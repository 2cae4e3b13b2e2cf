"""End-to-end training-corpus curation with datajudge_spark.pipeline.

The canonical pre-training data flow, each stage a lazy DataFrame
transformation (one driver action per printed stat):

    raw corpus
      -> exact dedup            (md5 fingerprint groups)
      -> near-dedup             (MinHash + LSH candidate pairs -> clusters,
                                 keep the lowest doc_id per cluster)
      -> quality filter         (alpha ratio, repetition signals)
      -> per-language trim      (drop the bottom length decile per stratum)
      -> decontamination        (3-gram overlap vs the eval split)
      -> deterministic split    (hash-bucket train/val, partitioning-stable)
      -> context-window chunks  (fixed token budget, map-only)

Run:  PYTHONPATH=/root/repo python docs/examples/corpus_curation.py
"""

import os

from pyspark.sql import functions as F

from datajudge_spark import get_spark
from datajudge_spark.pipeline import decontam, dedup, sampling, text

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("corpus-curation")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print(f"raw docs: {docs.count()}")

    # 1. exact dedup: keep one doc per identical normalized text
    keep_exact = (
        dedup.normalized_fingerprint(docs, "doc_id", "text")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    docs = docs.join(keep_exact.select("doc_id"), "doc_id", "semi")
    print(f"after exact dedup: {docs.count()}")

    # 2. near-dedup: MinHash+LSH candidates -> connected clusters,
    #    keep the cluster representative (lowest doc_id)
    sigs = dedup.minhash_signature(docs, "doc_id", "text", num_hashes=12)
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", bands=4, rows=3)
    clusters = dedup.duplicate_clusters(pairs.select("d1", "d2"))
    dupes = clusters.where(F.col("doc_id") != F.col("cluster_id"))
    docs = docs.join(dupes.select("doc_id"), "doc_id", "anti")
    print(f"after near dedup: {docs.count()}")

    # 3. quality: drop high-repetition docs
    rep = text.repetition_signals(docs, "doc_id", "text")
    good = rep.where(
        (F.col("dup_token_fraction") < 0.7) & (F.col("top_bigram_fraction") < 0.5)
    )
    docs = docs.join(good.select("doc_id"), "doc_id", "semi")
    print(f"after repetition filter: {docs.count()}")

    # 4. per-language length trim: drop the bottom decile per stratum
    thr = sampling.stratified_percentile_threshold(docs, "lang", "n_chars", 10.0)
    docs = docs.join(F.broadcast(thr), docs["lang"] == thr["stratum"]).where(
        F.col("n_chars") >= F.col("threshold")
    ).drop("stratum", "threshold")
    print(f"after per-language trim: {docs.count()}")

    # 5. decontamination vs the eval split (doc_id % 10 == 0)
    ev = docs.where(F.col("doc_id") % 10 == 0)
    train = docs.where(F.col("doc_id") % 10 != 0)
    contam = decontam.ngram_contamination(train, ev, "doc_id", "text")
    dirty = contam.where(F.col("contamination") > 0.8)
    print(f"contaminated eval docs dropped: {dirty.count()}")

    # 6. leakage-safe train/val split: whole SOURCES are assigned to a
    #    split (near-dups within a source can never straddle train/val);
    #    the audit digest is one conditional-agg scan
    split_audit = sampling.group_split_counts(train, "source", val_rate=10)
    for r in split_audit.collect():
        print(f"split {r.split}: {r.n_rows} docs from {r.n_groups} sources")
    val = sampling.deterministic_sample(train, "source", 10, salt="split")
    trn = train.join(val.select("doc_id"), "doc_id", "anti")

    # 7. mixture weights for the final training mix (alpha=0.5
    #    up-weights small sources)
    for r in sampling.mixture_weights(trn, "source").collect():
        print(f"source {r.source}: weight {r.weight}")

    # 8. drift gate: the curated corpus must still match the raw
    #    length distribution (PSI < 0.25 = no destructive filtering)
    from datajudge_spark.operators.stats import psi_drift

    raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    psi = psi_drift(raw, trn, "n_chars", 0.0, 2000.0, 10).collect()[0].psi
    print(f"length-distribution PSI raw vs curated: {psi}")

    # 9. context-window chunks
    chunks = text.chunk_documents(trn, "doc_id", "text", chunk_tokens=16)
    print(f"train chunks: {chunks.count()}")


if __name__ == "__main__":
    main()
