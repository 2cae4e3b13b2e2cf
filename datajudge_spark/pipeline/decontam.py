"""Benchmark decontamination: n-gram overlap between a training corpus
and an evaluation set.

No reference analog (Quantco/datajudge stops at relational validation);
this is the standard pre-training hygiene step: an eval document whose
word n-grams substantially appear in the training corpus is
"contaminated" and must be excluded from evaluation (or the training
docs dropped).

Scale design (100 TB training side, small-ish eval side):

- The training corpus is reduced to its **distinct n-gram hash set**
  first: ``array_distinct`` per row before the explode (the shuffle
  carries no within-document duplicates), then a map-side partial
  distinct on the 60-bit hash. The set is orders of magnitude smaller
  than the corpus and is the only thing that flows into the join.
- The overlap join is a plain shuffled hash join on an int64 hash
  column — no strings cross the wire. With a small eval set the
  optimizer (or AQE) broadcast-joins the eval side instead; either
  plan is one shuffle of hashes, never of text.
- Hashing is :func:`datajudge_spark.pipeline.text.md5_long` — portable,
  so the DuckDB oracle reproduces identical counts (collisions included)
  bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datajudge_spark.pipeline._util import materialize_once
from datajudge_spark.pipeline.dedup import _distinct_shingles
from datajudge_spark.pipeline.text import md5_long


def train_ngram_set(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """Distinct word-``shingle_n``-gram hash set of a corpus.

    One column ``h`` (int64). Partial (map-side) distinct on the hash,
    then a final distinct after the shuffle — the classic two-level
    dedup; the shuffle payload is 8 bytes per surviving n-gram.
    """
    return (
        _distinct_shingles(df, id_col, text_col, shingle_n)
        .select(md5_long("s").alias("h"))
        .distinct()
    )


def ngram_contamination(
    train: DataFrame,
    eval_: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-eval-document contamination against a training corpus.

    Returns ``(eval_id, total, shared, contamination)`` where ``total``
    is the number of distinct n-grams of the eval document, ``shared``
    how many of them occur anywhere in ``train``, and ``contamination``
    their ratio rounded to 6 places. Documents shorter than ``shingle_n``
    tokens have no n-grams and are absent from the output (consistent
    with the oracle construction).
    """
    tr = train_ngram_set(train, id_col, text_col, shingle_n)
    ev = materialize_once(
        _distinct_shingles(eval_, id_col, text_col, shingle_n).select(
            F.col("_id"), md5_long("s").alias("h")
        )
    )
    totals = ev.groupBy("_id").agg(F.count("*").alias("total"))
    shared = (
        ev.join(tr, "h", "inner").groupBy("_id").agg(F.count("*").alias("shared"))
    )
    return (
        totals.join(shared, "_id", "left")
        .select(
            F.col("_id").alias("eval_id"),
            F.col("total"),
            F.coalesce(F.col("shared"), F.lit(0)).alias("shared"),
            F.round(
                F.coalesce(F.col("shared"), F.lit(0)) / F.col("total"), 6
            ).alias("contamination"),
        )
    )


def source_overlap(
    df: DataFrame,
    group_col: str,
    text_col: str,
    shingle_n: int = 3,
    max_breadth: int = 64,
) -> DataFrame:
    """Pairwise corpus-lineage matrix: for every source pair,
    ``(src_a, src_b, n_shared, jaccard)`` over the sources' DISTINCT
    n-gram hash vocabularies — "which shards are re-crawls / mirrors of
    each other?" in one relational pass.

    Scale: each source reduces to its distinct hash set first (8 bytes
    per surviving n-gram).  The pair space is bounded the same way the
    dedup family bounds hot buckets: a hash present in more than
    ``max_breadth`` sources is UBIQUITOUS boilerplate (carries no
    lineage signal — it would contribute O(breadth²) pair rows) and is
    excluded from both the pair counts and the per-source totals, so
    the join's per-hash fan-out is bounded at ``max_breadth²`` no
    matter how many sources share a cookie banner.  Output is
    |source-pairs| rows.
    """
    from datajudge_spark.pipeline._util import spread
    from datajudge_spark.pipeline.dedup import word_shingles

    base = spread(
        df.where(
            F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
        )
    ).select(
        F.col(group_col).alias("_src"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), shingle_n))
        ).alias("s"),
    )
    sets = materialize_once(
        base.select("_src", md5_long("s").alias("h")).distinct()
    )
    breadth = sets.groupBy("h").agg(F.count(F.lit(1)).alias("_b"))
    keep = materialize_once(
        sets.join(breadth, "h").where(F.col("_b") <= max_breadth).select(
            "_src", "h"
        )
    )
    totals = keep.groupBy("_src").agg(F.count(F.lit(1)).alias("_t"))
    a, b = keep.alias("a"), keep.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a._src") < F.col("b._src")),
        )
        .groupBy(
            F.col("a._src").alias("src_a"), F.col("b._src").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = totals.select(
        F.col("_src").alias("src_a"), F.col("_t").alias("_ta")
    )
    tb = totals.select(
        F.col("_src").alias("src_b"), F.col("_t").alias("_tb")
    )
    return (
        pairs.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(
                F.col("n_shared")
                / (F.col("_ta") + F.col("_tb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
            # containment is the DIRECTIONAL mirror signal jaccard
            # dilutes: a small source fully swallowed by a big crawl
            # has containment_a ~ 1 while jaccard stays small
            F.round(F.col("n_shared") / F.col("_ta"), 6).alias(
                "containment_a"
            ),
            F.round(F.col("n_shared") / F.col("_tb"), 6).alias(
                "containment_b"
            ),
        )
    )


def per_source_novelty(
    df: DataFrame,
    group_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-source vocabulary novelty: for EVERY source, the fraction of
    its distinct n-gram hashes that appear in NO other source —
    ``(source, n_ngrams, n_shared_elsewhere, novelty_fraction)``.

    The corpus-curation ranking ("which sources are redundant, which
    carry unique content?") in ONE pass: the per-source distinct hash
    sets feed a breadth count per hash (how many sources hold it), and
    a hash is shared-elsewhere exactly when its breadth is >= 2 — no
    per-source anti-join, no |sources|² work, just the same two
    aggregates :func:`source_overlap` already builds.
    """
    from datajudge_spark.pipeline._util import spread
    from datajudge_spark.pipeline.dedup import word_shingles

    base = spread(
        df.where(
            F.col(text_col).isNotNull() & F.col(group_col).isNotNull()
        )
    ).select(
        F.col(group_col).alias("_src"),
        F.explode(
            F.array_distinct(word_shingles(F.col(text_col), shingle_n))
        ).alias("s"),
    )
    sets = materialize_once(
        base.select("_src", md5_long("s").alias("h")).distinct()
    )
    breadth = sets.groupBy("h").agg(F.count(F.lit(1)).alias("_b"))
    return (
        sets.join(breadth, "h")
        .groupBy(F.col("_src").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("_b") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared_elsewhere"),
        )
        .select(
            group_col,
            "n_ngrams",
            "n_shared_elsewhere",
            F.round(
                (F.col("n_ngrams") - F.col("n_shared_elsewhere"))
                / F.col("n_ngrams"),
                6,
            ).alias("novelty_fraction"),
        )
    )


def ngram_novelty(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Corpus-level novelty digest: how much of an incoming shard's
    n-gram vocabulary is NEW relative to the corpus already ingested.

    One row ``(n_test_ngrams, n_shared, novelty_fraction)`` over the
    DISTINCT n-gram hash sets of both sides — the "does this shard add
    information or is it a re-crawl?" gate (near-zero novelty means the
    shard is redundant; near-one means it is from a different
    distribution and deserves quality review).  The set-level complement
    of :func:`ngram_contamination`'s per-document view.

    Plan: both corpora reduce to distinct 60-bit hash sets FIRST
    (``array_distinct`` per row, then map-side partial distinct — the
    shuffle carries 8 bytes per surviving n-gram, never text), the sets
    hash-join on the int64, and the digest is one aggregate row.
    """
    tr = train_ngram_set(train, id_col, text_col, shingle_n).select(
        "h", F.lit(1).alias("_seen")
    )
    te = train_ngram_set(test, id_col, text_col, shingle_n)
    joined = te.join(tr, "h", "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_test_ngrams"),
        F.coalesce(F.sum("_seen"), F.lit(0))
        .cast("bigint")
        .alias("n_shared"),
        F.round(
            F.when(
                F.count(F.lit(1)) > 0,
                (F.count(F.lit(1)) - F.coalesce(F.sum("_seen"), F.lit(0)))
                / F.count(F.lit(1)),
            ),
            6,
        ).alias("novelty_fraction"),
    )


def capture_recapture(
    df: DataFrame,
    source_col: str,
    text_col: str,
    src_a,
    src_b,
) -> DataFrame:
    """Chapman capture-recapture estimate of the underlying document
    POOL two sources draw from: treating each source's exact-dedup
    fingerprint set as one "capture" of the pool, the overlap m
    between captures of sizes n_a and n_b yields the bias-corrected
    Chapman estimator

        N̂ = (n_a + 1)(n_b + 1) / (m + 1) − 1
        Var(N̂) = (n_a + 1)(n_b + 1)(n_a − m)(n_b − m)
                  / ((m + 1)² (m + 2))

    — the "how much of the reachable pool have my two crawls already
    seen?" gate COUNT(DISTINCT) cannot express (it counts what was
    seen, not what exists).  One digest row ``(n_a, n_b, n_both,
    n_union, chapman_total, se, est_unseen)``; ``est_unseen`` =
    max(N̂ − union, 0) — the estimated distinct documents NEITHER
    source has captured (valid under the independent-capture model;
    dependent crawls bias N̂ low — documented, not hidden).
    Degenerate m = 0 still yields the finite Chapman value (its
    raison d'être over Lincoln-Petersen).

    Scale: each source reduces to its DISTINCT fingerprint set first
    (md5 of normalized text — the exact-dedup key), one shuffle on the
    fingerprint, per-fingerprint membership flags fold into ONE
    conditional-aggregation row.  No pair join, no text on the wire.
    Extension — no reference counterpart.
    """
    from datajudge_spark.pipeline._util import spread
    from datajudge_spark.pipeline.dedup import normalized_fingerprint

    base = spread(
        df.where(
            F.col(text_col).isNotNull()
            & F.col(source_col).isin([src_a, src_b])
        )
    )
    fps = (
        normalized_fingerprint(
            base.select(
                F.col(source_col).alias("_src"), F.col(text_col)
            ),
            "_src",
            text_col,
        )
        .distinct()
    )
    flags = fps.groupBy("fingerprint").agg(
        F.max(F.when(F.col("_src") == F.lit(src_a), 1).otherwise(0)).alias(
            "_in_a"
        ),
        F.max(F.when(F.col("_src") == F.lit(src_b), 1).otherwise(0)).alias(
            "_in_b"
        ),
    )
    counts = flags.agg(
        # coalesce: a fully-empty selection yields SUM() = NULL; the
        # gate needs clean zeros to report "capture is empty", not a
        # driver-side TypeError (ADVICE r10).
        F.coalesce(F.sum("_in_a"), F.lit(0)).cast("bigint").alias("n_a"),
        F.coalesce(F.sum("_in_b"), F.lit(0)).cast("bigint").alias("n_b"),
        F.coalesce(
            F.sum(
                F.when((F.col("_in_a") == 1) & (F.col("_in_b") == 1), 1)
            ),
            F.lit(0),
        ).cast("bigint").alias("n_both"),
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    m = F.col("n_both").cast("double")
    chapman = (na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0
    var = (
        (na + 1.0) * (nb + 1.0) * (na - m) * (nb - m)
        / ((m + 1.0) * (m + 1.0) * (m + 2.0))
    )
    return counts.select(
        "n_a",
        "n_b",
        "n_both",
        "n_union",
        F.round(chapman, 6).alias("chapman_total"),
        F.round(F.sqrt(var), 6).alias("se"),
        F.round(
            F.greatest(chapman - F.col("n_union").cast("double"), F.lit(0.0)),
            6,
        ).alias("est_unseen"),
    )


def winnowing_contamination(
    train: DataFrame,
    eval_: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Per-eval-document contamination via winnowing fingerprints —
    the LOCAL-overlap complement of :func:`ngram_contamination`.

    Returns ``(eval_id, n_fp, n_hit, contamination)``: ``n_fp`` is the
    number of distinct winnowing-selected fingerprints of the eval
    document, ``n_hit`` how many of them occur anywhere in ``train``,
    ``contamination`` their ratio rounded to 6 places.

    Why a second contamination gate: the n-gram set gate samples EVERY
    n-gram, so its index is dense, and its guarantee stops at exactly-n
    spans — a verbatim passage that is long but rare among millions of
    short accidental n-gram collisions is indistinguishable from noise.
    Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003) stores only each
    ``w``-window's MINIMUM k-gram hash (~``2/(w+1)`` density) yet still
    GUARANTEES that any shared passage of at least ``w + k - 1`` words
    yields at least one shared fingerprint — a sparse index with a
    local-match guarantee, which is what catches plagiarism-style
    verbatim spans that whole-document MinHash similarity and dense
    n-gram noise both wash out.  Documents shorter than one window keep
    their global-minimum fingerprint; documents with no tokens are
    absent from the output (consistent with the oracle construction).

    Scale (100 TB train side): the train corpus reduces to its DISTINCT
    fingerprint set (per-document ``array_distinct`` before the
    explode, then map-side partial distinct — 8 bytes per surviving
    fingerprint cross the wire, never text), so a fingerprint shared by
    millions of train documents contributes ONE row to the membership
    join, never a pair explosion.  The semi-join on the int64
    fingerprint is one hash shuffle; with a small eval side AQE
    broadcast-joins it instead.  The eval fingerprint frame is
    persisted once (totals + hits both read it).  Fingerprints are
    portable md5 60-bit hashes, so the DuckDB oracle reproduces
    identical counts (collisions included) bit-for-bit.
    """
    from datajudge_spark.pipeline.dedup import winnowing_fingerprints

    tr = (
        winnowing_fingerprints(train, id_col, text_col, k, w)
        .select("fp")
        .distinct()
    )
    ev = materialize_once(
        winnowing_fingerprints(eval_, id_col, text_col, k, w).select(
            F.col(id_col).alias("_id"), "fp"
        )
    )
    totals = ev.groupBy("_id").agg(F.count(F.lit(1)).alias("n_fp"))
    hits = (
        ev.join(tr, "fp", "left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, "_id", "left")
        .select(
            F.col("_id").alias("eval_id"),
            F.col("n_fp"),
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_fp"), 6
            ).alias("contamination"),
        )
    )
