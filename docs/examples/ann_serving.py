"""ANN index lifecycle with datajudge_spark.pipeline.similarity.

The FAISS-style build / search / evaluate flow, expressed as Spark
plans (every distance fold is a JVM higher-order function — no Python
in any hot path):

    embeddings
      -> train coarse cells      (distributed spherical k-means)
      -> encode                  (PQ: m one-byte codes per vector)
      -> search                  (brute force | IVF | PQ-ADC | IVF-PQ)
      -> evaluate                (recall@k vs exact ground truth)
      -> ship                    (int8 quantize, persist the index)

At 100 TB the encoded corpus (cell id + m bytes per vector) IS the
stored index; cell assignment and encoding are map-only passes against
broadcast constants, and every search shuffles exactly once (the
per-query top-k window).

Run:  PYTHONPATH=/root/repo python docs/examples/ann_serving.py
"""

import os

from pyspark.sql import functions as F

from datajudge_spark import get_spark
from datajudge_spark.pipeline.similarity import (
    kmeans_centroids,
    pq_codebook,
    quantize_embeddings,
    recall_at_k,
    save_ivf_index,
    topk_bruteforce,
    topk_ivf,
    topk_ivf_pq,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("ann-serving-example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    corpus = emb.select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )

    # 1. build: train the coarse quantizer (k cells), pick the PQ
    #    codebook. Only k x dim doubles ever reach the driver.
    cells = kmeans_centroids(
        emb, k=8, v_id="vec_id", v_vec="embedding", max_iterations=5
    )
    codebook = pq_codebook(emb, n_codes=16, v_id="vec_id", v_vec="embedding")

    # 2. search: the exact baseline and the two approximate paths
    exact = topk_bruteforce(queries, corpus, k=3)
    ivf = topk_ivf(queries, corpus, cells, k=3)
    ivf_pq = topk_ivf_pq(queries, corpus, cells, codebook, m=8, k=3)

    # 3. evaluate: recall@3 against the exact ground truth — the gate
    #    every index deployment runs before trusting approximate results
    for name, approx in [("ivf", ivf), ("ivf_pq", ivf_pq)]:
        rec = recall_at_k(approx, exact, k=3)
        mean = rec.agg(F.round(F.avg("recall"), 3).alias("r")).first()["r"]
        print(f"recall@3 {name}: {mean}")

    # 4. ship: int8 storage form (4 bytes/dim -> 1 byte/dim) and the
    #    persisted index (an IVF index IS its centroid table)
    q8 = quantize_embeddings(emb, "vec_id", "embedding")
    print("quantized rows:", q8.count())
    save_ivf_index(cells, "/tmp/djs_ivf_index")
    print("index saved: /tmp/djs_ivf_index")


if __name__ == "__main__":
    main()
