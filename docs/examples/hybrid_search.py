"""Hybrid corpus retrieval: BM25 lexical + dense cosine, RRF-fused.

The retrieval flow a training-data curation stack uses to pull
candidate documents for a topic (dedup audits, targeted decontam,
eval-set mining):

    documents ──> BM25 top-n          (query-term filter BELOW the
                                       (doc, term) shuffle; df and
                                       (N, avgdl) broadcast)
    embeddings ─> cosine top-n        (brute force here; swap in
                                       similarity.topk_ivf / topk_pq
                                       for corpus scale — recall is
                                       MEASURED by recall_at_k)
    both ───────> reciprocal-rank     (bounded lists only: the fuse
                  fusion (rrf_fuse)    is shuffle-trivial regardless
                                       of corpus size)

At 100 TB nothing in the fuse step grows: each ranking is a top-n
digest, so RRF joins two n-row frames.  The heavy lifting stays in the
two retrieval ops, each already blocked/broadcast for scale.

Run:  PYTHONPATH=/root/repo python docs/examples/hybrid_search.py
"""

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from datajudge_spark import get_spark
from datajudge_spark.pipeline.similarity import (
    mmr_rerank,
    rrf_fuse,
    topk_bruteforce,
)
from datajudge_spark.pipeline.text import bm25_topk

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("hybrid-search")
docs = spark.read.parquet(f"{SF}/documents.parquet")
emb = spark.read.parquet(f"{SF}/embeddings.parquet")

# 1. lexical candidates for the query bag
lex = bm25_topk(docs, "doc_id", "text", ["hash", "vector", "stream"], k=50)
wl = Window.orderBy(F.desc("score_e6"), F.asc("doc_id"))  # 50-row frame
lex_r = lex.select(
    F.col("doc_id").alias("id"), F.row_number().over(wl).alias("rank")
)

# 2. dense candidates around an anchor document's embedding
q = emb.where(F.col("vec_id") == 0).select(
    F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
)
cand = emb.select(
    F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
)
dense_r = topk_bruteforce(q, cand, k=50).select(
    F.col("cid").alias("id"), F.col("rn").alias("rank")
)

# 3. fuse and show the blended ranking
fused = rrf_fuse([lex_r, dense_r], k=10)
print("rank  doc_id   rrf       lex  dense")
for i, r in enumerate(fused.collect(), 1):
    print(
        f"{i:>4}  {r['id']:>6}   {r['rrf']:.6f}  "
        f"{str(r['rank_0']):>4} {str(r['rank_1']):>5}"
    )

# 4. diversify the final page: MMR over the fused top-10 digest (the
#    greedy pass is driver-side ON PURPOSE — its input is bounded)
cands = fused.join(
    emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec")),
    "id",
).select("id", "vec", F.col("rrf").alias("rel"))
print("\nMMR-diversified (lambda=0.7):")
for r in mmr_rerank(cands, k=5, lam=0.7).orderBy("mmr_rank").collect():
    print(f"{r['mmr_rank']:>4}  {r['id']:>6}   score={r['mmr_score']:.6f}")
