"""Embedding-space near-duplicate removal at scale.

The semantic-dedup flow for a training corpus with an embedding column
(the text-side flow is docs/examples/corpus_curation.py):

    embeddings
      -> train coarse cells      (distributed spherical k-means)
      -> blocked pair graph      (multi-probe IVF cells, salted join —
                                  never all-pairs; recall MEASURED, not
                                  assumed)
      -> density classification  (core / border / isolated)
      -> duplicate clusters      (connected components, min-id reps)
      -> survivor sample         (deterministic weighted draw)

At 100 TB: centroids broadcast (map-only assignment), the pair join
shuffles on (cell, salt) so per-cell work spreads across the cluster,
cluster search falls back to distributed label propagation past 2M
edges, and the weighted sample needs no RNG state — re-materializing
the corpus reproduces the same draw.

Run:  PYTHONPATH=/root/repo python docs/examples/embedding_dedup.py
"""

import os

from pyspark.sql import functions as F

from datajudge_spark import get_spark
from datajudge_spark.pipeline.dedup import duplicate_clusters
from datajudge_spark.pipeline.sampling import weighted_sample
from datajudge_spark.pipeline.similarity import (
    density_core_points,
    kmeans_centroids,
    near_dup_pairs_ivf,
    recall_at_k,  # noqa: F401  (the eval gate; see ann_serving.py)
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("embedding-dedup-example")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vecs = emb.select(
        F.col("vec_id").alias("vid"), F.col("embedding").alias("vvec")
    )

    # 1. coarse cells: in production size n_cells ~ sqrt(corpus) so the
    #    per-cell population (the quadratic term) stays bounded
    cent = kmeans_centroids(vecs, k=8, max_iterations=3)

    # 2. blocked near-dup pair graph (threshold tuned to the corpus; the
    #    synthetic embeddings have no dedup-grade pairs, so 0.3 here)
    pairs = near_dup_pairs_ivf(vecs, cent, threshold=0.3, nprobe=2)
    print(f"candidate near-dup pairs: {pairs.count()}")

    # 3. density verdicts: isolated vectors pass through untouched,
    #    borders are the human-review set, cores form clusters
    verdicts = density_core_points(
        vecs, cent, threshold=0.3, min_neighbors=2, nprobe=2
    )
    verdicts.groupBy("is_core").count().show()

    # 4. one representative per duplicate cluster (min id), everything
    #    outside a cluster survives by definition
    clusters = duplicate_clusters(pairs.select("d1", "d2"))
    reps = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("keep"))
    drop = clusters.join(
        reps, clusters["doc_id"] == reps["keep"], "left_anti"
    ).select("doc_id")
    survivors = vecs.join(
        drop, vecs["vid"] == drop["doc_id"], "left_anti"
    )
    print(f"survivors after dedup: {survivors.count()}")

    # 5. deterministic weighted sample of survivors (weight = L2 norm
    #    as a stand-in for a quality score) — replay-stable, no RNG
    weighted = survivors.withColumn(
        "w",
        F.sqrt(
            F.aggregate(
                "vvec",
                F.lit(0.0),
                lambda a, v: a + v.cast("double") * v.cast("double"),
            )
        ),
    )
    sample = weighted_sample(weighted, "vid", "w", k=20)
    print("sampled vids:", [r.key for r in sample.collect()])


if __name__ == "__main__":
    main()
