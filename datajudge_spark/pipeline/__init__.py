"""Training-data pipeline operators (Spark-first, no reference analog).

The reference (Quantco/datajudge) stops at relational validation; a
100 TB training-data pipeline additionally needs deduplication,
similarity search, text analysis and multimodal handling. These modules
provide them as composable DataFrame transformations:

- :mod:`.text` — tokenization, shingling, portable hashing, language ID,
  quality signals, fingerprints.
- :mod:`.dedup` — exact, MinHash+LSH, SimHash and n-gram-Jaccard
  near-duplicate detection.
- :mod:`.similarity` — cosine top-k (brute force) and IVF-style
  cell-probed approximate nearest neighbours over embedding columns.
- :mod:`.multimodal` — binary media columns with typed metadata and
  Arrow-batched decode plumbing (``mapInPandas``).
- :mod:`.decontam` — eval-vs-train n-gram overlap (benchmark
  decontamination).
- :mod:`.sampling` — deterministic hash-based (stratified) sampling for
  reproducible corpus splits.

Everything is built from JVM-side ``pyspark.sql.functions`` (whole-stage
codegen) except the multimodal decoders, which are Arrow-batched pandas
iterators by necessity. All hash primitives are md5-based and therefore
bit-identical across engines — the DuckDB oracle recomputes them in SQL.
"""

from datajudge_spark.pipeline import (
    decontam,
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)

__all__ = ["decontam", "dedup", "multimodal", "sampling", "similarity", "text"]
