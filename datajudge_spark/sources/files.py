"""File-format sources beyond parquet, and scale-aware sinks.

The reference has NO sinks (results return to the driver —
db_access.py:754-756) and reads only DBMS tables; for a Spark-native
engine the natural extra surface is the file formats Spark ships
readers/writers for. Sources stay lazy (declare the scan, never trigger
jobs); sinks encode the two decisions that matter at 100 TB — how many
files (``repartition`` before write) and how data is laid out for later
scans (``partitionBy`` for partition pruning, ``bucketBy`` for
shuffle-free joins on the bucket key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datajudge_spark.sources import DataSource

__all__ = [
    "CsvDataSource",
    "JsonDataSource",
    "OrcDataSource",
    "write_parquet",
    "write_bucketed_table",
]


class _FileDataSource(DataSource):
    _format: str = ""

    def __init__(self, path: str, name: str | None = None, **options):
        self._path = path
        self._options = options
        self._name = name or path.rstrip("/").rsplit("/", 1)[-1].split(".")[0]

    def __str__(self) -> str:
        return self._name

    def get_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.format(self._format).options(**self._options).load(
            self._path
        )


class CsvDataSource(_FileDataSource):
    """CSV scan; pass ``header=True``/``inferSchema=True``/``schema=...``
    via options. Prefer an explicit schema at scale — inference scans the
    data once before the real job."""

    _format = "csv"


class JsonDataSource(_FileDataSource):
    """JSON-lines scan; same schema guidance as CSV."""

    _format = "json"


class OrcDataSource(_FileDataSource):
    """ORC scan — same pushdown/pruning properties as parquet."""

    _format = "orc"


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet with explicit layout control.

    ``partition_by`` creates hive-style directories that later scans
    prune on (the filter never touches excluded partitions);
    ``num_files`` repartitions before the write so output file count is
    a decision, not an accident of upstream shuffles (thousands of tiny
    files destroy scan performance at scale as surely as one giant one).
    """
    if num_files is not None:
        df = (
            df.repartition(num_files, *partition_by)
            if partition_by
            else df.repartition(num_files)
        )
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-ordered) catalog table.

    Two tables bucketed identically on their join key join WITHOUT a
    shuffle — the pre-partitioning pattern for repeatedly-joined big
    tables. Requires the session catalog (bucket metadata lives there).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name, format="parquet")
