"""Scale-aware parquet sinks.

At 100 TB the difference between a usable and an unusable lake is layout:

- **Partition columns** (low-cardinality: date, topic) become directories;
  any query filtering on them prunes whole partitions before a single
  row-group is opened — the storage-level twin of predicate pushdown.
- **Bucketing** (high-cardinality join/agg key) pre-shuffles data at write
  time into a fixed number of hash buckets; a join or groupBy on the
  bucket key between two tables bucketed the same way needs NO exchange at
  read time — the shuffle is paid once, at ingest, instead of per query.
- **Target file sizing** via pre-write repartition: many small files kill
  scan throughput (driver-side listing + per-file open cost), one giant
  file kills parallelism.  ``spark.sql.files.maxPartitionBytes`` splits
  big files on read, but writing ~128 MB-1 GB files is the durable fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    files_per_partition: int | None = None,
) -> None:
    """Hive-style partitioned parquet (``path/col=value/...``).

    ``files_per_partition`` repartitions by the partition columns first so
    each directory gets a bounded file count instead of one file per
    in-memory partition (the classic small-files explosion: P shuffle
    partitions × D dates = P·D files without it)."""
    out = df
    if files_per_partition is not None:
        out = df.repartition(files_per_partition, *[F.col(c) for c in partition_by])
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str] | str,
    n_buckets: int,
    sort_by: list[str] | str | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed (and optionally sorted) table via ``saveAsTable`` —
    bucketing metadata lives in the catalog, so readers of two tables
    bucketed on the same key × count plan joins with zero exchange
    (and zero sort, when ``sort_by`` matches the join key)."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    writer = df.write.mode(mode).bucketBy(n_buckets, cols[0], *cols[1:])
    if sort_by is not None:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(s[0], *s[1:])
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)
