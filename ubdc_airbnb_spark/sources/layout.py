"""Data-layout utilities for the lakehouse tables (SURVEY §4: the
reference's B-tree/GIN indexes become partition pruning + min/max stats
+ co-located buckets).

- ``write_clustered``  — range-partition + sort on the cluster keys so
  every output file owns a tight min/max range: filters on those keys
  prune at file/row-group level (the Z-ORDER-lite that parquet stats
  give for free; for multi-dim locality, cluster by the quadkey string,
  which IS a Z-order curve — interleaved x/y bits).
- ``write_bucketed``   — hash-bucketed + sorted table so equi-joins and
  aggregations on the bucket key run with NO shuffle on either side
  (verified by plan assertion in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 16,
) -> None:
    """Range-partition by the cluster keys and sort within partitions;
    each parquet file then covers a disjoint key range (checked via
    footer stats in tests) so predicate pushdown skips whole files."""
    (
        df.repartitionByRange(num_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
) -> None:
    """Persist as a bucketed+sorted catalog table. Two tables bucketed
    the same way join with zero Exchange — the co-located join the
    reference can't express (Postgres always re-hashes)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )
