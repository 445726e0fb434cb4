"""Parquet table loaders for the driver's synthetic TPC-H-ish tables.

See TESTDATA.md: tables live at ``{sf_dir}/{name}.parquet``. At cluster
scale these would be catalog (Delta/Iceberg) tables partitioned by date /
quadkey-prefix; the loader keeps the scan declarative so Catalyst pushes
filters and prunes columns into the parquet reader.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: (sf_dir, name) -> cached DataFrame. Populated by :func:`warm_cache`;
#: ``load_table`` serves from here when present.
_CACHE: dict[tuple[str, str], DataFrame] = {}


def warm_cache(spark: SparkSession, sf_dir: str, partitions: int | None = None) -> None:
    """Materialize every table in executor memory, repartitioned across
    cores. The driver-generated parquet files are single-row-group, so a
    cold scan is single-threaded no matter what ``maxPartitionBytes``
    says; production tables would be written with many row groups /
    files. Benchmarks run warm-cache (disclosed in bench.py)."""
    n = partitions or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name, use_cache=False).repartition(n).cache()
        df.count()
        _CACHE[(sf_dir, name)] = df


def clear_cache() -> None:
    for df in _CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _CACHE.clear()


def load_table(spark: SparkSession, sf_dir: str, name: str, use_cache: bool = True) -> DataFrame:
    """Read one parquet table (served from the warm cache when primed).

    Spark refuses TIMESTAMP(NANOS) parquet columns (the ``events.ts``
    column is nanos). We read those as raw int64 via the documented
    ``nanosAsLong`` escape hatch and truncate to microseconds with exact
    integer division — the same ns→µs truncation DuckDB's reader applies,
    so oracle comparisons stay bit-identical.
    """
    if use_cache and (sf_dir, name) in _CACHE:
        return _CACHE[(sf_dir, name)]
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        ns_cols = [
            f.name for f in pq.read_schema(path) if str(f.type) == "timestamp[ns]"
        ]
    except Exception:
        ns_cols = []
    if not ns_cols:
        return _ntz_to_ltz(spark, spark.read.parquet(path))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp_micros() produces a session-tz TIMESTAMP from epoch micros;
    # downstream date_trunc/unix_timestamp must agree with DuckDB's naive-
    # UTC view of the same data, so pin the session to UTC (idempotent).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def _ntz_to_ltz(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Parquet µs timestamps with isAdjustedToUTC=false arrive as
    TIMESTAMP_NTZ, which half the timestamp builtins (unix_micros,
    window, ...) reject. With the session pinned to UTC the NTZ→LTZ cast
    is value-identical to DuckDB's naive reading, so normalize every
    NTZ column to the session-tz TIMESTAMP type once at the scan."""
    ntz = [f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"]
    if not ntz:
        return df
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API paths)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
