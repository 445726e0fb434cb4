"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — every implemented SURVEY §2 operator as (spark, sf_dir)
                  callables (see ubdc_airbnb_spark/queries.py).
``oracle_sql()``— matching DuckDB SQL for the value-hash correctness gate.

Entries come back in plain registry order: every registry entry has been
driver-certified green (cumulative r01-r06, 221/221), so the
certification-rotation ordering that used to live here is gone.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ubdc_airbnb_spark import queries as q_mod


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_mod.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.spark for spec in q_mod.registry()}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.sql for spec in q_mod.registry() if spec.sql is not None}
