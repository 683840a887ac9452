"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (full engine round-trip at
sf0.001); ``queries()``/``oracle_sql()`` expose one entry per implemented
operator (codec identity queries + chunk-stat aggregates + training-data
ops), verified against DuckDB at sf=0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMALL = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed encode -> decode round-trip of the token table
    derived from sf0.001 events; returns the reconstructed rows."""
    from orc_rs_spark.queries import QUERIES

    return QUERIES["rt_engine_tokens"](spark, SF_SMALL)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from orc_rs_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from orc_rs_spark.queries import ORACLES

    return dict(ORACLES)
