"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship correlator pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose one entry per implemented operator
family (SURVEY.md §2) with DuckDB-parity SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make the package importable regardless of the caller's cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmalyzer_spark.plans import driver_queries as _dq

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the Correlator (SURVEY.md §2.3 J4) over synthetic
    geotagged views of the sf0.001 tables — customers play OSM elements,
    suppliers play external data items (same shape as the reference's
    shop-chain analyzers). Returns the six-kind correlation DataFrame.
    """
    from osmalyzer_spark.operators.correlator import CorrelatorParams, correlate

    elements = _dq._geo_customers(spark, SF0001).withColumn(
        "elem_tag", (F.col("elem_id") % 7).cast("string")
    )
    items = _dq._geo_suppliers(spark, SF0001).withColumn(
        "item_tag", (F.col("item_id") % 7).cast("string")
    )
    params = CorrelatorParams(
        match_distance=150.0,
        unmatch_distance=1500.0,
        strong_extra_distance=3000.0,
        strength_expr=lambda df: F.when(
            F.col("item_tag") == F.col("elem_tag"), F.lit(3)
        ).otherwise(F.lit(1)),
        lone_allowance_expr=lambda df: F.col("elem_id") % 11 == 0,
    )
    res = correlate(spark, elements, items, params)
    return res.correlations


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame. Every
    computed column is aliased identically to the oracle SQL.
    """
    return _dq.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (same parquet
    tables registered as views)."""
    return _dq.oracle_sql()
