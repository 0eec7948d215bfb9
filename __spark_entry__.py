"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (SURVEY §7 minimum slice) at sf0.001.
queries()     — name -> (spark, sf_dir) -> DataFrame, one per implemented
                operator from SURVEY.md §2 (see cdc_rs_spark/registry.py).
oracle_sql()  — name -> equivalent ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_rs_spark.registry import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: snapshot `orders` -> Backfill change envelope -> BigQuery-CDC
    transform -> scalar projection (SURVEY §7 minimum end-to-end slice)."""
    registry = load_all()
    return registry["cdc_backfill_bigquery"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
