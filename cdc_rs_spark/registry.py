"""Central query registry — the bridge to the driver contract.

Every implemented operator from SURVEY §2 registers here as a named query
(a (SparkSession, sf_dir) -> DataFrame callable) plus, when SQL-expressible,
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
`__spark_entry__.py` exposes this registry to the driver.

Column-name/type parity rule: every computed column is aliased identically in
the Spark code and the oracle SQL, and value encodings are chosen so both
engines stringify identically (exact double arithmetic, decimal(18,2) for
money, explicit date formatting).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}

_PLAN_MODULES = [
    "cdc_rs_spark.plans.cdc",
    "cdc_rs_spark.plans.relational",
    "cdc_rs_spark.plans.relational2",
    "cdc_rs_spark.plans.events",
    "cdc_rs_spark.plans.dedup",
    "cdc_rs_spark.plans.similarity",
    "cdc_rs_spark.plans.text",
    "cdc_rs_spark.plans.multimodal",
    "cdc_rs_spark.plans.pipeline",
]


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, Query]:
    for mod in _PLAN_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # plan module not built yet
    return REGISTRY
