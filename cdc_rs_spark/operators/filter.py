"""Regex table filter — reference `--regex` gate.

The reference compiles the regex once and drops binlog events whose
"{db}.{table}" doesn't match (reference src/main.rs:220, 260-262), e.g.
'^pim.*\\.pim_catalog_product' (README.md:46). Here it's a plain Catalyst
predicate — it gets pushed as early as possible by the optimizer, the analog
of the reference filtering *before* row decode (src/main.rs:260-262 precedes
:274).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_matches(pattern: str) -> Column:
    return F.concat(F.col("db"), F.lit("."), F.col("table")).rlike(pattern)


def regex_table_filter(df: DataFrame, pattern: str) -> DataFrame:
    return df.filter(table_matches(pattern))
