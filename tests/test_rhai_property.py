"""Property test for the two Rhai engines: RANDOM integer-arithmetic
scripts must evaluate identically through the compiler (Spark column
expressions, one collect per program) and the interpreter (Python values)
— including negative operands through the %-sign semantics and nested
if/else branching. This is the fuzz companion to the hand-written parity
tests in test_envelope.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

X_VALUES = [-5, -3, -1, 0, 1, 2, 4, 7]


def _lit() -> st.SearchStrategy[str]:
    return st.integers(min_value=-9, max_value=9).map(
        lambda n: f"({n})" if n < 0 else str(n)
    )


def _expr() -> st.SearchStrategy[str]:
    base = st.one_of(_lit(), st.just("x"))

    def extend(children):
        return st.one_of(
            st.tuples(
                children, st.sampled_from(["+", "-", "*"]), children
            ).map(lambda t: f"({t[0]} {t[1]} {t[2]})"),
            # % only with a literal non-zero divisor (ANSI mode: % 0 throws)
            st.tuples(children, st.integers(1, 9)).map(
                lambda t: f"({t[0]} % {t[1]})"
            ),
            st.tuples(
                children,
                st.integers(1, 9),
                st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
                children,
                children,
            ).map(
                lambda t: (
                    f"(if ({t[0]} % {t[1]}) {t[2]} 0 "
                    f"{{ {t[3]} }} else {{ {t[4]} }})"
                )
            ),
        )

    return st.recursive(base, extend, max_leaves=10)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(body=_expr())
def test_random_programs_compiled_equals_interpreted(spark, body):
    from pyspark.sql import functions as F

    from cdc_rs_spark.functions.rhai import (
        RhaiInterpreter,
        RhaiScript,
        _to_col,
    )

    src = f"fn f(x) {{ {body} }}"
    df = spark.createDataFrame([(v,) for v in X_VALUES], "x long")
    compiled = {
        r["x"]: r["y"]
        for r in df.select(
            "x", _to_col(RhaiScript(src).call("f", F.col("x"))).alias("y")
        ).collect()
    }
    interp = RhaiInterpreter(src)
    assert compiled == {v: interp.call("f", v) for v in X_VALUES}, src
