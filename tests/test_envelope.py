"""Golden tests for the Change envelope + encode rules (SURVEY §1.2, §2.3).

The spec is the reference's wire decode (src/main.rs:442-507) and the stock
script's two envelope styles (test.rhai:1-52).
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from cdc_rs_spark.envelope import (
    BACKFILL_TS,
    live_changes,
    pkey_value,
    snapshot_changes,
)
from cdc_rs_spark.functions.encode import encode_value
from cdc_rs_spark.functions.transforms import (
    bigquery_json,
    debezium_json,
    scripted_transform,
    topic_column,
)


def _encode_one(spark, value, dtype):
    df = spark.createDataFrame([(value,)], f"v {dtype}")
    return df.select(encode_value(F.col("v"), dtype).alias("e")).collect()[0]["e"]


def test_encode_int_float_string(spark):
    assert _encode_one(spark, 42, "bigint") == "42"
    assert _encode_one(spark, -7, "int") == "-7"
    assert _encode_one(spark, 1.5, "double") == "1.5"
    assert _encode_one(spark, "abc", "string") == "abc"
    assert _encode_one(spark, None, "string") is None


def test_encode_date_and_midnight_collapse(spark):
    # Date(y,m,d,0,0,0,0) -> "YYYY-MM-DD" (src/main.rs:457); a midnight
    # DATETIME matches the same arm by pattern order.
    assert _encode_one(spark, datetime.date(2024, 3, 9), "date") == "2024-03-09"
    assert (
        _encode_one(spark, datetime.datetime(2024, 3, 9, 0, 0, 0), "timestamp")
        == "2024-03-09"
    )


def test_encode_datetime_seconds_and_micros(spark):
    assert (
        _encode_one(spark, datetime.datetime(2024, 3, 9, 13, 5, 7), "timestamp")
        == "2024-03-09 13:05:07"
    )
    assert (
        _encode_one(
            spark, datetime.datetime(2024, 3, 9, 13, 5, 7, 450), "timestamp"
        )
        == "2024-03-09 13:05:07.000450"
    )


def test_encode_binary_utf8_vs_hex(spark):
    # valid UTF-8 -> decoded string; invalid -> uppercase hex (src/main.rs:492-501)
    assert _encode_one(spark, bytearray(b"hello"), "binary") == "hello"
    assert _encode_one(spark, bytearray(b"\xff\x00\xab"), "binary") == "FF00AB"


def test_snapshot_changes_shape(spark, sf_dir):
    from cdc_rs_spark.session import load

    orders = load(spark, sf_dir, "orders")
    ch = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    row = ch.limit(1).collect()[0]
    assert row["op"] == "Backfill"
    assert row["before"] is None
    assert row["ts"] == BACKFILL_TS
    assert row["pkey"] == "o_orderkey"
    assert set(row["after"].keys()) == set(orders.columns)


def test_live_changes_images(spark):
    df = spark.createDataFrame(
        [(1, "a", "Insert", 10), (2, "b", "Update", 11), (3, "c", "Delete", 12)],
        "id int, v string, op string, ts int",
    )
    ch = live_changes(df, "db1", "t1", "id").collect()
    by_op = {r["op"]: r for r in ch}
    assert by_op["Insert"]["before"] is None
    assert by_op["Insert"]["after"] == {"id": "1", "v": "a"}
    assert by_op["Update"]["before"] == {"id": "2", "v": "b"}
    assert by_op["Update"]["after"] == {"id": "2", "v": "b"}
    assert by_op["Delete"]["after"] is None
    assert by_op["Delete"]["before"] == {"id": "3", "v": "c"}


def _mini_changes(spark):
    df = spark.createDataFrame(
        [
            ("Insert", "pim", "product", None, {"id": "1", "x": "a"}, 1700000000, "id"),
            ("Update", "pim", "product", {"id": "1", "x": "a"}, {"id": "1", "x": "b"}, 1700000001, "id"),
            ("Delete", "pim", "product", {"id": "1", "x": "b"}, None, 1700000002, "id"),
            ("Backfill", "pim", "product", None, {"id": "2", "x": "c"}, 1, "id"),
        ],
        "op string, db string, table string, before map<string,string>, "
        "after map<string,string>, ts long, pkey string",
    )
    return df


def test_debezium_envelope_golden(spark):
    """Spec: test.rhai:4-22 — payload with before/after/op/source/ts_ms."""
    df = _mini_changes(spark)
    rows = df.select(F.col("op"), debezium_json(df).alias("j")).collect()
    by_op = {r["op"]: json.loads(r["j"]) for r in rows}
    ins = by_op["Insert"]["payload"]
    assert ins["op"] == "c"
    assert "before" not in ins or ins.get("before") is None  # null omitted by to_json
    assert ins["after"] == {"id": "1", "x": "a"}
    assert ins["source"] == {"ts_ms": 1700000000, "db": "pim", "table": "product"}
    assert ins["ts_ms"] == 1700000000
    assert by_op["Update"]["payload"]["op"] == "u"
    assert by_op["Delete"]["payload"]["op"] == "d"
    assert by_op["Backfill"]["payload"]["op"] == "c"


def test_bigquery_envelope_golden(spark):
    """Spec: test.rhai:25-36 — flattened row, _CHANGE_TYPE, tenant=db,
    before-image payload iff Delete."""
    df = _mini_changes(spark)
    rows = df.select(F.col("op"), bigquery_json(df).alias("j")).collect()
    by_op = {r["op"]: json.loads(r["j"]) for r in rows}
    assert by_op["Insert"] == {
        "id": "1", "x": "a", "_CHANGE_TYPE": "UPSERT", "tenant": "pim"
    }
    assert by_op["Update"] == {
        "id": "1", "x": "b", "_CHANGE_TYPE": "UPSERT", "tenant": "pim"
    }
    assert by_op["Delete"] == {
        "id": "1", "x": "b", "_CHANGE_TYPE": "DELETE", "tenant": "pim"
    }
    assert by_op["Backfill"] == {
        "id": "2", "x": "c", "_CHANGE_TYPE": "UPSERT", "tenant": "pim"
    }


def test_topic_template(spark):
    df = _mini_changes(spark)
    t = df.select(
        topic_column("projects/my-project-id/topics/all_pims.${table}").alias("t")
    ).collect()
    assert all(r["t"] == "projects/my-project-id/topics/all_pims.product" for r in t)
    t2 = df.select(topic_column("${db}.${table}.v1").alias("t")).collect()
    assert all(r["t"] == "pim.product.v1" for r in t2)


def test_pkey_value(spark):
    df = _mini_changes(spark)
    vals = sorted(
        df.select(pkey_value(df).alias("k")).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in vals] == ["1", "1", "1", "2"]


def test_scripted_transform_escape_hatch(spark):
    """The mapInPandas slow path mirroring src/main.rs:406-421."""
    df = _mini_changes(spark)

    def transform(db, table, op, before, after, ts):
        fields = dict(before if op == "Delete" else after)
        fields["_CHANGE_TYPE"] = "DELETE" if op == "Delete" else "UPSERT"
        fields["tenant"] = db
        return fields

    out = scripted_transform(df, transform).collect()
    assert len(out) == 4
    parsed = [json.loads(r["value"]) for r in out]
    assert all(p["tenant"] == "pim" for p in parsed)
    assert {p["_CHANGE_TYPE"] for p in parsed} == {"UPSERT", "DELETE"}


def test_envelope_absorbs_schema_drift(spark):
    """Schema evolution mid-stream: a change batch where later rows carry a
    column earlier rows lack (upstream ALTER TABLE ADD COLUMN). The
    map<string,string> envelope absorbs it — compaction and the BigQuery
    transform flow through, old rows simply lack the key (NULL on access)."""
    from cdc_rs_spark.operators.compaction import latest_per_key

    changes = spark.createDataFrame(
        [
            ("Insert", "db", "t", None, {"id": "1", "v": "a"}, 10, "id"),
            # after the ALTER: same key re-upserted with an extra column
            ("Update", "db", "t", {"id": "1", "v": "a"},
             {"id": "1", "v": "b", "extra": "new"}, 20, "id"),
            ("Insert", "db", "t", None, {"id": "2", "v": "c"}, 30, "id"),
        ],
        "op string, db string, table string, before map<string,string>, "
        "after map<string,string>, ts long, pkey string",
    )
    state = latest_per_key(changes, drop_deletes=True)
    rows = {r.k: (r.v, r.extra) for r in state.select(
        F.col("after")["id"].alias("k"),
        F.col("after")["v"].alias("v"),
        F.col("after")["extra"].alias("extra"),
    ).collect()}
    assert rows == {"1": ("b", "new"), "2": ("c", None)}


def test_typed_changes_declared_schema_decode(spark, sf_dir):
    """Declared-schema decode (SURVEY §7 hard part c): the typed projection
    yields native types (bigint/decimal), NULL images stay NULL, and absent
    declared columns decode to NULL instead of erroring."""
    from cdc_rs_spark.envelope import snapshot_changes, typed_changes
    from cdc_rs_spark.session import load

    orders = load(spark, sf_dir, "orders")
    changes = snapshot_changes(orders, "testdb", "orders", "o_orderkey")
    typed = typed_changes(changes, [
        ("o_orderkey", "bigint"),
        ("o_totalprice", "decimal(18,2)"),
        ("not_there_yet", "string"),
    ])
    assert dict(typed.dtypes)["after"] == (
        "struct<o_orderkey:bigint,o_totalprice:decimal(18,2),not_there_yet:string>"
    )
    r = typed.select("before", "after").first()
    assert r.before is None  # backfill has no before image
    assert isinstance(r.after.o_orderkey, int)
    assert r.after.not_there_yet is None


def test_typed_changes_schema_drift(spark):
    """Schema evolution tolerance of the declared-schema decode path:
    (a) a declared column absent from old rows decodes to NULL, (b) extra
    undeclared wire fields are pruned, (c) rows from before AND after the
    schema change coexist in one typed relation."""
    from cdc_rs_spark.envelope import CHANGE_SCHEMA, typed_changes

    rows = [
        # old-schema row: no 'discount' field yet
        ("Insert", "db", "t", None, {"id": "1", "amount": "10.50"}, 100, "id"),
        # new-schema row: adds 'discount', plus an undeclared 'debug' field
        (
            "Insert", "db", "t", None,
            {"id": "2", "amount": "20.25", "discount": "0.10", "debug": "x"},
            200, "id",
        ),
    ]
    changes = spark.createDataFrame(rows, CHANGE_SCHEMA)
    typed = typed_changes(
        changes,
        [("id", "bigint"), ("amount", "decimal(18,2)"), ("discount", "double")],
    ).collect()
    by_id = {r["after"]["id"]: r["after"] for r in typed}
    assert by_id[1]["discount"] is None  # absent key -> NULL, no error
    assert float(by_id[1]["amount"]) == 10.50
    assert by_id[2]["discount"] == 0.10
    assert "debug" not in by_id[2].asDict()  # undeclared field pruned


def test_rhai_script_matches_builtin_builders(spark, sf_dir):
    """The Rhai-subset compiler (functions/rhai.py) must produce BYTE-equal
    JSON to the hand-written envelope builders for a script that implements
    the same two envelopes — proving user scripts of the reference's shape
    (test.rhai) run declaratively at full parity. Also checks the script
    `topic` interpolation against the template router, and that the
    compiled expressions contain no Python plan nodes."""
    from cdc_rs_spark.envelope import snapshot_changes
    from cdc_rs_spark.functions.rhai import (
        RhaiScript,
        rhai_topic,
        rhai_transform_json,
    )
    from cdc_rs_spark.functions.transforms import (
        bigquery_json,
        debezium_json,
        topic_column,
    )
    from cdc_rs_spark.plans.cdc import RHAI_DEMO_SCRIPT
    from cdc_rs_spark.session import load
    from cdc_rs_spark.sources.synthetic import live_orders_changes

    orders = load(spark, sf_dir, "orders")
    merged = snapshot_changes(orders, "testdb", "orders", "o_orderkey").unionByName(
        live_orders_changes(spark, sf_dir)
    )
    script = RhaiScript(RHAI_DEMO_SCRIPT)
    out = merged.select(
        rhai_transform_json(merged, script).alias("script_flat"),
        bigquery_json(merged).alias("builtin_flat"),
        rhai_transform_json(merged, script, fn="nested").alias("script_nested"),
        debezium_json(merged).alias("builtin_nested"),
        rhai_topic(merged, script).alias("script_topic"),
        topic_column("sink/${db}/changes.${table}").alias("builtin_topic"),
    )
    mismatch = out.filter(
        (F.col("script_flat") != F.col("builtin_flat"))
        | (F.col("script_nested") != F.col("builtin_nested"))
        | (F.col("script_topic") != F.col("builtin_topic"))
    )
    assert mismatch.count() == 0, mismatch.limit(3).collect()
    assert out.count() > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan


def test_rhai_script_language_features(spark):
    """Unit coverage of the compiler's language surface beyond the demo
    script: switch default passthrough, != comparison, nested field writes
    via fn-call copies (Rhai by-value), interpolation with multiple holes."""
    from cdc_rs_spark.functions.rhai import MapVal, RhaiScript, _to_col

    df = spark.createDataFrame(
        [("Weird", "a", "t1"), ("Delete", "b", "t2")], "op string, db string, table string"
    )
    s = RhaiScript(
        """
        fn tag(op) {
            switch op {
                "Delete" => "gone",
                _ => op,
            }
        }
        fn label(db, table, op) {
            let t = tag(op);
            if t != "gone" { `${db}:${table}:${t}` } else { `tomb/${table}` }
        }
        """
    )
    out = df.select(
        _to_col(s.call("label", F.col("db"), F.col("table"), F.col("op"))).alias("x")
    ).collect()
    assert [r["x"] for r in out] == ["a:t1:Weird", "tomb/t2"]


def test_rhai_compiled_equals_interpreted(spark, sf_dir):
    """Two engines, one AST (VERDICT r3 task 6): the compiled column
    expressions for the extended-language script (arrays, for-loop
    unrolling, arithmetic, reassignment, .len(), parse_int) must equal a
    mapInPandas run of RhaiInterpreter over the same script, row for row."""
    import pandas as pd

    from cdc_rs_spark.envelope import snapshot_changes
    from cdc_rs_spark.functions.rhai import RhaiInterpreter, rhai_transform_value
    from cdc_rs_spark.plans.cdc import RHAI_SCORE_SCRIPT
    from cdc_rs_spark.session import load
    from cdc_rs_spark.sources.synthetic import live_orders_changes

    orders = load(spark, sf_dir, "orders")
    merged = snapshot_changes(orders, "testdb", "orders", "o_orderkey").unionByName(
        live_orders_changes(spark, sf_dir)
    )
    f = rhai_transform_value(merged, RHAI_SCORE_SCRIPT, fn="score")
    compiled = merged.select(
        f["okey"].alias("okey"),
        f["bucket"].cast("long").alias("bucket"),
        f["risk"].alias("risk"),
    )

    def run_interp(batches):
        interp = RhaiInterpreter(RHAI_SCORE_SCRIPT)
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                out = interp.call(
                    "score", r.db, r.table, r.op, r.before, r.after, r.ts
                )
                rows.append((out["okey"], out["bucket"], out["risk"]))
            yield pd.DataFrame(rows, columns=["okey", "bucket", "risk"])

    interpreted = merged.mapInPandas(
        run_interp, "okey long, bucket long, risk long"
    )
    got = sorted(map(tuple, compiled.collect()))
    want = sorted(map(tuple, interpreted.collect()))
    assert got == want and len(got) > 0


def test_rhai_extended_language_units(spark):
    """Compiler unit coverage for the round-4 notch: indexing, unary minus,
    comparisons, && ||, constant folding of literal arithmetic, %-sign
    semantics, and the for-loop over an array built from expressions."""
    from cdc_rs_spark.functions.rhai import RhaiInterpreter, RhaiScript, _to_col

    src = """
    fn poly(x) {
        let coeffs = [2, -3, 5];
        let acc = 0;
        let i = 0;
        for c in coeffs {
            acc = acc * x + c;
            i = i + 1;
        }
        if i == coeffs.len() && (x > 0 || x <= -10) {
            acc + coeffs[0] % 2
        } else {
            -acc
        }
    }
    """
    s = RhaiScript(src)
    df = spark.createDataFrame([(4,), (-2,), (-100,)], "x long")
    out = df.select(_to_col(s.call("poly", F.col("x"))).alias("y")).collect()
    interp = RhaiInterpreter(src)
    assert [r["y"] for r in out] == [interp.call("poly", x) for x in (4, -2, -100)]
    # Horner's rule by hand: ((0*4+2)*4-3)*4+5 = 25, +0 (2%2) -> 25
    assert out[0]["y"] == 25


def test_rhai_string_methods_compiled_equals_interpreted(spark):
    """String-method surface (len/to_upper/to_lower/trim/contains/
    starts_with/ends_with): compiled column expressions equal the
    interpreter, including SQL NULL propagation on a missing field."""
    from cdc_rs_spark.functions.rhai import RhaiInterpreter, RhaiScript, _to_col

    src = """
    fn tag(s, t) {
        if s.trim().to_lower().contains("urgent") || t.starts_with("pim.") {
            `HOT:${s.to_upper()}:${s.len()}`
        } else {
            if t.ends_with(".log") { "LOG" } else { t.to_lower() }
        }
    }
    """
    s = RhaiScript(src)
    rows = [
        ("  Urgent-1 ", "pim.products"),
        ("normal", "app.events.log"),
        ("Other", "APP.Users"),
    ]
    df = spark.createDataFrame(rows, "s string, t string")
    compiled = [
        r["x"]
        for r in df.select(
            _to_col(s.call("tag", F.col("s"), F.col("t"))).alias("x")
        ).collect()
    ]
    interp = RhaiInterpreter(src)
    assert compiled == [interp.call("tag", a, b) for a, b in rows]
    assert compiled[0].startswith("HOT:") and compiled[1] == "LOG"


def test_rhai_three_valued_logic_parity(spark):
    """Round-4 review finding: && / || over a NULL operand must follow SQL
    three-valued logic in BOTH engines (FALSE && NULL = FALSE,
    TRUE || NULL = TRUE, else NULL -> falsy in if), and booleans
    interpolate as 'true'/'false' like the SQL cast."""
    from cdc_rs_spark.functions.rhai import (
        MapVal,
        RhaiInterpreter,
        RhaiScript,
        _to_col,
    )

    src = """
    fn probe(m) {
        let g = (m.missing == "x" && m.c == "c") == (m.d == "nope");
        let h = (m.missing == "x" || m.c == "zzz");
        let k = (m.c == "zzz" && m.missing == "x");
        let t = (m.c == "c" || m.missing == "x");
        #{ g: if g { 1 } else { 0 },
           h: `${m.c == m.d}:${t}`,
           k: if k { 1 } else { 0 } }
    }
    """
    df = spark.createDataFrame(
        [({"c": "c", "d": "d"},)], "m map<string,string>"
    )
    s = RhaiScript(src)
    out = df.select(
        _to_col(s.call("probe", MapVal(base=F.col("m")))).alias("o")
    ).collect()[0]["o"]
    interp = RhaiInterpreter(src).call("probe", {"c": "c", "d": "d"})
    # compiled: g = (NULL && TRUE) == FALSE = NULL -> else branch -> 0
    assert out["g"] == 0 and interp["g"] == 0
    # h column: NULL || FALSE = NULL -> the interpolation of t is fine but
    # m.c == m.d is FALSE -> 'false'; t = TRUE || NULL = TRUE -> 'true'
    assert out["h"] == "false:true" and interp["h"] == "false:true"
    # k = FALSE && NULL = FALSE -> 0 in both
    assert out["k"] == 0 and interp["k"] == 0


def test_rhai_concat_builtin_parity(spark):
    from cdc_rs_spark.functions.rhai import RhaiInterpreter, RhaiScript, _to_col

    src = 'fn j(a, b) { concat(a, "-", b.len(), "-", a == b) }'
    df = spark.createDataFrame([("x", "yy")], "a string, b string")
    s = RhaiScript(src)
    got = df.select(
        _to_col(s.call("j", F.col("a"), F.col("b"))).alias("o")
    ).collect()[0]["o"]
    assert got == "x-2-false"
    assert RhaiInterpreter(src).call("j", "x", "yy") == got


def test_rhai_while_and_runtime_ranges_compile(spark):
    """Round 6 (VERDICT r5 task 1): `while` loops and runtime-bound
    `lo..hi` ranges COMPILE. A compile-time condition constant-folds by
    static execution; a runtime one becomes an aggregate() fold over a
    WHILE_COMPILE_CAP sequence with a live-flag; runtime range bounds
    become a guarded sequence() column. Both engines agree row for row,
    and a row that fails to terminate within the cap raises loudly."""
    import pytest

    from cdc_rs_spark.functions.rhai import (
        RhaiInterpreter,
        RhaiScript,
        _to_col,
    )

    src = """
    fn digit_count(n) {
        let d = 1;
        let p = 10;
        while p <= n {
            d = d + 1;
            p = p * 10;
        }
        d
    }
    """
    vals = [0, 7, 91, 4096, 987654]
    expect = [len(str(v)) for v in vals]
    interp = RhaiInterpreter(src)
    assert [interp.call("digit_count", v) for v in vals] == expect
    # compile-time argument: static constant-fold, no columns anywhere
    assert [RhaiScript(src).call("digit_count", v) for v in vals] == expect
    # runtime argument: the while-fold — same values through the JVM
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = {
        r["n"]: r["s"]
        for r in df.select(
            F.col("n"),
            _to_col(RhaiScript(src).call("digit_count", F.col("n"))).alias("s"),
        ).collect()
    }
    assert got == dict(zip(vals, expect))

    # runtime-length range: BOTH engines iterate now
    rng = """
    fn triangle(n) {
        let total = 0;
        for i in 0..n { total = total + i; }
        total
    }
    """
    assert RhaiInterpreter(rng).call("triangle", 10) == 45
    assert RhaiScript(rng).call("triangle", 10) == 45  # static unroll
    got = [
        r["t"]
        for r in df.select(
            _to_col(RhaiScript(rng).call("triangle", F.col("n") % 10)).alias("t")
        ).collect()
    ]
    assert got == [RhaiInterpreter(rng).call("triangle", v % 10) for v in vals]

    # compile-time bounds still unroll in both engines
    fixed = "fn t() { let total = 0; for i in 0..5 { total = total + i; } total }"
    assert RhaiScript(fixed).call("t") == 10
    assert RhaiInterpreter(fixed).call("t") == 10

    # the runaway guards fail loudly instead of wedging an executor task
    from cdc_rs_spark.functions import rhai as rhai_mod

    loop = "fn spin() { let i = 0; while 1 == 1 { i = i + 1; } i }"
    old = rhai_mod.MAX_WHILE_ITERATIONS
    rhai_mod.MAX_WHILE_ITERATIONS = 1000
    try:
        with pytest.raises(RuntimeError, match="exceeded 1000 iterations"):
            RhaiInterpreter(loop).call("spin")
        # the compiled STATIC path hits the same guard
        with pytest.raises(RuntimeError, match="exceeded 1000 iterations"):
            RhaiScript(loop).call("spin")
        # a corrupt row value must not materialize a billion-element list
        with pytest.raises(RuntimeError, match="exceeds 1000 elements"):
            RhaiInterpreter(rng).call("triangle", 10_000_000_000)
        with pytest.raises(RuntimeError, match="exceeds 1000 elements"):
            RhaiScript(rng).call("triangle", 10_000_000_000)
    finally:
        rhai_mod.MAX_WHILE_ITERATIONS = old

    # the compiled WHILE-FOLD cap: a row needing more iterations than
    # WHILE_COMPILE_CAP raises at runtime (never silently truncates)
    old_cap = rhai_mod.WHILE_COMPILE_CAP
    rhai_mod.WHILE_COMPILE_CAP = 4
    try:
        capped = df.select(
            _to_col(RhaiScript(src).call("digit_count", F.col("n"))).alias("s")
        )
        with pytest.raises(Exception, match="WHILE_COMPILE_CAP=4"):
            capped.collect()  # 987654 needs 6 iterations
    finally:
        rhai_mod.WHILE_COMPILE_CAP = old_cap

    # float range bounds error in both engines (never silent truncation)
    with pytest.raises(TypeError, match="range bounds must be integers"):
        RhaiInterpreter(rng).call("triangle", 4.5)
    with pytest.raises(TypeError, match="range bounds must be integers"):
        RhaiScript(rng).call("triangle", 4.5)


def test_rhai_closures_compile_and_match_interpreter(spark):
    """Round 6: closures and the closure-taking array methods
    map/filter/reduce/some/all COMPILE — statically over array literals,
    via transform/filter/aggregate/exists/forall over runtime arrays.
    Capture is by snapshot in both engines; reduce still requires an
    explicit initial value in both."""
    import pytest

    from cdc_rs_spark.functions.rhai import (
        RhaiInterpreter,
        RhaiScript,
        StructVal,
        _to_col,
    )

    src = """
    fn pipeline(xs, floor) {
        let squared = xs.map(|x| x * x);
        let kept = squared.filter(|x| x >= floor);
        let total = kept.reduce(|acc, x| acc + x, 0);
        #{
            "kept": kept.len(),
            "total": total,
            "any_big": kept.some(|x| x > 100),
            "all_pos": kept.all(|x| x > 0),
        }
    }
    fn twice(f, v) { f.call(f.call(v)) }
    fn adder(n) { |x| x + n }
    """
    expected = {"kept": 5, "total": 4 + 9 + 16 + 25 + 144,
                "any_big": True, "all_pos": True}
    interp = RhaiInterpreter(src)
    assert interp.call("pipeline", [1, 2, 3, 4, 5, -12], 4) == expected
    # the COMPILED engine now constant-folds the same literal call
    out = RhaiScript(src).call("pipeline", [1, 2, 3, 4, 5, -12], 4)
    assert isinstance(out, StructVal) and out.fields == expected
    # first-class closures: passed as args and returned (captured n)
    inc = interp.call("adder", 10)
    assert inc(5) == 15
    assert interp.call("twice", inc, 1) == 21
    cinc = RhaiScript(src).call("adder", 10)
    assert cinc(5) == 15
    assert RhaiScript(src).call("twice", cinc, 1) == 21

    # runtime arrays: higher-order functions, row-for-row parity
    hof = """
    fn f(n) {
        let xs = (0..n).map(|x| x * x + 1);
        let kept = xs.filter(|x| x % 2 == 1);
        let r = kept.reduce(|acc, x| acc + x, 0) + kept.len();
        if xs.some(|x| x > 20) && xs.all(|x| x >= 1) { r } else { -r }
    }
    """
    vals = [0, 3, 7, 12]
    df = spark.createDataFrame([(v,) for v in vals], "n long")
    got = [
        r["y"]
        for r in df.select(
            _to_col(RhaiScript(hof).call("f", F.col("n"))).alias("y")
        ).collect()
    ]
    assert got == [RhaiInterpreter(hof).call("f", v) for v in vals]

    # reduce without an explicit initial value: both engines refuse
    with pytest.raises(TypeError, match="reduce\\(closure, initial\\)"):
        RhaiInterpreter("fn f(xs) { xs.reduce(|a, x| a + x) }").call("f", [1, 2])
    with pytest.raises(TypeError, match="reduce\\(closure, initial\\)"):
        RhaiScript("fn f(xs) { xs.reduce(|a, x| a + x) }").call("f", [1, 2])


def test_rhai_compiled_loop_plan_is_pure_column(spark):
    """The VERDICT r5 'done' bar: a script using filter/map closures AND a
    runtime-bound while compiles to a plan with NO Python evaluation node
    — the whole script rides whole-stage codegen / JVM expression eval."""
    from cdc_rs_spark.functions.rhai import RhaiScript, _to_col

    src = """
    fn f(n) {
        let xs = (0..n).map(|x| x * x);
        let odd = xs.filter(|x| x % 2 == 1);
        let s = odd.reduce(|acc, x| acc + x, 0);
        let i = 0;
        while i * i < s {
            i = i + 1;
        }
        i
    }
    """
    df = spark.createDataFrame([(v,) for v in [0, 5, 9]], "n long")
    out = df.select(
        _to_col(RhaiScript(src).call("f", F.col("n"))).alias("isqrt")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("Python", "MapInPandas", "EvalPython", "ArrowEval"):
        assert marker not in plan, f"Python node {marker!r} in plan:\n{plan}"
    # and it computes the right thing: ceil(sqrt(sum of odd squares))
    from cdc_rs_spark.functions.rhai import RhaiInterpreter

    got = [r["isqrt"] for r in out.collect()]
    assert got == [RhaiInterpreter(src).call("f", v) for v in [0, 5, 9]]


def test_rhai_pipeline_interpreter_fallback_is_wired(spark):
    """Round-6 advice (medium): a script that outgrows the compilable
    subset must not dead-end in an error telling the user about an engine
    nothing wires up — apply_transform falls back to RhaiInterpreter under
    mapInPandas automatically and produces (topic, value) rows."""
    import json as _json

    from cdc_rs_spark.envelope import CHANGE_SCHEMA
    from cdc_rs_spark.pipeline import PipelineConfig, apply_transform

    # field write inside a runtime-bound while: compilable-subset edge
    script = """
    fn transform(db, table, op, before, after, ts) {
        let m = after;
        let i = 0;
        while i < ts {
            m.hops = `${i + 1}`;
            i = i + 1;
        }
        m
    }
    fn topic(db, table) { `${db}.${table}` }
    """
    rows = [
        ("Insert", "testdb", "orders", None, {"id": "1"}, 2, "1"),
        ("Insert", "testdb", "orders", None, {"id": "2"}, 3, "2"),
    ]
    changes = spark.createDataFrame(rows, CHANGE_SCHEMA)
    cfg = PipelineConfig(
        source_path="/nonexistent", checkpoint_dir="/nonexistent",
        script=script,
    )
    got = sorted(
        (r["topic"], r["value"])
        for r in apply_transform(changes, cfg, can_carry_malformed=False).collect()
    )
    assert [t for t, _ in got] == ["testdb.orders", "testdb.orders"]
    payloads = [_json.loads(v) for _, v in got]
    assert payloads[0] == {"id": "1", "hops": "2"}
    assert payloads[1] == {"id": "2", "hops": "3"}


def test_rhai_fold_type_mismatch_falls_back_to_interpreter(spark):
    """Round-6 review: an int-initialized accumulator mutated with
    double-producing arithmetic inside a runtime-bound loop compiles to an
    aggregate() whose zero/merge types mismatch — Catalyst raises
    AnalysisException, not TypeError, and the pipeline must STILL fall
    back to the interpreter instead of dying."""
    import json as _json

    from cdc_rs_spark.envelope import CHANGE_SCHEMA
    from cdc_rs_spark.pipeline import PipelineConfig, apply_transform

    script = """
    fn transform(db, table, op, before, after, ts) {
        let acc = 0;
        for i in 0..ts { acc = acc + 0.5; }
        #{ "acc": `${acc}` }
    }
    fn topic(db, table) { `${db}.${table}` }
    """
    changes = spark.createDataFrame(
        [("Insert", "testdb", "orders", None, {"id": "1"}, 3, "1")],
        CHANGE_SCHEMA,
    )
    cfg = PipelineConfig(
        source_path="/nonexistent", checkpoint_dir="/nonexistent",
        script=script,
    )
    rows = apply_transform(changes, cfg, can_carry_malformed=False).collect()
    assert len(rows) == 1
    assert _json.loads(rows[0]["value"]) == {"acc": "1.5"}


def test_rhai_interpreter_pipeline_null_ts_does_not_kill_stream(spark):
    """Round-7 advice: Arrow->pandas converts a nullable long ts to
    float64 with NaN; int(NaN) raised inside mapInPandas and killed the
    stream on the FIRST null-ts row, whereas the compiled engine
    propagates null. The interpreter path must pass None through."""
    import json as _json

    from cdc_rs_spark.functions.rhai import rhai_interpret_pipeline

    script = (
        'fn transform(db, table, op, before, after, ts) '
        '{ #{ "id": after.id } }\n'
        "fn topic(db, table) { `${db}.${table}` }"
    )
    changes = spark.createDataFrame(
        [
            ("Insert", "db", "t", None, {"id": "1"}, None, "1"),
            ("Insert", "db", "t", None, {"id": "2"}, 7, "2"),
        ],
        "op string, db string, table string, before map<string,string>, "
        "after map<string,string>, ts long, pkey string",
    )
    rows = rhai_interpret_pipeline(changes, script).collect()
    assert sorted(_json.loads(r["value"])["id"] for r in rows) == ["1", "2"]


def test_rhai_genuine_analysis_bug_reraises_not_degrades(spark, monkeypatch):
    """Round-7 advice: only the expected DATATYPE_MISMATCH shape (the
    loop-to-fold zero/merge mismatch) may degrade to the interpreter. An
    arbitrary AnalysisException — a genuine plan bug like an unresolved
    column — must re-raise at plan time with Catalyst's message intact,
    not resurface as an opaque executor-side mapInPandas failure."""
    import pytest
    from pyspark.errors import AnalysisException

    import cdc_rs_spark.functions.rhai as rhai_mod
    from cdc_rs_spark.envelope import CHANGE_SCHEMA
    from cdc_rs_spark.pipeline import PipelineConfig, apply_transform

    def unresolved(df, compiled):
        return df.select("no_such_column_zzz")  # real UNRESOLVED_COLUMN

    monkeypatch.setattr(rhai_mod, "rhai_topic", unresolved)
    script = (
        "fn transform(db, table, op, before, after, ts) { after }\n"
        'fn topic(db, table) { "t" }'
    )
    changes = spark.createDataFrame(
        [("Insert", "testdb", "orders", None, {"id": "1"}, 3, "1")],
        CHANGE_SCHEMA,
    )
    cfg = PipelineConfig(
        source_path="/nonexistent", checkpoint_dir="/nonexistent",
        script=script,
    )
    with pytest.raises(AnalysisException):
        apply_transform(changes, cfg, can_carry_malformed=False)


def test_rhai_fallback_increments_observable_counter(spark):
    """Round-7 advice: a WARNING line alone is easy to miss — the silent
    order-of-magnitude engine degradation must also surface as a counter
    operators can poll."""
    import json as _json

    import cdc_rs_spark.pipeline as pipeline_mod
    from cdc_rs_spark.envelope import CHANGE_SCHEMA
    from cdc_rs_spark.pipeline import PipelineConfig, apply_transform

    script = """
    fn transform(db, table, op, before, after, ts) {
        let m = after;
        let i = 0;
        while i < ts { m.hops = `${i + 1}`; i = i + 1; }
        m
    }
    fn topic(db, table) { `${db}.${table}` }
    """
    changes = spark.createDataFrame(
        [("Insert", "testdb", "orders", None, {"id": "1"}, 2, "1")],
        CHANGE_SCHEMA,
    )
    cfg = PipelineConfig(
        source_path="/nonexistent", checkpoint_dir="/nonexistent",
        script=script,
    )
    before = pipeline_mod.INTERPRETER_FALLBACKS
    rows = apply_transform(changes, cfg, can_carry_malformed=False).collect()
    assert pipeline_mod.INTERPRETER_FALLBACKS == before + 1
    assert _json.loads(rows[0]["value"]) == {"id": "1", "hops": "2"}


def test_rhai_compiled_index_out_of_range_raises(spark):
    """Round-7 advice: compiled out-of-range indexing must fail loudly on
    EVERY Spark config — under default non-ANSI, element_at silently
    returns NULL, so the same script diverged between engines. The
    explicit raise_error guard restores the interpreter's IndexError
    contract; in-range (including Rhai's negative -1 = last) still
    computes."""
    import pytest

    from cdc_rs_spark.functions.rhai import (
        RhaiInterpreter,
        RhaiScript,
        _to_col,
    )

    src = "fn f(n) { let a = [10, 20, 30]; a[n] }"

    def run(vals):
        df = spark.createDataFrame([(v,) for v in vals], "n long")
        out = df.select(
            _to_col(RhaiScript(src).call("f", F.col("n"))).alias("v")
        )
        return [r["v"] for r in out.collect()]

    assert run([0, 2, -1]) == [10, 30, 30]
    with pytest.raises(Exception, match="out of range"):
        run([5])
    with pytest.raises(Exception, match="out of range"):
        run([-4])
    with pytest.raises(Exception, match="out of range"):
        run([None])
    # interpreter contract the guard mirrors
    with pytest.raises(IndexError):
        RhaiInterpreter(src).call("f", 5)


def test_rhai_runtime_range_cap_guard_fails_row_loudly(spark):
    """Round-6 review: the compiled runtime `lo..hi` must carry the same
    MAX_WHILE_ITERATIONS element guard as the interpreter — a corrupt row
    value raises instead of materializing a multi-GB per-row array."""
    import pytest

    from cdc_rs_spark.functions import rhai as rhai_mod
    from cdc_rs_spark.functions.rhai import RhaiScript, _to_col

    src = "fn f(n) { let t = 0; for i in 0..n { t = t + 1; } t }"
    old = rhai_mod.MAX_WHILE_ITERATIONS
    rhai_mod.MAX_WHILE_ITERATIONS = 1000
    try:
        df = spark.createDataFrame([(10,), (2_000_000_000,)], "n long")
        out = df.select(
            _to_col(RhaiScript(src).call("f", F.col("n"))).alias("t")
        )
        with pytest.raises(Exception, match="exceeds 1000 elements"):
            out.collect()
        # sane rows still compute once the corrupt one is filtered
        ok = df.filter(F.col("n") < 100).select(
            _to_col(RhaiScript(src).call("f", F.col("n"))).alias("t")
        )
        assert [r["t"] for r in ok.collect()] == [10]
    finally:
        rhai_mod.MAX_WHILE_ITERATIONS = old


def test_rhai_lowered_scripts_chain_without_collision(spark):
    """Round-6 review: rhai_transform_columns must mint UNIQUE intermediate
    column names per call — chaining two lowered scripts over one frame
    must not let the second silently replace the first's materialized
    columns."""
    from cdc_rs_spark.envelope import CHANGE_SCHEMA
    from cdc_rs_spark.functions.rhai import rhai_transform_columns

    s1 = """
    fn transform(db, table, op, before, after, ts) {
        let xs = (0..ts).map(|x| x + 1);
        xs.reduce(|a, x| a + x, 0)
    }
    """
    s2 = """
    fn transform(db, table, op, before, after, ts) {
        let xs = (0..ts).map(|x| x * 10);
        xs.reduce(|a, x| a + x, 0)
    }
    """
    df = spark.createDataFrame(
        [("Insert", "d", "t", None, {"id": "1"}, 3, "1")], CHANGE_SCHEMA
    )
    low1, v1 = rhai_transform_columns(df, s1)
    low2, v2 = rhai_transform_columns(low1, s2)
    row = low2.select(
        F.col(v1._jc.toString()) if False else v1.alias("a"), v2.alias("b")
    ).collect()[0]
    assert row["a"] == 1 + 2 + 3  # first script's value survives
    assert row["b"] == 0 + 10 + 20
