"""End-to-end pipeline assembly — the equivalent of the reference binary's
main loop (src/main.rs:123-199: tail source -> regex filter -> script
transform -> topic routing -> publish, with durable offset state).

The reference is configured by CLI flags / env (src/main.rs:25-44:
`--state --server-id --regex --source --script --backfill-batch-size`);
`PipelineConfig` is the typed restatement, and `run_pipeline` wires the same
dataflow on Structured Streaming. A user of the reference maps their
invocation directly:

    cdc-rs --source mysql://.. --regex '^testdb\\..*' \\
           --script test.rhai --state state.db
 ->
    run_pipeline(spark, PipelineConfig(
        source_path=...,            # change-feed dir (Kafka in production)
        table_regex=r"^testdb\\..*",
        topic_template="projects/p/topics/all_pims.${table}",
        checkpoint_dir=...,         # replaces --state (SQLite offsets)
        publish=my_publish_fn,      # None = dry-run, like the shipped binary
    ))

The transform defaults to the declarative BigQuery-CDC envelope
(test.rhai:25-36). `script` is the direct `--script` analog: a Rhai-subset
source string whose `transform(db, table, op, before, after, ts)` and
`topic(db, table)` functions replace the built-in envelope and topic
template — compiled ONCE to Column expressions (functions/rhai.py), so the
scripted pipeline runs at the same whole-stage-codegen throughput as the
declarative one (the reference re-enters its scripting VM per row).
Offset durability: the checkpoint WAL commits per micro-batch — the
reference's SQLite `log_pos` table with better transactional guarantees.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from cdc_rs_spark.functions.transforms import bigquery_json, topic_column
from cdc_rs_spark.operators.filter import regex_table_filter
from cdc_rs_spark.sources.sinks import publish_foreach_batch
from cdc_rs_spark.streaming.source import read_change_stream


@dataclass
class PipelineConfig:
    source_path: str                       # --source (file feed; Kafka in prod)
    checkpoint_dir: str                    # --state
    table_regex: str = ".*"                # --regex
    topic_template: str = "cdc.${db}.${table}"  # script's topic() fn
    max_files_per_trigger: int | None = None    # --backfill-batch-size analog
    #   (json_dir source: maxFilesPerTrigger — FILES per micro-batch)
    max_records_per_batch: int | None = None    # change_feed source:
    #   maxRecordsPerBatch — RECORDS per micro-batch. Separate field from
    #   max_files_per_trigger (ADVICE r4): one knob silently changing units
    #   by source format meant a '--backfill-batch-size 100' feed cap of
    #   100 files in one mode and 100 rows in the other
    publish: Callable[[str, list[str]], None] | None = None  # None = dry-run
    source_format: str = "json_dir"        # or "change_feed": the Python
    #   DataSource with binlog-style (file, pos) offsets — the closest
    #   restatement of the reference's tail (streaming/datasource.py)
    script: str | None = None              # --script: Rhai-subset source whose
    #   transform()/topic() fns replace the built-in envelope + template
    #   (compiled to Column expressions — no per-row VM)
    gc_committed: bool = False             # change_feed only: delete fully
    #   committed feed files when planning each batch (PURGE BINARY LOGS
    #   analog for self-managed spools; see streaming/datasource.py)
    dead_letter_topic: str | None = "deadletter"  # permissive-mode
    #   quarantine rows (op='Malformed', empty db/table) would otherwise be
    #   SILENTLY dropped by the regex gate; they route here with their raw
    #   payload instead. None restores the silent-drop behavior.
    schema_change_topic: str | None = "schemachanges"  # binlog DDL markers
    #   (op='SchemaChange', streaming/binlog.py QUERY_EVENT surface): a
    #   mid-stream ALTER for a GATED table routes here with the raw DDL
    #   statement, instead of being mangled through the row envelope as an
    #   UPSERT whose payload is the query text. Consumers use it to evolve
    #   their sinks in step with the source schema. None drops markers.


# Observable degradation signal (round-7 review): operators can poll this
# to tell that a script silently left the compiled Column engine for the
# per-row interpreter — an order-of-magnitude perf cliff that a WARNING
# line alone is easy to miss.
INTERPRETER_FALLBACKS = 0


def _interpreter_fallback(gated: DataFrame, script: str, exc: Exception) -> DataFrame:
    from cdc_rs_spark.functions.rhai import rhai_interpret_pipeline

    import logging

    global INTERPRETER_FALLBACKS
    INTERPRETER_FALLBACKS += 1
    logging.getLogger(__name__).warning(
        "rhai script outgrows the compilable subset; falling back to the "
        "RhaiInterpreter engine (mapInPandas, per-row cost). Cause: %r",
        exc,
    )
    return rhai_interpret_pipeline(gated, script)


def apply_transform(
    changes: DataFrame, cfg: PipelineConfig, *, can_carry_malformed: bool | None = None
) -> DataFrame:
    """regex gate -> envelope transform -> topic column, over ANY change
    frame (the streaming tail or a batch backfill snapshot) — the reference
    pushes both sources through the same script host (src/main.rs:162-188),
    and so does this. Permissive-mode quarantine rows (op='Malformed')
    bypass the gate and the envelope to a dead-letter topic with their raw
    payload — a poison record is INSPECTABLE downstream, never silently
    swallowed by a table regex it can't match."""
    from pyspark.sql import functions as F

    # Route the dead-letter leg whenever the frame CAN carry Malformed rows
    # (ADVICE r4): that's any streaming input AND batch change_feed reads
    # (spark.read.format('change_feed'), mode=permissive, quarantines the
    # same way). Backfill snapshots are built from typed tables and cannot
    # carry them — run_backfill_queue passes False so the extra filter leg
    # doesn't re-scan every snapshot.
    if can_carry_malformed is None:
        can_carry_malformed = (
            changes.isStreaming or cfg.source_format == "change_feed"
        )
    route_dead = cfg.dead_letter_topic is not None and can_carry_malformed
    if route_dead:
        dead = changes.filter(F.col("op") == "Malformed").select(
            F.lit(cfg.dead_letter_topic).alias("topic"),
            F.to_json(
                F.struct(
                    F.element_at("after", "raw").alias("raw"),
                    F.col("ts").alias("ts"),
                )
            ).alias("value"),
        )
        changes = changes.filter(F.col("op") != "Malformed")  # gate sees clean rows
    # DDL markers take their own leg AFTER the regex gate (an ALTER for an
    # ignored table is dropped like its rows) and BEFORE the envelope: a
    # SchemaChange row has no before/after images to envelope — its payload
    # is the statement itself.
    route_ddl = cfg.schema_change_topic is not None and can_carry_malformed
    if route_ddl:
        ddl = regex_table_filter(
            changes.filter(F.col("op") == "SchemaChange"), cfg.table_regex
        ).select(
            F.lit(cfg.schema_change_topic).alias("topic"),
            F.to_json(
                F.struct(
                    F.col("db"),
                    F.col("table"),
                    F.element_at("after", "query").alias("query"),
                    F.col("ts"),
                )
            ).alias("value"),
        )
    if can_carry_malformed:
        # markers leave the row path EITHER WAY (round-5 review): with
        # schema_change_topic=None they are dropped, never pushed through
        # the row envelope as a fake UPSERT whose payload is the statement
        changes = changes.filter(F.col("op") != "SchemaChange")
    gated = regex_table_filter(changes, cfg.table_regex)
    if cfg.script is not None:
        from cdc_rs_spark.functions.rhai import (
            RhaiScript,
            rhai_interpret_pipeline,
            rhai_topic,
            rhai_transform_json,
        )

        from pyspark.errors import AnalysisException

        compiled = RhaiScript(cfg.script)  # parse errors surface eagerly
        try:
            out = gated.select(
                rhai_topic(gated, compiled).alias("topic"),
                rhai_transform_json(gated, compiled).alias("value"),
            )
        except TypeError as exc:
            # A construct the compiler rejects outright: the interpreter
            # engine runs the script fine (round-6 advice: the documented
            # engine must actually be WIRED, not a dead-end error message)
            # — run it per row instead, the same cost model the reference
            # pays for every script.
            out = _interpreter_fallback(gated, cfg.script, exc)
        except AnalysisException as exc:
            # The script compiled but Catalyst refused the plan. Only the
            # EXPECTED fallback shape is downgraded to the interpreter:
            # type mismatches from the loop-to-fold lowering (e.g. an
            # accumulator initialized as int then mutated with double
            # arithmetic mismatches aggregate() zero/merge types —
            # round-6 review). A genuine script bug — a misspelled field
            # Catalyst flags as unresolved — must NOT silently switch the
            # stream to per-row mapInPandas, where the same bug resurfaces
            # as an opaque executor-side failure (round-7 review): re-raise
            # it here, at plan time, with Catalyst's message intact.
            cls = exc.getCondition() or ""
            expected = cls.startswith("DATATYPE_MISMATCH") or (
                not cls and "DATATYPE_MISMATCH" in str(exc)
            )
            if not expected:
                raise
            out = _interpreter_fallback(gated, cfg.script, exc)
    else:
        out = gated.select(
            topic_column(cfg.topic_template).alias("topic"),
            bigquery_json(gated).alias("value"),
        )
    if route_ddl:
        out = out.unionByName(ddl)
    if route_dead:
        out = out.unionByName(dead)
    return out


def build_stream(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """The declarative dataflow: source -> regex gate -> envelope transform ->
    topic column. Returns the unstarted streaming DataFrame (inspectable /
    unit-testable)."""
    if cfg.source_format == "change_feed":
        from cdc_rs_spark.streaming.datasource import register_change_feed

        register_change_feed(spark)
        reader = (
            spark.readStream.format("change_feed")
            .option("path", cfg.source_path)
        )
        if cfg.gc_committed:
            reader = reader.option("gcCommitted", "true")
        if cfg.max_files_per_trigger and not cfg.max_records_per_batch:
            # Pre-round-5 invocations passed this knob as records-per-batch
            # for change_feed; silently ignoring it now would hand an
            # operator with a month of backlog ONE unbounded micro-batch
            # (round-5 review) — fail with the migration instead.
            raise ValueError(
                "change_feed admission control is RECORDS-based: use "
                "max_records_per_batch / --max-records-per-batch "
                "(max_files_per_trigger counts FILES and only applies to "
                "the json_dir source)"
            )
        if cfg.max_records_per_batch:
            reader = reader.option(
                "maxRecordsPerBatch", str(cfg.max_records_per_batch)
            )
        changes = reader.load()
    else:
        if cfg.max_records_per_batch:
            # mirror of the change_feed check above: json_dir admission is
            # FILE-based, and silently dropping the records knob would run
            # an invocation that asked for admission control with none at
            # all (round-6 advice)
            raise ValueError(
                "json_dir admission control is FILES-based: use "
                "max_files_per_trigger / --max-files-per-trigger "
                "(max_records_per_batch counts RECORDS and only applies "
                "to the change_feed source)"
            )
        changes = read_change_stream(
            spark, cfg.source_path, max_files_per_trigger=cfg.max_files_per_trigger
        )
    return apply_transform(changes, cfg)


def run_backfill_queue(
    spark: SparkSession, cfg: PipelineConfig, queue_path: str, data_dir: str
) -> int:
    """Drain the backfill job queue through the SAME transform + publish
    path as the live stream — the reference's second source (its select!
    loop interleaves backfill rows with binlog rows through one script
    host, src/main.rs:162-199). Returns the number of published rows.

    Each job's status commits ONLY after ITS publish pass succeeds (the
    reference commits a job after streaming all its pages,
    src/main.rs:352-366) — a failed snapshot or publish leaves that job
    and everything after it 'todo' for the next poll while completed
    shards stay done. Each shard's transformed frame is persisted so its
    validating count and publish pass share one materialization."""
    from pyspark.storagelevel import StorageLevel

    from cdc_rs_spark.sources.backfill import BackfillQueue, snapshot_table

    if cfg.publish is None:
        # ADVICE r3: draining with no sink configured would consume queue
        # entries while producing NOTHING — refuse instead of silently
        # marking jobs done (the CLI maps --out/--print to cfg.publish)
        raise ValueError(
            "run_backfill_queue: no publish sink configured — draining "
            "would mark jobs done with no output (pass --out or --print)"
        )
    queue = BackfillQueue(queue_path)
    jobs = queue.todo()
    if not jobs:
        return 0
    # PER-JOB commit (round-4 review): each job snapshots, transforms,
    # publishes and flips to 'done' independently, so a crash mid-drain
    # resumes at the failing shard — with plan_ranges shards, a 99%-done
    # table backfill retries one range, not the whole table. The batch id
    # encodes the job index so each shard's dry-run frames are
    # distinguishable and an idempotent sink keys per shard.
    total = 0
    for idx, job in enumerate(jobs):
        df = snapshot_table(spark, data_dir, job)
        frames = apply_transform(
            df, cfg, can_carry_malformed=False
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n = frames.count()  # one validated materialization per shard
            publish_foreach_batch(cfg.publish)(frames, -(idx + 1))
            queue.mark_done(job)
            total += n
        finally:
            frames.unpersist(blocking=False)
    return total


def run_pipeline(spark: SparkSession, cfg: PipelineConfig):
    """Start the pipeline; returns the StreamingQuery (caller owns
    awaitTermination / stop). Continuous trigger semantics are the default;
    tests use availableNow via run_pipeline_once."""
    return (
        build_stream(spark, cfg)
        .writeStream.foreachBatch(publish_foreach_batch(cfg.publish))
        .option("checkpointLocation", cfg.checkpoint_dir)
        .start()
    )


def run_pipeline_once(spark: SparkSession, cfg: PipelineConfig):
    """Drain everything currently available, then stop (availableNow) —
    batch-mode replay of the feed, and the deterministic form for tests."""
    q = (
        build_stream(spark, cfg)
        .writeStream.foreachBatch(publish_foreach_batch(cfg.publish))
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q
