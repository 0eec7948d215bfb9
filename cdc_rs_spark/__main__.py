"""CLI entry point — the direct analog of invoking the reference binary.

The reference is a single binary configured by flags (src/main.rs:25-44:
`--state --server-id --regex --source --script --backfill-batch-size`); this
module gives the engine the same invocation shape on Spark:

    cdc-rs --source mysql://.. --regex '^testdb\\..*' \\
           --script test.rhai --state state.db --backfill-batch-size 500
 ->
    python -m cdc_rs_spark --source /data/feed --regex '^testdb\\..*' \\
           --script test.rhai --state /data/ckpt --backfill-batch-size 500

Flag mapping (one line per reference flag):
  --source   feed directory (file restatement of the binlog tail; Kafka or
             the change_feed DataSource in production — --source-format)
  --state    Spark checkpoint dir (replaces the SQLite log_pos table,
             src/main.rs:137-141, with a transactional WAL)
  --regex    table gate, identical semantics (src/main.rs:171)
  --script   Rhai-subset transform/topic script, compiled to Column
             expressions (functions/rhai.py) — the reference re-enters its
             scripting VM per row (src/main.rs:407-441)
  --backfill-batch-size   json_dir maxFilesPerTrigger admission (FILES)
  --max-records-per-batch change_feed maxRecordsPerBatch admission (RECORDS)
  --server-id  accepted for parity; Spark checkpoints key on the checkpoint
             dir, so it only namespaces the default state path

Publishing: like the shipped reference (publish commented out,
src/main.rs:187), the default is a DRY RUN — frames are written as
(topic, key, value) parquet under --out for inspection; `--print` echoes
them to stdout instead.
"""

from __future__ import annotations

import argparse
import sys


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m cdc_rs_spark",
        description="CDC stream processor (PySpark) — reference-binary CLI shape",
    )
    p.add_argument("--source", required=True, help="change feed directory")
    p.add_argument("--state", required=True, help="checkpoint dir (offset state)")
    p.add_argument("--regex", default=".*", help="db.table gate regex")
    p.add_argument("--script", default=None, help="Rhai-subset script file")
    p.add_argument(
        "--topic-template",
        default="cdc.${db}.${table}",
        help="topic route when no --script supplies topic()",
    )
    p.add_argument(
        "--backfill-batch-size",
        type=int,
        default=None,
        help="json_dir source: max FILES per trigger (admission control)",
    )
    p.add_argument(
        "--max-records-per-batch",
        type=int,
        default=None,
        help="change_feed source: max RECORDS per micro-batch (admission "
        "control; explicit unit, ADVICE r4 — --backfill-batch-size counts "
        "files and only applies to json_dir)",
    )
    p.add_argument("--server-id", type=int, default=1, help="parity flag")
    p.add_argument(
        "--source-format",
        choices=["json_dir", "change_feed"],
        default="json_dir",
    )
    p.add_argument(
        "--out", default=None, help="dry-run publish dir (parquet frames)"
    )
    p.add_argument(
        "--print", dest="echo", action="store_true",
        help="echo published frames to stdout instead of writing parquet",
    )
    p.add_argument(
        "--pubsub", action="store_true",
        help="publish for real over the Pub/Sub REST API "
        "(sources/pubsub.py) — topics must be full resource names; honors "
        "PUBSUB_EMULATOR_HOST, needs credentials against the live service",
    )
    p.add_argument(
        "--gc-committed", action="store_true",
        help="change_feed source: delete fully-committed feed files when "
        "planning each batch (self-managed spools; PURGE BINARY LOGS analog)",
    )
    p.add_argument(
        "--once", action="store_true",
        help="drain the available feed and exit (availableNow trigger)",
    )
    # backfill queue — the reference's second source: users enqueue jobs
    # (README.md:38-40 does it by SQL INSERT into the sqlite table) and the
    # engine drains 'todo' jobs through the same transform + publish path
    p.add_argument(
        "--backfill-queue", default=None,
        help="backfill job-queue file (reference `backfill` table analog)",
    )
    p.add_argument(
        "--data-dir", default=None,
        help="table directory backfill snapshots read from",
    )
    p.add_argument(
        "--enqueue-backfill", default=None, metavar="DB.TABLE:PKEY[:SELECTION]",
        help="append a todo job to --backfill-queue and exit "
        "(the reference's `insert into backfill ...`)",
    )
    p.add_argument(
        "--shards", type=int, default=0, metavar="N",
        help="with --enqueue-backfill and --data-dir: split the table into "
        "N pkey-range jobs (resumable partitioned backfill; the finished "
        "form of the reference's `range` column)",
    )
    p.add_argument(
        "--replicate", default=None, metavar="mysql://user:pw@host:port[/FILE[:POS]]",
        help="drain a live MySQL replication stream (COM_BINLOG_DUMP, "
        "streaming/replication.py) into --source as sorted JSON-lines "
        "spool files, then exit; run the pipeline against the same "
        "--source dir to consume them. --server-id is the replica id; "
        "--once maps to a NON_BLOCK dump (drain available, then stop). "
        "Needs a reachable MySQL endpoint (the protocol itself is fully "
        "tested against an in-process server, tests/test_replication.py)",
    )
    p.add_argument(
        "--retries", type=int, default=0, metavar="N",
        help="with --replicate: reconnect up to N consecutive times on a "
        "transport failure (exponential backoff), resuming from the "
        "sidecar's committed position — or the gtid_executed set with "
        "?gtid=, which survives a failover to a renamed-binlog replica. "
        "-1 = retry forever. 0 (default) = single session",
    )
    return p


def main(argv: list[str] | None = None, spark=None) -> int:
    from cdc_rs_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
        run_pipeline_once,
    )

    args = _parser().parse_args(argv)
    if args.replicate:
        from urllib.parse import unquote, urlparse

        from cdc_rs_spark.streaming.replication import (
            BinlogReplicationClient,
            ReplicationConfig,
            spool_to_feed,
        )

        usage = (
            "--replicate expects mysql://user:pw@host:port[/FILE[:POS]]"
            "[?ssl-mode=required[&ssl-ca=/ca.pem]]"
            "[&gtid=1|&gtid=uuid:1-5,...]"
        )
        try:
            u = urlparse(args.replicate)
            port = u.port  # raises ValueError on a non-numeric port
        except ValueError:
            print(usage, file=sys.stderr)
            return 2
        if u.scheme != "mysql" or not u.hostname:
            print(usage, file=sys.stderr)
            return 2
        filename, pos = "", 4
        if u.path and u.path != "/":
            fspec = u.path.lstrip("/")
            filename, _, p = fspec.partition(":")
            try:
                pos = int(p) if p else 4
            except ValueError:
                print(usage + f" (bad POS {p!r})", file=sys.stderr)
                return 2
        from urllib.parse import parse_qs

        q = parse_qs(u.query)
        # parse_qs already percent-decodes values — a second unquote would
        # double-decode paths containing literal % (round-6 review)
        ssl_mode = q.get("ssl-mode", ["disabled"])[0].strip().lower()
        ssl_ca = q["ssl-ca"][0] if "ssl-ca" in q else None
        # MySQL's VERIFY_CA spelling maps onto required+ca here; accept
        # both hyphen/underscore forms and any case
        if ssl_mode in ("verify-ca", "verify_ca"):
            if not ssl_ca:
                print(usage + " (ssl-mode=verify-ca needs ssl-ca=)",
                      file=sys.stderr)
                return 2
            ssl_mode = "required"
        if ssl_mode not in ("disabled", "required"):
            print(usage + f" (bad ssl-mode {ssl_mode!r})", file=sys.stderr)
            return 2
        if ssl_ca and ssl_mode == "disabled":
            # a CA with no mode must never silently fall back to
            # PLAINTEXT auth (round-6 review) — imply encryption
            ssl_mode = "required"
        # gtid=1 turns on auto-positioning (resume by the sidecar's
        # gtid_executed set — survives a source failover); gtid=<set>
        # additionally pins the STARTING set explicitly
        gtid_raw = q.get("gtid", [""])[0].strip()
        gtid_mode = bool(gtid_raw)
        gtid_set = "" if gtid_raw in ("1", "true", "on") else gtid_raw
        if gtid_set:
            # validate at the CLI boundary like every other param — a
            # typo'd set must print usage + exit 2, not traceback
            # (round-7 review #4)
            from cdc_rs_spark.streaming.replication import (
                GtidSet,
                ProtocolError,
            )

            try:
                GtidSet.from_text(gtid_set)
            except (ProtocolError, ValueError):
                print(
                    usage + f" (bad gtid value {gtid_raw!r}: use gtid=1 "
                    "or gtid=<uuid:ranges set>)",
                    file=sys.stderr,
                )
                return 2
        if gtid_mode and filename:
            print(
                usage + " (gtid auto-positioning and FILE[:POS] are "
                "mutually exclusive)",
                file=sys.stderr,
            )
            return 2
        rep_cfg = ReplicationConfig(
            host=u.hostname,
            port=port or 3306,
            # urlparse leaves %xx escapes literal, so credentials
            # containing '@' ':' '/' '%' must be percent-encoded in the
            # URL and decoded here (round-6 advice)
            user=unquote(u.username) if u.username else "repl",
            password=unquote(u.password) if u.password else "",
            server_id=args.server_id,
            filename=filename,
            pos=pos,
            non_block=args.once,
            # mysql://u:p@h:3306/FILE?ssl-mode=required&ssl-ca=/ca.pem
            ssl_mode=ssl_mode,
            ssl_ca=ssl_ca,
            gtid_mode=gtid_mode,
            gtid_set=gtid_set,
        )
        if args.retries:
            from cdc_rs_spark.streaming.replication import spool_with_retry

            n = spool_with_retry(
                rep_cfg, args.source,
                retries=None if args.retries < 0 else args.retries,
            )
            at = "sidecar state"
        else:
            client = BinlogReplicationClient(rep_cfg)
            client.connect()
            n = spool_to_feed(client, args.source)
            at = (
                f"gtid {client.state.gtid_executed}"
                if gtid_mode
                else f"{client.state.filename}:{client.state.pos}"
            )
        print(f"spooled {n} changes to {args.source} (at {at})")
        return 0
    if args.shards and not args.enqueue_backfill:
        print("--shards requires --enqueue-backfill", file=sys.stderr)
        return 2
    if args.shards < 0:
        print("--shards must be positive", file=sys.stderr)
        return 2
    if args.enqueue_backfill:
        from cdc_rs_spark.sources.backfill import BackfillJob, BackfillQueue

        if not args.backfill_queue:
            print("--enqueue-backfill requires --backfill-queue", file=sys.stderr)
            return 2
        try:
            db, rest = args.enqueue_backfill.split(".", 1)
            parts = rest.split(":")
            table, pk = parts[0], parts[1]
            if not (db and table and pk):
                raise ValueError(args.enqueue_backfill)
        except (ValueError, IndexError):
            print(
                "--enqueue-backfill expects DB.TABLE:PKEY[:SELECTION], got "
                f"{args.enqueue_backfill!r}",
                file=sys.stderr,
            )
            return 2
        selection = parts[2] if len(parts) > 2 else "*"
        if args.shards:  # N=1 still yields one RANGED job via plan_ranges
            if not args.data_dir:
                print("--shards requires --data-dir", file=sys.stderr)
                return 2
            from cdc_rs_spark.session import get_spark
            from cdc_rs_spark.sources.backfill import plan_ranges

            sp = spark or get_spark("cdc-rs-spark-enqueue")
            try:
                jobs = plan_ranges(
                    sp, args.data_dir, db, table, pk, args.shards,
                    selection=selection,
                )
            except ValueError as e:
                print(str(e), file=sys.stderr)
                return 2
            BackfillQueue(args.backfill_queue).enqueue(jobs)
            print(
                f"enqueued {len(jobs)} range shards for {db}.{table} "
                f"(pkey={pk}): "
                + ", ".join(j.range for j in jobs)
            )
            return 0
        BackfillQueue(args.backfill_queue).enqueue(
            [BackfillJob(db=db, relation=table, pkey=pk, selection=selection)]
        )
        print(f"enqueued backfill job {db}.{table} (pkey={pk}, selection={selection})")
        return 0
    if spark is None:
        from cdc_rs_spark.session import get_spark

        spark = get_spark(f"cdc-rs-spark-{args.server_id}")

    # publish callbacks execute on the EXECUTORS (sinks.publish_foreach_batch
    # repartitions by topic and publishes per partition) — no SparkSession
    # there, so the dry-run writer uses pyarrow directly.
    publish = None
    if args.pubsub:
        # real Pub/Sub REST publishing (sources/pubsub.py): topic column
        # values must be full resource names (the stock template
        # 'projects/<p>/topics/<t>' form). Honors PUBSUB_EMULATOR_HOST;
        # against the live service wire a token provider here.
        from cdc_rs_spark.sources.pubsub import make_pubsub_publish

        publish = make_pubsub_publish()
    elif args.echo:
        def publish(topic: str, values: list[str]) -> None:
            for v in values:
                sys.stdout.write(f"{topic}\t{v}\n")
    elif args.out:
        out_dir = args.out

        def publish(topic: str, values: list[str]) -> None:
            import os
            import uuid

            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(out_dir, exist_ok=True)
            table = pa.table(
                {"topic": [topic] * len(values), "value": values}
            )
            pq.write_table(
                table, os.path.join(out_dir, f"part-{uuid.uuid4().hex}.parquet")
            )

    script_src = open(args.script).read() if args.script else None
    cfg = PipelineConfig(
        source_path=args.source,
        checkpoint_dir=args.state,
        table_regex=args.regex,
        topic_template=args.topic_template,
        max_files_per_trigger=args.backfill_batch_size,
        max_records_per_batch=args.max_records_per_batch,
        publish=publish,
        source_format=args.source_format,
        script=script_src,
        gc_committed=args.gc_committed,
    )
    if args.backfill_queue:
        # ADVICE r3: --backfill-queue without --data-dir used to skip the
        # drain silently — make the missing source an explicit error
        if not args.data_dir:
            print("--backfill-queue requires --data-dir", file=sys.stderr)
            return 2
        if publish is None:
            print(
                "--backfill-queue requires a sink (--out or --print): "
                "draining would consume jobs with no output",
                file=sys.stderr,
            )
            return 2
        from cdc_rs_spark.pipeline import run_backfill_queue

        n = run_backfill_queue(spark, cfg, args.backfill_queue, args.data_dir)
        print(f"backfill published {n} rows")
    if args.once:
        run_pipeline_once(spark, cfg)
        return 0
    q = run_pipeline(spark, cfg)
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
