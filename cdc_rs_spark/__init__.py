"""cdc_rs_spark — a PySpark-native analytics engine with the capabilities of
docteurklein/cdc-rs, re-expressed Spark-first.

The reference (`/root/reference/src/main.rs`, 507 LoC Rust) is a MySQL CDC
stream processor: binlog tail + snapshot backfill sources, a keyed
backfill-vs-live reconciliation merge, a regex table filter, scripted per-row
envelope transforms (Debezium / BigQuery-CDC), dynamic topic routing, and a
Pub/Sub sink with durable offsets. Here each of those is a declarative
DataFrame transformation (Catalyst-optimizable), with Structured Streaming
providing the incremental/streaming execution and checkpointed offsets.

Layout:
  envelope    — the Change event schema + snapshot->change-stream construction
  functions/  — value encoding (reference §1.2), text analytics, vector math
  operators/  — filter, merge (live-wins), compaction, dedup, similarity
  sources/    — backfill snapshot source + job queue, file-based CDC stream
  plans/      — relational query inventory over the TPC-H-ish fixtures
  streaming/  — windowed/stateful streaming analytics
"""

__version__ = "0.1.0"
