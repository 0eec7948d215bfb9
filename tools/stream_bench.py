"""Streaming-path throughput: generate an N-change feed (JSON lines and/or
binary binlog), drain it through the FULL pipeline (source -> regex gate ->
envelope transform -> topic routing -> executor-side publish) with one
availableNow pass, and report rows/s. This is the number comparable to the
reference's single-node loop (one Rhai VM call per row); the batch queries
in bench.py don't exercise the streaming path.

Usage: python tools/stream_bench.py [n_changes] [json|binlog|both]
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_json_feed(path: str, n: int, files: int = 8) -> None:
    os.makedirs(path, exist_ok=True)
    per = n // files
    k = 0
    for f_i in range(files):
        with open(os.path.join(path, f"feed.{f_i:06d}.json"), "w") as f:
            for _ in range(per):
                op = ("Insert", "Update", "Delete")[k % 3]
                row = {"id": k, "v": f"val{k}", "amount": str(k % 997)}
                rec = {
                    "op": op,
                    "db": "testdb",
                    "table": "orders" if k % 2 else "items",
                    "before": row if op != "Insert" else None,
                    "after": row if op != "Delete" else None,
                    "ts": 1000 + k,
                    "pkey": "id",
                }
                f.write(json.dumps(rec) + "\n")
                k += 1


def gen_binlog_feed(path: str, n: int, files: int = 8) -> None:
    """Binary binlog files with 3-column rows via the same layout the
    decoder tests use (v4 headers, TABLE_MAP with names, WRITE_ROWS v2)."""
    os.makedirs(path, exist_ok=True)

    def ev(ts, etype, body):
        return struct.pack("<IBIIIH", ts, etype, 1, 19 + len(body), 0, 0) + body

    def lenenc(x):
        return bytes([x])

    fde = struct.pack("<H", 4) + b"8.0".ljust(50, b"\x00") + struct.pack("<I", 0)
    fde += bytes([19]) + bytes(39) + bytes([0])
    tme_body = (7).to_bytes(6, "little") + b"\x01\x00"
    tme_body += bytes([6]) + b"testdb\x00" + bytes([6]) + b"orders\x00"
    tme_body += lenenc(3) + bytes([3, 15, 5])  # LONG, VARCHAR, DOUBLE
    meta = struct.pack("<H", 64) + bytes([8])
    tme_body += lenenc(len(meta)) + meta + bytes([0])
    names = b"".join(lenenc(len(c)) + c for c in (b"id", b"v", b"amount"))
    tme_body += bytes([4]) + lenenc(len(names)) + names
    per = n // files
    k = 0
    for f_i in range(files):
        chunks = [b"\xfebin", ev(1000, 0x0F, fde), ev(1001, 0x13, tme_body)]
        rows_per_event = 512
        i = 0
        while i < per:
            m = min(rows_per_event, per - i)
            body = (7).to_bytes(6, "little") + b"\x01\x00"
            body += struct.pack("<H", 2) + lenenc(3) + bytes([0b111])
            imgs = []
            for _ in range(m):
                v = f"val{k}".encode()
                imgs.append(
                    bytes([0])
                    + struct.pack("<i", k)
                    + bytes([len(v)])
                    + v
                    + struct.pack("<d", float(k % 997))
                )
                k += 1
            chunks.append(ev(1002, 0x1E, body + b"".join(imgs)))
            i += m
        with open(os.path.join(path, f"bin.{f_i:06d}.binlog"), "wb") as f:
            f.write(b"".join(chunks))


def drain(spark, src: str, workdir: str) -> tuple[float, int]:
    from cdc_rs_spark.pipeline import PipelineConfig, run_pipeline_once

    counts_dir = os.path.join(workdir, "counts")

    def publish(topic: str, values: list[str]) -> None:
        import uuid

        os.makedirs(counts_dir, exist_ok=True)
        with open(os.path.join(counts_dir, uuid.uuid4().hex), "w") as f:
            f.write(str(len(values)))

    cfg = PipelineConfig(
        source_path=src,
        checkpoint_dir=os.path.join(workdir, "ckpt"),
        publish=publish,
        source_format="change_feed",  # the binlog-tail-analog DataSource
    )
    t0 = time.time()
    run_pipeline_once(spark, cfg)
    dt = time.time() - t0
    total = sum(int(open(os.path.join(counts_dir, f)).read()) for f in os.listdir(counts_dir))
    return dt, total


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "both"
    from cdc_rs_spark.session import get_spark

    spark = get_spark("stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    root = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        if mode in ("json", "both"):
            src = os.path.join(root, "json_feed")
            gen_json_feed(src, n)
            dt, total = drain(spark, src, os.path.join(root, "w_json"))
            out["json"] = {"rows": total, "sec": round(dt, 2),
                           "rows_per_sec": int(total / dt)}
        if mode in ("binlog", "both"):
            src = os.path.join(root, "binlog_feed")
            gen_binlog_feed(src, n)
            dt, total = drain(spark, src, os.path.join(root, "w_binlog"))
            out["binlog"] = {"rows": total, "sec": round(dt, 2),
                             "rows_per_sec": int(total / dt)}
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
