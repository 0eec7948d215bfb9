"""Binary binlog decode parity (streaming/binlog.py): hand-packed v4
binlog files — FDE, TABLE_MAP with MySQL-8 column-name metadata,
WRITE/UPDATE/DELETE_ROWS v2, null bitmaps, CRC32 trailers — must decode
into the same Change envelope the JSON feed produces, with the
reference's stringification (ints/floats/DATE/invalid-UTF8→hex), both
directly and through the change_feed DataSource."""

from __future__ import annotations

import struct
import zlib

from cdc_rs_spark.streaming.binlog import (
    DELETE_ROWS_EVENT_V2,
    FORMAT_DESCRIPTION_EVENT,
    MAGIC,
    TABLE_MAP_EVENT,
    UPDATE_ROWS_EVENT_V2,
    WRITE_ROWS_EVENT_V2,
    parse_binlog_bytes,
)

T_LONG, T_DOUBLE, T_DATE, T_VARCHAR = 3, 5, 10, 15


def _event(ts: int, etype: int, body: bytes, crc: bool) -> bytes:
    size = 19 + len(body) + (4 if crc else 0)
    # header: timestamp u32, type u8, server_id u32, event_size u32,
    # log_pos u32, flags u16
    hdr = struct.pack("<IBIIIH", ts, etype, 1, size, 0, 0)
    ev = hdr + body
    if crc:
        ev += struct.pack("<I", zlib.crc32(ev))
    return ev


def _fde(crc: bool) -> bytes:
    body = struct.pack("<H", 4)
    body += b"8.0.30".ljust(50, b"\x00")
    body += struct.pack("<I", 0)
    body += bytes([19])
    body += bytes(39)  # post-header length table (content irrelevant here)
    body += bytes([1 if crc else 0])  # checksum algorithm
    return _event(1000, FORMAT_DESCRIPTION_EVENT, body, crc)


def _lenenc(n: int) -> bytes:
    assert n < 251
    return bytes([n])


def _table_map(table_id: int, crc: bool) -> bytes:
    body = table_id.to_bytes(6, "little") + b"\x01\x00"
    body += bytes([6]) + b"testdb" + b"\x00"
    body += bytes([6]) + b"orders" + b"\x00"
    body += _lenenc(4)
    body += bytes([T_LONG, T_VARCHAR, T_DOUBLE, T_DATE])
    meta = struct.pack("<H", 255) + bytes([8])  # varchar max-len, double sz
    body += _lenenc(len(meta)) + meta
    body += bytes([0b0010])  # declared nullability (name)
    names = b"".join(_lenenc(len(n)) + n for n in (b"id", b"name", b"price", b"created"))
    body += bytes([4]) + _lenenc(len(names)) + names  # COLUMN_NAME TLV
    body += bytes([1]) + _lenenc(1) + bytes([0b0001])  # SIGNEDNESS TLV
    return _event(1001, TABLE_MAP_EVENT, body, crc)


def _date(y: int, m: int, d: int) -> bytes:
    return (d | (m << 5) | (y << 9)).to_bytes(3, "little")


def _row(id_v: int, name: bytes | None, price: float, ymd) -> bytes:
    null = 0
    out = b""
    out += struct.pack("<i", id_v)
    if name is None:
        null |= 0b0010
    else:
        out = out + bytes([len(name)]) + name
    out += struct.pack("<d", price)
    out += _date(*ymd)
    return bytes([null]) + out


def _rows_event(etype: int, table_id: int, images: list[bytes], crc: bool, ts=1002) -> bytes:
    body = table_id.to_bytes(6, "little") + b"\x01\x00"
    body += struct.pack("<H", 2)  # extra-data length (just itself)
    body += _lenenc(4)
    body += bytes([0b1111])  # columns-present
    if etype == UPDATE_ROWS_EVENT_V2:
        body += bytes([0b1111])
    body += b"".join(images)
    return _event(ts, etype, body, crc)


def _feed(crc: bool) -> bytes:
    tid = 99
    return (
        MAGIC
        + _fde(crc)
        + _table_map(tid, crc)
        + _rows_event(
            WRITE_ROWS_EVENT_V2,
            tid,
            [
                _row(7, b"alpha", 12.5, (2024, 3, 9)),
                _row(8, None, -0.25, (1999, 12, 31)),
                _row(9, b"\xff\xfe", 3.0, (2024, 1, 1)),
            ],
            crc,
        )
        + _rows_event(
            UPDATE_ROWS_EVENT_V2,
            tid,
            [
                _row(7, b"alpha", 12.5, (2024, 3, 9)),
                _row(7, b"beta", 99.0, (2024, 3, 9)),
            ],
            crc,
            ts=1003,
        )
        + _rows_event(
            DELETE_ROWS_EVENT_V2,
            tid,
            [_row(8, None, -0.25, (1999, 12, 31))],
            crc,
            ts=1004,
        )
    )


def _check_changes(changes: list[dict]):
    assert [c["op"] for c in changes] == [
        "Insert", "Insert", "Insert", "Update", "Delete",
    ]
    assert all(c["db"] == "testdb" and c["table"] == "orders" for c in changes)
    first = changes[0]["after"]
    assert first == {
        "id": "7",
        "name": "alpha",
        "price": "12.5",
        "created": "2024-03-09",
    }
    assert changes[0]["before"] is None and changes[0]["ts"] == 1002
    assert changes[1]["after"]["name"] is None  # null bitmap
    assert changes[1]["after"]["price"] == "-0.25"
    assert changes[2]["after"]["name"] == "FFFE"  # invalid UTF-8 -> hex
    upd = changes[3]
    assert upd["before"]["name"] == "alpha" and upd["after"]["name"] == "beta"
    assert upd["after"]["price"] == "99.0" and upd["ts"] == 1003
    dele = changes[4]
    assert dele["after"] is None and dele["before"]["id"] == "8"


def test_parse_binlog_bytes_plain():
    _check_changes(list(parse_binlog_bytes(_feed(crc=False))))


def test_parse_binlog_bytes_with_crc32_trailers():
    _check_changes(list(parse_binlog_bytes(_feed(crc=True))))


def test_change_feed_datasource_reads_binlog_and_json_mixed(spark, tmp_path):
    """A directory mixing binary binlog files and JSON-lines files streams
    through one source: extension dispatch, same envelope, offsets count
    decoded ROWS records."""
    import json
    import os

    from cdc_rs_spark.streaming.datasource import register_change_feed

    register_change_feed(spark)
    src = tmp_path / "feed"
    os.makedirs(src)
    (src / "bin.000001.binlog").write_bytes(_feed(crc=True))
    with open(src / "bin.000002.json", "w") as f:
        f.write(
            json.dumps(
                {
                    "op": "Insert",
                    "db": "testdb",
                    "table": "orders",
                    "after": {"id": 10, "name": "json", "price": 1.5},
                    "ts": 2000,
                }
            )
            + "\n"
        )
    df = spark.read.format("change_feed").option("path", str(src)).load()
    rows = sorted(df.collect(), key=lambda r: (r["ts"], r["op"]))
    assert len(rows) == 6
    assert rows[0]["after"]["created"] == "2024-03-09"
    assert rows[-1]["after"]["name"] == "json"
    # streaming form sees the same six records once
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("change_feed")
        .option("path", str(src))
        .load()
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out).count() == 6


def test_char_column_metadata_and_row_decode():
    """MYSQL_TYPE_STRING (CHAR) metadata is a big-endian (real_type, length)
    pair — always >= 256 — while the ROW length prefix follows the REAL
    declared length: 1 byte for CHAR(10). A decoder comparing the raw meta
    against 256 misreads every CHAR row (round-4 review finding)."""
    tid = 7
    body = tid.to_bytes(6, "little") + b"\x01\x00"
    body += bytes([2]) + b"db" + b"\x00"
    body += bytes([1]) + b"t" + b"\x00"
    body += _lenenc(2)
    body += bytes([3, 254])  # LONG, STRING(CHAR)
    meta = bytes([254, 10])  # (real_type=STRING, length=10), big-endian pair
    body += _lenenc(len(meta)) + meta
    body += bytes([0])
    names = b"".join(_lenenc(len(n)) + n for n in (b"k", b"c"))
    body += bytes([4]) + _lenenc(len(names)) + names
    tme = _event(1001, TABLE_MAP_EVENT, body, crc=False)

    row = bytes([0]) + struct.pack("<i", 5) + bytes([3]) + b"abc"
    rbody = tid.to_bytes(6, "little") + b"\x01\x00"
    rbody += struct.pack("<H", 2)
    rbody += _lenenc(2) + bytes([0b11])
    rbody += row
    ev = _event(1002, WRITE_ROWS_EVENT_V2, rbody, crc=False)

    changes = list(parse_binlog_bytes(MAGIC + _fde(False) + tme + ev))
    assert len(changes) == 1
    assert changes[0]["after"] == {"k": "5", "c": "abc"}


def test_incomplete_trailing_event_waits_instead_of_quarantining(spark, tmp_path):
    """Round-4 review: a half-appended trailing event (writer mid-flush)
    must be treated as NOT YET WRITTEN — neither counted nor quarantined —
    so the record is consumed exactly once after the writer completes it.
    Committing it as Malformed would skip the real record forever."""
    import os

    from cdc_rs_spark.streaming.datasource import (
        _count_records,
        register_change_feed,
    )

    full = _feed(crc=False)
    # cut the final DELETE event in half
    delete_ev = _rows_event(
        DELETE_ROWS_EVENT_V2, 99, [_row(8, None, -0.25, (1999, 12, 31))],
        False, ts=1004,
    )
    truncated = full[: len(full) - len(delete_ev) // 2 - 1]
    src = tmp_path / "feed"
    os.makedirs(src)
    fp = str(src / "bin.000001.binlog")
    with open(fp, "wb") as f:
        f.write(truncated)
    # 4 complete records visible; the partial 5th neither counts nor errors
    assert _count_records(fp, permissive=True) == 4
    assert _count_records(fp, permissive=False) == 4
    assert len(list(parse_binlog_bytes(truncated))) == 4

    register_change_feed(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("change_feed")
            .option("path", str(src))
            .option("mode", "permissive")
            .load()
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    got1 = spark.read.parquet(out)
    assert got1.count() == 4 and "Malformed" not in {r["op"] for r in got1.collect()}
    # writer completes the event; a later poll delivers it exactly once
    with open(fp, "wb") as f:
        f.write(full)
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 5
    assert sum(1 for r in rows if r["op"] == "Delete") == 1


def test_temporal_and_decimal_wire_decoding():
    """DATETIME2/TIMESTAMP2/TIME2/NEWDECIMAL row images decoded from
    hand-computed wire bytes with the reference's stringification."""
    from cdc_rs_spark.streaming.binlog import (
        _decode_datetime2,
        _decode_newdecimal,
        _decode_time2,
        _decode_timestamp2,
    )

    # DATETIME2 2024-03-09 14:30:45 (fsp=0): 5-byte BE packed
    ym = 2024 * 13 + 3
    packed = (1 << 39) | (ym << 22) | (9 << 17) | (14 << 12) | (30 << 6) | 45
    s, i = _decode_datetime2(packed.to_bytes(5, "big"), 0, 0)
    assert (s, i) == ("2024-03-09 14:30:45", 5)
    # fsp=3: frac .123 stored as 1230 in 2 BE bytes -> micros 123000
    buf = packed.to_bytes(5, "big") + (1230).to_bytes(2, "big")
    s, i = _decode_datetime2(buf, 0, 3)
    assert (s, i) == ("2024-03-09 14:30:45.123000", 7)
    # fsp>0 with ZERO micros: reference's Value::Date(..., 0) arm prints no
    # fraction; and a midnight datetime with zero micros prints DATE-ONLY
    # (Value::Date(y,m,d,0,0,0,0) arm, src/main.rs:458) — ADVICE r4 parity
    buf = packed.to_bytes(5, "big") + (0).to_bytes(2, "big")
    assert _decode_datetime2(buf, 0, 3)[0] == "2024-03-09 14:30:45"
    mid = (1 << 39) | (ym << 22) | (9 << 17)
    assert _decode_datetime2(mid.to_bytes(5, "big"), 0, 0)[0] == "2024-03-09"
    buf = mid.to_bytes(5, "big") + (0).to_bytes(2, "big")
    assert _decode_datetime2(buf, 0, 3)[0] == "2024-03-09"

    # TIMESTAMP2: epoch 1609556645 = 2021-01-02 03:04:05 UTC, fsp=6
    buf = (1609556645).to_bytes(4, "big") + (123456).to_bytes(3, "big")
    s, i = _decode_timestamp2(buf, 0, 6)
    assert (s, i) == ("2021-01-02 03:04:05.123456", 7)

    # TIME2 +12:34:56 and -00:00:01 (fsp=0) — hours pad to THREE digits
    # like the reference's "{:03}" Time arms (src/main.rs:466-491)
    pos = (1 << 23) | (12 << 12) | (34 << 6) | 56
    assert _decode_time2(pos.to_bytes(3, "big"), 0, 0)[0] == "012:34:56"
    neg = (1 << 24) - ((1 << 23) | 1)
    assert _decode_time2(neg.to_bytes(3, "big"), 0, 0)[0] == "-000:00:01"
    # fsp > 0 but micros == 0: the reference prints NO fraction
    # (Value::Time(_,_,_,_,_, 0) arm) — and neither do we
    buf6 = pos.to_bytes(3, "big") + (0).to_bytes(3, "big")
    assert _decode_time2(buf6, 0, 6)[0] == "012:34:56"
    buf6 = pos.to_bytes(3, "big") + (123456).to_bytes(3, "big")
    assert _decode_time2(buf6, 0, 6)[0] == "012:34:56.123456"

    # NEWDECIMAL(10,2): 1234567.89 -> [80 12 D6 87 59]; negative inverts
    raw = bytes([0x80, 0x12, 0xD6, 0x87, 0x59])
    assert _decode_newdecimal(raw, 0, 10, 2) == ("1234567.89", 5)
    negd = bytes((~b) & 0xFF for b in raw)
    assert _decode_newdecimal(negd, 0, 10, 2) == ("-1234567.89", 5)
    # multi-group precision 20, scale 9: 12345678901.234567891
    # intg=11 -> group(2 digits,1B)+group(9,4B); frac=9 -> one 4B group
    intg_rest, intg_full9 = 12, 345678901
    frac9 = 234567891
    body = bytes([0x80 | 0x00, intg_rest]) + b""
    body = bytearray(
        (intg_rest).to_bytes(1, "big")
        + (intg_full9).to_bytes(4, "big")
        + (frac9).to_bytes(4, "big")
    )
    body[0] |= 0x80
    assert _decode_newdecimal(bytes(body), 0, 20, 9) == (
        "12345678901.234567891",
        9,
    )


def test_rows_with_datetime2_and_decimal_columns():
    """End-to-end through TABLE_MAP + WRITE_ROWS with the new types."""
    tid = 11
    body = tid.to_bytes(6, "little") + b"\x01\x00"
    body += bytes([2]) + b"db" + b"\x00"
    body += bytes([1]) + b"t" + b"\x00"
    body += _lenenc(3)
    body += bytes([3, 18, 246])  # LONG, DATETIME2, NEWDECIMAL
    meta = bytes([0]) + bytes([10, 2])  # fsp=0; (precision=10, scale=2)
    body += _lenenc(len(meta)) + meta
    body += bytes([0])
    names = b"".join(_lenenc(len(n)) + n for n in (b"k", b"dt", b"amt"))
    body += bytes([4]) + _lenenc(len(names)) + names
    tme = _event(1001, TABLE_MAP_EVENT, body, crc=False)

    ym = 2025 * 13 + 12
    packed = (1 << 39) | (ym << 22) | (31 << 17) | (23 << 12) | (59 << 6) | 58
    row = (
        bytes([0])
        + struct.pack("<i", 42)
        + packed.to_bytes(5, "big")
        + bytes([0x80, 0x12, 0xD6, 0x87, 0x59])
    )
    rbody = tid.to_bytes(6, "little") + b"\x01\x00"
    rbody += struct.pack("<H", 2) + _lenenc(3) + bytes([0b111]) + row
    ev = _event(1002, WRITE_ROWS_EVENT_V2, rbody, crc=False)
    changes = list(parse_binlog_bytes(MAGIC + _fde(False) + tme + ev))
    assert changes[0]["after"] == {
        "k": "42",
        "dt": "2025-12-31 23:59:58",
        "amt": "1234567.89",
    }


def _query_event(schema: bytes, query: bytes, ts=1005, crc=False) -> bytes:
    # thread_id(4) exec_time(4) schema_len(1) error_code(2)
    # status_vars_len(2) status_vars schema NUL query
    body = struct.pack("<IIBHH", 1, 0, len(schema), 0, 0)
    body += schema + b"\x00" + query
    from cdc_rs_spark.streaming.binlog import QUERY_EVENT

    return _event(ts, QUERY_EVENT, body, crc)


def test_ddl_query_event_emits_schema_change_marker(spark, tmp_path):
    """VERDICT r4 task 4: a binlog interleaving DDL (QUERY_EVENT) with row
    events must surface the ALTER as a SchemaChange marker row — db/table
    parsed from the statement — and KEEP DECODING the rows after it.
    BEGIN/COMMIT QUERY_EVENTs (transaction bookkeeping) stay silent."""
    import os

    tid = 99
    data = (
        MAGIC
        + _fde(False)
        + _query_event(b"testdb", b"BEGIN")
        + _table_map(tid, False)
        + _rows_event(
            WRITE_ROWS_EVENT_V2, tid, [_row(1, b"a", 1.0, (2024, 1, 1))], False
        )
        + _query_event(
            b"testdb", b"ALTER TABLE `testdb`.`orders` ADD COLUMN note TEXT",
            ts=1006,
        )
        + _rows_event(
            WRITE_ROWS_EVENT_V2, tid, [_row(2, b"b", 2.0, (2024, 1, 2))],
            False, ts=1007,
        )
    )
    changes = list(parse_binlog_bytes(data))
    assert [c["op"] for c in changes] == ["Insert", "SchemaChange", "Insert"]
    marker = changes[1]
    assert marker["db"] == "testdb" and marker["table"] == "orders"
    assert marker["after"]["query"].startswith("ALTER TABLE")
    # un-prefixed CREATE parses the bare table name; non-DDL stays silent
    only = list(
        parse_binlog_bytes(
            MAGIC
            + _fde(False)
            + _query_event(b"d", b"CREATE TABLE IF NOT EXISTS t2 (id INT)")
            + _query_event(b"d", b"GRANT SELECT ON *.* TO x")
        )
    )
    assert len(only) == 1 and only[0]["table"] == "t2" and only[0]["db"] == "d"

    # the marker flows through the streaming source with the row events
    from cdc_rs_spark.streaming.datasource import register_change_feed

    register_change_feed(spark)
    src = tmp_path / "feed"
    os.makedirs(src)
    (src / "bin.000001.binlog").write_bytes(data)
    df = spark.read.format("change_feed").option("path", str(src)).load()
    ops = [r["op"] for r in sorted(df.collect(), key=lambda r: r["ts"])]
    assert ops == ["Insert", "SchemaChange", "Insert"]


def test_text_blob_json_columns_stream_end_to_end(spark, tmp_path):
    """VERDICT r4 task 3: TEXT/BLOB/JSON columns (the reference's generic
    Bytes arm, src/main.rs:492-501) decode through the streaming source —
    UTF-8 passes as text, non-UTF-8 surfaces as uppercase hex."""
    import os

    tid = 42
    body = tid.to_bytes(6, "little") + b"\x01\x00"
    body += bytes([2]) + b"db" + b"\x00"
    body += bytes([1]) + b"t" + b"\x00"
    body += _lenenc(4)
    body += bytes([3, 252, 252, 245])  # LONG, TEXT(1B), BLOB(2B), JSON(4B)
    meta = bytes([1]) + bytes([2]) + bytes([4])
    body += _lenenc(len(meta)) + meta
    body += bytes([0])
    names = b"".join(
        _lenenc(len(n)) + n for n in (b"id", b"body", b"payload", b"doc")
    )
    body += bytes([4]) + _lenenc(len(names)) + names
    tme = _event(1001, TABLE_MAP_EVENT, body, crc=False)

    text = "héllo world".encode()
    blob = b"\x00\x01\xff\xfe"
    jsonb = b"\x83\xfebinjson"  # MySQL JSON binary: not valid UTF-8 text
    row = (
        bytes([0])
        + struct.pack("<i", 7)
        + bytes([len(text)]) + text
        + struct.pack("<H", len(blob)) + blob
        + struct.pack("<I", len(jsonb)) + jsonb
    )
    rbody = tid.to_bytes(6, "little") + b"\x01\x00"
    rbody += struct.pack("<H", 2) + _lenenc(4) + bytes([0b1111]) + row
    ev = _event(1002, WRITE_ROWS_EVENT_V2, rbody, crc=False)
    data = MAGIC + _fde(False) + tme + ev

    from cdc_rs_spark.streaming.datasource import register_change_feed

    register_change_feed(spark)
    src = tmp_path / "feed"
    os.makedirs(src)
    (src / "bin.000001.binlog").write_bytes(data)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("change_feed")
        .option("path", str(src))
        .load()
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    after = rows[0]["after"]
    assert after["body"] == "héllo world"
    assert after["payload"] == "0001FFFE"
    assert after["doc"] == jsonb.hex().upper()


def test_fde_checksum_byte_false_positive_rejected():
    """ADVICE r4: body[-5] == 1 on a checksum-DISABLED file is a post-
    header-length array entry, not the checksum flag — the decoder must
    validate the FDE's own CRC32 before stripping 4-byte trailers, or it
    silently corrupts every following event body."""
    # checksum-off FDE whose post-header table happens to end ...,1,0]
    body = struct.pack("<H", 4) + b"8.0.30".ljust(50, b"\x00")
    body += struct.pack("<I", 0) + bytes([19])
    body += bytes(38) + bytes([1])  # table's LAST entry = 1 -> body[-5] == 1
    body += bytes([0])  # checksum algorithm byte: OFF
    fde = _event(1000, FORMAT_DESCRIPTION_EVENT, body, crc=False)
    tid = 99
    data = (
        MAGIC
        + fde
        + _table_map(tid, False)
        + _rows_event(
            WRITE_ROWS_EVENT_V2, tid, [_row(7, b"alpha", 12.5, (2024, 3, 9))],
            False,
        )
    )
    changes = list(parse_binlog_bytes(data))
    assert len(changes) == 1 and changes[0]["after"]["name"] == "alpha"


def test_growing_binlog_feed_with_mid_event_appends(spark, tmp_path):
    """VERDICT r4 task 7: drive the streaming source against a LIVE growing
    binlog file the way a replication spool grows — append half an event,
    poll, append the rest plus more, poll again — and assert every record
    lands exactly once, in order, with no Malformed quarantine. This is the
    socket-shaped arrival pattern: the writer's flush boundary lands
    mid-event, and the incomplete-tail handling must hold across MULTIPLE
    incremental appends, not just one rewrite."""
    import os

    from cdc_rs_spark.streaming.datasource import register_change_feed

    register_change_feed(spark)
    src = tmp_path / "feed"
    os.makedirs(src)
    fp = str(src / "bin.000001.binlog")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    tid = 99
    events = [
        _rows_event(
            WRITE_ROWS_EVENT_V2, tid, [_row(i, f"r{i}".encode(), float(i), (2024, 1, 1 + i))],
            False, ts=2000 + i,
        )
        for i in range(1, 7)
    ]
    prefix = MAGIC + _fde(False) + _table_map(tid, False)

    def poll():
        q = (
            spark.readStream.format("change_feed")
            .option("path", str(src))
            .option("mode", "permissive")
            .load()
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    # append schedule: (bytes to append, expected cumulative complete rows)
    half2 = len(events[1]) // 2
    schedule = [
        (prefix + events[0], 1),                      # one full event
        (events[1][:half2], 1),                       # half of #2: no new row
        (events[1][half2:] + events[2], 3),           # rest of #2 + #3
        (events[3] + events[4][: len(events[4]) - 3], 4),  # #4 full, #5 cut
        (events[4][len(events[4]) - 3 :] + events[5], 6),  # finish #5, #6
    ]
    seen_ids = []
    for chunk, want in schedule:
        with open(fp, "ab") as f:
            f.write(chunk)
        poll()
        rows = (
            spark.read.parquet(out).collect()
            if os.path.exists(out)
            else []
        )
        assert len(rows) == want, (len(rows), want)
        assert all(r["op"] == "Insert" for r in rows)
        seen_ids = sorted(int(r["after"]["id"]) for r in rows)
    assert seen_ids == [1, 2, 3, 4, 5, 6]  # exactly once each, no dup/loss
