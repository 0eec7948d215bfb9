"""Round-trip fuzz for the binlog wire decoder: random table schemas over
the decoded type subset, random rows (including NULLs and negative
numbers) encoded with an independent test-side writer, decoded by
streaming/binlog.py — images must match the expected stringifications
exactly. Complements the hand-computed fixtures with breadth."""

from __future__ import annotations

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_rs_spark.streaming.binlog import (
    MAGIC,
    TABLE_MAP_EVENT,
    WRITE_ROWS_EVENT_V2,
    parse_binlog_bytes,
)
from tests.test_jsonb import jenc as _jenc

# (type_code, metadata bytes, value strategy, encoder, expected-string fn)


def _enc_long(v):
    return struct.pack("<i", v)


def _enc_longlong(v):
    return struct.pack("<q", v)


def _enc_short(v):
    return struct.pack("<h", v)


def _enc_tiny(v):
    return struct.pack("<b", v)


def _enc_double(v):
    return struct.pack("<d", v)


def _enc_varchar(v):
    b = v.encode()
    return bytes([len(b)]) + b


def _enc_date(v):
    y, m, d = v
    return (d | (m << 5) | (y << 9)).to_bytes(3, "little")


def _enc_datetime2(v):
    y, mo, d, h, mi, s = v
    packed = (
        (1 << 39)
        | ((y * 13 + mo) << 22)
        | (d << 17)
        | (h << 12)
        | (mi << 6)
        | s
    )
    return packed.to_bytes(5, "big")


def _fmt_datetime(v):
    # reference row_to_map arms (src/main.rs:458-465): all-zero time ->
    # date-only; no fraction when micros == 0 (fsp=0 here, so always)
    y, mo, d, h, mi, s = v
    if h == mi == s == 0:
        return f"{y:04d}-{mo:02d}-{d:02d}"
    return f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"


def _exp_bytes(v: bytes):
    # reference generic Bytes arm (src/main.rs:492-501)
    try:
        return v.decode("utf-8")
    except UnicodeDecodeError:
        return v.hex().upper()


def _enc_time2_fsp0(v):
    neg, h, mi, s = v
    packed = (1 << 23) | (h << 12) | (mi << 6) | s
    if neg:
        packed = (1 << 24) - packed
    return packed.to_bytes(3, "big")


def _fmt_time2(v):
    neg, h, mi, s = v
    return f"{'-' if neg else ''}{h:03d}:{mi:02d}:{s:02d}"


def _enc_newdecimal_10_2(v):
    # value in hundredths; precision 10, scale 2 -> 4B int group + 1B frac
    neg = v < 0
    v = abs(v)
    intp, frac = divmod(v, 100)
    raw = bytearray(intp.to_bytes(4, "big") + bytes([frac]))
    raw[0] |= 0x80
    if neg:
        raw = bytearray((~b) & 0xFF for b in raw)
    return bytes(raw)


COLUMN_KINDS = {
    "tiny": (1, b"", st.integers(-128, 127), _enc_tiny, str),
    "short": (2, b"", st.integers(-(2**15), 2**15 - 1), _enc_short, str),
    "long": (3, b"", st.integers(-(2**31), 2**31 - 1), _enc_long, str),
    "longlong": (8, b"", st.integers(-(2**63), 2**63 - 1), _enc_longlong, str),
    "double": (
        5,
        bytes([8]),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        _enc_double,
        repr,
    ),
    "varchar": (
        15,
        struct.pack("<H", 255),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FA0),
            max_size=40,
        ),
        _enc_varchar,
        str,
    ),
    "date": (
        10,
        b"",
        st.tuples(
            st.integers(1000, 9999), st.integers(1, 12), st.integers(1, 28)
        ),
        _enc_date,
        lambda v: f"{v[0]:04d}-{v[1]:02d}-{v[2]:02d}",
    ),
    "datetime2": (
        18,
        bytes([0]),
        st.tuples(
            st.integers(1000, 9999), st.integers(1, 12), st.integers(1, 28),
            st.integers(0, 23), st.integers(0, 59), st.integers(0, 59),
        ),
        _enc_datetime2,
        _fmt_datetime,
    ),
    "decimal_10_2": (
        246,
        bytes([10, 2]),
        st.integers(-(10**9), 10**9),  # hundredths
        _enc_newdecimal_10_2,
        lambda v: f"{'-' if v < 0 else ''}{abs(v) // 100}.{abs(v) % 100:02d}",
    ),
    # --- the generic-Bytes family (VERDICT r4 task 3) -------------------
    "time2": (
        19,
        bytes([0]),
        st.tuples(
            st.booleans(), st.integers(0, 838), st.integers(0, 59),
            st.integers(0, 59),
        ).filter(lambda v: not (v[0] and v[1] == v[2] == v[3] == 0)),
        _enc_time2_fsp0,
        _fmt_time2,
    ),
    "year": (
        13,
        b"",
        st.integers(0, 255),
        lambda v: bytes([v]),
        lambda v: "0000" if v == 0 else str(1900 + v),
    ),
    "text_1b": (  # TEXT = BLOB with a charset; 1-byte length prefix
        252,
        bytes([1]),
        st.text(max_size=40),
        lambda v: bytes([len(v.encode())]) + v.encode(),
        str,
    ),
    "blob_2b": (
        252,
        bytes([2]),
        st.binary(max_size=64),
        lambda v: struct.pack("<H", len(v)) + v,
        _exp_bytes,
    ),
    "json_4b": (  # MySQL binary JSON -> the JSON TEXT MySQL would print
        245,
        bytes([4]),
        st.recursive(
            st.one_of(
                st.none(),
                st.booleans(),
                st.integers(-(2**31), 2**31 - 1),
                st.text(max_size=8),
            ),
            lambda ch: st.one_of(
                st.lists(ch, max_size=3),
                st.dictionaries(st.text(max_size=5), ch, max_size=3),
            ),
            max_leaves=8,
        ),
        lambda v: (lambda p: struct.pack("<I", len(p)) + p)(_jenc(v)),
        lambda v: __import__("json").dumps(
            v, ensure_ascii=False, separators=(", ", ": ")
        ),
    ),
    "geometry_4b": (
        255,
        bytes([4]),
        st.binary(max_size=48),
        lambda v: struct.pack("<I", len(v)) + v,
        _exp_bytes,
    ),
    "bit_12": (  # 12 bits -> meta (12%8, 12//8), 2 BE value bytes
        16,
        bytes([4, 1]),
        st.binary(min_size=2, max_size=2),
        lambda v: v,
        _exp_bytes,
    ),
    "enum_1b": (  # logged under T_STRING with real_type 247 metadata
        254,
        bytes([247, 1]),
        st.integers(0, 255),
        lambda v: bytes([v]),
        str,
    ),
    "set_2b": (  # real_type 248, 2-byte LE bitmask
        254,
        bytes([248, 2]),
        st.integers(0, 2**16 - 1),
        lambda v: struct.pack("<H", v),
        str,
    ),
}


def _event(etype: int, body: bytes) -> bytes:
    return struct.pack("<IBIIIH", 1000, etype, 1, 19 + len(body), 0, 0) + body


def _fde() -> bytes:
    body = struct.pack("<H", 4) + b"8.0".ljust(50, b"\x00")
    body += struct.pack("<I", 0) + bytes([19]) + bytes(39) + bytes([0])
    return _event(0x0F, body)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(data=st.data())
def test_random_schema_row_roundtrip(data):
    kinds = data.draw(
        st.lists(
            st.sampled_from(sorted(COLUMN_KINDS)), min_size=1, max_size=6
        )
    )
    # TABLE_MAP
    body = (5).to_bytes(6, "little") + b"\x01\x00"
    body += bytes([2]) + b"db\x00" + bytes([1]) + b"t\x00"
    body += bytes([len(kinds)])
    body += bytes(COLUMN_KINDS[k][0] for k in kinds)
    meta = b"".join(COLUMN_KINDS[k][1] for k in kinds)
    body += bytes([len(meta)]) + meta
    body += bytes((len(kinds) + 7) // 8)
    names = b"".join(
        bytes([len(f"c{i}")]) + f"c{i}".encode() for i in range(len(kinds))
    )
    body += bytes([4, len(names)]) + names
    tme = _event(TABLE_MAP_EVENT, body)

    # one WRITE_ROWS with 1-3 rows, random NULLs
    n_rows = data.draw(st.integers(1, 3))
    rows, expected = [], []
    for _ in range(n_rows):
        null_bm = 0
        img = b""
        exp = {}
        for idx, k in enumerate(kinds):
            _, _, strat, enc, fmt = COLUMN_KINDS[k]
            if data.draw(st.booleans()) and data.draw(st.booleans()):
                null_bm |= 1 << idx
                exp[f"c{idx}"] = None
                continue
            v = data.draw(strat)
            img += enc(v)
            exp[f"c{idx}"] = fmt(v)
        nb = (len(kinds) + 7) // 8
        rows.append(null_bm.to_bytes(nb, "little") + img)
        expected.append(exp)
    rbody = (5).to_bytes(6, "little") + b"\x01\x00"
    rbody += struct.pack("<H", 2) + bytes([len(kinds)])
    rbody += bytes([0xFF] * ((len(kinds) + 7) // 8))
    rbody += b"".join(rows)
    ev = _event(WRITE_ROWS_EVENT_V2, rbody)

    changes = list(parse_binlog_bytes(MAGIC + _fde() + tme + ev))
    assert [c["after"] for c in changes] == expected
    assert all(c["op"] == "Insert" and c["before"] is None for c in changes)
