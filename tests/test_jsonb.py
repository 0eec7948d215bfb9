"""MySQL binary-JSON (JSONB) decode: hand-built wire images and a
property round-trip against an INDEPENDENT test-side encoder of the
json_binary.cc small/large layout — the decoder must reproduce the JSON
text MySQL prints ('", "' separators, stored key order)."""

from __future__ import annotations

import json
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_rs_spark.streaming.jsonb import JsonbError, decode_mysql_json


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def jenc(v) -> bytes:
    """Full JSONB value: type byte + payload (small format containers)."""
    t, payload = _parts(v)
    return bytes([t]) + payload


def _parts(v) -> tuple[int, bytes]:
    if v is None:
        return 0x04, b"\x00"
    if v is True:
        return 0x04, b"\x01"
    if v is False:
        return 0x04, b"\x02"
    if isinstance(v, int):
        if -(2**15) <= v < 2**15:
            return 0x05, struct.pack("<h", v)
        if -(2**31) <= v < 2**31:
            return 0x07, struct.pack("<i", v)
        return 0x09, struct.pack("<q", v)
    if isinstance(v, float):
        return 0x0B, struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode()
        return 0x0C, _varint(len(b)) + b
    if isinstance(v, list):
        return 0x02, _container(None, v)
    if isinstance(v, dict):
        return 0x00, _container(list(v.keys()), list(v.values()))
    raise TypeError(type(v))


def _container(keys, vals) -> bytes:
    """Small-format container payload: count(2) size(2) [key entries]
    [value entries] [keys] [values]; literal/int16 inlined like MySQL."""
    w = 2
    n = len(vals)
    fixed = 2 * w + (n * (w + 2) if keys is not None else 0) + n * (1 + w)
    keyblob = b""
    key_entries = []
    if keys is not None:
        for k in keys:
            kb = k.encode()
            key_entries.append((fixed + len(keyblob), len(kb)))
            keyblob += kb
    valblob = b""
    val_entries = []
    for v in vals:
        t, payload = _parts(v)
        if t == 0x04:
            val_entries.append(bytes([t]) + payload + b"\x00")
        elif t == 0x05:
            val_entries.append(bytes([t]) + payload)
        else:
            off = fixed + len(keyblob) + len(valblob)
            val_entries.append(bytes([t]) + struct.pack("<H", off))
            valblob += payload
    size = fixed + len(keyblob) + len(valblob)
    out = struct.pack("<HH", n, size)
    for off, klen in key_entries:
        out += struct.pack("<HH", off, klen)
    out += b"".join(val_entries)
    return out + keyblob + valblob


def test_jsonb_golden_values():
    assert decode_mysql_json(jenc(None)) == "null"
    assert decode_mysql_json(jenc(True)) == "true"
    assert decode_mysql_json(jenc(False)) == "false"
    assert decode_mysql_json(jenc(42)) == "42"
    assert decode_mysql_json(jenc(-7)) == "-7"
    assert decode_mysql_json(jenc(70000)) == "70000"
    assert decode_mysql_json(jenc(-(2**40))) == str(-(2**40))
    assert decode_mysql_json(jenc(1.5)) == "1.5"
    assert decode_mysql_json(jenc("héllo")) == '"héllo"'
    assert decode_mysql_json(jenc([])) == "[]"
    assert decode_mysql_json(jenc({})) == "{}"
    # MySQL text style: comma-space and colon-space, stored key order
    assert (
        decode_mysql_json(jenc({"b": 1, "a": [True, None, "x"]}))
        == '{"b": 1, "a": [true, null, "x"]}'
    )
    # inlined scalars in containers (literal + int16 ride the offset field)
    assert decode_mysql_json(jenc([0, -1, None, False])) == "[0, -1, null, false]"


def test_jsonb_unsupported_falls_back():
    import pytest

    with pytest.raises(JsonbError):
        decode_mysql_json(b"")
    with pytest.raises(JsonbError):
        decode_mysql_json(b"\x0f\x05\x00abc")  # opaque: not decoded
    with pytest.raises(JsonbError):
        decode_mysql_json(b"\xff\x00")  # unknown type
    # round-5 review: CORRUPT payloads must normalize to JsonbError too —
    # an escaping UnicodeDecodeError/struct.error/IndexError would skip the
    # binlog decoder's bytes-rule fallback and abort the rest of the file
    with pytest.raises(JsonbError):
        decode_mysql_json(b"\x0c\x02\xff\xfe")  # string: invalid UTF-8
    with pytest.raises(JsonbError):
        decode_mysql_json(b"\x0b\x00\x00")  # double: short payload
    with pytest.raises(JsonbError):
        decode_mysql_json(b"\x04")  # literal: empty payload


_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(2**62), 2**62),
    st.text(max_size=12),
)
_json_values = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(st.text(max_size=8), children, max_size=5),
    ),
    max_leaves=20,
)


@settings(max_examples=150, deadline=None)
@given(v=_json_values)
def test_jsonb_roundtrip_property(v):
    """decode(encode(v)) must parse back to v AND print in MySQL's text
    style — json.dumps with (', ', ': ') separators is the independent
    oracle for every non-float value."""
    text = decode_mysql_json(jenc(v))
    assert json.loads(text) == v
    assert text == json.dumps(v, ensure_ascii=False, separators=(", ", ": "))


def test_jsonb_through_binlog_row():
    """A JSON column in a WRITE_ROWS image decodes to the JSON TEXT (the
    reference's text-protocol parity), not hex."""
    from cdc_rs_spark.streaming.binlog import T_JSON, _decode_value

    doc = {"id": 7, "tags": ["a", "b"], "ok": True}
    payload = jenc(doc)
    buf = struct.pack("<I", len(payload)) + payload
    val, end = _decode_value(buf, 0, T_JSON, 4)
    assert end == len(buf)
    assert val == '{"id": 7, "tags": ["a", "b"], "ok": true}'
    # opaque payload inside the column falls back to raw bytes -> hex rule
    bad = b"\x0f\x05\x00abc"
    buf2 = struct.pack("<I", len(bad)) + bad
    val2, _ = _decode_value(buf2, 0, T_JSON, 4)
    assert val2 == bad
