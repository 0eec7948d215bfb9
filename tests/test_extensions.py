"""Unit tests for the extension operators: dedup, similarity, text,
multimodal (SURVEY §2.2 EXTENSION rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_rs_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    simhash_pairs,
)
from cdc_rs_spark.operators.multimodal import attach_payload, fake_image_meta
from cdc_rs_spark.operators.similarity import brute_force_topk, lsh_topk
from cdc_rs_spark.functions.text import (
    predicted_lang,
    rolling_fingerprint,
    tokens,
)


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "other text")], "doc_id long, text string"
    )
    out = exact_dedup(df, ["text"], "doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == [1, 3]


def test_minhash_finds_planted_near_dup(spark):
    # 26-word doc with one word changed -> trigram jaccard ~0.78, inside the
    # high-recall region of the 8x4 banding S-curve (a 13-word doc at ~0.57
    # sits in the soft region and may deterministically miss).
    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
        "lima mike november oscar papa quebec romeo sierra tango uniform "
        "victor whiskey xray yankee zulu"
    ).split()
    base = " ".join(words)
    near = " ".join(words[:20] + ["CHANGED"] + words[21:])
    far = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = minhash_dedup_pairs(df, "doc_id", "text", threshold=0.4).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert 0.4 <= pairs[0]["jaccard"] < 1.0


def test_minhash_identical_docs_jaccard_one(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame([(1, t), (2, t)], "doc_id long, text string")
    pairs = minhash_dedup_pairs(df, "doc_id", "text", threshold=0.9).collect()
    assert len(pairs) == 1
    assert pairs[0]["jaccard"] == 1.0


def test_simhash_near_identical(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(1, base.strip()), (2, (base + "extra").strip()), (3, "totally unrelated content " * 6)],
        "doc_id long, text string",
    )
    pairs = simhash_pairs(df, "doc_id", "text", max_hamming=6).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found and (2, 3) not in found


def test_brute_force_topk_identical_vector_ranks_first(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # identical to 0
        (2, [0.9, 0.1, 0.0, 0.0]),   # close
        (3, [0.0, 0.0, 1.0, 0.0]),   # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = brute_force_topk(q, df, k=3).collect()
    assert [r["vec_id"] for r in out] == [1, 2, 3]
    assert out[0]["cosine"] == 1.0
    assert out[2]["cosine"] == 0.0


def test_lsh_topk_is_subset_of_bruteforce(spark, sf_dir):
    from cdc_rs_spark.session import load

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    bf = brute_force_topk(q, emb.select("vec_id", "embedding"), k=50).collect()
    ann = lsh_topk(q, emb.select("vec_id", "embedding"), k=5, max_hamming=2).collect()
    assert len(ann) > 0
    # every ANN hit must be a genuine vector with the cosine the exact path computed
    bf_cos = {(r["query_id"], r["vec_id"]): r["cosine"] for r in bf}
    for r in ann:
        key = (r["query_id"], r["vec_id"])
        if key in bf_cos:
            assert abs(bf_cos[key] - r["cosine"]) < 1e-9


def test_langid_and_fingerprint(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in the house"),
            (2, "el perro y el gato en la casa de los vecinos"),
            (3, "xyzzy plugh quux"),
        ],
        "doc_id long, text string",
    )
    toks = tokens(F.col("text"))
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        predicted_lang(toks).alias("lang"),
        rolling_fingerprint(toks).alias("fp"),
    ).collect()}
    assert out[1]["lang"] == "en"
    assert out[2]["lang"] == "es"
    assert out[3]["lang"] == "und"
    # fingerprint is order-sensitive
    df2 = spark.createDataFrame([(1, "b a"), (2, "a b")], "doc_id long, text string")
    fps = [r["fp"] for r in df2.select(rolling_fingerprint(tokens(F.col("text"))).alias("fp")).collect()]
    assert fps[0] != fps[1]


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "abc")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in fake_image_meta(attach_payload(df)).collect()}
    assert out[1]["n_bytes"] == 11
    assert out[1]["width"] == 11 and out[1]["height"] == 77
    assert out[2]["n_bytes"] == 3
    assert out[1]["format"] == "fake/deterministic"


def _png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 4


def _bmp(w: int, h: int) -> bytes:
    return (
        b"BM" + b"\x00" * 16
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
    )


def _jpeg(w: int, h: int) -> bytes:
    # SOI + APP0 segment + SOF0 with dims (height first per spec)
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (11).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0


def test_multimodal_decode_image_headers(spark):
    """decode_image is a real decoder without PIL: it reads dimensions and
    format from PNG/GIF/BMP/JPEG container headers, and quarantines
    unrecognized bytes as (-1, -1, 'unknown') instead of throwing."""
    from cdc_rs_spark.operators.multimodal import decode_image

    payloads = [
        (1, _png(640, 480)),
        (2, _gif(13, 37)),
        (3, _bmp(200, 100)),
        (4, _jpeg(1920, 1080)),
        (5, b"not an image at all"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert (out[1]["width"], out[1]["height"], out[1]["format"]) == (640, 480, "PNG")
    assert (out[2]["width"], out[2]["height"], out[2]["format"]) == (13, 37, "GIF")
    assert (out[3]["width"], out[3]["height"], out[3]["format"]) == (200, 100, "BMP")
    assert (out[4]["width"], out[4]["height"], out[4]["format"]) == (1920, 1080, "JPEG")
    assert (out[5]["width"], out[5]["height"], out[5]["format"]) == (-1, -1, "unknown")
    assert out[5]["n_bytes"] == len(b"not an image at all")


def test_decode_image_pillow_path_matches_header_parser(spark):
    """When Pillow IS importable, decode_image's real-codec path must agree
    with the pure-Python header parser on every synthetic image — proving
    the mapInPandas seam carries a real decoder without changing the
    deterministic oracle. Skips where PIL is absent (this container)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from cdc_rs_spark.operators.multimodal import decode_image, parse_image_header

    payloads = []
    for i, (fmt, size) in enumerate(
        [("PNG", (640, 480)), ("GIF", (13, 37)), ("BMP", (200, 100)),
         ("JPEG", (192, 108))]
    ):
        buf = io.BytesIO()
        Image.new("RGB", size).save(buf, format=fmt)
        payloads.append((i, buf.getvalue()))
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in decode_image(df).collect()}
    for doc_id, b in payloads:
        want = parse_image_header(b)
        assert want is not None
        got = out[doc_id]
        assert (got["width"], got["height"], got["format"]) == want


def test_embedding_near_dup_finds_planted_pair(spark):
    import random

    from cdc_rs_spark.operators.similarity import EMB_DIM, embedding_near_dup_pairs

    rng = random.Random(11)
    base = [rng.uniform(-1, 1) for _ in range(EMB_DIM)]
    near = list(base)
    near[0] += 0.01  # cosine ~1, identical LSH signature
    far = [rng.uniform(-1, 1) for _ in range(EMB_DIM)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<float>"
    )
    pairs = embedding_near_dup_pairs(df, threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["cosine"] > 0.99


def test_ivf_topk_exact_within_probed_lists(spark):
    import random

    from cdc_rs_spark.operators.similarity import EMB_DIM, cosine, ivf_topk

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(EMB_DIM)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    out = ivf_topk(queries, df, n_centroids=4, nprobe=4, k=3).collect()
    # nprobe == n_centroids probes everything -> must equal brute force
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    assert set(per_q) == {0, 1}
    assert all(sorted(v)[0][0] == 1 and len(v) == 3 for v in per_q.values())
    from cdc_rs_spark.operators.similarity import brute_force_topk

    bf = brute_force_topk(queries, df, k=3).collect()
    bf_pairs = {(r["query_id"], r["rank"], r["vec_id"]) for r in bf}
    ivf_pairs = {(r["query_id"], r["rank"], r["vec_id"]) for r in out}
    assert ivf_pairs == bf_pairs


def test_lloyd_refine_local_matches_distributed(spark):
    """The driver-local Lloyd trainer must be bit-identical to the
    distributed refine_centroids on the same input — same assignment
    tiebreaks, same exact integer accumulation, same int->double mean
    rounding. This is what licenses similarity_ivf_topk to train locally
    on its bounded sample while claiming oracle-exact centroids."""
    import random

    from cdc_rs_spark.operators.similarity import (
        EMB_DIM,
        lloyd_refine_local,
        refine_centroids,
    )

    rng = random.Random(99)
    # float32-quantized values, like the parquet fixture
    import struct as st

    def f32(x):
        return st.unpack("f", st.pack("f", x))[0]

    rows = [
        (i, [f32(rng.uniform(-1, 1)) for _ in range(EMB_DIM)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds_rows = [
        {"cent_id": i, "c_emb": rows[i][1]} for i in range(4)
    ]
    seeds_df = spark.createDataFrame(
        [(r["cent_id"], r["c_emb"]) for r in seeds_rows],
        "cent_id bigint, c_emb array<float>",
    )
    dist = {
        r["cent_id"]: list(r["c_emb"])
        for r in refine_centroids(df, seeds_df, dim=EMB_DIM).collect()
    }
    local = {
        c["cent_id"]: c["c_emb"]
        for c in lloyd_refine_local(
            [{"vec_id": i, "embedding": e} for i, e in rows], seeds_rows
        )
    }
    assert dist.keys() == local.keys()
    for cid in dist:
        assert dist[cid] == local[cid], f"centroid {cid} diverged"


def test_audio_features_checksum_matches_md5(spark):
    import hashlib

    from cdc_rs_spark.operators.multimodal import fake_audio_features

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    row = fake_audio_features(attach_payload(df)).collect()[0]
    assert row["n_bytes"] == 11
    assert row["frame_count"] == 1
    assert row["duration_ms"] == 0
    assert row["checksum"] == int(hashlib.md5(b"hello world").hexdigest()[:15], 16)


def test_video_frame_sampling_shape(spark):
    from cdc_rs_spark.operators.multimodal import sample_video_frames

    # 1000-byte payload -> frames 0..3 (256B each, last=232B); stride 4 keeps
    # only frame 0; a 1025-byte payload has 5 frames -> frames 0 and 4.
    df = spark.createDataFrame(
        [(1, "x" * 1000), (2, "y" * 1025)], "doc_id long, text string"
    )
    rows = sorted(
        sample_video_frames(attach_payload(df), stride=4).collect(),
        key=lambda r: (r["doc_id"], r["frame_idx"]),
    )
    got = [(r["doc_id"], r["frame_idx"], r["frame_offset"], r["frame_len"]) for r in rows]
    assert got == [(1, 0, 0, 256), (2, 0, 0, 256), (2, 4, 1024, 1)]


def test_asof_join_backward_semantics(spark):
    from cdc_rs_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 200), (3, 20, 50)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(
        [(7, 10, 100), (8, 10, 150), (9, 10, 100), (6, 30, 10)],
        "rid long, k long, rt long",
    )
    out = {
        r["lid"]: r
        for r in asof_join_backward(
            left,
            right.select("k", "rt", F.col("rt").alias("m_t"), F.col("rid").alias("m_id")),
            on=["k"],
            left_time="t",
            right_time="rt",
            payload_cols=["m_t", "m_id"],
        ).collect()
    }
    # t=100: rows 7 and 9 tie at rt=100 (inclusive match); larger rid wins
    assert (out[1]["m_t"], out[1]["m_id"]) == (100, 9)
    # t=200: latest at-or-before is rt=150
    assert (out[2]["m_t"], out[2]["m_id"]) == (150, 8)
    # k=20 has no right rows at all -> null payload
    assert out[3]["m_t"] is None and out[3]["m_id"] is None


def test_int8_quantize_zero_vector_and_range(spark):
    from cdc_rs_spark.operators.similarity import int8_quantize

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -0.5]), (3, [0.25, 0.125])],
        "id long, e array<float>",
    )
    rows = {r.id: r.q for r in df.select("id", int8_quantize(F.col("e")).alias("q")).collect()}
    assert rows[1] == [0, 0]            # zero vector stays zero (no div-by-0)
    assert rows[2] == [127, -63]        # max|x| -> 127; half-up rounding
    assert rows[3] == [127, 64]         # scale-relative, not absolute


def test_incremental_join_agg_group_migration_and_deletion(spark):
    """An update that moves a fact row to a DIFFERENT dim key retracts from
    the old group and asserts into the new one; a full-group deletion drops
    the group (n_rows=0 filtered) — the invariants the synthetic feed never
    exercises (it keeps keys stable)."""
    from cdc_rs_spark.operators.incremental import incremental_join_agg

    img = "map<string,string>"
    changes = spark.createDataFrame(
        [
            # key 1 in region A: backfill assert of v=10
            ("Backfill", None, {"k": "1", "v": "10"}),
            # key 2 in region A: asserted then MOVED to region B with v 5->7
            ("Backfill", None, {"k": "2", "v": "5"}),
            ("Update", {"k": "2", "v": "5"}, {"k": "20", "v": "7"}),
            # key 3 alone in region C, then deleted -> group C disappears
            ("Backfill", None, {"k": "3", "v": "1"}),
            ("Delete", {"k": "3", "v": "1"}, None),
        ],
        f"op string, before {img}, after {img}",
    )
    dim = spark.createDataFrame(
        [(1, "A"), (2, "A"), (20, "B"), (3, "C")], "dk long, grp string"
    )
    out = {
        r.grp: (r.n_rows, float(r.total))
        for r in incremental_join_agg(
            changes,
            dim,
            key_of=lambda i: i["k"].cast("bigint"),
            dim_key="dk",
            group_col="grp",
            value_of=lambda i: i["v"].cast("decimal(18,2)"),
        ).collect()
    }
    assert out == {"A": (1, 10.0), "B": (1, 7.0)}


def test_exploded_ngrams_matches_array_shingles(spark):
    """The index-sequence explode (performance path) emits exactly the same
    multiset of n-grams as explode(shingles(...)) minus the per-doc distinct
    (shingles array_distincts; exploded_ngrams leaves duplicates to the
    caller) — verified on docs with and without internal repetition."""
    from cdc_rs_spark.operators.dedup import exploded_ngrams, shingles, word_tokens

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y x y x"), (3, "one two")],
        "doc_id long, text string",
    )
    fast = exploded_ngrams(df, "doc_id", "text", 3)
    got = sorted((r.doc_id, r.gram) for r in fast.collect())
    assert got == [
        (1, "a b c"), (1, "b c d"),
        (2, "x y x"), (2, "x y x"), (2, "y x y"),
    ]
    toks = word_tokens(F.col("text"))
    ref = (
        df.filter(F.size(toks) >= 3)
        .select("doc_id", F.explode(shingles(toks)).alias("gram"))
    )
    assert sorted((r.doc_id, r.gram) for r in ref.collect()) == sorted(
        set(got)
    )


def test_epoch_us_agnostic_to_timestamp_type(spark):
    """epoch_us must yield identical epoch micros for TIMESTAMP and
    TIMESTAMP_NTZ input (the fixture parquet changed type across rounds —
    naive timestamp[us] reads as NTZ under Spark 4's inference)."""
    from cdc_rs_spark.functions.timeutil import epoch_ms, epoch_us

    df = spark.createDataFrame(
        [("2024-01-01 00:09:58.778549",)], "s string"
    ).select(
        F.col("s").cast("timestamp").alias("ltz"),
        F.col("s").cast("timestamp_ntz").alias("ntz"),
    )
    r = df.select(
        epoch_us("ltz").alias("a"),
        epoch_us("ntz").alias("b"),
        epoch_ms("ntz").alias("m"),
    ).first()
    assert r.a == r.b == 1704067798778549
    assert r.m == 1704067798778


def test_conversion_latency_zero_conversions(spark, tmp_path):
    """Degenerate-input guard: clicks with no subsequent purchases must
    return the oracle's (0, NULL, NULL, NULL) row, not crash on the empty
    quantile input."""
    import datetime

    from cdc_rs_spark.registry import load_all

    rows = [
        (1, datetime.datetime(2024, 1, 1, 10, 0), 7, "click", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 1, 11, 0), 8, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    q = load_all()["events_conversion_latency_quantiles"]
    out = q.fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_conversions"] == 0
    assert r["p50_s"] is None and r["p90_s"] is None and r["p99_s"] is None


# ---- round 7: SemDeDup assignment + exact-substring spans properties ------


def test_semantic_cluster_assign_matches_numpy_argmax(spark):
    """Property: the broadcast+struct-max assignment equals a NumPy
    nearest-anchor argmax (cos DESC, seed_id ASC tie-break) on a random
    corpus — the distributed argmax encoding (max of (cos, -seed_id,
    emb)) is easy to get subtly wrong."""
    import numpy as np

    from cdc_rs_spark.operators.dedup import semantic_cluster_assign

    rng = np.random.default_rng(7)
    n, k, dim = 60, 4, 8
    vecs = rng.normal(size=(n, dim)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id bigint, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in semantic_cluster_assign(df, k).collect()
    }
    seeds = vecs[:k].astype("float64")
    v64 = vecs.astype("float64")
    cos = (v64 @ seeds.T) / (
        np.linalg.norm(v64, axis=1, keepdims=True)
        * np.linalg.norm(seeds, axis=1)
    )
    # argmax with seed_id ASC tie-break == first max index
    expect = {i: int(np.argmax(cos[i])) for i in range(n)}
    assert got == expect


def test_exact_substring_spans_matches_python_reference(spark, tmp_path):
    """Property: the distributed span report equals a pure-Python
    reference (dict-of-sets over the same stride windows) on a corpus
    with planted cross-document duplicates."""
    import collections
    import random

    from cdc_rs_spark.plans.dedup import (
        SPAN_LEN,
        SPAN_STRIDE,
        dedup_exact_substring_spans,
    )

    rng = random.Random(13)
    alphabet = "abcdefg "
    shared = "".join(rng.choice(alphabet) for _ in range(90))
    docs = []
    for i in range(30):
        body = "".join(rng.choice(alphabet) for _ in range(rng.randint(10, 200)))
        if i % 3 == 0:  # plant the shared run in every third doc
            body = body[:20] + shared + body[20:]
        docs.append((i, body))

    # pure-Python reference over the same windows
    span_docs = collections.defaultdict(set)
    per_doc = collections.Counter()
    occurrences = collections.defaultdict(list)
    for doc_id, text in docs:
        if len(text) < SPAN_LEN:
            continue
        for pos in range(0, len(text) - SPAN_LEN + 1, SPAN_STRIDE):
            span = text[pos : pos + SPAN_LEN]
            span_docs[span].add(doc_id)
            per_doc[doc_id] += 1
            occurrences[doc_id].append(span)
    expect = {}
    for doc_id, spans in occurrences.items():
        dup = sum(1 for s in spans if len(span_docs[s]) >= 2)
        if dup:
            expect[doc_id] = (per_doc[doc_id], dup)

    import os

    sf_dir = str(tmp_path)
    spark.createDataFrame(docs, "doc_id bigint, text string").write.parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in dedup_exact_substring_spans(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect, "vacuous: no planted duplicates found"


def test_semantic_cluster_assign_tie_breaks_to_lowest_seed(spark):
    """Directed tie case: identical anchor vectors produce EQUAL cosines,
    and the (cos, -seed_id) struct-max must resolve to the LOWEST seed_id
    — the oracle's row_number(ORDER BY cos DESC, seed_id) contract."""
    from cdc_rs_spark.operators.dedup import semantic_cluster_assign

    base = [1.0, 0.0, 0.0, 0.0]
    other = [0.0, 1.0, 0.0, 0.0]
    rows = [(0, base), (1, base), (2, other), (5, base)]  # seeds: 0,1,2
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<float>",
    )
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in semantic_cluster_assign(df, 3).collect()
    }
    # vec 0, 1 and 5 all tie between seeds 0 and 1 (identical anchors):
    # lowest seed wins every time
    assert got == {0: 0, 1: 0, 2: 2, 5: 0}


def test_semdedup_ivf_variant_is_anchor_parity_modulo_anchor_table(spark):
    """dedup_semantic_ivf_centroids differs from dedup_semantic_clustered
    ONLY in the anchor table (VERDICT r7 next #5): feeding the IVF
    variant's assignment path (_assign_to_centroids + shared
    _semdedup_report) the SAME K-lowest-id anchors the seed-based query
    uses must reproduce its report exactly."""
    from cdc_rs_spark.operators.dedup import semantic_cluster_assign
    from cdc_rs_spark.operators.similarity import (
        EMB_DIM,
        _assign_to_centroids,
        norm_sql,
    )
    from cdc_rs_spark.plans.dedup import SEMDEDUP_K, _semdedup_report
    from cdc_rs_spark.session import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    seed_anchors = (
        emb.orderBy("vec_id")
        .limit(SEMDEDUP_K)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.expr(
                "transform(embedding, x -> CAST(x AS DOUBLE))"
            ).alias("c_emb"),
        )
    )
    via_ivf_path = (
        _assign_to_centroids(emb, seed_anchors, EMB_DIM)
        .select("vec_id", F.col("cent_id").alias("cluster_id"), "embedding")
        .withColumn("nrm", F.expr(norm_sql("embedding", None)))
    )
    report_ivf = {
        tuple(r)
        for r in _semdedup_report(spark, via_ivf_path).collect()
    }
    report_seed = {
        tuple(r)
        for r in _semdedup_report(
            spark, semantic_cluster_assign(emb, SEMDEDUP_K)
        ).collect()
    }
    assert report_ivf == report_seed
    assert len(report_ivf) > 0


def test_residual_ivfpq_recall_at_least_raw(spark, sf_dir):
    """The residual form's reason to exist (VERDICT r8 next #2): at
    identical storage (4 codes + a norm per vector) residual encoding
    must recall AT LEAST as well as raw-vector PQ on the fixture —
    measured 0.25 vs 0.15 at sf0.1 and ties at the smaller scales, both
    values oracle-pinned; this test pins the RELATION so a regression in
    either index surfaces as a direction, not just a moved number."""
    from cdc_rs_spark.plans.similarity import (
        similarity_ivfpq_recall_eval,
        similarity_ivfpq_residual_recall_eval,
    )

    raw = similarity_ivfpq_recall_eval(spark, sf_dir).collect()[0]
    res = similarity_ivfpq_residual_recall_eval(spark, sf_dir).collect()[0]
    assert res["mean_recall"] >= raw["mean_recall"], (res, raw)


def test_dhash_rescaled_duplicate_hashes_identically(spark):
    """Directed pin of dHash resize invariance (VERDICT r8 next #3) on
    HANDMADE payloads the generator never produced: a base 9x8 image with
    arbitrary luma values, its 2x nearest-neighbor upscale (18x16), and a
    one-gradient-flipped variant. The rescale must hash IDENTICALLY
    (block sums scale by k^2, comparisons are scale-free), the flipped
    variant at hamming 1, a random image far away, and a corrupt payload
    (width not a multiple of 9) must be quarantined."""
    from cdc_rs_spark.operators.multimodal import (
        dhash_images,
        dhash_near_dup_pairs,
    )

    lum = [[(7 * u * u + 13 * v + 5 * u * v + 3) % 251 for u in range(9)]
           for v in range(8)]

    def payload(grid, k):
        w, h = 9 * k, 8 * k
        px = bytes(
            grid[y // k][x // k] for y in range(h) for x in range(w)
        )
        return w.to_bytes(4, "big") + h.to_bytes(4, "big") + px

    # flip exactly one gradient sign: bit (u=0, v=0) compares lum[0][1] vs
    # lum[0][0] — swap them (both comparisons u=0 and u=1 could change;
    # engineer a single-bit flip by making lum[0][1] dip below lum[0][0]
    # while staying above... simpler: copy and assert measured hamming 1)
    flipped = [row[:] for row in lum]
    flipped[0][0], flipped[0][1] = flipped[0][1], flipped[0][0]

    rnd = [[(91 * u + 57 * v + 23 * u * v + 11) % 251 for u in range(9)]
           for v in range(8)]
    rows = [
        (1, payload(lum, 1)),
        (2, payload(lum, 2)),          # 2x rescale of doc 1
        (3, payload(flipped, 1)),      # near-dup candidate of doc 1
        (4, payload(rnd, 3)),          # unrelated
        (5, b"\x00\x00\x00\x07" + b"\x00\x00\x00\x38" + bytes(7 * 56)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    decoded = dhash_images(df)
    got = {r["doc_id"]: r for r in decoded.collect()}
    assert set(got) == {1, 2, 3, 4}  # doc 5 quarantined (width 7 != 9k)
    assert got[1]["bands"] == got[2]["bands"]  # resize invariance, exact
    assert (got[2]["width"], got[2]["height"]) == (18, 16)

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    h13 = ham(got[1]["bands"], got[3]["bands"])
    assert 1 <= h13 <= 2, h13  # the engineered near-dup stays in range
    assert ham(got[1]["bands"], got[4]["bands"]) > 2  # unrelated stays out

    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dhash_near_dup_pairs(decoded).collect()
    }
    assert pairs[(1, 2)] == 0  # the rescaled duplicate is CAUGHT
    assert (1, 3) in pairs and pairs[(1, 3)] == h13
    assert all(4 not in p for p in pairs)


def test_lpa_two_cliques_with_bridge(spark, tmp_path):
    """Synchronous fixed-round LPA semantics on a crafted graph: two
    cliques joined by one bridge edge must resolve to two communities,
    matching a 10-line Python reference of the exact same rule (mode of
    neighbor labels, ties to the smallest label, LPA_ROUNDS rounds)."""
    from cdc_rs_spark.plans.relational2 import LPA_ROUNDS, part_community_lpa

    # lineitem encodes the graph: order k = a clique over its parts.
    # clique A = {1,2,3}, clique B = {10,11,12}, bridge order = {3,10}.
    rows = (
        [(1, p) for p in (1, 2, 3)]
        + [(2, p) for p in (10, 11, 12)]
        + [(3, p) for p in (3, 10)]
    )
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )

    # python reference over the identical rule
    edges = set()
    orders = {}
    for ok, p in rows:
        orders.setdefault(ok, []).append(p)
    for ps in orders.values():
        for x in ps:
            for y in ps:
                if x != y:
                    edges.add((x, y))
    lab = {v: v for v, _ in edges}
    for _ in range(LPA_ROUNDS):
        msgs = {}
        for s, d in edges:
            msgs.setdefault(d, []).append(lab[s])
        lab = {
            v: min(
                set(ls), key=lambda x: (-ls.count(x), x)
            )
            for v, ls in msgs.items()
        }
    want = {}
    for v, c in lab.items():
        want[c] = want.get(c, 0) + 1
    expect = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))

    got = [
        (r.community, r.n_members)
        for r in part_community_lpa(spark, str(tmp_path)).orderBy("rnk").collect()
    ]
    assert got == expect
    assert len(got) == 2  # the bridge must NOT glue the cliques together


def test_bloom_prefilter_audit_invariants(spark, sf_dir):
    """Structural Bloom guarantees on real data: zero false negatives
    (every member key passes), pass superset of members, and the pruned
    row count is consistent with the pass verdicts."""
    from cdc_rs_spark.plans.relational2 import join_bloom_prefilter_audit

    row = join_bloom_prefilter_audit(spark, sf_dir).collect()[0]
    assert row.n_false_neg == 0
    assert row.n_pass_bloom >= row.n_member_keys
    assert row.n_false_pos == row.n_pass_bloom - row.n_member_keys
    assert 0 <= row.order_rows_pruned <= row.n_order_rows


def test_frame_luma_signatures_crafted_payloads(spark):
    """Crafted payloads through the Arrow hatch: a flat doc yields equal
    frame sums (no cut), a doc with a hard brightness jump yields a
    >3-byte-unit mean delta between adjacent frames, and a short tail
    frame keeps its exact length and sum."""
    from cdc_rs_spark.operators.multimodal import (
        LUMA_FRAME_BYTES,
        frame_luma_signatures,
    )

    flat = bytes([100]) * (LUMA_FRAME_BYTES * 2)
    jump = bytes([32]) * LUMA_FRAME_BYTES + bytes([122]) * LUMA_FRAME_BYTES
    tail = bytes([50]) * (LUMA_FRAME_BYTES + 10)
    df = spark.createDataFrame(
        [(1, bytearray(flat)), (2, bytearray(jump)), (3, bytearray(tail))],
        "doc_id long, payload binary",
    )
    rows = {
        (r.doc_id, r.frame_idx): r
        for r in frame_luma_signatures(df).collect()
    }
    assert rows[(1, 0)].luma_sum == rows[(1, 1)].luma_sum == 100 * LUMA_FRAME_BYTES
    d_jump = abs(rows[(2, 1)].luma_sum - rows[(2, 0)].luma_sum) / LUMA_FRAME_BYTES
    assert d_jump == 90  # 122 - 32: an unmistakable scene cut
    assert rows[(3, 1)].frame_len == 10
    assert rows[(3, 1)].luma_sum == 50 * 10


def test_bpe_fertility_conservation(spark, sf_dir):
    """Per-source fertility must satisfy the tokenizer conservation laws:
    every word >= 1 token, every token >= 1 char, so
    n_chars >= n_tokens >= n_words and tokens/word >= 1.0 exactly."""
    from cdc_rs_spark.plans.text import text_bpe_encode_fertility

    rows = text_bpe_encode_fertility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_chars >= r.n_tokens >= r.n_words > 0
        assert r.tokens_per_word_micro >= 1_000_000
        assert r.chars_per_token_micro >= 1_000_000


def test_jl_projection_preserves_distances_on_fixture(spark, sf_dir):
    """The JL guarantee at k=16 (sd ~ sqrt(2/k) ~ 0.35 of the ratio):
    the mean projected/original distance ratio lands near 1 and a
    majority of sampled pairs fall within +/-50%."""
    from cdc_rs_spark.plans.similarity import (
        embedding_random_projection_audit,
    )

    row = embedding_random_projection_audit(spark, sf_dir).collect()[0]
    assert row.n_pairs > 0
    assert 500_000 <= row.avg_ratio_micro <= 1_500_000
    assert row.n_within_50pct * 2 >= row.n_pairs


def test_cusum_closed_form_equals_recursion(spark, sf_dir):
    """The window identity S_t = P_t - min_{k<=t} P_k must equal the
    textbook recursion S_t = max(0, S_{t-1} + dev_t), replayed in plain
    Python over the collected daily series (|days| rows)."""
    from cdc_rs_spark.plans.events import anomaly_cusum_daily_revenue
    from cdc_rs_spark.session import load
    from pyspark.sql import functions as F

    rows = sorted(
        anomaly_cusum_daily_revenue(spark, sf_dir).collect(),
        key=lambda r: r.d,
    )
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("rc")
        )
        .collect()
    )
    rc = {r.d: r.rc for r in daily}
    target = sum(rc.values()) // len(rc)
    s_pos = s_neg = 0
    for r in rows:
        s_pos = max(0, s_pos + (rc[r.d] - target))
        s_neg = max(0, s_neg + (target - rc[r.d]))
        assert r.s_pos_cents == s_pos, r.d
        assert r.s_neg_cents == s_neg, r.d


def test_quantile_histogram_bounds_exact_quantile(spark, sf_dir):
    """The served bucket must BRACKET the exact selection quantile:
    bucket*width <= exact q-th value <= est_hi, for both served qs."""
    from cdc_rs_spark.operators.quantiles import exact_quantiles
    from cdc_rs_spark.plans.relational2 import (
        QH_BUCKET,
        quantile_histogram_incremental,
    )
    from cdc_rs_spark.session import load

    li = load(spark, sf_dir, "lineitem")
    exact = exact_quantiles(
        li, "l_extendedprice", [0.5, 0.95], group_cols=("l_returnflag",)
    )
    for r in quantile_histogram_incremental(spark, sf_dir).collect():
        q50, q95 = exact[(r.grp,)]
        x = q50 if r.q_pct == 50 else q95
        assert r.bucket * QH_BUCKET <= x <= r.est_hi, (r, x)


def test_vad_segments_crafted_runs(spark):
    """Gaps-and-islands over crafted frames: active-inactive-active-active
    must yield 2 segments with longest 2."""
    from cdc_rs_spark.operators.multimodal import LUMA_FRAME_BYTES

    fb = LUMA_FRAME_BYTES
    payload = (
        bytes([120]) * fb + bytes([10]) * fb + bytes([120]) * fb
        + bytes([120]) * fb
    )
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    from cdc_rs_spark.operators.multimodal import frame_luma_signatures
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    fr = frame_luma_signatures(df)
    act = fr.filter(F.col("luma_sum") >= 100 * F.col("frame_len")).select(
        "doc_id",
        "frame_idx",
        (
            F.col("frame_idx")
            - F.row_number().over(W.partitionBy("doc_id").orderBy("frame_idx"))
        ).alias("grp"),
    )
    seg = (
        act.groupBy("doc_id", "grp").count().collect()
    )
    lens = sorted(r["count"] for r in seg)
    assert lens == [1, 2]


def test_frequent_triples_match_bruteforce(spark, sf_dir):
    """The join-generated triples must equal a brute-force Python count
    over the collected baskets (item-pruned), including the top-k cut."""
    from itertools import combinations

    from cdc_rs_spark.plans.relational2 import (
        FIM_MIN_ITEM_SUP,
        FIM_TOP,
        basket_frequent_triples,
    )
    from cdc_rs_spark.session import load

    rows = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    baskets: dict[int, set] = {}
    item_sup: dict[int, int] = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
        item_sup[r.l_partkey] = item_sup.get(r.l_partkey, 0) + 1
    freq = {p for p, n in item_sup.items() if n >= FIM_MIN_ITEM_SUP}
    sup: dict[tuple, int] = {}
    for items in baskets.values():
        for t in combinations(sorted(i for i in items if i in freq), 3):
            sup[t] = sup.get(t, 0) + 1
    expect = sorted(
        ((n, t) for t, n in sup.items()),
        key=lambda x: (-x[0], x[1]),
    )[:FIM_TOP]
    got = [
        ((r.support), (r.p1, r.p2, r.p3))
        for r in basket_frequent_triples(spark, sf_dir).collect()
    ]
    assert got == expect


def test_io_roundtrip_formats_agree(spark, sf_dir):
    """Losslessness across writers: all three formats must report the
    IDENTICAL (n_rows, checksum_sum, id_sum) triple."""
    from cdc_rs_spark.plans.pipeline import io_format_roundtrip_checksum

    rows = io_format_roundtrip_checksum(spark, sf_dir).collect()
    assert sorted(r.format for r in rows) == ["csv", "json", "parquet"]
    triples = {(r.n_rows, r.checksum_sum, r.id_sum) for r in rows}
    assert len(triples) == 1, rows


def test_matryoshka_recall_sane(spark, sf_dir):
    """Prefix-truncation recall must be a valid recall (0 < r <= 1) for
    both prefixes, with min <= mean, over all 8 probe queries."""
    from cdc_rs_spark.plans.similarity import (
        embedding_matryoshka_truncation_audit,
    )

    rows = embedding_matryoshka_truncation_audit(spark, sf_dir).collect()
    assert sorted(r.prefix_dim for r in rows) == [16, 32]
    for r in rows:
        assert r.n_queries == 8
        assert 0.0 < r.mean_recall <= 1.0
        assert 0.0 <= r.min_recall <= r.mean_recall


def test_zipf_ratios_anchor_and_monotone(spark, sf_dir):
    """Rank 1's ratio is exactly 1e6 (f1/f1) and ratios are nondecreasing
    in rank (frequency is nonincreasing by construction)."""
    from cdc_rs_spark.plans.text import text_zipf_rank_ratio_audit

    rows = sorted(
        text_zipf_rank_ratio_audit(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert rows[0].rank == 1 and rows[0].f1_over_fr_micro == 1_000_000
    ratios = [r.f1_over_fr_micro for r in rows]
    assert ratios == sorted(ratios)


def test_l_diversity_partitions_customers(spark, sf_dir):
    """The band rollup must partition the customer table exactly."""
    from cdc_rs_spark.plans.pipeline import l_diversity_audit_customer
    from cdc_rs_spark.session import load

    rows = l_diversity_audit_customer(spark, sf_dir).collect()
    n = load(spark, sf_dir, "customer").count()
    assert sum(r.n_rows for r in rows) == n


def test_prefix_join_is_lossless_vs_bruteforce(spark, sf_dir):
    """The prefix filter must find EXACTLY the pairs a brute-force
    all-pairs Jaccard >= 0.6 finds — losslessness is the whole claim."""
    from cdc_rs_spark.plans.dedup import dedup_jaccard_prefix_join
    from cdc_rs_spark.session import load
    from pyspark.sql import functions as F

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 3)
        .collect()
    )
    sets = {}
    for r in docs:
        w = r.w
        sets[r.doc_id] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
    ids = sorted(sets)
    expect = set()
    for i, a in enumerate(ids):
        sa = sets[a]
        for b in ids[i + 1 :]:
            sb = sets[b]
            inter = len(sa & sb)
            if inter * 10 >= 6 * (len(sa) + len(sb) - inter):
                expect.add((a, b))
    got = {
        (r.id_a, r.id_b)
        for r in dedup_jaccard_prefix_join(spark, sf_dir).collect()
    }
    assert got == expect


def test_item_cf_invariants(spark, sf_dir):
    """CF output sanity: <= CF_TOPN recs per seed, co-count bounded by both
    marginals, similarity in (0, 1e6]."""
    from collections import Counter

    from cdc_rs_spark.plans.relational2 import (
        CF_SEEDS,
        CF_TOPN,
        basket_item_cf_topk,
    )

    rows = basket_item_cf_topk(spark, sf_dir).collect()
    per_seed = Counter(r.seed_part for r in rows)
    assert len(per_seed) <= CF_SEEDS
    assert all(v <= CF_TOPN for v in per_seed.values())
    for r in rows:
        assert 0 < r.n_both <= min(r.n_seed, r.n_rec)
        assert 0 < r.sim2_micro <= 1_000_000


def test_bfs_matches_python_reference(spark, sf_dir):
    """Distributed BFS levels must equal a plain Python BFS over the same
    thresholded edges."""
    from collections import deque

    from cdc_rs_spark.plans.relational2 import (
        BFS_MAX_HOPS,
        BFS_N_SOURCES,
        part_bfs_distance,
    )
    from cdc_rs_spark.session import load
    from pyspark.sql import functions as F

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter

    w = Counter()
    for items in baskets.values():
        for u in items:
            for v in items:
                if u != v:
                    w[(u, v)] += 1
    adj: dict[int, set] = {}
    for (u, v), n in w.items():
        if n >= 2:
            adj.setdefault(u, set()).add(v)
    sources = sorted(adj)[:BFS_N_SOURCES]
    expect = Counter()
    for s in sources:
        dist = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= BFS_MAX_HOPS:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for d in dist.values():
            expect[(s, d)] += 1
    got = {
        (r.source, r.dist): r.n_vertices
        for r in part_bfs_distance(spark, sf_dir).collect()
    }
    assert got == dict(expect)


def test_association_rules_invariants(spark, sf_dir):
    """Rule metrics: confidence <= 1, lift symmetric across orientations
    of the same pair, co-count bounded by both marginals."""
    from cdc_rs_spark.plans.relational2 import basket_association_rules

    rows = basket_association_rules(spark, sf_dir).collect()
    assert rows
    lift = {}
    for r in rows:
        assert 0 < r.confidence_micro <= 1_000_000
        assert 0 < r.n_both <= min(r.n_ante, r.n_cons)
        lift[(r.antecedent, r.consequent)] = r.lift_micro
    for (a, c), lv in lift.items():
        if (c, a) in lift:
            assert lift[(c, a)] == lv


def test_cep_counts_match_python_re(spark, sf_dir):
    """The engine regex counts must equal Python re.findall (the same
    left-to-right non-overlapping semantics) over the reconstructed
    journeys."""
    import re

    from cdc_rs_spark.plans.events import CEP_PATTERNS, events_pattern_regex_cep
    from cdc_rs_spark.session import load
    from pyspark.sql import functions as F

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    journeys: dict[int, list] = {}
    for r in ev:
        journeys.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type[0]))
    expect = {}
    for name, pat in CEP_PATTERNS:
        users = total = mx = 0
        for evs in journeys.values():
            s = "".join(x[2] for x in sorted(evs))
            n = len(re.findall(pat, s))
            users += n > 0
            total += n
            mx = max(mx, n)
        expect[name] = (users, total, mx)
    for r in events_pattern_regex_cep(spark, sf_dir).collect():
        assert expect[r.pattern_name] == (
            r.n_users, r.total_matches, r.max_per_user,
        ), r


def test_km_survival_invariants(spark, sf_dir):
    """KM curve laws: survival nonincreasing in (0,1], n_at_risk strictly
    decreasing across buckets, and the (event + censored) mass sums to the
    user count."""
    from cdc_rs_spark.plans.events import events_survival_km
    from cdc_rs_spark.session import load
    from pyspark.sql import functions as F

    rows = sorted(
        events_survival_km(spark, sf_dir).collect(), key=lambda r: r.hour
    )
    assert rows
    n_users = (
        load(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    assert sum(r.n_events + r.n_censored for r in rows) == n_users
    assert rows[0].n_at_risk == n_users
    last_s = 1.0 + 1e-12
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_at_risk == prev.n_at_risk - prev.n_events - prev.n_censored
    for r in rows:
        assert 0.0 < r.survival <= last_s + 1e-9
        last_s = r.survival


def test_entity_clusters_invariants(spark, sf_dir):
    """ER clusters: every cluster has >= 2 members, the canonical id is the
    min member, and the total membership equals the distinct suppliers
    appearing in any fuzzy pair."""
    from cdc_rs_spark.plans.relational2 import (
        supplier_entity_clusters,
        supplier_fuzzy_match,
    )

    clusters = supplier_entity_clusters(spark, sf_dir).collect()
    pairs = supplier_fuzzy_match(spark, sf_dir).collect()
    in_pairs = {r.supp_a for r in pairs} | {r.supp_b for r in pairs}
    assert sum(c.n_members for c in clusters) == len(in_pairs)
    for c in clusters:
        assert c.n_members >= 2
        assert c.component == c.min_member


def test_auc_matches_sklearn_free_reference(spark, sf_dir):
    """The rank-sum AUC must equal a plain-Python tie-corrected AUC over
    the collected (label, margin) pairs."""
    from cdc_rs_spark.operators.classify import nb_score, nb_train_weights
    from cdc_rs_spark.plans.text import text_nb_auc_eval
    from cdc_rs_spark.session import load, spread
    from pyspark.sql import functions as F

    docs = spread(load(spark, sf_dir, "documents"))
    labeled = docs.select(
        "doc_id",
        (F.length("source") <= 4).alias("is_a"),
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        F.lower("text").alias("lt"),
    )
    train = labeled.filter("is_train").select(
        "is_a", F.explode(F.split("lt", " ")).alias("token")
    ).filter(F.col("token") != "")
    w, n0 = nb_train_weights(train)
    test = labeled.filter(~F.col("is_train")).select(
        "doc_id", "is_a", F.explode(F.split("lt", " ")).alias("token")
    ).filter(F.col("token") != "")
    pairs = [
        (r.is_a, r.s_milli - r.base_milli)
        for r in nb_score(test, w, n0).collect()
    ]
    pairs.sort(key=lambda x: x[1])
    # average ranks with ties
    ranks = {}
    i = 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][1] == pairs[i][1]:
            j += 1
        avg2 = (i + 1) + j  # doubled average rank of the tie block
        ranks.setdefault(pairs[i][1], avg2)
        i = j
    n_pos = sum(1 for a, _ in pairs if a)
    n_neg = len(pairs) - n_pos
    sum_pos_r2 = sum(ranks[m] for a, m in pairs if a)
    expect = (sum_pos_r2 - n_pos * (n_pos + 1)) * 1_000_000 // (2 * n_pos * n_neg)
    row = text_nb_auc_eval(spark, sf_dir).collect()[0]
    assert (row.n_pos, row.n_neg, row.auc_micro) == (n_pos, n_neg, expect)


def test_decile_lift_partitions_eval_set(spark, sf_dir):
    """Deciles partition the held-out docs into NTILE's exact sizes and
    the cumulative gain reaches 100% at decile 10."""
    from cdc_rs_spark.plans.text import text_nb_decile_lift

    rows = sorted(
        text_nb_decile_lift(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    n = sum(r.n_docs for r in rows)
    q, rem = divmod(n, 10)
    assert [r.n_docs for r in rows] == [q + 1] * rem + [q] * (10 - rem)
    assert rows[-1].cum_gain_micro == 1_000_000


def test_poisson_anomaly_threshold_math(spark, sf_dir):
    """Every flagged hour must satisfy the 3-sigma Poisson bound computed
    in plain Python from the hourly counts."""
    from cdc_rs_spark.plans.events import events_poisson_rate_anomaly
    from cdc_rs_spark.functions.timeutil import epoch_us
    from cdc_rs_spark.session import load
    from pyspark.sql import functions as F

    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            (epoch_us("ts") / F.lit(3600_000_000)).cast("long").alias("h"),
        )
        .count()
        .collect()
    )
    tot: dict[str, list] = {}
    for r in hourly:
        t = tot.setdefault(r.event_type, [0, 0])
        t[0] += r["count"]
        t[1] += 1
    flagged = events_poisson_rate_anomaly(spark, sf_dir).collect()
    for r in flagged:
        t, h = tot[r.event_type]
        lam = t / h
        assert r.n > lam + 3 * (lam ** 0.5), r
    # and nothing below the bound is flagged
    expect = sum(
        1
        for r in hourly
        if r["count"] > tot[r.event_type][0] / tot[r.event_type][1]
        + 3 * (tot[r.event_type][0] / tot[r.event_type][1]) ** 0.5
    )
    assert len(flagged) == expect


def test_bot_regularity_cv2_reference(spark, sf_dir):
    """cv2_micro must equal the Python var/mean^2 over minute-floored
    gaps for every reported user."""
    from cdc_rs_spark.plans.events import events_bot_regularity_score
    from cdc_rs_spark.session import load

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id))
    for r in events_bot_regularity_score(spark, sf_dir).collect():
        evs = sorted(by_user[r.user_id])
        gaps = [
            int((b[0] - a[0]).total_seconds() // 60)
            for a, b in zip(evs, evs[1:])
        ]
        k, sg, sg2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
        assert r.n_events == k + 1
        if sg > 0:
            assert r.cv2_micro == (k * sg2 - sg * sg) * 1_000_000 // (sg * sg)


def test_rake_matches_python_reference(spark, sf_dir):
    """RAKE scores must equal a plain-Python implementation (split on
    stopwords, cap length, degree/freq word scores, phrase sums) including
    the top-k cut."""
    from cdc_rs_spark.plans.text import (
        RAKE_MAX_LEN,
        RAKE_STOPS,
        RAKE_TOP,
        text_rake_keyphrases,
    )
    from cdc_rs_spark.session import load

    docs = load(spark, sf_dir, "documents").select("text").collect()
    stops = set(RAKE_STOPS)
    phrases = []
    for r in docs:
        cur = []
        for w in r.text.lower().split():
            if w in stops:
                if cur:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(tuple(cur))
    capped = [p for p in phrases if len(p) <= RAKE_MAX_LEN]
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for p in capped:
        for w in p:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(p)
    score = {w: deg[w] * 1_000_000 // freq[w] for w in freq}
    from collections import Counter

    occ = Counter(" ".join(p) for p in capped)
    ps = {
        s: sum(score[w] for w in s.split())
        for s in occ
    }
    expect = sorted(ps.items(), key=lambda kv: (-kv[1], kv[0]))[:RAKE_TOP]
    got = [
        (r.phrase, r.score_micro)
        for r in text_rake_keyphrases(spark, sf_dir).collect()
    ]
    assert got == expect
    for r in text_rake_keyphrases(spark, sf_dir).collect():
        assert r.n_occurrences == occ[r.phrase]


def test_opq_rotation_three_way_parity_and_orthogonality(spark):
    """The OPQ rotation's three mirrors (Spark expr, DuckDB SQL, driver
    Python) must agree BIT-FOR-BIT, and the rotation must be orthogonal
    (norms and dot products preserved to fp) — the properties the
    similarity_opq_recall_eval oracle equality rests on."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from cdc_rs_spark.operators.similarity import (
        opq_rotate_expr,
        opq_rotate_py,
        opq_rotate_sql,
    )

    rng = np.random.RandomState(7)
    vecs = [
        (i, [float(np.float32(x)) for x in rng.randn(64) * 0.3])
        for i in range(6)
    ]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    got_spark = {
        r["vec_id"]: r["r"]
        for r in df.select(
            "vec_id", F.expr(opq_rotate_expr()).alias("r")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding FLOAT[])")
    for vid, v in vecs:
        con.execute("INSERT INTO t VALUES (?, ?)", [vid, v])
    got_duck = {
        r[0]: r[1]
        for r in con.sql(f"SELECT vec_id, {opq_rotate_sql()} FROM t").fetchall()
    }
    for vid, v in vecs:
        py = opq_rotate_py(v)
        assert got_spark[vid] == py == got_duck[vid]
        n1 = sum(x * x for x in v)
        n2 = sum(x * x for x in py)
        assert abs(n1 - n2) < 1e-9 * max(n1, 1.0)
    # dot preservation across two distinct vectors
    d1 = sum(a * b for a, b in zip(vecs[0][1], vecs[1][1]))
    r0, r1 = opq_rotate_py(vecs[0][1]), opq_rotate_py(vecs[1][1])
    d2 = sum(a * b for a, b in zip(r0, r1))
    assert abs(d1 - d2) < 1e-9


def test_opq_rotation_recovers_recall_on_planted_anisotropic_corpus():
    """THE reason OPQ exists (Ge et al. 2014): when the energy
    concentrates in one subspace, plain PQ burns all its codewords on
    that subspace and recall collapses; the rotation spreads the energy
    across subspaces and recovers it. The fixture corpus is isotropic by
    construction (so the registered recall query pins numbers, not a
    win) — this test PLANTS the anisotropy: ~97% of variance in PQ
    subspace 0, near-silence elsewhere, and asserts the rotated form's
    recall@5 strictly beats the raw form's."""
    import numpy as np

    from cdc_rs_spark.operators.similarity import (
        PQ_M,
        PQ_SUB,
        _py_cosine,
        _py_d2,
        _py_sub,
        opq_rotate_py,
        pq_train_local,
    )

    rng = np.random.RandomState(10)
    n, dim = 256, 64
    X = np.zeros((n, dim))
    X[:, :PQ_SUB] = rng.randn(n, PQ_SUB)  # subspace 0 carries the signal
    X[:, PQ_SUB:] = 0.05 * rng.randn(n, dim - PQ_SUB)
    X = X.astype(np.float32)
    vecs = [[float(x) for x in row] for row in X]
    queries = list(range(8))

    def exact_top5(space):
        out = {}
        for q in queries:
            scored = sorted(
                (-_py_cosine(space[q], space[v]), v)
                for v in range(n) if v != q
            )[:5]
            out[q] = {v for _, v in scored}
        return out

    def pq_recall(space):
        rows = [{"vec_id": i, "embedding": space[i]} for i in range(n)]
        cb = pq_train_local(rows)
        by_m = {}
        for r in cb:
            by_m.setdefault(r["m"], []).append(r)
        # encode: per subspace argmin d2, reconstruct x_hat
        recon = []
        for v in space:
            xh = []
            for m in range(PQ_M):
                sub = _py_sub(v, m, PQ_SUB)
                best = min(
                    (_py_d2(sub, c["c_sub"]), c["code"], c["c_sub"])
                    for c in by_m[m]
                )
                xh.extend(best[2])
            recon.append(xh)
        truth = exact_top5(space)
        hits = 0
        for q in queries:
            approx = sorted(
                (-_py_cosine(space[q], recon[v]), v)
                for v in range(n) if v != q
            )[:5]
            hits += len({v for _, v in approx} & truth[q])
        return hits / (5.0 * len(queries))

    raw_recall = pq_recall(vecs)
    rot_recall = pq_recall([opq_rotate_py(v) for v in vecs])
    assert rot_recall > raw_recall, (rot_recall, raw_recall)
    # the planted gap is material, not noise
    assert rot_recall - raw_recall >= 0.1, (rot_recall, raw_recall)


def test_opq_trained_permutation_parity_and_planted_win(spark):
    """The trained eigenvalue-allocation permutation (round 11): (a) the
    three application mirrors (Spark expr / driver Python / the SQL
    oracle's list indexing) agree bit-for-bit and the transform is
    orthogonal (a permutation matrix); (b) on the planted-anisotropy
    corpus — energy concentrated in PQ subspace 0 — the TRAINED
    permutation's recall@5 >= the r10 seeded Hadamard rotation's (it
    moves hot dims into distinct subspaces without correlating
    coordinates), and both beat raw PQ."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from cdc_rs_spark.operators.similarity import (
        PQ_M,
        PQ_SUB,
        _py_cosine,
        _py_d2,
        _py_sub,
        opq_permute_expr,
        opq_permute_py,
        opq_rotate_py,
        opq_train_permutation,
        pq_train_local,
    )

    rng = np.random.RandomState(10)
    n, dim = 256, 64
    X = np.zeros((n, dim))
    X[:, :PQ_SUB] = rng.randn(n, PQ_SUB)  # subspace 0 carries the signal
    X[:, PQ_SUB:] = 0.05 * rng.randn(n, dim - PQ_SUB)
    X = X.astype(np.float32)
    vecs = [[float(x) for x in row] for row in X]
    train_rows = [{"embedding": v} for v in vecs]
    perm = opq_train_permutation(train_rows)
    # a genuine permutation of 1..64
    assert sorted(perm) == list(range(1, dim + 1))
    # the 16 hot dims (1..16) spread 4-to-a-subspace
    for m in range(PQ_M):
        hot = sum(
            1 for p in perm[m * PQ_SUB:(m + 1) * PQ_SUB] if p <= PQ_SUB
        )
        assert hot == PQ_SUB // PQ_M, (m, hot)
    # (a) three-way application parity
    df = spark.createDataFrame(
        list(enumerate(vecs[:5])), "vec_id bigint, embedding array<float>"
    )
    got_spark = {
        r["vec_id"]: r["r"]
        for r in df.select(
            "vec_id", F.expr(opq_permute_expr(perm)).alias("r")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding FLOAT[])")
    for vid, v in enumerate(vecs[:5]):
        con.execute("INSERT INTO t VALUES (?, ?)", [vid, v])
    pl = "[" + ", ".join(str(d) for d in perm) + "]"
    got_duck = {
        r[0]: r[1]
        for r in con.sql(
            f"SELECT vec_id, list_transform({pl}, d -> embedding[d]::DOUBLE)"
            " FROM t"
        ).fetchall()
    }
    for vid in range(5):
        py = opq_permute_py(vecs[vid], perm)
        assert got_spark[vid] == py == got_duck[vid]
        assert sorted(py) == sorted(float(x) for x in vecs[vid])

    # (b) planted recall: trained permutation >= seeded rotation > raw
    queries = list(range(8))

    def exact_top5(space):
        out = {}
        for q in queries:
            scored = sorted(
                (-_py_cosine(space[q], space[v]), v)
                for v in range(n) if v != q
            )[:5]
            out[q] = {v for _, v in scored}
        return out

    def pq_recall(space):
        rows = [{"vec_id": i, "embedding": space[i]} for i in range(n)]
        cb = pq_train_local(rows)
        by_m = {}
        for r in cb:
            by_m.setdefault(r["m"], []).append(r)
        recon = []
        for v in space:
            xh = []
            for m in range(PQ_M):
                sub = _py_sub(v, m, PQ_SUB)
                best = min(
                    (_py_d2(sub, c["c_sub"]), c["code"], c["c_sub"])
                    for c in by_m[m]
                )
                xh.extend(best[2])
            recon.append(xh)
        truth = exact_top5(space)
        hits = 0
        for q in queries:
            approx = sorted(
                (-_py_cosine(space[q], recon[v]), v)
                for v in range(n) if v != q
            )[:5]
            hits += len({v for _, v in approx} & truth[q])
        return hits / (5.0 * len(queries))

    raw_recall = pq_recall(vecs)
    rot_recall = pq_recall([opq_rotate_py(v) for v in vecs])
    trained_recall = pq_recall([opq_permute_py(v, perm) for v in vecs])
    assert trained_recall >= rot_recall, (trained_recall, rot_recall)
    assert trained_recall > raw_recall, (trained_recall, raw_recall)


def test_opq_givens_chain_parity_and_planted_correlation_win(spark):
    """The trained Givens completion (round 12, VERDICT r11 next #6):
    (a) the pair-rotation application agrees bit-for-bit across Spark
    expr / driver Python / the oracle's pspec SQL form; (b) on a corpus
    with CORRELATED dims split across PQ subspaces — the distortion
    source the permutation alone cannot touch (iid hot dims are
    rotation-invariant, so the r11 planted fixture can't show this) —
    the full chain (permute -> gated mutual-max Givens -> re-balancing
    permute) clears recall@5 >= 0.55 and strictly beats the permutation
    alone (0.50 on this fixture)."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    from cdc_rs_spark.operators.similarity import (
        PQ_M,
        PQ_SUB,
        _py_cosine,
        _py_d2,
        _py_sub,
        opq_pairs_expr,
        opq_pairs_py,
        opq_permute_py,
        opq_train_pair_rotations,
        opq_train_permutation,
        pq_train_local,
    )

    rng = np.random.RandomState(10)
    n, dim = 256, 64
    X = np.zeros((n, dim))
    X[:, :16] = rng.randn(n, 16)  # hot dims
    X[:, 16:] = 0.05 * rng.randn(n, 48)
    for k in range(8):  # cross-subspace correlated copies of hot dims
        X[:, 16 + k] = 0.9 * X[:, k] + 0.3 * rng.randn(n)
    X = X.astype(np.float32)
    vecs = [[float(x) for x in row] for row in X]

    perm = opq_train_permutation([{"embedding": v} for v in vecs])
    permuted = [opq_permute_py(v, perm) for v in vecs]
    pairs = opq_train_pair_rotations(permuted)
    assert pairs, "the planted correlation must produce matched pairs"
    ij = [p for pair in pairs for p in pair[:2]]
    assert len(ij) == len(set(ij)), "mutual-max pairs must be disjoint"

    # (a) three-way application parity on the permuted vectors
    df = spark.createDataFrame(
        list(enumerate(permuted[:5])), "vec_id bigint, embedding array<double>"
    )
    got_spark = {
        r["vec_id"]: r["r"]
        for r in df.select(
            "vec_id", F.expr(opq_pairs_expr(pairs)).alias("r")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (vec_id BIGINT, embedding DOUBLE[])")
    for vid, v in enumerate(permuted[:5]):
        con.execute("INSERT INTO t VALUES (?, ?)", [vid, v])
    con.execute(
        "CREATE TABLE pspec (pos BIGINT, partner BIGINT, c DOUBLE, "
        "s DOUBLE, role BIGINT)"
    )
    for i, j, c, s in pairs:
        con.execute("INSERT INTO pspec VALUES (?, ?, ?, ?, 1)", [i, j, c, s])
        con.execute("INSERT INTO pspec VALUES (?, ?, ?, ?, 2)", [j, i, c, s])
    got_duck = {
        r[0]: r[1]
        for r in con.sql(
            f"""
            SELECT vec_id, list(v ORDER BY p) FROM (
                SELECT t.vec_id, g.p,
                       COALESCE(
                           CASE WHEN ps.role = 1
                                THEN ps.c * t.embedding[g.p]
                                     + ps.s * t.embedding[ps.partner]
                                WHEN ps.role = 2
                                THEN ps.c * t.embedding[g.p]
                                     - ps.s * t.embedding[ps.partner] END,
                           t.embedding[g.p]) AS v
                FROM t CROSS JOIN range(1, {dim + 1}) g(p)
                LEFT JOIN pspec ps ON ps.pos = g.p
            ) GROUP BY vec_id
            """
        ).fetchall()
    }
    for vid in range(5):
        py = opq_pairs_py(permuted[vid], pairs)
        assert got_spark[vid] == py == got_duck[vid]

    # (b) planted-correlation recall: chain >= 0.55, > permutation alone
    queries = list(range(8))

    def exact_top5(space):
        return {
            q: {
                v
                for _, v in sorted(
                    (-_py_cosine(space[q], space[v]), v)
                    for v in range(n)
                    if v != q
                )[:5]
            }
            for q in queries
        }

    def pq_recall(space):
        rows = [{"vec_id": i, "embedding": space[i]} for i in range(n)]
        cb = pq_train_local(rows)
        by_m = {}
        for r in cb:
            by_m.setdefault(r["m"], []).append(r)
        recon = []
        for v in space:
            xh = []
            for m in range(PQ_M):
                sub = _py_sub(v, m, PQ_SUB)
                best = min(
                    (_py_d2(sub, c["c_sub"]), c["code"], c["c_sub"])
                    for c in by_m[m]
                )
                xh.extend(best[2])
            recon.append(xh)
        truth = exact_top5(space)
        hits = 0
        for q in queries:
            approx = sorted(
                (-_py_cosine(space[q], recon[v]), v)
                for v in range(n)
                if v != q
            )[:5]
            hits += len({v for _, v in approx} & truth[q])
        return hits / (5.0 * len(queries))

    rot = [opq_pairs_py(v, pairs) for v in permuted]
    perm2 = opq_train_permutation([{"embedding": v} for v in rot])
    final = [opq_permute_py(v, perm2) for v in rot]
    perm_recall = pq_recall(permuted)
    chain_recall = pq_recall(final)
    assert chain_recall >= 0.55, (chain_recall, perm_recall)
    assert chain_recall > perm_recall, (chain_recall, perm_recall)
