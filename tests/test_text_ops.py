"""Invariant tests for the chunking / boilerplate / sampling text ops over
CRAFTED documents (the parquet fixtures have no adversarial lengths): every
token count 1..80 is represented, covering all window/stride boundary cases
(n = 24, 25, 32, 33, 48, 49, ...).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

WINDOW, STRIDE = 32, 24


def _write_docs(spark, path: str, texts: dict[int, str]) -> str:
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in sorted(texts.items())
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


@pytest.fixture(scope="module")
def chunk_docs(spark, tmp_path_factory):
    """One doc per token count 1..80: doc n = 'w1 w2 ... wn'."""
    texts = {
        n: " ".join(f"w{i}" for i in range(1, n + 1)) for n in range(1, 81)
    }
    base = str(tmp_path_factory.mktemp("chunkdocs"))
    return _write_docs(spark, base, texts), texts


def test_chunk_overlap_invariants(spark, chunk_docs):
    """For every doc length 1..80: starts are 1+STRIDE*idx <= n; chunk sizes
    are min(WINDOW, n-start+1); the chunks cover [1, n] with no gap; and
    consecutive chunks overlap by exactly WINDOW-STRIDE except when the
    previous chunk was already truncated by the document end."""
    from cdc_rs_spark.plans.text import text_chunk_overlap

    sf_dir, texts = chunk_docs
    out = text_chunk_overlap(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(texts)
    for n, rows in ((d, sorted(v, key=lambda r: r["chunk_idx"])) for d, v in by_doc.items()):
        covered = set()
        for i, r in enumerate(rows):
            assert r["chunk_idx"] == i
            assert r["start_tok"] == 1 + STRIDE * i
            assert r["start_tok"] <= n
            assert r["n_tokens"] == min(WINDOW, n - r["start_tok"] + 1)
            covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
        assert covered == set(range(1, n + 1)), f"doc {n} has coverage gaps"
        # no start beyond n: the next start after the last must exceed n
        assert rows[-1]["start_tok"] + STRIDE > n


def test_chunk_md5_matches_slice(spark, chunk_docs):
    """chunk_md5 is the md5 of exactly the sliced token span."""
    import hashlib

    from cdc_rs_spark.plans.text import text_chunk_overlap

    sf_dir, texts = chunk_docs
    for r in text_chunk_overlap(spark, sf_dir).collect():
        toks = texts[r["doc_id"]].split(" ")
        span = " ".join(toks[r["start_tok"] - 1 : r["start_tok"] - 1 + r["n_tokens"]])
        assert r["chunk_md5"] == hashlib.md5(span.encode()).hexdigest()


def test_boilerplate_counts_doc_once(spark, tmp_path):
    """A 5-gram repeated WITHIN one doc votes once; doc_freq counts distinct
    documents containing the gram."""
    from cdc_rs_spark.plans.text import text_boilerplate_ngrams

    gram = "a b c d e"
    texts = {
        # doc 0 contains the gram twice -> one vote
        0: f"{gram} x {gram}",
        1: f"pre {gram} post",
        2: "nothing shared here at all",
        3: "too short",  # < 5 tokens: excluded
    }
    sf_dir = _write_docs(spark, str(tmp_path), texts)
    got = {r["gram"]: r["doc_freq"] for r in text_boilerplate_ngrams(spark, sf_dir).collect()}
    assert got[gram] == 2
    assert max(got.values()) == 2


def test_weighted_priority_monotone_in_weight(spark, tmp_path):
    """Determinism + weight-monotonicity: re-runs select identical rows, and
    scaling a doc's weight (n_chars) up can only lower its priority key."""
    from cdc_rs_spark.plans.pipeline import hash_bucket
    from cdc_rs_spark.plans.pipeline import sample_weighted_priority

    texts = {i: "x" * (10 + 7 * (i % 13)) for i in range(300)}
    sf_dir = _write_docs(spark, str(tmp_path), texts)
    a = sample_weighted_priority(spark, sf_dir).collect()
    b = sample_weighted_priority(spark, sf_dir).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) == 200
    # key = bucket/weight: verify against an independent recomputation
    buckets = {
        r["doc_id"]: r["b"]
        for r in spark.createDataFrame(
            [(i,) for i in texts], "doc_id long"
        ).select("doc_id", hash_bucket(F.col("doc_id"), 1_000_000).alias("b")).collect()
    }
    expect = sorted(
        ((buckets[i] / len(t), i) for i, t in texts.items())
    )[:200]
    assert [(r["priority"], r["doc_id"]) for r in sorted(a, key=lambda r: (r["priority"], r["doc_id"]))] == expect


def test_nb_classifier_recovers_planted_signal(spark):
    """The registered text_nb_source_classifier runs on an exchangeable
    synthetic corpus (chance accuracy by construction; the oracle pins the
    margins). This test proves the classifier LEARNS when signal exists:
    plant two cohorts with disjoint marker tokens diluted by shared
    filler, train on half, and assert the held-out confusion matrix is
    perfectly diagonal and every cell's margin points the right way."""
    from cdc_rs_spark.operators.classify import (
        nb_confusion,
        nb_score,
        nb_train_weights,
    )

    rows = []
    for i in range(200):
        is_a = i % 2 == 0
        marker = "alpha beta" if is_a else "gamma delta"
        rows.append((i, is_a, i % 4 < 2, f"common filler {marker} shared words"))
    labeled = spark.createDataFrame(
        rows, "doc_id long, is_a boolean, is_train boolean, lt string"
    )
    toks = lambda df, cols: (  # noqa: E731
        df.select(*cols, F.explode(F.split("lt", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    weights, neutral = nb_train_weights(
        toks(labeled.filter("is_train"), ["is_a"])
    )
    scored = nb_score(
        toks(labeled.filter(~F.col("is_train")), ["doc_id", "is_a"]),
        weights,
        neutral,
    )
    cells = {
        (r.pred_a, r.actual_a): r
        for r in nb_confusion(scored).collect()
    }
    assert set(cells) == {(1, 1), (0, 0)}, f"off-diagonal cells: {cells}"
    assert cells[(1, 1)].n_docs == 50 and cells[(0, 0)].n_docs == 50
    assert cells[(1, 1)].margin_milli > 0 and cells[(0, 0)].margin_milli < 0

    # OOV robustness: a held-out doc of ONLY unseen tokens scores exactly
    # neutral (s == base) and classifies not-A by the strict-> tie rule.
    oov = nb_score(
        spark.createDataFrame(
            [(999, True, "zzz qqq")], "doc_id long, is_a boolean, lt string"
        ).select("doc_id", "is_a", F.explode(F.split("lt", " ")).alias("token")),
        weights,
        neutral,
    ).collect()[0]
    assert oov.s_milli == oov.base_milli


def test_span_cut_rewrite_on_crafted_overlaps(spark, tmp_path):
    """Independent pin of the rewrite semantics (the oracle checks
    Spark == DuckDB; this checks both == the SPEC): three docs share a
    60-char region, so the stride grid marks overlapping windows that
    must merge into ONE cut range; the lowest doc keeps its text
    (absent from the output), the others lose exactly the duplicated
    region's window coverage."""
    from cdc_rs_spark.plans.dedup import dedup_span_cut_rewrite

    dup = "".join(f"x{i % 10}" for i in range(30))  # 60 shared chars
    # stride sampling only equates windows whose offsets into the shared
    # region agree modulo the stride — place every copy at a start
    # congruent to 6 mod 10 (doc 1/2 at 26, doc 3 at 6) so the grids
    # sample identical substrings
    texts = {
        1: "A" * 25 + dup + "B" * 25,
        2: "C" * 25 + dup + "D" * 25,
        3: "F" * 5 + dup + "E" * 50,
        4: "unique " * 20,  # no duplicated window: absent from output
    }
    base = str(tmp_path / "spancut")
    _write_docs(spark, base, texts)
    got = {
        r["doc_id"]: r
        for r in dedup_span_cut_rewrite(spark, base).collect()
    }
    # doc 1 is every shared window's canonical owner -> untouched
    assert set(got) == {2, 3}
    for did in (2, 3):
        assert got[did]["n_cut_ranges"] == 1  # overlapping windows merged
        assert len(got[did]["clean_text"]) == len(texts[did]) - got[did][
            "n_chars_cut"
        ]
        assert dup not in got[did]["clean_text"]
    # doc 2: duplicated windows start at grid points inside [26, 66];
    # window starts are 1,11,21,31,41,51,... -> starts 31,41 fall fully
    # inside the dup region (need start >= 26 and start+39 <= 85):
    # starts 31 and 41 -> cut [31, 80], 50 chars
    assert got[2]["n_chars_cut"] == 50
    assert got[2]["clean_text"] == texts[2][:30] + texts[2][80:]
    # doc 3: dup at [6, 65]; qualifying grid starts 11, 21 -> cut
    # [11, 60], 50 chars (stride sampling leaves the unaligned fringes)
    assert got[3]["n_chars_cut"] == 50
    assert got[3]["clean_text"] == texts[3][:10] + texts[3][60:]


def test_anchor_spans_catch_offset_shifted_duplicate(spark, tmp_path):
    """The crafted offset-shifted duplicate (VERDICT r8 next #1): doc 2 is
    doc 1 shifted by 3 chars — offsets disagree mod SPAN_STRIDE, so the
    stride grid provably misses it, while content-defined anchors (which
    move with the content) must catch it. A pure-Python replica of the
    rolling hash independently pins the anchor spec (both engines == SPEC,
    not just Spark == DuckDB)."""
    from cdc_rs_spark.operators.dedup import (
        CDA_B,
        CDA_K,
        CDA_W,
        SPAN_LEN,
        doc_anchor_spans,
        doc_spans,
    )
    from cdc_rs_spark.plans.dedup import dedup_exact_substring_anchored

    # deterministic but aperiodic pseudo-text (md5 counter mode): ~1/11 of
    # positions anchor, so 240 chars all but guarantees several anchors
    import hashlib

    base = "".join(
        chr(ord("a") + b % 26)
        for k in range(15)
        for b in hashlib.md5(f"anchor-{k}".encode()).digest()
    )
    assert len(base) == 240

    # python replica of the anchor rule
    def anchors(t: str) -> list[int]:
        out = []
        for i in range(len(t) - SPAN_LEN + 1):
            h = 0
            for j in range(CDA_K):
                h = h * CDA_B + (ord(t[i + j]) % 256)
            if h % CDA_W == 0:
                out.append(i)
        return out

    assert len(anchors(base)) >= 1, "crafted text must contain an anchor"

    texts = {1: base, 2: "~~~" + base}  # shift 3: not 0 mod SPAN_STRIDE
    sf_dir = _write_docs(spark, str(tmp_path), texts)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # stride sampling: the two copies share NO window (the provable miss)
    sp = doc_spans(docs)
    a = {r["span"] for r in sp.filter("doc_id = 1").collect()}
    b = {r["span"] for r in sp.filter("doc_id = 2").collect()}
    assert not (a & b), "shift of 3 must defeat the stride grid"

    # anchored sampling: every in-range anchor of the shared text appears
    # in BOTH copies (python replica confirms the positions shift by 3)
    asp = doc_anchor_spans(docs)
    a2 = {r["span"] for r in asp.filter("doc_id = 1").collect()}
    b2 = {r["span"] for r in asp.filter("doc_id = 2").collect()}
    shared = a2 & b2
    assert shared, "content-defined anchors must catch the shifted copy"
    expect = {base[i : i + SPAN_LEN] for i in anchors(base)}
    assert a2 == expect  # Spark == the python SPEC, byte for byte
    assert shared == {s for s in expect if s in b2}

    # and the registered report flags both docs
    got = {r["doc_id"] for r in dedup_exact_substring_anchored(spark, sf_dir).collect()}
    assert got == {1, 2}


def test_bigram_lm_score_separates_fluent_from_gibberish(spark, tmp_path):
    """Planted-signal pin for the bigram LM filter (the corpus fixtures
    are label-exchangeable, so separation must be proven on a crafted
    corpus): train docs repeat a small set of bigram patterns; a held-out
    doc built from the SAME patterns must outscore a doc of never-seen
    token pairs, and the score must be the exact integer the spec
    defines (python replica)."""
    from cdc_rs_spark.plans.text import LM_Q, text_bigram_lm_score

    pattern = "the cat sat on the mat and the dog ran to the cat"
    texts = {
        0: pattern,             # train (even ids)
        2: pattern,
        4: "the cat ran to the mat and the dog sat on the cat",
        1: pattern,             # held-out, in-distribution
        3: "zq xw vb nm kj hg fd sa pl mn qa ws ed rf tg yh",  # gibberish
    }
    sf_dir = _write_docs(spark, str(tmp_path), texts)
    got = {r["doc_id"]: r for r in text_bigram_lm_score(spark, sf_dir).collect()}
    assert set(got) == {1, 3}
    # the add-one smoothing floor is 1e6/(0+V) for fully-OOV bigrams, so
    # with this tiny planted vocab (V=9) the gibberish doc sits at ~111k
    # while the in-distribution doc reaches ~296k — assert the >2x
    # separation rather than a ratio that only a large vocab can produce
    assert got[1]["score_micro"] > 2 * got[3]["score_micro"]

    # python replica of the exact integer spec for doc 1
    train_bg, train_c1, vocab = {}, {}, set()
    for did in (0, 2, 4):
        w = texts[did].split(" ")
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            train_bg[(a, b)] = train_bg.get((a, b), 0) + 1
            train_c1[a] = train_c1.get(a, 0) + 1
    v = len(vocab)
    w = texts[1].split(" ")
    parts = [
        ((train_bg.get((a, b), 0) + 1) * LM_Q) // (train_c1.get(a, 0) + v)
        for a, b in zip(w, w[1:])
    ]
    assert got[1]["n_bigrams"] == len(parts)
    assert got[1]["score_micro"] == sum(parts) // len(parts)


def test_bpe_train_merges_on_crafted_corpus(spark, tmp_path):
    """Directed BPE-training semantics on a planted corpus where every
    subtlety is exercised: greedy non-overlapping merges ('aaaa' with pair
    (a,a) must become [aa,aa], NOT [aa,a,a] — the string-replace shortcut
    gets this wrong), multi-level merges (a learned symbol merging again),
    single-char words (the Spark sequence(1,0)=[1,0] descent trap), and
    count-tie lexicographic break."""
    from cdc_rs_spark.plans.text import text_bpe_train_merges

    # corpus: 'aaaa' x4, 'abab' x3, 'i' x5 (single-char word), 'ab' x2
    docs = " ".join(["aaaa"] * 4 + ["abab"] * 3 + ["i"] * 5 + ["ab"] * 2)
    path = _write_docs(spark, str(tmp_path / "bpe"), {1: docs})
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in text_bpe_train_merges(spark, path).collect()
    ]
    # round 1 pair counts: (a,a): 3*4=12 from 'aaaa'; (a,b): 2*3+1*2=8;
    # (b,a): 1*3=3  -> merge (a,a) n=12
    assert got[0] == (1, "a", "a", "aa", 12)
    # after round 1: 'aaaa'->[aa,aa] (greedy non-overlap), 'abab' unchanged
    # round 2: (aa,aa): 4 from 'aaaa'; (a,b): 8 -> merge (a,b) n=8
    assert got[1] == (2, "a", "b", "ab", 8)
    # round 3: 'abab'->[ab,ab]: (ab,ab): 3; (aa,aa): 4 -> merge (aa,aa) n=4
    assert got[2] == (3, "aa", "aa", "aaaa", 4)
    # round 4: (ab,ab): 3 -> multi-level merge of a learned symbol
    assert got[3] == (4, "ab", "ab", "abab", 4 - 1)
