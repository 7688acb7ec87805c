"""Exact-substring span dedup: hand-built corpora with known shared
runs, plus invariance properties."""

from __future__ import annotations

import pytest

from metadata_ingestion_poc_spark.operators.spans import (
    duplicated_spans,
    positional_grams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _words(*idxs):
    return " ".join(f"w{i}" for i in idxs)


def test_positional_grams_positions_and_content(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b")])
    got = {
        (r.doc, r.pos, r.g)
        for r in positional_grams(df, k=3).collect()
    }
    assert got == {(1, 1, "a b c"), (1, 2, "b c d")}  # doc 2 too short


def test_single_shared_span_exact_length(spark):
    # docs share exactly tokens 10..29 (20 tokens), different offsets
    shared = _words(*range(100, 120))
    a = _words(*range(0, 10)) + " " + shared + " " + _words(*range(200, 210))
    b = _words(*range(300, 305)) + " " + shared + " " + _words(*range(400, 420))
    out = duplicated_spans(
        _docs(spark, [(1, a), (2, b)]), k=5, min_span=10, max_gram_df=None
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.longest_span == 20
    assert r.n_spans == 1


def test_two_disjoint_spans_counted(spark):
    s1 = _words(*range(100, 115))  # 15 tokens
    s2 = _words(*range(500, 520))  # 20 tokens
    a = s1 + " " + _words(*range(0, 8)) + " " + s2
    b = s2 + " " + _words(*range(700, 709)) + " " + s1
    out = duplicated_spans(
        _docs(spark, [(1, a), (2, b)]), k=5, min_span=15, max_gram_df=None
    ).collect()
    assert len(out) == 1
    assert out[0].longest_span == 20
    assert out[0].n_spans == 2


def test_below_min_span_not_reported(spark):
    shared = _words(*range(100, 109))  # 9 tokens < min_span=10
    a = _words(*range(0, 10)) + " " + shared
    b = shared + " " + _words(*range(200, 210))
    out = duplicated_spans(
        _docs(spark, [(1, a), (2, b)]), k=5, min_span=10, max_gram_df=None
    ).collect()
    assert out == []


def test_gram_df_cap_prunes_boilerplate(spark):
    # the same 12-token run in 4 docs -> every gram has df=4;
    # cap at 3 removes the whole span from the index
    shared = _words(*range(100, 112))
    rows = [(i, _words(*range(i * 50, i * 50 + 5)) + " " + shared)
            for i in range(1, 5)]
    full = duplicated_spans(
        _docs(spark, rows), k=5, min_span=10, max_gram_df=None
    ).collect()
    assert len(full) == 6  # all C(4,2) pairs
    capped = duplicated_spans(
        _docs(spark, rows), k=5, min_span=10, max_gram_df=3
    ).collect()
    assert capped == []


def test_min_span_below_k_rejected(spark):
    with pytest.raises(ValueError):
        duplicated_spans(_docs(spark, [(1, "a b c")]), k=8, min_span=5)


def test_repartition_invariance(spark):
    shared = _words(*range(100, 118))
    rows = [
        (1, _words(*range(0, 12)) + " " + shared),
        (2, shared + " " + _words(*range(200, 220))),
        (3, _words(*range(300, 340))),
    ]
    df = _docs(spark, rows)
    a = sorted(
        map(tuple, duplicated_spans(df, k=5, min_span=12).collect())
    )
    b = sorted(
        map(
            tuple,
            duplicated_spans(df.repartition(7), k=5, min_span=12).collect(),
        )
    )
    assert a == b and len(a) == 1


def test_self_repeated_spans_planted_repeat(spark):
    from metadata_ingestion_poc_spark.operators.spans import (
        self_repeated_spans,
    )

    body = _words(*range(0, 30))
    looped = body + " " + _words(*range(10, 22))  # re-appends tokens 11..22
    clean = _words(*range(100, 140))
    out = self_repeated_spans(
        _docs(spark, [(1, looped), (2, clean)]), k=5, min_span=10,
        max_gram_df=None,
    ).collect()
    assert len(out) == 1
    assert out[0].doc_id == 1
    assert out[0].longest_span == 12
    assert out[0].n_spans == 1


def test_spans_against_cross_set_only(spark):
    from metadata_ingestion_poc_spark.operators.spans import (
        duplicated_spans_against,
    )

    shared = _words(*range(100, 118))  # 18 tokens
    batch = _docs(spark, [
        (1, _words(*range(0, 10)) + " " + shared),
        (2, _words(*range(20, 60))),  # clean
        (3, shared),                  # the whole doc is the span
    ])
    # corpus docs 1 and 2 share the span WITH EACH OTHER too — that
    # within-corpus pair must NOT be reported
    corpus = _docs(spark, [
        (1, shared + " " + _words(*range(200, 220))),
        (2, _words(*range(300, 310)) + " " + shared),
        (9, _words(*range(400, 440))),
    ])
    out = sorted(
        (r.batch_doc, r.corpus_doc, r.longest_span, r.n_spans)
        for r in duplicated_spans_against(
            batch, corpus, k=5, min_span=15, max_gram_df=None
        ).collect()
    )
    assert out == [
        (1, 1, 18, 1), (1, 2, 18, 1),
        (3, 1, 18, 1), (3, 2, 18, 1),
    ]


def test_spans_against_df_cap_counts_both_sides(spark):
    from metadata_ingestion_poc_spark.operators.spans import (
        duplicated_spans_against,
    )

    shared = _words(*range(100, 115))
    batch = _docs(spark, [(i, shared) for i in range(1, 4)])   # df 3
    corpus = _docs(spark, [(i, shared) for i in range(10, 13)])  # +3 = 6
    found = duplicated_spans_against(
        batch, corpus, k=5, min_span=15, max_gram_df=6
    ).count()
    assert found == 9
    capped = duplicated_spans_against(
        batch, corpus, k=5, min_span=15, max_gram_df=5
    ).count()
    assert capped == 0


def test_compression_ratio_exact_values(spark):
    import zlib

    from metadata_ingestion_poc_spark.operators.text import (
        compression_ratio,
    )

    loopy = "spam " * 200        # compresses hard
    nat = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [(1, loopy), (2, nat), (3, "")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: (r.raw_len, r.zlib_len, r.compression_ratio)
        for r in compression_ratio(df).collect()
    }
    for i, t in ((1, loopy), (2, nat)):
        raw = len(t.encode())
        z = len(zlib.compress(t.encode(), 6))
        assert got[i] == (raw, z, round(z / raw, 6))
    assert got[3] == (0, len(zlib.compress(b"", 6)), 0.0)
    assert got[1][2] < 0.1 < got[2][2]  # the screen separates them


# ---------------------------------------------------------------------------
# winnowing fingerprints (operators/text.py winnow_fingerprints)
# ---------------------------------------------------------------------------


def _brute_winnow(text, k, w):
    import hashlib

    toks = text.lower().strip().split()
    grams = [
        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
    ]
    hs = [hashlib.md5(g.encode()).hexdigest()[:16] for g in grams]
    out = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        m = min(win)
        # rightmost occurrence of the minimum
        pos = j + max(i for i, v in enumerate(win) if v == m)
        out.add((pos + 1, m))
    return out


def test_winnow_matches_reference_model(spark):
    from metadata_ingestion_poc_spark.operators.text import (
        winnow_fingerprints,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a b c d e f g h i j",
        "x y z",  # too short for any window (k=3, w=4 needs 6 grams? 3+4-1 tokens)
        "repeat repeat repeat repeat repeat repeat repeat",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {}
    for r in winnow_fingerprints(df, k=3, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _brute_winnow(t, 3, 4), f"doc {i}"


def test_winnow_shared_span_guarantee(spark):
    """Any verbatim match of >= w+k-1 tokens shares a fingerprint."""
    from metadata_ingestion_poc_spark.operators.text import (
        winnow_fingerprints,
    )

    span = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    df = spark.createDataFrame(
        [
            (0, f"one two three {span} four five six"),
            (1, f"seven eight {span} nine ten eleven twelve"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(df, k=3, w=4)
    a = {r["fp"] for r in fps.filter("doc_id = 0").collect()}
    b = {r["fp"] for r in fps.filter("doc_id = 1").collect()}
    assert a & b


def test_winnow_repartition_invariant(spark, sf_dir):
    from metadata_ingestion_poc_spark.catalog import load_table
    from metadata_ingestion_poc_spark.operators.text import (
        winnow_fingerprints,
    )

    d = load_table(spark, sf_dir, "documents").limit(40)
    r1 = sorted(map(tuple, winnow_fingerprints(d).collect()))
    r2 = sorted(
        map(tuple, winnow_fingerprints(d.repartition(7)).collect())
    )
    assert r1 == r2


def test_winnow_bad_args(spark):
    import pytest as _pytest

    from metadata_ingestion_poc_spark.operators.text import (
        winnow_fingerprints,
    )

    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="k and w"):
        winnow_fingerprints(df, k=0)
