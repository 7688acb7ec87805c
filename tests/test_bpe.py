"""Independent gate for the distributed BPE trainer.

The q278 oracle replays the identical replace-chain in DuckDB, so a
shared semantics error (e.g. a replace chain that is NOT greedy BPE)
would pass the sweep on both engines at once. This test pins the
trainer against a from-scratch Python greedy BPE, including the
overlapping-run corner the replace chain must get right."""

from __future__ import annotations

import pytest

from metadata_ingestion_poc_spark.operators.bpe import bpe_train


def _py_bpe(word_counts, rounds):
    """Reference: classical greedy BPE on a (word -> count) table."""
    corpus = {w: list(w) for w in word_counts}
    out = []
    for r in range(1, rounds + 1):
        pairs = {}
        for w, syms in corpus.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p[0], p[1]))
        a, b = best
        c = pairs[best]
        for w, syms in corpus.items():
            merged, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            corpus[w] = merged
        total = sum(word_counts[w] * len(s) for w, s in corpus.items())
        distinct = len({sym for s in corpus.values() for sym in s})
        out.append((r, a, b, c, total, distinct))
    return out


def _run(spark, word_counts, rounds=6):
    rows = [
        (f"{w} " * c,)  # expand counts through the tokenizing scan
        for w, c in word_counts.items()
    ]
    df = spark.createDataFrame(rows, "text string")
    return bpe_train(df, "text", rounds=rounds)


def test_matches_reference_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = bpe_train(docs, "text", rounds=6)
    wc = {}
    for r in docs.select("text").collect():
        for w in r["text"].strip().lower().split():
            wc[w] = wc.get(w, 0) + 1
    assert got == _py_bpe(wc, 6)


def test_overlapping_runs(spark):
    # 'aaaa' must merge greedily left-to-right: [aa, aa], and 'aaa'
    # to [aa, a] — the replace-chain's hardest corner
    wc = {"aaaa": 3, "aaa": 2, "ab": 1}
    got = _run(spark, wc, rounds=2)
    assert got == _py_bpe(wc, 2)
    assert got[0][1:3] == ("a", "a")  # (a,a) dominates: 3*3 + 2*2 = 13


def test_merged_symbols_cascade(spark):
    # after (l,o) merges, a later round must be able to pick the
    # multi-char symbol ('lo', 'w') etc. — merges compose
    wc = {"low": 5, "lower": 2, "slow": 3}
    got = _run(spark, wc, rounds=4)
    ref = _py_bpe(wc, 4)
    assert got == ref
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, *_ in got)


def test_separator_word_fails_loud(spark):
    df = spark.createDataFrame([("bad|word here",)], "text string")
    with pytest.raises(ValueError):
        bpe_train(df, "text", rounds=1)


def test_bad_params_fail_loud(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe_train(df, "text", rounds=0)
