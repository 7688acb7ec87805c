"""Unit gates for operators/fuzzy.py qgram_edit_join.

The oracle sweep (q267) proves lossless-ness vs a brute-force
levenshtein join on real data; these pin the operator contracts in
isolation: exact equality with a Python brute force on adversarial
strings (including a pair sharing exactly the minimum q-gram count,
shifted grams after a deletion, and far-apart strings), the fail-loud
short-string guard, and partitioning invariance."""

from __future__ import annotations

import pytest
from pyspark.sql.utils import AnalysisException

from metadata_ingestion_poc_spark.operators.fuzzy import qgram_edit_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


_STRINGS = [
    "abcdefgh",      # base
    "abcdeXgh",      # 1 substitution
    "abdefgh",       # 1 deletion (grams shift left)
    "XbcdefgY",      # 2 substitutions, both ends
    "abcdefghij",    # 2 insertions at the end
    "zzzzzzzz",      # far from everything
    "zzzzzzzz",      # exact duplicate of the far one (dist 0 pair)
    "mnopqrstuv",    # unrelated
    "mnopqrsXuv",    # 1 sub of unrelated
]


def _expected(max_dist: int) -> set[tuple[int, int, int]]:
    out = set()
    for i in range(len(_STRINGS)):
        for j in range(i + 1, len(_STRINGS)):
            d = _lev(_STRINGS[i], _STRINGS[j])
            if d <= max_dist:
                out.add((i, j, d))
    return out


def test_matches_brute_force(spark):
    df = spark.createDataFrame(
        list(enumerate(_STRINGS)), "id long, s string"
    )
    got = {
        (r["id_1"], r["id_2"], r["dist"])
        for r in qgram_edit_join(df, "id", "s", max_dist=2).collect()
    }
    assert got == _expected(2)


def test_short_string_fails_loud(spark):
    df = spark.createDataFrame(
        [(0, "abcdefgh"), (1, "abc")], "id long, s string"
    )
    with pytest.raises(Exception) as exc:
        qgram_edit_join(df, "id", "s", max_dist=2).collect()
    assert "qgram_edit_join" in str(exc.value)


def test_partitioning_invariant(spark):
    df = spark.createDataFrame(
        list(enumerate(_STRINGS)), "id long, s string"
    )

    def run(d):
        return sorted(
            (r["id_1"], r["id_2"], r["dist"])
            for r in qgram_edit_join(d, "id", "s", max_dist=1).collect()
        )

    assert run(df.repartition(1)) == run(df.repartition(7, "id"))
    assert set(run(df)) == _expected(1)
