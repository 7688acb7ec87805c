"""Unit gates for operators/coverage.py (greedy max-coverage).

The q253 oracle sweep proves the trajectory vs DuckDB; these pin the
operator-level contracts a green hash can't isolate: the greedy
argmax actually prefers coverage over raw size, ties break on the
lower id, and an exhausted corpus truncates rather than erroring."""

from __future__ import annotations

from metadata_ingestion_poc_spark.operators.coverage import (
    greedy_set_cover,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_greedy_prefers_new_coverage_over_size(spark):
    # doc 0: 4 shingles; doc 1: subset of doc 0 (0 new after pick 1);
    # doc 2: 2 shingles, disjoint. Greedy picks 0, then 2; doc 1 is
    # then FULLY covered, so round 3 truncates (fully-covered docs
    # drop out of the gain frame — the oracle's s3 CTE is empty the
    # same way, so the contract is cross-engine consistent).
    rows = [
        (0, "a b c d e f"),       # shingles: abc bcd cde def
        (1, "a b c d"),           # abc bcd  (subset of doc 0)
        (2, "x y z w"),           # xyz yzw  (disjoint)
    ]
    sel = greedy_set_cover(_docs(spark, rows), rounds=3)
    assert [(r, i, g) for r, i, g, _ in sel] == [
        (1, 0, 4),
        (2, 2, 2),
    ]
    assert [c for *_, c in sel] == [4, 6]


def test_greedy_tie_breaks_on_lower_id(spark):
    rows = [(5, "p q r"), (3, "u v w"), (9, "m n o")]
    sel = greedy_set_cover(_docs(spark, rows), rounds=2)
    assert [i for _, i, _, _ in sel] == [3, 5]


def test_greedy_truncates_when_corpus_exhausted(spark):
    rows = [(0, "a b c"), (1, "d e f")]
    sel = greedy_set_cover(_docs(spark, rows), rounds=6)
    assert len(sel) == 2


def test_greedy_anti_join_path_matches_literal_path(spark, monkeypatch):
    """Round-11 (advisor): past _COVERED_LITERAL_CAP covered shingles
    the per-round probe switches from an inlined array literal to a
    broadcast LEFT ANTI join. Forcing the cap to 0 must produce the
    IDENTICAL trajectory — the two probe forms are the same predicate,
    and a divergence means the fallback changed semantics."""
    from metadata_ingestion_poc_spark.operators import coverage

    rows = [
        (0, "a b c d e f"),
        (1, "a b c d x y z"),
        (2, "x y z w q r"),
        (3, "m n o p"),
    ]
    lit_path = greedy_set_cover(_docs(spark, rows), rounds=4)
    monkeypatch.setattr(coverage, "_COVERED_LITERAL_CAP", 0)
    anti_path = greedy_set_cover(_docs(spark, rows), rounds=4)
    assert anti_path == lit_path
    assert len(lit_path) >= 3
