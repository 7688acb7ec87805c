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


def test_greedy_matches_bruteforce_trajectory(spark):
    """Round 15: the covered set is maintained distributed-side (anti
    join against the picked docs' index rows; cum_covered is the
    running gain sum — the old literal/collect path is gone). Pin the
    full (rank, doc, gain, cum) trajectory against a Python
    brute-force greedy over the same shingle sets."""
    rows = [
        (0, "a b c d e f"),
        (1, "a b c d x y z"),
        (2, "x y z w q r"),
        (3, "m n o p"),
    ]

    def brute(rounds):
        sets = {
            i: {
                " ".join(t.split()[j:j + 3])
                for j in range(max(len(t.split()) - 2, 1))
            }
            for i, t in rows
        }
        covered: set[str] = set()
        picked: list[int] = []
        out = []
        for r in range(1, rounds + 1):
            gains = {
                i: len(s - covered)
                for i, s in sets.items()
                if i not in picked and len(s - covered) > 0
            }
            if not gains:
                break
            winner = min(gains, key=lambda i: (-gains[i], i))
            covered |= sets[winner]
            picked.append(winner)
            out.append((r, winner, gains[winner], len(covered)))
        return out

    sel = greedy_set_cover(_docs(spark, rows), rounds=4)
    assert sel == brute(4)
    assert len(sel) >= 3
