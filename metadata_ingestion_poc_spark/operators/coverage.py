"""Greedy maximum-coverage document selection (budgeted set cover).

The classic submodular curation primitive (Nemhauser/Wolsey/Fisher
1978 greedy, public literature): pick R documents one at a time, each
maximizing the number of distinct shingles not yet covered by earlier
picks — the "most new information per document" rule used to seed
eval sets and diversity-first training subsets. The greedy choice is
within (1 − 1/e) of the optimal cover, which is why it is THE
practical algorithm for this family.

100-TB shape (the kcenter_greedy stateless-literal discipline):

- The (doc, shingle) inverted frame is built once (shingles() +
  explode_outer, the _shingle_index lesson) and localCheckpointed;
  every round scans that compact copy.
- The covered set is BOUNDED by construction — at most R · (shingles
  per doc) strings — so while it stays small it rides into each
  round's plan as one array literal probed with array_contains: no
  join against a covered frame, no growing lineage, and the only
  per-round exchange is the doc-grouped gain rollup behind map-side
  combine, followed by a top-1 reduction (never a global sort of the
  corpus). The bound is DATA-dependent though (one picked document
  with ~100k shingles would inline a ~100k-element literal into every
  later round's plan), so past `_COVERED_LITERAL_CAP` entries the
  probe switches to a broadcast LEFT ANTI join against the covered
  set — identical semantics, and the driver ships the set once per
  round as a broadcast table instead of re-parsing it as plan text.
- Per round exactly TWO bounded collects: the 1-row argmax and the
  winner's ≤ shingles-per-doc shingle set.

Determinism: gains are integers; the argmax total order is
(gain DESC, doc_id ASC); exhausted corpora truncate the traversal
(the kcenter contract). The DuckDB oracle replays the rounds as
unrolled MATERIALIZED CTEs, so q253 sweeps prove the trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, shingles

# Above this many covered shingles, the per-round "not yet covered"
# probe switches from an inlined array literal to a broadcast anti
# join — a literal this large costs driver-side parse/plan time in
# EVERY subsequent round, while a broadcast table ships once.
_COVERED_LITERAL_CAP = 4096


def _covered_literal(covered: set[str]) -> str:
    items = ", ".join(
        "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
        for s in sorted(covered)
    )
    return f"array({items})"


def greedy_set_cover(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    rounds: int = 5,
) -> list[tuple[int, int, int, int]]:
    """Greedy max-coverage over word n-gram shingles.

    Returns [(sel_rank, id, gain, cum_covered)]: the picked document,
    how many previously-uncovered shingles it contributed, and the
    covered-universe size after the pick. Documents whose shingles are
    all covered drop out of the gain frame; an exhausted corpus
    truncates the traversal.
    """
    sh = (
        shingles(_spread(df), n, text_col)
        .select(id_col, F.explode_outer("shingles").alias("s"))
        .filter(F.col("s").isNotNull())
        .localCheckpoint(eager=False)
    )
    covered: set[str] = set()
    picked: list[int] = []
    out: list[tuple[int, int, int, int]] = []
    for r in range(1, rounds + 1):
        cand = sh
        if picked:
            cand = cand.filter(~F.col(id_col).isin(*picked))
        if covered and len(covered) <= _COVERED_LITERAL_CAP:
            cand = cand.filter(
                ~F.expr(f"array_contains({_covered_literal(covered)}, s)")
            )
        elif covered:
            cov = df.sparkSession.createDataFrame(
                [(s,) for s in sorted(covered)], "s string"
            )
            cand = cand.join(F.broadcast(cov), "s", "left_anti")
        top = (
            cand.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__gain"))
            .orderBy(F.col("__gain").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # every remaining document is fully covered
        winner = int(top[0][id_col])
        gain = int(top[0]["__gain"])
        covered |= {
            row["s"]
            for row in sh.filter(F.col(id_col) == winner).collect()
        }
        picked.append(winner)
        out.append((r, winner, gain, len(covered)))
    return out
