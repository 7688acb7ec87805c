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
  per doc) strings — so it rides into each round's plan as one array
  literal probed with array_contains: no join against a covered
  frame, no growing lineage, and the only per-round exchange is the
  doc-grouped gain rollup behind map-side combine, followed by a
  top-1 reduction (never a global sort of the corpus).
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
        if covered:
            cand = cand.filter(
                ~F.expr(f"array_contains({_covered_literal(covered)}, s)")
            )
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
