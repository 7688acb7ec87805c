"""Neyman-allocation stratified sampling: variance-optimal sample
budgets across strata (public literature: Neyman 1934; any sampling
text). For a fixed total budget n, allocating n_h ∝ N_h·S_h (stratum
size × stratum standard deviation) minimizes the variance of the
stratified mean estimator — the principled answer to "how many
documents should each source contribute to an eval/training sample",
where proportional allocation over-samples homogeneous sources and
equal allocation over-samples small ones.

The 100-TB shape: ONE map-combined rollup per stratum of the exact
integer moments (N, Σx, Σx²) — the only data-sized exchange; the
allocation itself is arithmetic on the |strata|-bounded frame.

Cross-engine exactness (the q276 discipline, re-hardened round 13):
the variance ships as the EXACT integer pair
(var_num, var_den) = (N·Σx² − (Σx)², N·(N−1)) — never as a
ROUND(double, 6), whose implementation diverges across engine
VERSIONS (the lesson that kept q276 red two rounds). Inside the
weight chain the variance is the raw single division of those exact
operands; division, sqrt, multiply, add, FLOOR are all
correctly-rounded/exact IEEE primitives, so the chain is
bit-identical on every engine evaluating the same expression tree.
The chain is then pinned to an INTEGER micro-weight
u_h = FLOOR(N_h·S_h·10⁶ + 0.5) (the FLOOR(+0.5) grid rule), after
which EVERYTHING is integer: base_h = (n·u_h) DIV U and
remainder_h = (n·u_h) MOD U with U = Σu_h, and the largest-remainder
top-up ranks exact integers with a stratum tie-break — so the final
allocation, not just the weights, is engine-identical. Every output
cell is a BIGINT (or the stratum key): zero floats reach the hash.
var_num stays within BIGINT up to N·Σx² < 2⁶³ (≈ sf1000 for document
lengths); beyond that widen to DECIMAL(38,0)/HUGEINT and emit as
strings (the q276 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_expr: str,
    budget: int,
) -> DataFrame:
    """(stratum, n_rows, var_num, var_den, u_weight, alloc_base,
    remainder, n_alloc): Neyman-optimal integer allocation of
    ``budget`` samples across strata by largest-remainder rounding.
    The sample variance is var_num/var_den exactly (0/1 for
    single-row strata).

    ``value_expr`` must be integer-valued (the exactness contract —
    lengths, counts, grades); single-row strata get S_h = 0 (no
    variance information, documented rather than divided by zero).
    Budgets above Σ min(N_h, ...) are the caller's concern: Neyman
    can assign n_h > N_h on extreme variance ratios — downstream
    samplers should cap at N_h and re-spread if that matters.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    m = df.selectExpr(
        f"{stratum_col} AS stratum",
        f"CAST({value_expr} AS BIGINT) AS x",
    ).groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.expr("x * x")).cast("long").alias("sxx"),
    )
    # raw single division of exact integer operands — the safe class;
    # the n<2 branch keeps the pair a valid rational (0/1)
    var_raw = (
        "CASE WHEN n_rows < 2 THEN CAST(0.0 AS DOUBLE) ELSE "
        "CAST(n_rows * sxx - sx * sx AS DOUBLE)"
        " / CAST(n_rows * (n_rows - 1) AS DOUBLE) END"
    )
    w = m.selectExpr(
        "stratum",
        "n_rows",
        "CAST(CASE WHEN n_rows < 2 THEN 0"
        " ELSE n_rows * sxx - sx * sx END AS BIGINT) AS var_num",
        "CAST(CASE WHEN n_rows < 2 THEN 1"
        " ELSE n_rows * (n_rows - 1) END AS BIGINT) AS var_den",
        f"CAST(FLOOR(n_rows * sqrt({var_raw}) * 1000000 + 0.5)"
        " AS BIGINT) AS u_weight",
    )
    tot = w.agg(
        F.sum("u_weight").cast("long").alias("uu"),
        F.sum("n_rows").cast("long").alias("nn"),
    )
    # zero-total-variance corpora degrade to PROPORTIONAL allocation
    # (u = N_h) rather than allocating nothing — expressed in-frame so
    # the branch is data-deterministic and oracle-replayable
    alloc = w.crossJoin(F.broadcast(tot)).selectExpr(
        "stratum",
        "n_rows",
        "var_num",
        "var_den",
        "u_weight",
        "CASE WHEN uu = 0 THEN n_rows ELSE u_weight END AS ue",
        "CASE WHEN uu = 0 THEN nn ELSE uu END AS utot",
    ).selectExpr(
        "stratum",
        "n_rows",
        "var_num",
        "var_den",
        "u_weight",
        # integer division / modulo: engine-identical by construction
        f"CAST({budget} * ue AS BIGINT) DIV utot AS alloc_base",
        f"CAST({budget} * ue AS BIGINT) % utot AS remainder",
    )
    wsum = Window.partitionBy()
    wrk = Window.orderBy(F.desc("remainder"), F.asc("stratum"))
    return (
        alloc.withColumn(
            "extra", F.lit(budget) - F.sum("alloc_base").over(wsum)
        )
        .withColumn("rk", F.row_number().over(wrk).cast("long"))
        .selectExpr(
            "stratum",
            "n_rows",
            "var_num",
            "var_den",
            "u_weight",
            "alloc_base",
            "remainder",
            "CAST(alloc_base + CASE WHEN rk <= extra THEN 1 ELSE 0 END"
            " AS BIGINT) AS n_alloc",
        )
        .orderBy("stratum")
    )
