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

Cross-engine exactness (the q276/q291 discipline): the variance is
ONE division of exact integer operands (N·Σx² − (Σx)²)/(N·(N−1));
sqrt is correctly rounded IEEE on both engines; the weight chain
N_h·sqrt(var) is pinned to an INTEGER micro-weight
u_h = FLOOR(N_h·S_h·10⁶ + 0.5) (the FLOOR(+0.5) grid rule), after
which EVERYTHING is integer: base_h = (n·u_h) DIV U and
remainder_h = (n·u_h) MOD U with U = Σu_h, and the largest-remainder
top-up ranks exact integers with a stratum tie-break — so the final
allocation, not just the weights, is engine-identical.
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
    """(stratum, n_rows, var6, u_weight, alloc_base, remainder,
    n_alloc): Neyman-optimal integer allocation of ``budget`` samples
    across strata by largest-remainder rounding.

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
    var6 = (
        "CASE WHEN n_rows < 2 THEN CAST(0.0 AS DOUBLE) ELSE "
        "round(CAST(n_rows * sxx - sx * sx AS DOUBLE)"
        " / CAST(n_rows * (n_rows - 1) AS DOUBLE), 6) END"
    )
    w = m.selectExpr(
        "stratum",
        "n_rows",
        f"{var6} AS var6",
        f"CAST(FLOOR(n_rows * sqrt({var6}) * 1000000 + 0.5)"
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
        "var6",
        "u_weight",
        "CASE WHEN uu = 0 THEN n_rows ELSE u_weight END AS ue",
        "CASE WHEN uu = 0 THEN nn ELSE uu END AS utot",
    ).selectExpr(
        "stratum",
        "n_rows",
        "var6",
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
            "var6",
            "u_weight",
            "alloc_base",
            "remainder",
            "CAST(alloc_base + CASE WHEN rk <= extra THEN 1 ELSE 0 END"
            " AS BIGINT) AS n_alloc",
        )
        .orderBy("stratum")
    )
