"""Round-12 analytics batch: BH-FDR battery properties."""

from __future__ import annotations

import math

import pytest

from metadata_ingestion_poc_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bh_rows(spark):
    return QUERIES["q291_bh_fdr"](spark, SF).collect()


def test_bh_recovers_planted_discoveries(bh_rows):
    # The query plants a +600-char length shift on exactly three
    # sources; BH at alpha=0.05 over the 19-test battery must discover
    # exactly those (verified to hold at sf0.001/0.01/0.1 — the
    # vs-reference design keeps the discovery set scale-stable).
    got = sorted(r.source for r in bh_rows if r.rejected)
    assert got == ["src15", "src3", "src7"], got


def test_bh_stepup_matches_reference_procedure(bh_rows):
    # Re-run the BH step-up procedure from scratch in python on the
    # emitted p-values: k* = max{i : p_(i) <= i*alpha/m}, reject
    # ranks 1..k*. The query's rejected column must agree row-for-row.
    m = len(bh_rows)
    by_rank = sorted(bh_rows, key=lambda r: r.p_rank)
    assert [r.p_rank for r in by_rank] == list(range(1, m + 1))
    k_star = 0
    for r in by_rank:
        if r.p6 <= r.p_rank * 0.05 / m + 1e-12:
            k_star = r.p_rank
    for r in by_rank:
        assert r.rejected == (r.p_rank <= k_star), (r.source, r.p_rank)


def test_bh_rejections_are_rank_prefix(bh_rows):
    # step-up rejections are a PREFIX of the p-value order, never a
    # scattered subset (the property naive per-test thresholding lacks)
    ranks = sorted(r.p_rank for r in bh_rows if r.rejected)
    assert ranks == list(range(1, len(ranks) + 1))


def test_bh_ks_and_p_are_consistent(bh_rows):
    # D = K/(n1*n2) and p = min(1, round(2*exp(-2K^2/((n1+n2)n1n2)),6))
    # must reproduce from the emitted integers exactly.
    # recover n2 from any row: ks_d = ks_k/(n1*n2)
    r0 = bh_rows[0]
    n2 = round(r0.ks_k / (r0.ks_d * r0.n_docs))
    for r in bh_rows:
        assert r.ks_d == r.ks_k / (r.n_docs * n2)
        arg = -2.0 * r.ks_k * r.ks_k / ((r.n_docs + n2) * r.n_docs * n2)
        p = min(1.0, round(2.0 * math.exp(arg), 6))
        assert abs(p - r.p6) < 2e-6, (r.source, p, r.p6)


def test_huber_recovers_planted_line(spark):
    # iteration 0 is contaminated OLS; the final Huber fit must land
    # near the planted (100, 12) line while OLS is pulled away by the
    # +5000 outlier shocks.
    rows = sorted(
        QUERIES["q294_huber_irls"](spark, SF).collect(),
        key=lambda r: r.iter,
    )
    ols, hub = rows[0], rows[-1]
    assert ols.n_down == 0  # all-ones weights at the OLS solve
    assert hub.n_down > 0   # outliers really got downweighted
    assert abs(hub.b0 - 100.0) < abs(ols.b0 - 100.0) / 3
    assert abs(hub.b1 - 12.0) < 0.5
    assert abs(ols.b0 - 100.0) > 100.0  # the contamination is real


def test_voptimal_dp_matches_exhaustive_enumeration():
    # On a small grid the DP must equal brute force over ALL C(n-1,B-1)
    # boundary placements — total SSE AND the chosen boundaries
    # (ties to the lexicographically smallest split vector).
    from decimal import Decimal
    from itertools import combinations

    from metadata_ingestion_poc_spark.operators.histogram import (
        _sse6,
        voptimal_from_grid,
    )

    grid = [(i, f) for i, f in enumerate(
        [3, 50, 52, 49, 7, 6, 100, 98, 5, 4, 51, 2], start=10
    )]
    n, B = len(grid), 4
    P = [0] * (n + 1)
    Q = [0] * (n + 1)
    for j, (_, f) in enumerate(grid, start=1):
        P[j] = P[j - 1] + f
        Q[j] = Q[j - 1] + f * f

    def sse(i, j):
        return _sse6(Q[j] - Q[i - 1], P[j] - P[i - 1], j - i + 1)

    best = None
    for cuts in combinations(range(1, n), B - 1):
        bounds = [0, *cuts, n]
        total = sum(
            (sse(bounds[b] + 1, bounds[b + 1]) for b in range(B)),
            Decimal(0),
        )
        cand = (total, cuts)
        if best is None or cand < best:
            best = cand
    got = voptimal_from_grid(grid, B)
    got_total = sum(Decimal(repr(r[5])) for r in got)
    assert got_total == best[0]
    # reconstruct the DP's cut cells from the bucket cell counts
    cells, cuts = 0, []
    for r in got[:-1]:
        cells += r[3]
        cuts.append(cells)
    assert tuple(cuts) == best[1]


def test_voptimal_validation():
    from metadata_ingestion_poc_spark.operators.histogram import (
        voptimal_from_grid,
    )

    with pytest.raises(ValueError, match=">= 1"):
        voptimal_from_grid([(1, 2), (2, 3)], 0)
    with pytest.raises(ValueError, match="non-empty"):
        voptimal_from_grid([(1, 2)], 2)
    with pytest.raises(ValueError, match="sorted"):
        voptimal_from_grid([(2, 1), (1, 1)], 1)


def test_voptimal_grid_cap_fails_loudly(spark):
    # the bounded-grid contract is ENFORCED (round 13): an
    # over-cardinality expression must raise before the driver-side
    # collect, not OOM it
    from metadata_ingestion_poc_spark.operators.histogram import (
        voptimal_histogram,
    )

    df = spark.range(500).selectExpr("id AS v")
    with pytest.raises(ValueError, match="not a bounded grid"):
        voptimal_histogram(df, "v", 3, max_grid_cells=100)
    # at-or-below the cap runs fine
    out = voptimal_histogram(df, "v", 3, max_grid_cells=500).collect()
    assert len(out) == 3


def test_ams_f2_accuracy_under_skew(spark):
    # The planted heavy key concentrates F2, which is the regime the
    # estimator is accurate in BY THEORY (variance 2(F2^2-F4)/F2^2
    # collapses as one key dominates). Deterministic signs — the
    # measured error reproduces exactly.
    rows = QUERIES["q296_ams_f2"](spark, SF).collect()
    assert len(rows) == 4
    est, exact = rows[0].est_f2, rows[0].exact_f2
    assert all(r.est_f2 == est and r.exact_f2 == exact for r in rows)
    assert abs(est - exact) / exact < 0.15
    # per-group sums reconstruct the median-of-means exactly
    gs = sorted(r.sum_e for r in rows)
    assert est == (gs[1] + gs[2]) / 16.0


def test_ams_f2_validation(spark):
    from metadata_ingestion_poc_spark.operators.sketches import ams_f2

    li = spark.createDataFrame([(1,)], "l_orderkey long")
    with pytest.raises(ValueError, match="divisible"):
        ams_f2(li, "l_orderkey", reps=10, groups=4)
    # one md5 supplies exactly 32 sign nibbles: reps>32 would read
    # past the digest and silently NULL every extra sign
    with pytest.raises(ValueError, match=r"\[1, 32\]"):
        ams_f2(li, "l_orderkey", reps=64, groups=4)
    with pytest.raises(ValueError, match=r"\[1, 32\]"):
        ams_f2(li, "l_orderkey", reps=0, groups=1)
    # empty input: sign sums COALESCE to 0, F2 estimate 0, no crash
    empty = li.filter("l_orderkey < 0")
    rows = ams_f2(empty, "l_orderkey", reps=8, groups=4).collect()
    assert [r.sum_e for r in rows] == [0, 0, 0, 0]
    assert rows[0].est_f2 == 0.0 and rows[0].exact_f2 == 0


def test_theil_sen_recovers_planted_line(spark):
    # q301: per-cell medians kill the +5000 shocks (1/13 < 50% per
    # cell) and the grid noise has median 0, so the cell medians sit
    # EXACTLY on the planted line — Theil-Sen returns it exactly,
    # while raw-row OLS carries the shock into its intercept.
    rows = {r.stat: r.value for r in QUERIES["q301_theil_sen"](spark, SF).collect()}
    assert rows["slope_ts"] == 12.0
    # small cells at sf0.001 can put a median half a noise-grid step
    # off the line (100.5 measured); at sf0.01 it is exactly 100.0
    assert abs(rows["intercept_ts"] - 100.0) <= 1.0
    assert rows["intercept_ols"] > 400  # ~+5000/13 contamination
    assert abs(rows["slope_ols"] - 12.0) < 1.0
    assert rows["n_cells"] == 50.0
    assert rows["n_pairs"] == 1225.0


def test_theil_sen_breaks_down_gracefully(spark):
    # a constant-y corpus has zero slopes everywhere: slope 0,
    # intercept = the constant
    from metadata_ingestion_poc_spark.operators.robust import (
        theil_sen_gridded,
    )

    df = spark.createDataFrame(
        [(x, 7) for x in range(1, 6) for _ in range(3)],
        "l_quantity int, yv int",
    )
    rows = {r.stat: r.value for r in theil_sen_gridded(df, "l_quantity", "yv").collect()}
    assert rows["slope_ts"] == 0.0
    assert rows["intercept_ts"] == 7.0
    assert rows["n_cells"] == 5.0 and rows["n_pairs"] == 10.0


def test_ams_join_size_accuracy_under_skew(spark):
    # AGMS inner product: the planted heavy key (every 10th orderkey
    # collapsed to 0) dominates Σ fA·fB, which is the regime the
    # estimator is tight in by theory (same variance collapse as F2).
    rows = QUERIES["q300_ams_join_size"](spark, SF).collect()
    assert len(rows) == 4 and [r.g for r in rows] == [0, 1, 2, 3]
    est, exact = rows[0].est_join_size, rows[0].exact_join_size
    assert all(
        (r.est_join_size, r.exact_join_size) == (est, exact)
        for r in rows
    )
    assert exact > 0
    assert abs(est - exact) / exact < 0.15
    # the estimate IS the median-of-means of the emitted group sums
    gs = sorted(r.sum_e for r in rows)
    assert est == (gs[1] + gs[2]) / 16.0


def test_ams_join_size_validation(spark):
    from metadata_ingestion_poc_spark.operators.sketches import (
        ams_join_size,
    )

    a = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="divisible"):
        ams_join_size(a, "k", a, "k", reps=10, groups=4)
    with pytest.raises(ValueError, match=r"\[1, 32\]"):
        ams_join_size(a, "k", a, "k", reps=40, groups=4)
    # empty side: inner product estimate is exactly 0, exact join 0
    rows = ams_join_size(
        a.filter("k < 0"), "k", a, "k", reps=8, groups=4
    ).collect()
    assert rows[0].est_join_size == 0.0
    assert rows[0].exact_join_size == 0


def test_ams_audit_false_is_join_free(spark):
    """audit=False is the production mode: the estimate must come
    from the two independent map-combined scans ONLY — no key rollup,
    no join anywhere in the plan — and must equal the audited run's
    estimate bit-for-bit."""
    from metadata_ingestion_poc_spark.catalog import load_table
    from metadata_ingestion_poc_spark.operators.sketches import (
        ams_f2,
        ams_join_size,
    )

    from pyspark.sql import DataFrame as _DF

    li = load_table(spark, SF, "lineitem").select("l_orderkey")
    od = load_table(spark, SF, "orders").select("o_orderkey")
    # prove structurally that the production path builds NO join and
    # NO key-grouped rollup: fail loud if either API is touched
    real_join, real_group = _DF.join, _DF.groupBy

    def _no_join(self, *a, **k):
        raise AssertionError("audit=False must not join")

    def _no_group(self, *a, **k):
        raise AssertionError("audit=False must not groupBy a key")

    _DF.join, _DF.groupBy = _no_join, _no_group
    try:
        lean = ams_join_size(
            li, "l_orderkey", od, "o_orderkey", audit=False
        )
        lean_rows = lean.collect()
        lf2 = ams_f2(li, "l_orderkey", audit=False)
        lf2_rows = lf2.collect()
    finally:
        _DF.join, _DF.groupBy = real_join, real_group
    assert lean.columns == ["g", "sum_e", "est_join_size"]
    assert lf2.columns == ["g", "sum_e", "est_f2"]
    # and the lean estimate equals the audited twin's bit-for-bit
    full = ams_join_size(li, "l_orderkey", od, "o_orderkey")
    assert [r.est_join_size for r in lean_rows] == [
        r.est_join_size for r in full.collect()
    ]
    assert (
        lf2_rows[0].est_f2
        == ams_f2(li, "l_orderkey").collect()[0].est_f2
    )


def test_neyman_allocation_properties(spark):
    import numpy as np

    rows = QUERIES["q297_neyman_allocation"](spark, SF).collect()
    # the budget is honored exactly after largest-remainder top-up
    assert sum(r.n_alloc for r in rows) == 300
    # allocation tracks N_h * S_h: the stratum with the largest
    # micro-weight never gets less than the one with the smallest
    by_w = sorted(rows, key=lambda r: r.u_weight)
    assert by_w[-1].n_alloc >= by_w[0].n_alloc
    # base/remainder reconstruct the integer quota arithmetic
    utot = sum(r.u_weight for r in rows)
    for r in rows:
        assert r.alloc_base == (300 * r.u_weight) // utot
        assert r.remainder == (300 * r.u_weight) % utot
    # the exact rational (var_num, var_den) IS the sample variance:
    # integer recompute from scratch, zero tolerance
    from metadata_ingestion_poc_spark.catalog import load_table

    docs = load_table(spark, SF, "documents").collect()
    import collections

    lens = collections.defaultdict(list)
    for d in docs:
        lens[d.source].append(len(d.text))
    for r in rows:
        xs = lens[r.stratum]
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        assert r.var_num == n * sxx - sx * sx, r.stratum
        assert r.var_den == n * (n - 1), r.stratum
        # and it agrees with numpy's ddof=1 variance
        v = np.var(xs, ddof=1)
        assert abs(r.var_num / r.var_den - float(v)) < 1e-6, r.stratum


def test_neyman_zero_variance_falls_back_proportional(spark):
    from metadata_ingestion_poc_spark.operators.sampling import (
        neyman_allocation,
    )

    df = spark.createDataFrame(
        [("a", 7)] * 30 + [("b", 7)] * 10, "s string, x int"
    )
    rows = neyman_allocation(df, "s", "x", 4).collect()
    got = {r.stratum: r.n_alloc for r in rows}
    assert sum(got.values()) == 4
    assert got["a"] == 3 and got["b"] == 1  # proportional 30:10
