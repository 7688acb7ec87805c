"""Mann-Whitney U rank-sum battery (operators/ranktests.py, q303)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def _brute_mwu(a: list[int], b: list[int]):
    """Textbook midrank U in exact integer (doubled) arithmetic."""
    combined = sorted(a + b)
    # doubled midrank per distinct value: 2*(count below) + t + 1
    from collections import Counter

    cnt = Counter(combined)
    below = 0
    dr = {}
    tie3 = 0
    for v in sorted(cnt):
        t = cnt[v]
        dr[v] = 2 * below + t + 1
        tie3 += t**3 - t
        below += t
    r2 = sum(dr[v] for v in a)
    n1, n2 = len(a), len(b)
    u2 = r2 - n1 * (n1 + 1)
    n = n1 + n2
    var = (n1 * n2 / 12.0) * ((n + 1.0) - tie3 / (n * (n - 1.0)))
    z = (u2 - n1 * n2) / (2.0 * var**0.5) if var > 0 else None
    return n1, n2, r2, u2, tie3, z


def test_mwu_matches_brute_force_exactly(spark):
    """Every integer cell (r2, u2, tie3) must equal the textbook
    doubled-midrank computation EXACTLY, and z bit-for-bit (the same
    IEEE chain over the same exact operands)."""
    from metadata_ingestion_poc_spark.operators.ranktests import (
        mann_whitney_battery,
    )

    a = [3, 5, 5, 7, 9, 9, 9, 12]  # candidate group, with ties
    b = [4, 5, 6, 9, 10, 11]  # reference, overlapping ties
    rows = [("cand", v) for v in a] + [("ref", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, v int")
    got = mann_whitney_battery(df, "grp", "v", "ref").collect()
    assert len(got) == 1
    r = got[0]
    n1, n2, r2, u2, tie3, z = _brute_mwu(a, b)
    assert (r.n1, r.n2, r.r2, r.u2, r.tie3) == (n1, n2, r2, u2, tie3)
    assert r.z == z  # bit-identical IEEE chain


def test_mwu_constant_sample_yields_null_z(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        mann_whitney_battery,
    )

    rows = [("cand", 7)] * 5 + [("ref", 7)] * 5
    df = spark.createDataFrame(rows, "grp string, v int")
    r = mann_whitney_battery(df, "grp", "v", "ref").collect()[0]
    # all 10 values tied: tie3 = 10^3-10, zero variance, NULL z
    assert r.tie3 == 990
    assert r.z is None
    # and a symmetric sample: doubled U equals n1*n2 exactly
    assert r.u2 == r.n1 * r.n2


def test_mwu_symmetry_u1_plus_u2(spark):
    """U₁ + U₂ = n1·n2 (doubled: u2_cand + u2_ref = 2·n1·n2) — run
    the battery both directions and check the identity."""
    from metadata_ingestion_poc_spark.operators.ranktests import (
        mann_whitney_battery,
    )

    a = [1, 4, 4, 8, 15, 16]
    b = [2, 3, 4, 10, 23]
    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, v int")
    fwd = mann_whitney_battery(df, "grp", "v", "B").collect()[0]
    rev = mann_whitney_battery(df, "grp", "v", "A").collect()[0]
    assert fwd.u2 + rev.u2 == 2 * len(a) * len(b)
    # z antisymmetric, bit-for-bit (identical chain, negated operand)
    assert fwd.z == pytest.approx(-rev.z, abs=0)


def test_mwu_battery_discovers_planted_shift(spark):
    """q303: the three planted +600-length sources must be BH-rejected
    with |z| far beyond every null source (the q291 discovery design,
    rank-sum flavored)."""
    from metadata_ingestion_poc_spark.queries.analytics9 import (
        _BH_PLANT,
    )

    planted = {s.strip(" '") for s in _BH_PLANT.strip("()").split(",")}
    rows = QUERIES["q303_mann_whitney"](spark, SF).collect()
    assert len(rows) == 19  # 20 sources minus the reference
    by_src = {r.source: r for r in rows}
    rejected = {r.source for r in rows if r.rejected}
    assert planted <= rejected
    # planted shifts dominate: every planted |z| above every null |z|
    null_max = max(
        abs(r.z) for r in rows if r.source not in planted
    )
    for s in planted:
        assert abs(by_src[s].z) > null_max
        assert by_src[s].z > 0  # shift is upward (+600 chars)
        assert by_src[s].p6 == 0.0  # subgaussian bound underflows
    # exact-cell invariants on the real battery
    for r in rows:
        assert r.u2 == r.r2 - r.n_docs * (r.n_docs + 1)
        assert r.tie3 >= 0


def _brute_tau_b(xy: list[tuple[int, int]]):
    """O(n²) textbook tau-b in exact integer arithmetic."""
    n = len(xy)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xy[i][0] - xy[j][0]) * (xy[i][1] - xy[j][1])
            if s > 0:
                conc += 1
            elif s < 0:
                disc += 1
    from collections import Counter

    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in xy).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in xy).values())
    # replay the operator's exact chain: (C−D)/sqrt((n0−n1)·(n0−n2))
    den = float(n0 - n1) * (n0 - n2)
    tau = (float(conc) - disc) / den**0.5 if den > 0 else None
    return n, conc, disc, n0, n1, n2, tau


def test_kendall_matches_brute_force_exactly(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        kendall_tau_b,
    )

    xy = [
        (1, 2), (1, 3), (2, 2), (2, 5), (3, 1),
        (3, 3), (4, 4), (4, 4), (5, 2), (5, 6),
    ]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in xy], "grp string, x int, y int"
    )
    r = kendall_tau_b(df, "grp", "x", "y").collect()[0]
    n, conc, disc, n0, n1, n2, tau = _brute_tau_b(xy)
    assert (r.n, r.conc, r.disc, r.n0, r.n1, r.n2) == (
        n, conc, disc, n0, n1, n2,
    )
    assert r.tau_b == tau  # bit-identical IEEE chain


def test_kendall_perfect_and_antisymmetric(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        kendall_tau_b,
    )

    rows = [("g", i, 2 * i + 1) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "grp string, x int, y int")
    assert kendall_tau_b(df, "grp", "x", "y").collect()[0].tau_b == 1.0
    neg = spark.createDataFrame(
        [("g", x, -y) for _, x, y in rows], "grp string, x int, y int"
    )
    assert kendall_tau_b(neg, "grp", "x", "y").collect()[0].tau_b == -1.0
    # constant y: zero y-variance, tau undefined -> NULL
    const = spark.createDataFrame(
        [("g", x, 7) for _, x, _ in rows], "grp string, x int, y int"
    )
    r = kendall_tau_b(const, "grp", "x", "y").collect()[0]
    assert r.tau_b is None and r.n2 == r.n0


def test_kendall_battery_on_lineitem_grid(spark):
    """q304: 3 return-flag groups, exact pair-count invariants:
    conc + disc + x-ties + y-ties − both-ties = n0 requires the cell
    grid — check the weaker but exact conc+disc ≤ n0 − max(n1,n2) +
    common-tie overlap, and that the registered query returns the
    operator's rows verbatim."""
    rows = QUERIES["q304_kendall_tau"](spark, SF).collect()
    assert [r["group"] for r in rows] == ["A", "N", "R"]
    for r in rows:
        assert r.n0 == r.n * (r.n - 1) // 2
        assert 0 <= r.conc and 0 <= r.disc
        assert r.conc + r.disc <= r.n0 - max(r.n1, r.n2) + min(r.n1, r.n2)
        assert abs(r.tau_b) < 0.1  # qty and disc are independent dials


def _brute_kw(groups: dict):
    """Textbook tie-corrected H with doubled-midrank exact integers,
    replaying the operator's ordered-fold float chain."""
    from collections import Counter

    allv = [v for vs in groups.values() for v in vs]
    cnt = Counter(allv)
    below = 0
    dr = {}
    tie3 = 0
    for v in sorted(cnt):
        t = cnt[v]
        dr[v] = 2 * below + t + 1
        tie3 += t**3 - t
        below += t
    n = len(allv)
    r2 = {g: sum(dr[v] for v in vs) for g, vs in groups.items()}
    s_sum = 0.0
    for g in sorted(groups):  # ordered left fold, 0.0 seed
        s_sum = s_sum + float(r2[g]) * float(r2[g]) / float(len(groups[g]))
    denom = 1.0 - tie3 / (float(n) * n * n - n)
    h = (
        (3.0 * s_sum / (float(n) * (n + 1.0)) - 3.0 * (n + 1.0)) / denom
        if denom > 0
        else None
    )
    return n, tie3, r2, h


def test_kruskal_wallis_matches_brute_force_exactly(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        kruskal_wallis,
    )

    groups = {
        "a": [3, 5, 5, 9, 12],
        "b": [4, 5, 6, 9],
        "c": [1, 9, 9, 15, 15, 20],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, v int")
    got = {r["group"]: r for r in kruskal_wallis(df, "grp", "v").collect()}
    n, tie3, r2, h = _brute_kw(groups)
    assert set(got) == set(groups)
    for g in groups:
        assert got[g].n_j == len(groups[g])
        assert got[g].r2_j == r2[g]
        assert got[g].n == n and got[g].tie3 == tie3
        assert got[g].h == h  # bit-identical ordered-fold chain
    # rank-sum conservation: Σ r2_j = 2·(1+2+...+n) = n(n+1)
    assert sum(r.r2_j for r in got.values()) == n * (n + 1)


def test_kruskal_wallis_all_tied_yields_null(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        kruskal_wallis,
    )

    df = spark.createDataFrame(
        [("a", 7)] * 3 + [("b", 7)] * 4, "grp string, v int"
    )
    r = kruskal_wallis(df, "grp", "v").collect()[0]
    assert r.tie3 == 7**3 - 7
    assert r.h is None


def test_kruskal_wallis_rejects_planted_shift(spark):
    """q305: the 3-source planted +600 shift must push H far past any
    homogeneity threshold (chi2_{19} at alpha=0.001 is ~43.8)."""
    rows = QUERIES["q305_kruskal_wallis"](spark, SF).collect()
    assert len(rows) == 20
    h = rows[0].h
    assert all(r.h == h for r in rows)  # one global statistic
    assert h > 100
    # exact conservation over the combined sample
    n = rows[0].n
    assert sum(r.r2_j for r in rows) == n * (n + 1)
    assert sum(r.n_j for r in rows) == n


def _brute_wsr(deltas):
    """Textbook tie-corrected signed-rank with doubled midranks,
    replaying the operator's exact-integer arithmetic."""
    from collections import Counter

    nz = [d for d in deltas if d != 0]
    cnt = Counter(abs(d) for d in nz)
    below = 0
    dr = {}
    tie3 = 0
    for a in sorted(cnt):
        t = cnt[a]
        dr[a] = 2 * below + t + 1
        tie3 += t**3 - t
        below += t
    n = len(nz)
    w2 = sum(dr[abs(d)] for d in nz if d > 0)
    var2 = n * (n + 1.0) * (2.0 * n + 1.0) / 6.0 - tie3 / 12.0
    z = (w2 - n * (n + 1.0) / 2.0) / var2**0.5 if var2 > 0 else None
    return n, len(deltas) - n, w2, tie3, z


def test_wilcoxon_signed_rank_matches_brute_force_exactly(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        wilcoxon_signed_rank,
    )

    # ties across signs (|−3| ties |3|), zeros dropped, tied |5|s
    groups = {
        "a": [3, -3, 5, 5, -5, 9, 0, -12, 7],
        "b": [1, 2, 3, 4, 0, 0],
        "c": [-1, -2, -8],
    }
    rows = [(g, d) for g, ds in groups.items() for d in ds]
    df = spark.createDataFrame(rows, "grp string, d long")
    got = {
        r["group"]: r
        for r in wilcoxon_signed_rank(df, "grp", "d").collect()
    }
    assert set(got) == set(groups)
    for g, ds in groups.items():
        n, n_zero, w2, tie3, z = _brute_wsr(ds)
        assert got[g].n == n and got[g].n_zero == n_zero
        assert got[g].w2 == w2 and got[g].tie3 == tie3
        if z is None:
            assert got[g].z is None
        else:
            assert got[g].z == z  # bit-identical fixed chain
    # all-negative group: w2 = 0, z well below 0
    assert got["c"].w2 == 0 and got["c"].z < 0


def test_wilcoxon_signed_rank_all_zero_group(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        wilcoxon_signed_rank,
    )

    df = spark.createDataFrame(
        [("a", 0)] * 4 + [("b", 2), ("b", -1)], "grp string, d long"
    )
    got = {
        r["group"]: r
        for r in wilcoxon_signed_rank(df, "grp", "d").collect()
    }
    assert got["a"].n == 0 and got["a"].n_zero == 4
    assert got["a"].w2 == 0 and got["a"].z is None
    assert got["b"].n == 2 and got["b"].n_zero == 0


def test_wilcoxon_rejects_planted_paired_shift(spark):
    """q306: the +$1M planted shift on two segments must reject
    decisively; unplanted segments stay near zero."""
    rows = QUERIES["q306_wilcoxon_signed_rank"](spark, SF).collect()
    assert len(rows) == 5
    by = {r["group"]: r for r in rows}
    planted = {"AUTOMOBILE", "MACHINERY"}
    for seg, r in by.items():
        assert r.n > 100  # real paired sample at sf0.01
        # rank-sum bound: 0 <= w2 <= n(2n+1) (all-positive max)
        assert 0 <= r.w2 <= r.n * (2 * r.n + 1)
        if seg in planted:
            assert r.z > 5
        else:
            assert abs(r.z) < 4


def _brute_jt(groups_ordered):
    """Textbook J by direct pair enumeration (ties at half weight ->
    doubled j2 exact int), Hollander-Wolfe tie-corrected variance,
    replaying the operator's fixed float chain."""
    import math
    from collections import Counter

    keys = sorted(groups_ordered)
    j2 = 0
    for ii in range(len(keys)):
        for jj in range(ii + 1, len(keys)):
            for a in groups_ordered[keys[ii]]:
                for b in groups_ordered[keys[jj]]:
                    j2 += 2 if a < b else (1 if a == b else 0)
    ns = [len(groups_ordered[k]) for k in keys]
    n = sum(ns)
    mean2 = (n * n - sum(x * x for x in ns)) // 2
    g2 = sum(x * (x - 1) for x in ns)
    g3 = sum(x * (x - 1) * (x - 2) for x in ns)
    g25 = sum(x * (x - 1) * (2 * x + 5) for x in ns)
    tc = Counter(v for vs in groups_ordered.values() for v in vs)
    t2 = sum(t * (t - 1) for t in tc.values())
    t3 = sum(t * (t - 1) * (t - 2) for t in tc.values())
    t25 = sum(t * (t - 1) * (2 * t + 5) for t in tc.values())
    if n > 2:
        var = (
            (float(n) * (n - 1.0) * (2.0 * n + 5.0)
             - float(g25) - float(t25)) / 72.0
            + float(g3) * float(t3)
            / (36.0 * float(n) * (n - 1.0) * (n - 2.0))
            + float(g2) * float(t2) / (8.0 * float(n) * (n - 1.0))
        )
    else:
        var = 0.0
    z = (
        (float(j2) - float(mean2)) / (2.0 * math.sqrt(var))
        if n > 2 and var > 0
        else None
    )
    return dict(
        j2=j2, mean2=mean2, n=n, g2=g2, g3=g3, g25=g25,
        t2=t2, t3=t3, t25=t25, z=z,
    )


def test_jonckheere_matches_brute_force_exactly(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        jonckheere_terpstra,
    )

    groups = {
        1: [3, 5, 5, 9, 1],
        2: [4, 5, 6, 9, 9],
        3: [1, 9, 9, 15, 15, 20],
        4: [7, 7, 21],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "grp int, v int")
    got = {
        r["group"]: r
        for r in jonckheere_terpstra(df, "grp", "v").collect()
    }
    exp = _brute_jt(groups)
    assert set(got) == set(groups)
    for g in groups:
        r = got[g]
        assert r.n_j == len(groups[g])
        for k in (
            "j2", "mean2", "n", "g2", "g3", "g25", "t2", "t3", "t25"
        ):
            assert r[k] == exp[k], k
        assert r.z == exp["z"]  # bit-identical fixed chain


def test_jonckheere_edge_cases(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        jonckheere_terpstra,
    )

    # single group: no pairs, z NULL
    one = spark.createDataFrame(
        [(1, 5), (1, 7), (1, 9)], "grp int, v int"
    )
    r = jonckheere_terpstra(one, "grp", "v").collect()[0]
    assert r.j2 == 0 and r.mean2 == 0 and r.z is None
    # perfectly separated increasing groups: j2 = 2*mean2, z > 0
    sep = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 10), (2, 11), (3, 20), (3, 21)],
        "grp int, v int",
    )
    rows = jonckheere_terpstra(sep, "grp", "v").collect()
    assert rows[0].j2 == 2 * rows[0].mean2
    assert rows[0].z > 2


def test_jonckheere_trend_discovery(spark):
    """q307: the planted +1/year monotone trend must reject; the raw
    (untrended) quantity grid must not."""
    from metadata_ingestion_poc_spark.catalog import load_table
    from metadata_ingestion_poc_spark.operators.ranktests import (
        jonckheere_terpstra,
    )

    rows = QUERIES["q307_jonckheere_trend"](spark, SF).collect()
    assert len(rows) == 7
    z = rows[0].z
    assert all(r.z == z for r in rows)  # one global statistic
    assert z > 10
    # conservation: j2 of trend + j2 of reversed order = 2*mean2
    assert 0 <= rows[0].j2 <= 2 * rows[0].mean2
    # null contrast: raw quantity has no year trend
    raw = load_table(spark, SF, "lineitem").selectExpr(
        "year(l_shipdate) AS yr", "CAST(l_quantity AS INT) AS v"
    )
    r0 = jonckheere_terpstra(raw, "yr", "v").collect()[0]
    assert abs(r0.z) < 4


def _brute_friedman(blocks):
    """Textbook tie-corrected Friedman with doubled midranks; blocks
    = {block: {treatment: value}} (complete design)."""
    trts = sorted(next(iter(blocks.values())))
    r2 = {t: 0 for t in trts}
    a4 = 0
    for vals in blocks.values():
        for t, v in vals.items():
            below = sum(1 for u in vals.values() if u < v)
            ties = sum(1 for u in vals.values() if u == v)
            m2 = 2 * below + ties + 1
            r2[t] += m2
            a4 += m2 * m2
    b = len(blocks)
    k = len(trts)
    c4 = b * k * (k + 1) * (k + 1)
    s4 = sum((r2[t] - b * (k + 1)) ** 2 for t in trts)
    chi = (
        (float(k) - 1.0) * float(s4) / (float(a4) - float(c4))
        if a4 > c4
        else None
    )
    return r2, b, k, a4, c4, s4, chi


def test_friedman_matches_brute_force_exactly(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        friedman,
    )

    # within-block ties in blocks 2 and 4; one fully tied block
    blocks = {
        1: {"x": 10, "y": 20, "z": 30},
        2: {"x": 5, "y": 5, "z": 9},
        3: {"x": 7, "y": 3, "z": 8},
        4: {"x": 4, "y": 4, "z": 4},
        5: {"x": 1, "y": 9, "z": 2},
    }
    rows = [
        (blk, t, v)
        for blk, vals in blocks.items()
        for t, v in vals.items()
    ]
    df = spark.createDataFrame(rows, "blk int, trt string, v long")
    got = {
        r["treatment"]: r
        for r in friedman(df, "blk", "trt", "v").collect()
    }
    r2, b, k, a4, c4, s4, chi = _brute_friedman(blocks)
    assert set(got) == set(r2)
    for t in r2:
        assert got[t].r2_sum == r2[t]
        assert got[t].b == b and got[t].k == k
        assert got[t].a4 == a4 and got[t].c4 == c4
        assert got[t].s4 == s4
        assert got[t].chi2_f == chi  # one exact-over-exact divide
    # doubled-rank conservation per block: sum over all cells
    assert sum(r2.values()) == b * k * (k + 1)


def test_friedman_all_tied_yields_null(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        friedman,
    )

    rows = [(blk, t, 7) for blk in (1, 2) for t in ("x", "y")]
    df = spark.createDataFrame(rows, "blk int, trt string, v long")
    r = friedman(df, "blk", "trt", "v").collect()[0]
    assert r.a4 == r.c4 and r.chi2_f is None


def test_friedman_planted_consistent_winner(spark):
    """q308: the planted revenue boosts pin AUTOMOBILE to the top
    rank and MACHINERY to second in every year block."""
    rows = QUERIES["q308_friedman"](spark, SF).collect()
    assert len(rows) == 5
    by = {r["treatment"]: r for r in rows}
    b, k = by["AUTOMOBILE"].b, by["AUTOMOBILE"].k
    assert by["AUTOMOBILE"].r2_sum == b * 2 * k  # top in all blocks
    assert by["MACHINERY"].r2_sum == b * 2 * (k - 1)
    chi = rows[0].chi2_f
    assert all(r.chi2_f == chi for r in rows)
    assert chi > 9.49  # chi2_{k-1=4} at alpha=0.05
    # conservation over the complete design
    assert sum(r.r2_sum for r in rows) == b * k * (k + 1)


def _brute_mood(cand, ref):
    """Textbook Mood scale statistic with doubled midranks and the
    conditional tie moments, replaying the operator's ordered-fold
    and z chain."""
    import math
    from collections import Counter

    allv = Counter(cand) + Counter(ref)
    n = sum(allv.values())
    below = 0
    m2 = {}
    for v in sorted(allv):
        t = allv[v]
        m2[v] = 2 * below + t + 1
        below += t
    q = {v: (m2[v] - (n + 1)) ** 2 for v in allv}
    t4 = sum(q[v] for v in cand)
    s4 = sum(allv[v] * q[v] for v in allv)
    fsum = 0.0
    for v in sorted(allv):  # ordered left fold, 0.0 seed
        d = float(q[v]) - float(s4) / float(n)
        fsum = fsum + float(allv[v]) * d * d
    n1, n2 = len(cand), len(ref)
    z = (
        (float(t4) - float(n1) * float(s4) / float(n))
        / math.sqrt(
            float(n1) * float(n2) / (float(n) * (n - 1.0)) * fsum
        )
        if n > 1 and fsum > 0
        else None
    )
    return n1, n2, t4, s4, fsum, z


def test_mood_matches_brute_force_exactly(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        mood_scale_battery,
    )

    ref = [5, 6, 6, 7, 8, 9]
    groups = {
        "wide": [1, 2, 6, 13, 15],       # more spread than ref
        "tied": [6, 6, 7, 7],            # heavy cross-sample ties
        "same": [5, 6, 7, 8, 9],
    }
    rows = [("ref", v) for v in ref] + [
        (g, v) for g, vs in groups.items() for v in vs
    ]
    df = spark.createDataFrame(rows, "grp string, v int")
    got = {
        r["group"]: r
        for r in mood_scale_battery(df, "grp", "v", "ref").collect()
    }
    assert set(got) == set(groups)
    for g, vs in groups.items():
        n1, n2, t4, s4, fsum, z = _brute_mood(vs, ref)
        assert got[g].n1 == n1 and got[g].n2 == n2
        assert got[g].t4 == t4 and got[g].s4 == s4
        assert got[g].fsum == fsum  # bit-identical ordered fold
        assert got[g].z == z        # bit-identical fixed chain
    assert got["wide"].z > 1  # spread excess pushes z positive


def test_mood_constant_sample_yields_null(spark):
    from metadata_ingestion_poc_spark.operators.ranktests import (
        mood_scale_battery,
    )

    df = spark.createDataFrame(
        [("ref", 7)] * 3 + [("a", 7)] * 4, "grp string, v int"
    )
    r = mood_scale_battery(df, "grp", "v", "ref").collect()[0]
    assert r.fsum == 0.0 and r.z is None


def test_mood_rejects_planted_scale_inflation(spark):
    """q309: the 3x spread inflation on two event types must reject
    decisively; unplanted types stay near zero (location screens
    would see nothing — the planted center is nearly unchanged)."""
    rows = QUERIES["q309_mood_scale"](spark, SF).collect()
    assert len(rows) == 4
    by = {r["group"]: r for r in rows}
    for gname, r in by.items():
        assert r.n1 > 1900 and r.n2 > 1900
        assert 0 < r.t4 < r.s4  # candidate share of the score total
        if gname in ("error", "purchase"):
            assert r.z > 10
        else:
            assert abs(r.z) < 4
