"""Property-based checks (hypothesis) for the engine's algebraic
invariants: decimal-sum partition independence, dedup idempotence,
top-k containment, as-of ordering.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from metadata_ingestion_poc_spark.functions.determinism import DEC
from metadata_ingestion_poc_spark.operators.dedup import exact_dedup

_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(_floats, min_size=1, max_size=60), parts=st.integers(1, 7))
@_settings
def test_decimal_sum_is_partition_independent(spark, vals, parts):
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    a = df.coalesce(1).agg(F.sum(F.col("x").cast(DEC)).alias("s")).first().s
    b = df.repartition(parts).agg(F.sum(F.col("x").cast(DEC)).alias("s")).first().s
    assert a == b


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=50
    )
)
@_settings
def test_exact_dedup_idempotent_and_minimal(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v"])
    d1 = exact_dedup(df, ["k"], ["v"])
    d2 = exact_dedup(d1, ["k"], ["v"])
    got = sorted(map(tuple, d1.collect()))
    assert got == sorted(map(tuple, d2.collect()))
    # winner per key is the minimum v (order_cols order)
    expect = {}
    for k, v in rows:
        expect[k] = min(v, expect.get(k, v))
    assert got == sorted(expect.items())


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],
    ),
    k=st.integers(1, 5),
)
@_settings
def test_topk_per_group_contained_and_sized(spark, rows, k):
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, ["g", "v"])
    w = Window.partitionBy("g").orderBy(F.desc("v"))
    top = (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "v")
    )
    got = {tuple(r) for r in top.collect()}
    src = {tuple(r) for r in df.collect()}
    assert got <= src
    by_g: dict[int, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        want = set(sorted(vs, reverse=True)[:k])
        assert {v for gg, v in got if gg == g} == want


@given(texts=st.lists(st.text(max_size=40), min_size=1, max_size=20))
@_settings
def test_normalize_text_idempotent_and_clean(spark, texts):
    from metadata_ingestion_poc_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    once = normalize_text(df).select(
        "doc_id", F.col("norm_text").alias("text")
    )
    twice = {
        r.doc_id: r.norm_text for r in normalize_text(once).collect()
    }
    first = {
        r.doc_id: (r.norm_text, r.norm_tokens)
        for r in normalize_text(df).collect()
    }
    for i, (norm, ntok) in first.items():
        assert twice[i] == norm  # idempotent
        assert set(norm) <= set("abcdefghijklmnopqrstuvwxyz0123456789 ")
        assert "  " not in norm
        assert norm == norm.strip()
        assert ntok == (len(norm.split(" ")) if norm else 0)


@given(
    vals=st.lists(_floats, min_size=1, max_size=80),
    p=st.sampled_from([0.0, 0.25, 0.5, 0.75, 0.9, 1.0]),
)
@_settings
def test_exact_percentiles_match_builtin_property(spark, vals, p):
    from metadata_ingestion_poc_spark.operators.percentiles import (
        exact_percentiles,
    )

    df = spark.createDataFrame([("g", float(v)) for v in vals], ["g", "v"])
    mine = (
        exact_percentiles(df, ["g"], "v", {"q": p}).first().q
    )
    ref = df.agg(F.percentile("v", F.lit(p)).alias("q")).first().q
    assert abs(mine - ref) <= 1e-9 * max(1.0, abs(ref))


def _ref_spans(token_lists, k, min_span):
    """O(n² · len²) reference for duplicated_spans: maximal equal-token
    runs per alignment diagonal; runs shorter than k are invisible to
    a k-gram index."""
    out = {}
    ids = sorted(token_lists)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = token_lists[a], token_lists[b]
            runs = []
            for off in range(-(len(tb) - 1), len(ta)):
                run = 0
                for i in range(max(0, off), min(len(ta), len(tb) + off)):
                    if ta[i] == tb[i - off]:
                        run += 1
                    else:
                        if run:
                            runs.append(run)
                        run = 0
                if run:
                    runs.append(run)
            visible = [r for r in runs if r >= k]
            if visible and max(visible) >= min_span:
                out[(a, b)] = (
                    max(visible),
                    sum(1 for r in runs if r >= min_span),
                )
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=40),
        min_size=2,
        max_size=4,
    )
)
@_settings
def test_duplicated_spans_matches_bruteforce(spark, docs):
    from metadata_ingestion_poc_spark.operators.spans import (
        duplicated_spans,
    )

    token_lists = {i + 1: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in token_lists.items()],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_a, r.doc_b): (r.longest_span, r.n_spans)
        for r in duplicated_spans(
            df, k=3, min_span=4, max_gram_df=None
        ).collect()
    }
    assert got == _ref_spans(token_lists, k=3, min_span=4)


@given(
    a=st.lists(st.integers(0, 500), min_size=0, max_size=40),
    b=st.lists(st.integers(0, 500), min_size=0, max_size=40),
    probe=st.lists(st.integers(0, 500), min_size=1, max_size=20),
)
@_settings
def test_bloom_merge_union_and_no_false_negatives(spark, a, b, probe):
    """bloom(a ∪ b) == merge(bloom(a), bloom(b)) bit-for-bit, and a
    probe of any built key always survives the prune."""
    from metadata_ingestion_poc_spark.operators.bloom import (
        bloom_build,
        bloom_merge,
        bloom_prune,
    )

    da = spark.createDataFrame([(int(v),) for v in a] or [(None,)], "k: bigint")
    db = spark.createDataFrame([(int(v),) for v in b] or [(None,)], "k: bigint")
    kw = dict(num_bits=1 << 10, num_hashes=3)
    whole = bloom_build(da.union(db), "k", **kw).collect()[0]["words"]
    merged = bloom_merge(
        bloom_build(da, "k", **kw), bloom_build(db, "k", **kw)
    ).collect()[0]["words"]
    assert list(whole) == list(merged)

    built = set(a) | set(b)
    dp = spark.createDataFrame([(int(v),) for v in probe], "k: bigint")
    kept = {
        r["k"]
        for r in bloom_prune(
            dp, bloom_build(da.union(db), "k", **kw), "k"
        ).collect()
    }
    assert (set(probe) & built) <= kept


@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    threshold=st.integers(1, 6),
)
@_settings
def test_cms_screen_two_pass_equals_exact(spark, vals, threshold):
    """Screen + exact == plain groupBy-HAVING, for any data and any
    threshold (the no-false-negative superset property)."""
    from collections import Counter

    from metadata_ingestion_poc_spark.operators.sketches import (
        cms_build,
        cms_screen,
    )

    df = spark.createDataFrame([(int(v),) for v in vals], "k: bigint")
    sk = cms_build(df, "k", width=256, depth=3)
    got = sorted(
        (r["k"], r["n"])
        for r in cms_screen(df, "k", sk, threshold)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= threshold)
        .collect()
    )
    want = sorted(
        (k, n) for k, n in Counter(vals).items() if n >= threshold
    )
    assert got == want


# --- round-11 training-fold invariants -------------------------------------


@given(
    counts=st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=6).filter(bool),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
    rounds=st.integers(1, 3),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bpe_train_equals_reference_on_random_vocab(spark, counts, rounds):
    """The distributed replace-chain BPE must equal greedy Python BPE
    on arbitrary small vocabularies (adversarial overlapping runs like
    'aaaa' are well inside this strategy's reach)."""
    from metadata_ingestion_poc_spark.operators.bpe import bpe_train
    from tests.test_bpe import _py_bpe

    rows = [(f"{w} " * c,) for w, c in counts.items()]
    df = spark.createDataFrame(rows, "text string")
    assert bpe_train(df, "text", rounds=rounds) == _py_bpe(counts, rounds)


@given(
    ys=st.lists(
        st.decimals(
            min_value=-10000, max_value=10000, places=2,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=25,
    ),
    alpha=st.sampled_from([0.2, 0.3, 0.5, 0.8]),
    beta=st.sampled_from([0.05, 0.1, 0.4]),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_holt_fold_equals_reference_on_random_series(spark, ys, alpha, beta):
    """The codegen Holt fold must replay the exact-decimal reference
    recursion for arbitrary 2-dp series and any 6-dp smoothing
    coefficients."""
    from decimal import Decimal

    from metadata_ingestion_poc_spark.operators.forecast import holt_linear
    from tests.test_forecast import _py_holt

    rows = [("g", i, Decimal(y)) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "g string, t int, y decimal(20,6)")
    got = holt_linear(df, "g", "t", "y", alpha=alpha, beta=beta).first()
    lvl, tr, sae = _py_holt([str(y) for y in ys], alpha, beta)
    assert Decimal(str(got["level"])) == lvl
    assert Decimal(str(got["trend"])) == tr
    if len(ys) > 1:
        assert abs(got["mae"] - float(sae) / (len(ys) - 1)) < 1e-9


# --- round-12 driver-side math (pure python — no Spark fixture) -----------


@given(
    freqs=st.lists(st.integers(1, 200), min_size=4, max_size=9),
    buckets=st.integers(2, 4),
)
@settings(max_examples=40, deadline=None)
def test_voptimal_dp_equals_exhaustive(freqs, buckets):
    from decimal import Decimal
    from itertools import combinations

    from metadata_ingestion_poc_spark.operators.histogram import (
        _sse6,
        voptimal_from_grid,
    )

    n = len(freqs)
    if n < buckets:
        return
    grid = list(enumerate(freqs))
    P = [0] * (n + 1)
    Q = [0] * (n + 1)
    for j, f in enumerate(freqs, start=1):
        P[j] = P[j - 1] + f
        Q[j] = Q[j - 1] + f * f

    def sse(i, j):
        return _sse6(Q[j] - Q[i - 1], P[j] - P[i - 1], j - i + 1)

    best = min(
        sum(
            (
                sse(b[k] + 1, b[k + 1])
                for k in range(buckets)
            ),
            Decimal(0),
        )
        for cuts in combinations(range(1, n), buckets - 1)
        for b in [[0, *cuts, n]]
    )
    got = voptimal_from_grid(grid, buckets)
    assert sum(Decimal(repr(r[5])) for r in got) == best
    # buckets tile the grid exactly
    assert sum(r[3] for r in got) == n
    assert sum(r[4] for r in got) == sum(freqs)


@given(
    eigs=st.lists(
        st.floats(min_value=1e-6, max_value=1e6, allow_nan=False),
        min_size=4,
        max_size=16,
    ),
    m=st.integers(2, 4),
)
@settings(max_examples=40, deadline=None)
def test_eig_allocation_is_full_partition(eigs, m):
    from metadata_ingestion_poc_spark.operators.opq import _allocate_eigs

    if len(eigs) % m:
        return
    dsub = len(eigs) // m
    buckets = _allocate_eigs(eigs, m, dsub)
    assert all(len(b) == dsub for b in buckets)
    assert sorted(i for b in buckets for i in b) == list(range(len(eigs)))


@given(
    vals=st.lists(st.text(min_size=0, max_size=8), min_size=1, max_size=80),
    split=st.integers(0, 80),
    k=st.integers(1, 12),
)
@settings(max_examples=40, deadline=None)
def test_kmv_merge_equals_whole(vals, split, k):
    # bottom-k(bottom-k(A) ∪ hashes(B)) == bottom-k(A ∪ B) — the
    # mergeability that makes the streaming operator exact
    from metadata_ingestion_poc_spark.streaming.sketches import _hash48

    split = min(split, len(vals))
    a, b = vals[:split], vals[split:]
    bk = lambda hs: sorted(hs)[:k]
    merged = bk(set(bk({_hash48(v) for v in a})) | {_hash48(v) for v in b})
    whole = bk({_hash48(v) for v in vals})
    assert merged == whole


@given(
    strata=st.lists(
        st.tuples(st.integers(1, 500), st.integers(0, 10_000_000)),
        min_size=1,
        max_size=12,
    ),
    budget=st.integers(0, 1000),
)
@settings(max_examples=40, deadline=None)
def test_largest_remainder_is_exact_and_fair(strata, budget):
    # reference implementation of the q297 integer quota arithmetic:
    # the top-up always lands the budget exactly, and no stratum is
    # more than 1 away from its real-valued quota (the classic
    # largest-remainder guarantee)
    U = sum(u for _, u in strata)
    if U == 0:
        return
    base = [(budget * u) // U for _, u in strata]
    rem = [(budget * u) % U for _, u in strata]
    extra = budget - sum(base)
    order = sorted(range(len(strata)), key=lambda i: (-rem[i], i))
    alloc = list(base)
    for i in order[:extra]:
        alloc[i] += 1
    assert sum(alloc) == budget
    for (n_h, u), a in zip(strata, alloc):
        quota = budget * u / U
        assert quota - 1 < a < quota + 1


@given(
    baskets=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from("ABCDE")),
        min_size=2,
        max_size=40,
    )
)
@_settings
def test_basket_lift_matches_bruteforce(spark, baskets):
    from metadata_ingestion_poc_spark.operators.basket import pair_lift

    df = spark.createDataFrame(baskets, "basket int, item string")
    got = {
        (r.item_a, r.item_b): r
        for r in pair_lift(df, "basket", "item").collect()
    }
    # brute-force reference on presence sets
    sets: dict[int, set] = {}
    for b, it in baskets:
        sets.setdefault(b, set()).add(it)
    n = len(sets)
    item_n: dict[str, int] = {}
    pair_n: dict[tuple, int] = {}
    for s in sets.values():
        for it in s:
            item_n[it] = item_n.get(it, 0) + 1
        for a in s:
            for b2 in s:
                if a < b2:
                    pair_n[(a, b2)] = pair_n.get((a, b2), 0) + 1
    assert set(got) == set(pair_n)
    for p, c in pair_n.items():
        r = got[p]
        assert (r.n_pair, r.n_a, r.n_b, r.n_baskets) == (
            c, item_n[p[0]], item_n[p[1]], n,
        )
        assert r.support == c / n
        assert r.confidence == c / item_n[p[0]]
        assert r.lift == (c * n) / (item_n[p[0]] * item_n[p[1]])


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 6), st.integers(-50, 50)),
        min_size=4,
        max_size=60,
    )
)
@_settings
def test_theil_sen_gridded_matches_reference(spark, rows):
    import statistics

    from metadata_ingestion_poc_spark.operators.robust import (
        theil_sen_gridded,
    )

    df = spark.createDataFrame(rows, "xq int, yv long")
    xs = sorted({x for x, _ in rows})
    if len(xs) < 2:
        return  # a single grid cell has no pair slopes
    got = {
        r.stat: r.value
        for r in theil_sen_gridded(df, "xq", "yv").collect()
    }
    med = {
        x: statistics.median([y for xx, y in rows if xx == x]) for x in xs
    }
    slopes = sorted(
        (
            (med[b] - med[a]) / float(b - a),
            a,
            b,
        )
        for i2, a in enumerate(xs)
        for b in xs[i2 + 1:]
    )
    vals = [s for s, _, _ in slopes]
    c = len(vals)
    lo, hi = (c + 1) // 2 - 1, (c + 2) // 2 - 1
    want_slope = (vals[lo] + vals[hi]) / 2.0
    assert got["slope_ts"] == want_slope
    resid = sorted(
        (med[x] - want_slope * float(x), x) for x in xs
    )
    c = len(resid)
    lo, hi = (c + 1) // 2 - 1, (c + 2) // 2 - 1
    want_icpt = (resid[lo][0] + resid[hi][0]) / 2.0
    assert got["intercept_ts"] == want_icpt
    assert got["n_cells"] == float(len(xs))
    assert got["n_pairs"] == float(len(xs) * (len(xs) - 1) // 2)


@given(
    a=st.lists(st.integers(0, 8), min_size=1, max_size=50),
    b=st.lists(st.integers(0, 8), min_size=1, max_size=50),
)
@_settings
def test_ams_join_size_median_of_means_reconstruction(spark, a, b):
    from metadata_ingestion_poc_spark.operators.sketches import (
        ams_join_size,
    )

    dfa = spark.createDataFrame([(k,) for k in a], "k long")
    dfb = spark.createDataFrame([(k,) for k in b], "k long")
    rows = ams_join_size(dfa, "k", dfb, "k", reps=32, groups=4).collect()
    # exact audit equals the brute-force join size
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    want = sum(ca[k] * cb.get(k, 0) for k in ca)
    assert all(r.exact_join_size == want for r in rows)
    # the emitted estimate IS the median of the emitted group means
    gs = sorted(r.sum_e for r in rows)
    assert rows[0].est_join_size == (gs[1] + gs[2]) / 16.0
