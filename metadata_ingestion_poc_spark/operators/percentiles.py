"""Distributed exact percentiles (rank-based, shuffle-only).

Spark's built-in ``percentile`` is an ObjectHashAggregate whose buffer
holds EVERY (value → count) of a group on one executor — at 100 TB a
single hot group OOMs, and even locally the per-group merge is a
single-threaded sort. This operator computes the same continuous
percentile (SQL ``percentile_cont`` interpolation, identical to
Spark's and DuckDB's) out of distributed primitives only:

1. ``groupBy(group, value).count()``            — one shuffle, combiner
2. running rank per group via a value-ordered window — one shuffle
3. per-group totals + the tiny (group × percentile) target frame
4. broadcast range-join: target rank → covering value row
5. linear interpolation between the two covering values

No state ever exceeds one (group, distinct-value) row; every stage is
a plain shuffle Catalyst/AQE can plan. Cost: two shuffles of the
distinct-value table instead of one object-agg — strictly better
whenever values-per-group is large (the case that matters).

Scale bound, stated honestly: the running-rank window sorts each
group's DISTINCT (value, count) rows in one task. Raw row count per
group is irrelevant (the first aggregate collapses duplicates), so
the limit is distinct-value cardinality per group — fine for priced /
binned / integer domains at any corpus size. For a truly continuous
column whose distincts ≈ rows, ``exact_percentile_iterative`` below
is the scale path: histogram-descent selection, O(log_bins n) scan
aggregates, constant driver memory, no sort anywhere. The object-agg
both replace hits the same wall earlier and in memory instead of in
a spillable sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exact_percentile_iterative(
    df: DataFrame,
    value_col: str,
    p: float,
    bins: int = 1024,
    direct_threshold: int = 100_000,
    max_rounds: int = 8,
) -> float:
    """Exact continuous percentile of one column by iterative selection.

    The scale path for the case ``exact_percentiles`` documents as its
    limit: a continuous column whose per-group distinct count ≈ row
    count. Classic distributed selection — each round histograms the
    candidate interval into `bins` equal-width buckets (one
    distributed aggregate; driver sees only `bins` counts), descends
    into the bucket(s) containing the target rank(s), and stops when
    few enough rows remain to select exactly. Rounds are O(log_bins n)
    — 100 TB of doubles needs ~4 rounds of one scan-agg each, constant
    driver memory, no sort anywhere.

    Returns the same percentile_cont interpolation as the built-in
    (verified differentially in tests).
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0,1], got {p}")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(v.alias("v"))

    row = base.agg(
        F.count("v").alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).first()
    n, lo, hi = row["n"], row["lo"], row["hi"]
    if n == 0:
        raise ValueError("no non-null values")
    pos = p * (n - 1)
    r_lo, r_hi = int(pos // 1), min(int(pos // 1) + 1, n - 1)
    frac = pos - (pos // 1)

    def kth(rank: int, lo: float, hi: float, skipped: int) -> float:
        """Value at 0-indexed `rank` via histogram descent.

        Invariant each round: `skipped` == #{v < lo}; the rank-th value
        lies in [lo, hi]. One distributed aggregate per round; the
        driver holds only `bins` counts.
        """
        for _ in range(max_rounds):
            remaining = rank - skipped
            width = (hi - lo) / bins
            if width <= 0.0:
                # interval collapsed to one double value: every
                # remaining candidate equals lo, so return it directly
                # — the duplicate-dominated case (e.g. p99 of a column
                # that is one value ~everywhere) must not fall through
                # to a rank+1-row driver collect
                return lo
            bucket = F.least(
                F.lit(bins - 1),
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
            )
            hist = {
                r["b"]: r["c"]
                for r in base.filter(
                    (F.col("v") >= lo) & (F.col("v") <= hi)
                )
                .groupBy(bucket.alias("b"))
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
            if sum(hist.values()) <= direct_threshold:
                break
            acc = 0
            target_bin = bins - 1
            for b in range(bins):
                c = hist.get(b, 0)
                if acc + c > remaining:
                    target_bin = b
                    break
                acc += c
            skipped += acc
            new_hi = (
                lo + (target_bin + 1) * width if target_bin < bins - 1 else hi
            )
            # bucket b < target holds only values < its upper edge, so
            # skipped stays exactly #{v < new lo}; the last bucket is
            # closed on top (floor clamps), so the rank can't escape.
            lo, hi = lo + target_bin * width, min(new_hi, hi)
        # exact finish on the (now small) interval
        remaining = rank - skipped
        vals = (
            base.filter((F.col("v") >= lo) & (F.col("v") <= hi))
            .orderBy("v")
            .limit(remaining + 1)
            .collect()
        )
        return vals[remaining]["v"]

    v_lo = kth(r_lo, lo, hi, 0)
    v_hi = v_lo if r_hi == r_lo or frac == 0.0 else kth(r_hi, lo, hi, 0)
    return float(v_lo + frac * (v_hi - v_lo))


def exact_percentile_iterative_grouped(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: float,
    bins: int = 512,
    direct_threshold: int = 100_000,
    max_rounds: int = 8,
    out_col: str = "q",
) -> DataFrame:
    """Grouped continuous percentile by simultaneous histogram descent.

    The grouped twin of ``exact_percentile_iterative``: ALL groups
    descend together — each round is ONE distributed aggregate
    (`groupBy(task, bucket)`) over the rows still inside any group's
    candidate interval, driver state is one (lo, hi, skipped) triple
    per outstanding rank task (≤ 2 × #groups — the same boundedness
    any grouped report already assumes), and unresolved tasks narrow
    by ~bins× per round. The exact finish for every resolved task runs
    as one windowed job over ≤ direct_threshold rows per task — no
    value collect, no per-group object buffer, no one-task sort over a
    whole group.

    Returns one row per group: group_cols + `out_col` (percentile_cont
    interpolation, differentially tested against the built-in).
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"p must be in [0,1], got {p}")
    if not group_cols:
        raise ValueError("need at least one group column")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull()).select(
        *[F.col(c) for c in group_cols], v.alias("__v")
    )
    # unit-separator join + null marker: distinct group tuples must map
    # to distinct keys ("a","b" vs "ab",""; concat_ws silently SKIPS
    # nulls, so (x, null) and (null, x) would otherwise collide)
    gkey = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in group_cols
        ],
    )
    base = base.withColumn("__g", gkey)

    head = base.groupBy("__g").agg(
        F.count("__v").alias("n"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
        *[F.first(c).alias(f"__gc_{c}") for c in group_cols],
    )
    meta: dict[str, dict] = {}
    # task id = group key + which bracketing rank ("L"/"H")
    state: dict[tuple[str, str], dict] = {}
    for r in head.collect():  # one row per group — bounded driver data
        pos = p * (r["n"] - 1)
        r_lo = int(pos // 1)
        r_hi = min(r_lo + 1, r["n"] - 1)
        frac = pos - (pos // 1)
        meta[r["__g"]] = {
            "frac": frac,
            "cols": tuple(r[f"__gc_{c}"] for c in group_cols),
        }
        state[(r["__g"], "L")] = {
            "rank": r_lo, "lo": r["lo"], "hi": r["hi"], "skipped": 0
        }
        if r_hi != r_lo and frac != 0.0:
            state[(r["__g"], "H")] = {
                "rank": r_hi, "lo": r["lo"], "hi": r["hi"], "skipped": 0
            }

    spark = df.sparkSession

    def bounds_df(keys):
        rows = [
            (g, which, state[(g, which)]["lo"], state[(g, which)]["hi"])
            for (g, which) in keys
        ]
        return spark.createDataFrame(
            rows, "__g string, __which string, __lo double, __hi double"
        )

    open_keys = set(state)
    for _ in range(max_rounds):
        if not open_keys:
            break
        b = F.broadcast(bounds_df(open_keys))
        width = F.col("__hi") - F.col("__lo")
        bucket = F.least(
            F.lit(bins - 1),
            F.floor((F.col("__v") - F.col("__lo")) / (width / bins)).cast(
                "int"
            ),
        )
        hist_rows = (
            base.join(b, "__g")
            .filter(
                (F.col("__v") >= F.col("__lo"))
                & (F.col("__v") <= F.col("__hi"))
            )
            .withColumn(
                "__b",
                F.when(width > 0.0, bucket).otherwise(F.lit(0)),
            )
            .groupBy("__g", "__which", "__b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()  # ≤ tasks × bins rows — bounded driver data
        )
        hists: dict[tuple[str, str], dict[int, int]] = {}
        for r in hist_rows:
            hists.setdefault((r["__g"], r["__which"]), {})[r["__b"]] = r["c"]
        next_open = set()
        for key in open_keys:
            st = state[key]
            hist = hists.get(key, {})
            in_range = sum(hist.values())
            width_f = (st["hi"] - st["lo"]) / bins
            if in_range <= direct_threshold or width_f <= 0.0:
                continue  # resolved: exact finish handles it
            remaining = st["rank"] - st["skipped"]
            acc = 0
            target = bins - 1
            for bkt in range(bins):
                c = hist.get(bkt, 0)
                if acc + c > remaining:
                    target = bkt
                    break
                acc += c
            st["skipped"] += acc
            new_hi = (
                st["lo"] + (target + 1) * width_f
                if target < bins - 1
                else st["hi"]
            )
            st["lo"] = st["lo"] + target * width_f
            st["hi"] = min(new_hi, st["hi"])
            next_open.add(key)
        open_keys = next_open

    # exact finish: ONE windowed job over all tasks' small intervals
    fin = F.broadcast(bounds_df(state.keys()))
    w = Window.partitionBy("__g", "__which").orderBy("__v")
    ranked = (
        base.join(fin, "__g")
        .filter(
            (F.col("__v") >= F.col("__lo")) & (F.col("__v") <= F.col("__hi"))
        )
        .withColumn("__rn", F.row_number().over(w) - 1)
    )
    want = spark.createDataFrame(
        [
            (g, which, st["rank"] - st["skipped"])
            for (g, which), st in state.items()
        ],
        "__g string, __which string, __want long",
    )
    picked = {
        (r["__g"], r["__which"]): r["__v"]
        for r in ranked.join(
            F.broadcast(want),
            (ranked["__g"] == want["__g"])
            & (ranked["__which"] == want["__which"])
            & (F.col("__rn") == F.col("__want")),
        )
        .select(ranked["__g"], ranked["__which"], "__v")
        .collect()  # one row per task — bounded driver data
    }
    out_rows = []
    for g, m in meta.items():
        v_lo = picked[(g, "L")]
        v_hi = picked.get((g, "H"), v_lo)
        out_rows.append(m["cols"] + (float(v_lo + m["frac"] * (v_hi - v_lo)),))
    schema = df.select(
        *group_cols, F.lit(0.0).cast("double").alias(out_col)
    ).schema
    return spark.createDataFrame(out_rows, schema)


def exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: dict[str, float],
    count_col: str | None = None,
) -> DataFrame:
    """One row per group: a column per requested percentile.

    percentiles maps output column name → p in [0, 1], e.g.
    ``{"p50": 0.5, "p99": 0.99}``. Continuous interpolation:
    ``pos = p·(n−1); v = v[⌊pos⌋] + (pos−⌊pos⌋)·(v[⌊pos⌋+1] − v[⌊pos⌋])``
    over the value-sorted rows of the group (SQL percentile_cont).
    NULL values are excluded (same as the built-in aggregate).

    ``count_col``: WEIGHTED mode — ``df`` is already a value histogram
    ((group, value, count) rows) and ``count_col`` holds the
    multiplicity of each value. Result is identical to running the
    unweighted form on the exploded rows. Pre-aggregating to a
    histogram is the scale move for discrete/low-cardinality value
    columns: the expensive input is scanned once into a tiny frame
    (map-side combine), and every internal branch of this operator
    then re-reads the histogram, not the raw table.
    """
    if not percentiles:
        raise ValueError("need at least one percentile")
    g = [F.col(c) for c in group_cols]
    v = F.col(value_col)

    # 1. distinct-value counts (map-side combine collapses duplicates);
    # in weighted mode sum the provided multiplicities instead.
    vals = (
        df.filter(v.isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(
            (
                F.sum(count_col) if count_col else F.count(F.lit(1))
            ).alias("__cnt")
        )
    )
    # Lineage cut: every internal branch below (ranked, totals, one
    # targets arm per percentile, both rank lookups) re-derives this
    # frame — without a cut the physical plan re-scans the RAW input
    # once per branch (q14 showed 9 FileScans of lineitem). The
    # collapsed histogram is small (distinct (group,value) pairs), so
    # materialize it once and let all branches read the checkpoint.
    vals = vals.localCheckpoint(eager=False)
    # 2. per-value covering rank range [lo, hi] (0-indexed)
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = vals.withColumn("__hi", F.sum("__cnt").over(w) - 1).withColumn(
        "__lo", F.col("__hi") - F.col("__cnt") + 1
    )

    # 3. tiny target frame: one row per (group, percentile). Group
    # columns are renamed (__t_*) — targets shares lineage with
    # `ranked` (both derive from `vals`), and distinct names keep the
    # join references unambiguous.
    totals = vals.groupBy(*group_cols).agg(F.sum("__cnt").alias("__n"))
    targets = None
    for name, p in percentiles.items():
        pos = F.lit(float(p)) * (F.col("__n") - 1).cast("double")
        t = totals.select(
            *[F.col(c).alias(f"__t_{c}") for c in group_cols],
            F.lit(name).alias("__pname"),
            F.floor(pos).cast("long").alias("__r_lo"),
            F.least(F.floor(pos) + 1, F.col("__n") - 1)
            .cast("long")
            .alias("__r_hi"),
            (pos - F.floor(pos)).alias("__frac"),
        )
        targets = t if targets is None else targets.unionByName(t)

    # 4. covering-value lookup for both bracketing ranks. The target
    # side is group-cardinality × |percentiles| — broadcast it; the
    # range predicate makes this a broadcast theta join, never a
    # shuffle of the big side.
    def lookup(rank_col: str, out: str) -> DataFrame:
        # eqNullSafe: a NULL group-key value is a real group (the
        # built-in grouped aggregate and the DuckDB oracle both keep
        # it) — plain == would silently drop it here
        cond = F.lit(True)
        for c in group_cols:
            cond = cond & F.col(c).eqNullSafe(F.col(f"__t_{c}"))
        cond = (
            cond
            & (F.col(rank_col) >= F.col("__lo"))
            & (F.col(rank_col) <= F.col("__hi"))
        )
        return (
            ranked.join(F.broadcast(targets), cond)
            .select(
                *[
                    F.col(f"__t_{c}").alias(c) for c in group_cols
                ],
                "__pname",
                "__frac",
                F.col(value_col).cast("double").alias(out),
            )
        )

    lo = lookup("__r_lo", "__v_lo")
    hi = lookup("__r_hi", "__v_hi").select(
        *[F.col(c).alias(f"__h_{c}") for c in group_cols],
        F.col("__pname").alias("__h_pname"),
        F.col("__v_hi"),
    )
    # null-safe lo/hi pairing for the same reason as lookup()
    pair_cond = F.col("__pname") == F.col("__h_pname")
    for c in group_cols:
        pair_cond = pair_cond & F.col(c).eqNullSafe(F.col(f"__h_{c}"))
    interp = (
        lo.join(hi, pair_cond)
        .drop("__h_pname", *[f"__h_{c}" for c in group_cols])
        .withColumn(
            "__val",
            F.col("__v_lo")
            + F.col("__frac") * (F.col("__v_hi") - F.col("__v_lo")),
        )
    )

    # 5. pivot the percentile names back into columns (bounded set)
    out = (
        interp.groupBy(*group_cols)
        .pivot("__pname", list(percentiles.keys()))
        .agg(F.first("__val"))
    )
    return out


def exact_percentiles_continuous(
    df: DataFrame,
    value_col: str,
    percentiles: dict[str, float],
    tiebreak_cols: list[str],
) -> DataFrame:
    """Global percentile_cont over a CONTINUOUS (near-unique) value
    column — one row, a column per requested percentile.

    exact_percentiles' histogram pre-aggregation is the scale move for
    discrete values; on a near-unique double column the histogram
    collapses nothing, and with a constant group its rank window
    becomes a single-partition sort of the whole column — the exact
    cliff the operator exists to avoid. This variant is the
    continuous-path twin: a distributed range-partitioned sort
    (operators/indexing.py global_row_number, which already carries
    the checkpoint-before-offsets-collect lineage rule), then a filter
    to the <= 2·|percentiles| bracketing ranks and a bounded collect —
    interpolation v_lo + frac·(v_hi − v_lo) happens on those few rows,
    never on the column.

    tiebreak_cols must extend value_col to a total order (any unique
    key): tie ORDER among equal values is irrelevant to the value at a
    rank, but global_row_number requires it for determinism. NULL
    values are excluded (percentile_cont semantics).
    """
    if not percentiles:
        raise ValueError("need at least one percentile")
    for name, p in percentiles.items():
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile {name}={p} must be in [0, 1]")
    if not tiebreak_cols:
        raise ValueError("need a tiebreak column for a total order")
    cols = [F.col(value_col), *[F.col(c) for c in tiebreak_cols]]
    vals = df.filter(F.col(value_col).isNotNull()).select(
        value_col, *tiebreak_cols
    )
    # TWO jobs total: (1) range-sort, checkpoint (the mandatory
    # lineage cut — indexing.py's AQE rule), and collect per-partition
    # counts, which also yields n; (2) join the broadcast offsets back
    # and filter to the bracketing global ranks. Inlining the
    # global_row_number skeleton instead of calling it avoids its
    # separate count/checkpoint round-trips — on a driver-latency
    # budget, job COUNT is the cost, not rows.
    with_pid = (
        vals.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["__pid"]: r["c"]
        for r in with_pid.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n = sum(counts.values())
    if n == 0:
        raise ValueError("no non-null values to take percentiles of")
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    want: dict[str, tuple[int, int, float]] = {}
    ranks: set[int] = set()
    for name, p in percentiles.items():
        pos = float(p) * (n - 1)
        r_lo = int(pos)
        r_hi = min(r_lo + 1, n - 1)
        want[name] = (r_lo, r_hi, pos - r_lo)
        ranks.update((r_lo + 1, r_hi + 1))  # ranks are 1-based
    offset_df = F.broadcast(
        with_pid.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "__pid int, __offset long",
        )
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    by_rank = {
        r["__rn"]: r[value_col]
        for r in with_pid.join(offset_df, "__pid")
        .withColumn(
            "__rn", (F.col("__offset") + F.row_number().over(w)).cast("long")
        )
        .filter(F.col("__rn").isin(sorted(ranks)))
        .select("__rn", value_col)
        .collect()  # bounded: <= 2 rows per percentile
    }
    row = tuple(
        float(
            by_rank[r_lo + 1]
            + frac * (by_rank[r_hi + 1] - by_rank[r_lo + 1])
        )
        for (r_lo, r_hi, frac) in want.values()
    )
    return df.sparkSession.createDataFrame(
        [row], ", ".join(f"{name} double" for name in want)
    )


def exact_percentiles_bounded(
    df: DataFrame,
    value_cols: list[str],
    percentiles: dict[str, float],
) -> dict[str, dict[str, float]]:
    """percentile_cont for several BOUNDED-DISTINCT numeric columns in
    ONE job: fuse the columns into a single (metric, value) histogram
    (explode + map-side-combined groupBy), collect it — bounded by the
    columns' distinct-value counts (a day range, an order-count cap),
    NOT the row count — and interpolate in the driver.

    Returns {column: {percentile_name: value}}. This is the right
    shape when the grouped operator's machinery is overkill: a
    constant group means its window/join tree buys nothing, and each
    extra column would otherwise cost a full operator invocation
    (multiple jobs) instead of one shared scan. NULLs excluded
    (percentile_cont semantics). For near-unique columns use
    exact_percentiles_continuous instead — this one's collect would
    not be bounded there.
    """
    if not percentiles:
        raise ValueError("need at least one percentile")
    for name, p in percentiles.items():
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"percentile {name}={p} must be in [0, 1]")
    if not value_cols:
        raise ValueError("need at least one value column")
    fused = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("m"),
                        F.col(c).cast("double").alias("v"),
                    )
                    for c in value_cols
                ]
            )
        ).alias("s")
    ).select("s.m", "s.v")
    hist = (
        fused.filter(F.col("v").isNotNull())
        .groupBy("m", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_col: dict[str, list[tuple[float, int]]] = {c: [] for c in value_cols}
    for r in hist:
        by_col[r["m"]].append((r["v"], r["c"]))
    out: dict[str, dict[str, float]] = {}
    for c in value_cols:
        pairs = sorted(by_col[c])
        if not pairs:
            raise ValueError(f"no non-null values in column {c!r}")
        n = sum(cnt for _, cnt in pairs)
        # value at 0-based rank k via the cumulative histogram
        cum, bounds = 0, []
        for v, cnt in pairs:
            bounds.append((cum, cum + cnt - 1, v))
            cum += cnt

        def at(k: int) -> float:
            import bisect

            i = bisect.bisect_right([b[0] for b in bounds], k) - 1
            return bounds[i][2]

        cuts = {}
        for name, p in percentiles.items():
            pos = float(p) * (n - 1)
            lo, hi = int(pos), min(int(pos) + 1, n - 1)
            v_lo, v_hi = at(lo), at(hi)
            cuts[name] = v_lo + (pos - lo) * (v_hi - v_lo)
        out[c] = cuts
    return out
