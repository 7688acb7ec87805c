"""Declarative data-quality validation.

The reference's roadmap names "automated validation (Great
Expectations)" as future work (README.md:162 in /root/reference); this
is the Spark-first realization: expectations are declared as data
(rule dicts), compiled into ONE aggregate pass over the frame — no
per-rule scans, no Python row path — returning a violations report.

Supported rules: not_null, unique, in_range (min/max), in_set, regexp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violation_expr(rule: dict) -> Column:
    """Boolean column: True when the row VIOLATES the rule."""
    col = F.col(rule["column"])
    kind = rule["kind"]
    if kind == "not_null":
        return col.isNull()
    if kind == "in_range":
        lo, hi = rule.get("min"), rule.get("max")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (col < F.lit(lo))
        if hi is not None:
            cond = cond | (col > F.lit(hi))
        return col.isNotNull() & cond
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(*rule["values"])
    if kind == "regexp":
        return col.isNotNull() & ~col.rlike(rule["pattern"])
    raise ValueError(f"unknown rule kind: {kind!r}")


def validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Violations report: one row per rule with violation counts.

    Row-level rules compile into a single aggregate pass; `unique`
    rules each add one aggregate over their key (count - distinct).
    """
    row_rules = [r for r in rules if r["kind"] != "unique"]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]

    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, r in enumerate(row_rules):
        aggs.append(
            F.sum(_violation_expr(r).cast("long")).alias(f"__v{i}")
        )
    for j, r in enumerate(uniq_rules):
        aggs.append(
            (F.count(r["column"]) - F.countDistinct(r["column"])).alias(
                f"__u{j}"
            )
        )
    stats = df.agg(*aggs).first()

    spark = df.sparkSession
    report = []
    for i, r in enumerate(row_rules):
        report.append(
            (r["column"], r["kind"], int(stats[f"__v{i}"]), int(stats["__total"]))
        )
    for j, r in enumerate(uniq_rules):
        report.append(
            (r["column"], "unique", int(stats[f"__u{j}"]), int(stats["__total"]))
        )
    out = spark.createDataFrame(
        report, ["column", "rule", "n_violations", "n_rows"]
    )
    return out.withColumn("passed", F.col("n_violations") == 0)


def referential_integrity(
    edges: list[tuple[DataFrame, str, DataFrame, str, str]],
) -> DataFrame:
    """Orphan audit over foreign-key edges: one row per edge with
    (edge, n_child_keys, n_orphan_keys, n_orphan_rows).

    Scale shape, per edge: the child is reduced to its DISTINCT key
    set WITH per-key row counts first (one map-side-combined groupBy
    over a single column — the exchange carries keys, never rows),
    then left-joined to the parent's distinct keys; one final
    aggregate folds the orphan flags. The heavy fact table is never
    joined row-wise, and AQE picks broadcast for small parents. NULL
    child keys are excluded (a null FK is "absent", not "dangling" —
    q66's not_null rule owns nulls).
    """
    if not edges:
        raise ValueError("need at least one FK edge")
    names = [e[4] for e in edges]
    if len(set(names)) != len(names):
        raise ValueError("edge names must be unique")
    # Share the fact-side scan: a child table that appears in several
    # edges (lineitem has 3+ FK columns) would otherwise be re-scanned
    # once per edge. Melt all of a child's same-typed FK columns into
    # one (edge, key) stream with stack() — a generator, no shuffle —
    # so ONE FileScan feeds one combined groupBy; the collapsed
    # per-edge key counts are tiny, so cut lineage there and let each
    # edge filter its slice.
    by_child: dict[tuple[int, str], list[int]] = {}
    for i, (child, child_key, _p, _pk, _n) in enumerate(edges):
        dt = dict(child.dtypes)[child_key]
        by_child.setdefault((id(child), dt), []).append(i)
    ck_by_edge: dict[int, DataFrame] = {}
    for (_cid, _dt), idxs in by_child.items():
        child = edges[idxs[0]][0]
        if len(idxs) == 1:
            i = idxs[0]
            child_key = edges[i][1]
            ck_by_edge[i] = (
                child.filter(F.col(child_key).isNotNull())
                .groupBy(F.col(child_key).alias("__k"))
                .agg(F.count(F.lit(1)).alias("__cnt"))
            )
            continue
        pairs = ", ".join(
            "'{}', `{}`".format(edges[i][4].replace("'", "''"), edges[i][1])
            for i in idxs
        )
        grouped = (
            child.selectExpr(
                f"stack({len(idxs)}, {pairs}) as (__edge, __k)"
            )
            .filter(F.col("__k").isNotNull())
            .groupBy("__edge", "__k")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .localCheckpoint(eager=False)
        )
        for i in idxs:
            ck_by_edge[i] = grouped.filter(
                F.col("__edge") == edges[i][4]
            ).select("__k", "__cnt")
    outs = []
    for i, (child, child_key, parent, parent_key, name) in enumerate(edges):
        ck = ck_by_edge[i]
        pk = parent.select(F.col(parent_key).alias("__p")).distinct()
        flagged = ck.join(pk, ck["__k"] == pk["__p"], "left").select(
            "__cnt", F.col("__p").isNull().cast("int").alias("__orphan")
        )
        outs.append(
            flagged.agg(
                F.count(F.lit(1)).alias("n_child_keys"),
                F.coalesce(F.sum("__orphan"), F.lit(0))
                .cast("long")
                .alias("n_orphan_keys"),
                F.coalesce(
                    F.sum(F.when(F.col("__orphan") == 1, F.col("__cnt"))),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_orphan_rows"),
            ).select(
                F.lit(name).alias("edge"),
                "n_child_keys",
                "n_orphan_keys",
                "n_orphan_rows",
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def functional_dependencies(
    deps: list[tuple[DataFrame, str, str, str]],
) -> DataFrame:
    """Profile declared functional dependencies X → Y: one row per
    dependency with (dep, n_lhs, n_violating, violation_rate,
    max_rhs_per_lhs).

    A dependency holds for a key x when every row with that x carries
    the same y; `n_violating` counts keys with >1 distinct y. Scale
    shape per dependency: ONE exchange on x — count_distinct(y) plans
    as a single hash aggregate with map-side partials (the earlier
    distinct-pairs-then-count form paid a second shuffle on (x, y)).
    NULL x keys are excluded (no identity to violate); NULL y counts
    as a value (two rows (x, null), (x, 'a') violate) — count_distinct
    skips NULLs, so a has-null flag adds it back per key.
    """
    if not deps:
        raise ValueError("need at least one dependency")
    names = [d[3] for d in deps]
    if len(set(names)) != len(names):
        raise ValueError("dependency names must be unique")
    outs = []
    for df, lhs, rhs, name in deps:
        outs.append(
            df.filter(F.col(lhs).isNotNull())
            .select(F.col(lhs).alias("__x"), F.col(rhs).alias("__y"))
            .groupBy("__x")
            .agg(
                (
                    F.count_distinct("__y")
                    + F.max(
                        F.when(F.col("__y").isNull(), 1).otherwise(0)
                    )
                ).alias("__ny")
            )
            .select(F.lit(name).alias("dep"), "__ny")
        )
    # one grouped rollup over the tagged union instead of one
    # single-partition aggregate PER dependency — map-side partials
    # mean the final exchange carries ~(partitions x deps) rows
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    rolled = u.groupBy("dep").agg(
        F.count(F.lit(1)).cast("long").alias("n_lhs"),
        F.sum(F.when(F.col("__ny") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_violating"),
        # raw exact-operand IEEE division (safe class, r14)
        (
            F.sum(F.when(F.col("__ny") > 1, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("violation_rate"),
        F.max("__ny").cast("long").alias("max_rhs_per_lhs"),
    )
    # contract: ONE ROW PER DECLARED DEPENDENCY — a dep whose lhs is
    # entirely NULL (or whose table is empty) has no per-key rows and
    # would vanish from the groupBy; left-join the declared list back
    # so it reports n_lhs=0 (rate/max NULL, matching an aggregate over
    # an empty frame)
    declared = F.broadcast(
        outs[0].sparkSession.createDataFrame(
            [(n,) for n in names], "dep string"
        )
    )
    return declared.join(rolled, "dep", "left").select(
        "dep",
        F.coalesce(F.col("n_lhs"), F.lit(0)).cast("long").alias("n_lhs"),
        F.coalesce(F.col("n_violating"), F.lit(0))
        .cast("long")
        .alias("n_violating"),
        "violation_rate",
        "max_rhs_per_lhs",
    )
