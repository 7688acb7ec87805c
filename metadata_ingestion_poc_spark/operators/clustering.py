"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The classic LLM-curation clustering primitive (topic bucketing,
SemDeDup-style cluster-then-collapse, mixture balancing). Built
Spark-first for the 100-TB shape:

- **Assignment is pure codegen, zero shuffle.** The k centroids are
  tiny by definition (k·d doubles), so each iteration bakes them into
  the plan as SQL array literals — one ``array(named_struct(d2, cid))``
  argmin expression per row, no join, no explode, no Python. (A
  centroid JOIN would broadcast anyway; the literal form also keeps
  every iteration's plan flat — see lineage note below.)
- **The update step is ONE narrow exchange per iteration.** ``groupBy
  (cluster) . agg(d per-dim decimal sums + count)`` has k groups, so
  map-side partial aggregation reduces each of the N input partitions
  to ≤ k·(d+1) values before the shuffle; the exchange carries
  kilobytes at any data scale.
- **No lineage growth.** Each round collects the k·(d+1) update row
  (bounded by construction — k rows) and re-creates the next
  centroids as literals, so iteration t+1's plan reads the
  checkpointed input + literals; it never references iteration t's
  plan. This is strictly stronger than the per-round localCheckpoint
  discipline the iterative graph operators use (graph.py:234) —
  there is nothing to truncate.
- The projected (id, vector) input is localCheckpointed once so the
  T iterations scan a compact columnar copy instead of re-running the
  upstream plan T times. At cluster scale, callers with hot storage
  can pass ``cache=False`` and let the scans hit the source.

Cross-engine determinism (the DuckDB-oracle contract used by
q242/q247):

- Every per-dimension squared difference is rounded at 6 dp and
  summed in DECIMAL(28,6) — decimal addition is associative, so the
  distance is the identical exact value on any engine and any
  partitioning (functions/determinism.py discipline).
- Assignment ties (equal rounded distance) break on the lower
  cluster id via struct-ordered ``array_min``; seed selection orders
  by a deterministic integer hash with the id as tiebreak. Both are
  total orders, so the trajectory is engine-independent.
- New centroid coordinates are ``HALF_UP(round(sum/count, 6))``
  (Python ``round()`` is banker's — literal_row's audited rounding),
  matching SQL ``ROUND(CAST(SUM(decimal) AS DOUBLE)/COUNT, 6)``.
- A cluster that loses every member simply drops out (k shrinks);
  both engines' group-by semantics agree on this contract.

Reference parity: the reference engine (a 249-LoC ingestion POC) has
no clustering surface; this operator is part of the [EXT] analytics
surface SURVEY.md §2 scopes for training-data curation.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.determinism import DEC, _half_up

_HASH_MULT = 2654435761  # Knuth multiplicative hash (public constant)
_HASH_MOD = 2147483647


def _dist_sql(vec_expr: str, centroid: Sequence[float]) -> str:
    """Exact-decimal squared distance between a vector column and a
    literal centroid: each term rounded at 6 dp, decimal-summed in
    array order (associative, so order is irrelevant to the value).

    One ``array(...)`` SQL literal per centroid — NOT ``F.lit(list)``,
    which creates one py4j Column per element (a known seconds-of-
    driver-time trap at thousands of elements)."""
    arr = ", ".join(repr(float(x)) + "D" for x in centroid)
    return (
        f"aggregate(zip_with({vec_expr}, array({arr}), "
        f"(x, y) -> round((cast(x as double) - y) * (cast(x as double) - y), 6)), "
        f"cast(0 as decimal(28,6)), "
        f"(acc, v) -> cast(acc + cast(v as decimal(28,6)) as decimal(28,6)))"
    )


def _centroid_literal(centroids: Mapping[int, Sequence[float]]) -> tuple[str, str]:
    """(nested array literal of centroids, int array literal of their
    cids), in ascending-cid order."""
    cids = sorted(centroids)
    cb = "array(" + ", ".join(
        "array(" + ", ".join(repr(float(x)) + "D"
                             for x in centroids[c]) + ")"
        for c in cids
    ) + ")"
    return cb, "array(" + ", ".join(str(c) for c in cids) + ")"


def _struct_dists_expr(
    vec_col: str, centroids: Mapping[int, Sequence[float]]
) -> str:
    """Array of (d2, cid) structs over all centroids — the shared
    core of the argmin and nearest-two forms.

    The centroids enter as ONE nested-array literal with the exact-
    decimal distance written ONCE inside a zip_with lambda (round-10,
    the operators/pq.py lesson): the per-centroid-unrolled form (k
    separate aggregate expressions) builds thousands of Catalyst
    nodes at k=8·d=64 and pays seconds of analysis + codegen per
    Lloyd round; this form is ~50 nodes for identical arithmetic
    (same 6-dp rounds, same decimal fold, same (d2, cid) order)."""
    cb, cid_arr = _centroid_literal(centroids)
    dist = (
        f"aggregate(zip_with({vec_col}, cw, "
        f"(x, y) -> round((cast(x as double) - y) * (cast(x as double) - y), 6)), "
        f"cast(0 as decimal(28,6)), "
        f"(acc, v) -> cast(acc + cast(v as decimal(28,6)) as decimal(28,6)))"
    )
    return (
        f"zip_with({cb}, sequence(1, {len(centroids)}), "
        f"(cw, i) -> named_struct('d2', {dist}, "
        f"'cid', element_at({cid_arr}, i)))"
    )


def _assign_expr(
    vec_col: str, centroids: Mapping[int, Sequence[float]]
) -> str:
    """argmin_{cid} dist²(vec, centroid_cid) as a struct (d2, cid):
    struct comparison orders by d2 first, then cid — a total order,
    so ties break deterministically on the lower cluster id."""
    return f"array_min({_struct_dists_expr(vec_col, centroids)})"


def nearest_two_expr(
    vec_col: str, centroids: Mapping[int, Sequence[float]]
) -> str:
    """Sorted array of (d2, cid) structs over all centroids — element 1
    is the assigned centroid, element 2 the runner-up (silhouette's
    `b`). Same total order as the argmin: (exact decimal d2, cid)."""
    return f"array_sort({_struct_dists_expr(vec_col, centroids)})"


def seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> dict[int, list[float]]:
    """Deterministic spread seeds: the k rows with the smallest
    multiplicative-hash of the id (id as tiebreak), numbered 1..k in
    that order. Bounded collect: exactly k rows."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(
            # reduce the id FIRST so the product stays < MOD*MULT ≈
            # 5.7e18 < 2^63: a raw id above ~3.5e9 (routine at corpus
            # scale) would overflow the int64 multiply — silent wrap
            # in Spark, out-of-range error in the SQL twin. Equal to
            # (id*MULT) % MOD for every id by modular arithmetic.
            ((F.col(id_col) % F.lit(_HASH_MOD)) * F.lit(_HASH_MULT))
            % F.lit(_HASH_MOD),
            F.col(id_col),
        )
        .limit(k)
        .collect()
    )
    return {
        i + 1: [float(x) for x in r[vec_col]] for i, r in enumerate(rows)
    }


def _checked_base(
    df: DataFrame,
    id_col: str | None,
    vec_col: str,
    cache: bool,
    op: str,
    dims: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Projected (id, vector) frame + validated dimensionality + count.

    One aggregate over the (optionally checkpointed) projection
    replaces a separate probe + ragged-scan pair: a vector shorter
    than the rest (or NULL, or holding a NULL element) would
    zip_with-pad with NULL and silently poison its distances in BOTH
    the argmin and the farthest-point traversal — and silently drop
    out of mean/covariance sums — fail loud instead. ``id_col=None``
    projects only the vector (the PCA shape); ``dims`` asserts the
    uniform length matches the caller's declared dimensionality.

    The projection is ``_spread`` first (round-10): a small embeddings
    parquet arrives as ONE input split, so without it the checkpoint
    pins a single partition and every distance / covariance scan of
    the iterative suite runs on one core regardless of cluster size.
    The stats gate makes it a no-op at real scale, and the decimal
    discipline is partitioning-invariant by construction."""
    from .dedup import _spread

    base = _spread(df.select(*([id_col] if id_col else []), vec_col))
    if cache:
        # LAZY: the validation aggregate immediately below is the
        # materializing action, so eager=True would just split one
        # job into two (the q226 collect-to-literal lesson: job count
        # dominates at local scale).
        base = base.localCheckpoint(eager=False)
    row = base.agg(
        F.min(F.size(vec_col)).alias("lo"),
        F.max(F.size(vec_col)).alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col(vec_col).isNull(), 1).otherwise(0)).alias(
            "nulls"
        ),
        # element-level probe: one NULL element nulls every zip_with
        # distance / product term for its row — distinct failure mode
        # from a NULL vector, checked separately (size(filter) on a
        # NULL array would itself be NULL, hence the guard).
        F.sum(
            F.when(F.col(vec_col).isNull(), 0).otherwise(
                F.size(F.filter(F.col(vec_col), lambda x: x.isNull()))
            )
        ).alias("null_elems"),
    ).first()
    if row is None or row["n"] == 0:
        raise ValueError(f"{op}: empty input")
    if row["nulls"]:
        raise ValueError(f"{op}: NULL {vec_col} values")
    if row["null_elems"]:
        raise ValueError(
            f"{op}: {row['null_elems']} NULL element(s) inside "
            f"{vec_col} vectors"
        )
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"{op}: ragged {vec_col} — vector lengths span "
            f"[{row['lo']}, {row['hi']}]"
        )
    if dims is not None and row["hi"] != dims:
        raise ValueError(
            f"{op}: {vec_col} has {row['hi']} dims, caller declared "
            f"{dims}"
        )
    return base, row["hi"], row["n"]


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iterations: int,
    cache: bool = True,
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Run ``iterations`` Lloyd update rounds from the deterministic
    seeds, then assign every row to its final centroid.

    Returns ``(assigned, centroids)`` where ``assigned`` is the input
    frame plus ``cluster_id`` (int) and ``d2`` (DECIMAL(28,6) exact
    squared distance to the assigned centroid), and ``centroids`` maps
    cluster id -> list of 6-dp double coordinates after the last
    update. Clusters that lose all members drop out of both.
    """
    base, dims, _ = _checked_base(df, id_col, vec_col, cache, "kmeans_lloyd")

    centroids = seed_centroids(base, id_col, vec_col, k)

    for _ in range(iterations):
        choice = _assign_expr(vec_col, centroids)
        # ONE exchange: k groups, map-side combine; d decimal sums +
        # a count per group. The k-row collect is bounded by k.
        upd = (
            base.select(F.expr(choice).getField("cid").alias("__cid"), vec_col)
            .groupBy("__cid")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                *[
                    F.sum(
                        F.element_at(F.col(vec_col), i)
                        .cast("double")
                        .cast(DEC)
                    ).alias(f"__s{i}")
                    for i in range(1, dims + 1)
                ],
            )
            .collect()
        )
        centroids = {
            r["__cid"]: [
                _half_up(float(r[f"__s{i}"]) / r["__n"], 6)
                for i in range(1, dims + 1)
            ]
            for r in upd
        }

    from .dedup import _spread

    choice = _assign_expr(vec_col, centroids)
    # _spread the FINAL assignment scan too: it runs over the caller's
    # original frame (all columns), which for a small parquet is one
    # split — the k·d-literal distance expression is the CPU floor of
    # the whole operator and must use every core.
    assigned = _spread(df).withColumn("__choice", F.expr(choice)).select(
        "*",
        F.col("__choice").getField("cid").alias("cluster_id"),
        F.col("__choice").getField("d2").alias("d2"),
    ).drop("__choice")
    return assigned, centroids


def kcenter_greedy(
    df: DataFrame, id_col: str, vec_col: str, k: int, cache: bool = True
) -> list[tuple[int, int, object]]:
    """Gonzalez farthest-point traversal: the k-center coreset /
    diversity-sampling primitive (pick the point farthest from every
    already-chosen center, k times). The selection order doubles as a
    coverage-radius curve — radius2[r] is the exact squared distance
    that made pick r the argmax, i.e. how badly covered the corpus
    still was before it.

    100-TB shape: round r is ONE scan computing min over r LITERAL
    seed distances (same codegen-only discipline as the k-means
    assignment — no join, no shuffle) followed by a top-1 reduction
    (per-partition max + k-way driver merge, never a sort). Plans are
    STATELESS — every round rebuilds from literals, so nothing
    accumulates: no checkpoints, no growing lineage, O(k²·d) work per
    row total (k is small by definition).

    Determinism: distances are the exact-decimal d2 of `_dist_sql`;
    the argmax total order is (md2 DESC, id ASC); the first seed is
    the minimum id; already-chosen ids are excluded, so a duplicate
    VECTOR can still be picked (under a distinct id, with radius 0)
    but an id never repeats, and fewer than k rows truncates the
    traversal identically on both engines. Returns
    [(sel_rank, id, radius2)], radius2 None for the first seed
    (nothing to be far from yet). ``cache`` localCheckpoints the
    projected input once so the k rounds scan a compact copy instead
    of re-executing an expensive upstream plan per round.
    """
    base, _, _ = _checked_base(df, id_col, vec_col, cache, "kcenter_greedy")
    first = base.orderBy(id_col).limit(1).collect()
    chosen: dict[int, list[float]] = {
        int(first[0][id_col]): [float(x) for x in first[0][vec_col]]
    }
    out: list[tuple[int, int, object]] = [(1, int(first[0][id_col]), None)]
    for r in range(2, k + 1):
        # min over the literal seeds in ONE nested-literal transform
        # (the _struct_dists_expr codegen-size rationale); decimal min
        # is order-independent, so this equals the unrolled least()
        md2 = (
            f"array_min(transform("
            f"{_centroid_literal(dict(enumerate(chosen.values())))[0]}, "
            f"cw -> aggregate(zip_with({vec_col}, cw, "
            f"(x, y) -> round((cast(x as double) - y) * (cast(x as double) - y), 6)), "
            f"cast(0 as decimal(28,6)), "
            f"(acc, v) -> cast(acc + cast(v as decimal(28,6)) as decimal(28,6)))))"
        )
        top = (
            base.filter(~F.col(id_col).isin(*chosen.keys()))
            .withColumn("__md2", F.expr(md2))
            .orderBy(F.col("__md2").desc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # fewer than k ROWS remain (ids never repeat)
        row = top[0]
        chosen[int(row[id_col])] = [float(x) for x in row[vec_col]]
        out.append((r, int(row[id_col]), row["__md2"]))
    return out
