"""Sixth analytics batch: Bloom-filter semi-join reduction, PageRank.

- q167: selective star join with an explicit Bloom-filter prune on
  the fact side (operators/bloom.py) — the filter is built on the
  filtered part dimension, broadcast as a single-row array<bigint>,
  and drops non-joining lineitem rows BEFORE the join. The DuckDB
  oracle is the plain join, so the driver hash-check differentially
  proves the prune's no-false-negative guarantee end-to-end.
- q168: fixed-iteration PageRank over the part co-purchase graph
  (operators/graph.py pagerank) — the oracle UNROLLS the power
  iteration into chained CTEs, replaying the identical IEEE float
  expression tree with exact decimal contribution sums, so every
  iteration matches bit-for-bit (the q131 rounded-float discipline
  applied to an iterative algorithm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import query
from ..catalog import load_table
from ._util import davg, dsum, sql_davg, sql_dsum


@query(
    "q167_bloom_prune_join",
    oracle=f"""
    SELECT p.p_brand,
           COUNT(*) AS line_count,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")}
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 2
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q167_bloom_prune_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by brand for small parts, with the fact side pruned by
    a Bloom filter on the filtered dimension's keys before the join.

    The filter (1 MiB of state regardless of SF) is what shrinks the
    fact-side work at 100 TB: only might-match rows reach the join —
    and, in the shuffle-join case this stands in for, the exchange.
    The subsequent broadcast equi-join removes the Bloom false
    positives, so the result is exactly the plain join's (the oracle
    proves it).
    """
    from ..operators.bloom import bloom_build, bloom_prune

    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 2)
    dim = part.select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    bf = bloom_build(dim, "p_partkey", num_bits=1 << 20, num_hashes=5)
    pruned = bloom_prune(li, bf, "l_partkey")
    return (
        pruned.join(
            F.broadcast(dim), pruned.l_partkey == dim.p_partkey, "inner"
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("line_count"),
            dsum("rev", "revenue"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# q168 — PageRank on the part co-purchase graph (same edge derivation
# as q157/q161, restricted to small part keys to bound the graph).
# The oracle unrolls the fixed iteration count into chained CTEs; both
# engines compute rank'(v) = t + 0.85 * sum(rank(u)/deg(u)) with the
# contribution sum exact in DECIMAL(28,18) and the rank rounded to
# 12 dp per round, so the float paths are replayed identically.
# ---------------------------------------------------------------------------

_PR_ITERS = 4
_PR_KEY_CAP = 400

def _pagerank_oracle(iters: int) -> str:
    base = f"""
    WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                FROM lineitem WHERE l_partkey < {_PR_KEY_CAP}),
    e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
           FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p),
    edges AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
    deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
    n AS (SELECT COUNT(*) AS c FROM deg),
    r0 AS (SELECT u AS node,
                  ROUND(CAST(1 AS DOUBLE) / (SELECT c FROM n), 12) AS pr
           FROM deg)"""
    step = """,
    r{next} AS (
      SELECT e.v AS node,
             ROUND((CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
                     / (SELECT c FROM n)
                   + CAST(0.85 AS DOUBLE)
                     * CAST(SUM(CAST(r.pr / d.d AS DECIMAL(28,18)))
                            AS DOUBLE), 12) AS pr
      FROM edges e JOIN r{cur} r ON r.node = e.u JOIN deg d ON d.u = e.u
      GROUP BY e.v)"""
    sql = base + "".join(
        step.format(cur=i, next=i + 1) for i in range(iters)
    )
    return sql + f"""
    SELECT node, pr FROM r{iters} ORDER BY node
    """


@query("q168_pagerank", oracle=_pagerank_oracle(_PR_ITERS))
def q168_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < _PR_KEY_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e0 = a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v")
    return (
        pagerank(e0, iterations=_PR_ITERS, damping=0.85)
        .select("node", F.col("rank").alias("pr"))
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# q169 — two-pass heavy hitters: CMS screen + exact verify, over the
# bigram stream (916 distinct bigrams at sf0.01, 2-25% above the
# threshold across SFs — a real screen, unlike the ~40-word unigram vocab). The
# CMS estimate never undercounts, so the screen passes a superset of
# the truly-frequent bigrams and the exact second pass trims it to
# precisely the plain groupBy-HAVING result — which is the oracle, so
# the driver differentially proves the superset property end-to-end
# (the q167 transparent-prune pattern, for aggregation instead of
# joins). The threshold is relative (1/800 of the stream) so the
# screen's selectivity is SF-invariant.
# ---------------------------------------------------------------------------

_HH_FRACTION = 800  # heavy = more frequent than 1/800 of the stream


@query(
    "q169_cms_heavy_hitters",
    oracle=f"""
    WITH t AS (SELECT string_split(lower(trim(text)), ' ') AS toks
               FROM documents),
    sh AS (SELECT toks[i+1] || ' ' || toks[i+2] AS s
           FROM t, unnest(range(greatest(len(toks) - 1, 1))) AS u(i)),
    b AS (SELECT s FROM sh WHERE s IS NOT NULL),
    thr AS (SELECT CAST(CEIL(COUNT(*) / {_HH_FRACTION}.0) AS BIGINT) AS t
            FROM b)
    SELECT s AS bigram, COUNT(*)::BIGINT AS n
    FROM b
    GROUP BY s HAVING COUNT(*) >= (SELECT t FROM thr)
    ORDER BY n DESC, bigram
    """,
)
def q169_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.sketches import cms_build, cms_screen

    toks = F.col("__toks")
    grams = (
        load_table(spark, sf_dir, "documents")
        .withColumn(
            "__toks", F.split(F.lower(F.trim(F.col("text"))), " ")
        )
        .select(
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(F.size(toks) - 2, F.lit(0)),
                    ),
                    lambda i: F.concat(
                        F.element_at(toks, (i + 1).cast("int")),
                        F.lit(" "),
                        F.element_at(toks, (i + 2).cast("int")),
                    ),
                )
            ).alias("bigram")
        )
        .filter(F.col("bigram").isNotNull())
    )
    total = grams.count()  # one driver scalar (the relative threshold)
    min_count = math.ceil(total / float(_HH_FRACTION))
    sketch = cms_build(grams, "bigram", width=4096, depth=4)
    return (
        cms_screen(grams, "bigram", sketch, min_count)
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .orderBy(F.desc("n"), "bigram")
    )


# ---------------------------------------------------------------------------
# q170 — retrieval-quality metrics for the exact cosine search path:
# per-label precision@10 and MRR@10 over a 100-query evaluation set
# (the eval loop every embedding-pipeline change is judged by). The
# ranking is total-ordered (rounded cosine desc, neighbor id), so the
# DuckDB oracle reproduces the exact neighbor lists; metric floats
# (k/10, 1/rank) follow the decimal-average discipline.
# ---------------------------------------------------------------------------

_RM_QUERIES = 100
_RM_K = 10


@query(
    "q170_retrieval_metrics",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, label
               FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < {_RM_QUERIES}),
    rk AS (
      SELECT q.vec_id AS qid, q.label AS qlab, c.label AS clab,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(list_dot_product(q.e, c.e)
                        / (sqrt(list_dot_product(q.e, q.e))
                           * sqrt(list_dot_product(c.e, c.e))), 6) DESC,
                        c.vec_id) AS rn
      FROM q JOIN v c ON c.vec_id <> q.vec_id),
    per_q AS (
      SELECT qid, qlab,
             CAST(SUM(CASE WHEN clab = qlab THEN 1 ELSE 0 END) AS DOUBLE)
               / {_RM_K} AS prec_at_k,
             MAX(CASE WHEN clab = qlab
                      THEN CAST(1 AS DOUBLE) / rn ELSE 0 END) AS mrr
      FROM rk WHERE rn <= {_RM_K}
      GROUP BY qid, qlab)
    SELECT qlab AS label, COUNT(*)::BIGINT AS n_queries,
           {sql_davg("prec_at_k", "avg_precision_at_10")},
           {sql_davg("mrr", "avg_mrr")}
    FROM per_q GROUP BY qlab ORDER BY label
    """,
)
def q170_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    q = emb.filter(F.col("vec_id") < _RM_QUERIES)
    top = cosine_topk(q, emb, k=_RM_K)
    scored = (
        top.join(
            F.broadcast(labels.withColumnRenamed("label", "qlab")),
            top.query_id == F.col("vec_id"),
        )
        .drop("vec_id")
        .join(
            F.broadcast(labels.withColumnRenamed("label", "clab")),
            F.col("neighbor_id") == F.col("vec_id"),
        )
        .drop("vec_id")
    )
    match = F.when(F.col("clab") == F.col("qlab"), 1).otherwise(0)
    per_q = scored.groupBy("query_id", "qlab").agg(
        (F.sum(match).cast("double") / F.lit(_RM_K)).alias("prec_at_k"),
        F.max(
            F.when(
                F.col("clab") == F.col("qlab"),
                F.lit(1).cast("double") / F.col("rank"),
            ).otherwise(F.lit(0.0))
        ).alias("mrr"),
    )
    return (
        per_q.groupBy(F.col("qlab").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            davg("prec_at_k", "avg_precision_at_10"),
            davg("mrr", "avg_mrr"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q171 — moving median (windowed percentile): rolling 5-row median of
# order totals per customer. Spark has no percentile-over-frame
# window, so the operator shape is collect_list over the frame →
# array_sort → middle interpolation, all JVM expressions; DuckDB runs
# its native median window aggregate over the identical frame — the
# differential proves the hand-rolled frame median IS median
# semantics (even counts interpolate the two middle values).
# Scale note: the frame list is bounded (5 rows) per output row, so
# memory is O(frame), not O(partition) — the safe way to get moving
# percentiles without a custom UDAF.
# ---------------------------------------------------------------------------


@query(
    "q171_moving_median",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(median(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q171_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-4, 0)
    )
    vals = F.array_sort(F.collect_list("o_totalprice").over(w))
    m = F.size(vals)
    lo = F.element_at(vals, ((m + 1) / 2).cast("int"))
    hi = F.element_at(vals, (m / 2 + 1).cast("int"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round((lo + hi) / 2, 6).alias("med5"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q172 — new vs returning users per day + cumulative distinct users:
# first-seen flag via a per-user min-date, then one date rollup with a
# running sum. The classic growth-accounting query — and the exact
# way to get a cumulative distinct count without re-aggregating
# history (the running sum of first-seen days equals count(distinct)
# up to each day).
# ---------------------------------------------------------------------------


@query(
    "q172_new_vs_returning",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
               FROM events),
    fs AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY user_id),
    per AS (
      SELECT d.day,
             SUM(CASE WHEN d.day = fs.first_day THEN 1 ELSE 0 END) AS new_users,
             SUM(CASE WHEN d.day > fs.first_day THEN 1 ELSE 0 END) AS returning_users
      FROM d JOIN fs ON d.user_id = fs.user_id
      GROUP BY d.day)
    SELECT day, new_users::BIGINT AS new_users,
           returning_users::BIGINT AS returning_users,
           CAST(SUM(new_users) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cumulative_users
    FROM per ORDER BY day
    """,
)
def q172_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    fs = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    per = (
        d.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
            ).alias("new_users"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), 1).otherwise(0)
            ).alias("returning_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per.select(
        "day",
        "new_users",
        "returning_users",
        F.sum("new_users").over(w).alias("cumulative_users"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q173 — winnowing fingerprints (MOSS): hash every word trigram, keep
# the minimum of each 4-hash window (rightmost on ties). Hashes are
# 16-char md5 hex prefixes ordered LEXICOGRAPHICALLY, so the DuckDB
# oracle replays the exact selection — window mins via a forward
# ROWS frame, rightmost-tie via a bounded self-join. Any verbatim
# match of >= w+k-1 = 6 tokens is guaranteed to share a fingerprint
# at ~2/(w+1) of the full k-gram index size.
# ---------------------------------------------------------------------------


@query(
    "q173_winnow_fingerprints",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
               FROM documents),
    g AS (SELECT doc_id, i+1 AS pos,
                 substr(md5(toks[i+1] || ' ' || toks[i+2] || ' '
                            || toks[i+3]), 1, 16) AS h,
                 len(toks) - 2 AS n_grams
          FROM t, unnest(range(greatest(len(toks) - 2, 0))) AS u(i)),
    fmin AS (SELECT doc_id, pos AS j, n_grams,
                    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW
                                 AND 3 FOLLOWING) AS mh
             FROM g),
    wins AS (SELECT * FROM fmin WHERE j <= n_grams - 3),
    sel AS (SELECT w.doc_id, MAX(x.pos) AS pos, w.mh AS fp
            FROM wins w JOIN g x ON x.doc_id = w.doc_id
                             AND x.pos BETWEEN w.j AND w.j + 3
                             AND x.h = w.mh
            GROUP BY w.doc_id, w.j, w.mh)
    SELECT DISTINCT doc_id, pos, fp FROM sel
    ORDER BY doc_id, pos, fp
    """,
)
def q173_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import winnow_fingerprints

    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k=3, w=4
    ).orderBy("doc_id", "pos", "fp")


# ---------------------------------------------------------------------------
# q174 — triangle count over the (capped) part co-purchase graph.
# Spark runs the degree-ordered compact-forward algorithm
# (operators/graph.py triangle_count — O(E^1.5) wedge work even on
# hub-skewed graphs); the oracle counts canonical a<b<c triples with
# a plain three-way join. Equal counts prove the orientation +
# closure logic exactly.
# ---------------------------------------------------------------------------


@query(
    "q174_triangle_count",
    oracle=f"""
    WITH pl AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
                FROM lineitem WHERE l_partkey < {_PR_KEY_CAP}),
    e AS (SELECT DISTINCT a.p AS u, b.p AS v
          FROM pl a JOIN pl b ON a.ok = b.ok AND a.p < b.p)
    SELECT COUNT(*)::BIGINT AS triangles
    FROM e e1
    JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
    JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    """,
)
def q174_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < _PR_KEY_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    e0 = a.join(b, "ok").filter(F.col("u") < F.col("v")).select("u", "v")
    return triangle_count(e0)


# ---------------------------------------------------------------------------
# q175 — winsorized statistics per group: clamp order totals at the
# group's exact [p05, p95] (rank-based distributed percentiles, no
# value buffering), then the decimal-exact mean before/after plus the
# clamped-row count — the robust-stats preprocessing step, proving
# the percentile operator composes as a clamp bound, not just as a
# reporting output.
# ---------------------------------------------------------------------------


@query(
    "q175_winsorized_stats",
    oracle=f"""
    WITH b AS (SELECT o_orderpriority,
                      quantile_cont(o_totalprice, 0.05) AS lo,
                      quantile_cont(o_totalprice, 0.95) AS hi
               FROM orders GROUP BY o_orderpriority),
    w AS (SELECT o.o_orderpriority,
                 o.o_totalprice AS raw,
                 LEAST(GREATEST(o.o_totalprice, b.lo), b.hi) AS cl,
                 CASE WHEN o.o_totalprice < b.lo
                       OR o.o_totalprice > b.hi THEN 1 ELSE 0 END AS clamped
          FROM orders o JOIN b ON o.o_orderpriority = b.o_orderpriority)
    SELECT o_orderpriority,
           {sql_davg("raw", "mean_raw")},
           {sql_davg("cl", "mean_winsorized")},
           SUM(clamped)::BIGINT AS n_clamped
    FROM w GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q175_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentiles import exact_percentiles

    o = load_table(spark, sf_dir, "orders")
    bounds = exact_percentiles(
        o,
        group_cols=["o_orderpriority"],
        value_col="o_totalprice",
        percentiles={"lo": 0.05, "hi": 0.95},
    )
    cl = F.least(F.greatest(F.col("o_totalprice"), F.col("lo")), F.col("hi"))
    clamped = F.when(
        (F.col("o_totalprice") < F.col("lo"))
        | (F.col("o_totalprice") > F.col("hi")),
        1,
    ).otherwise(0)
    return (
        o.join(F.broadcast(bounds), "o_orderpriority")
        .select(
            "o_orderpriority",
            F.col("o_totalprice").alias("raw"),
            cl.alias("cl"),
            clamped.alias("clamped"),
        )
        .groupBy("o_orderpriority")
        .agg(
            davg("raw", "mean_raw"),
            davg("cl", "mean_winsorized"),
            F.sum("clamped").cast("long").alias("n_clamped"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q176 — two-sample Kolmogorov–Smirnov drift between sources'
# document-length distributions: per source-pair, the max |ECDF
# difference| evaluated on the shared length spine (ECDFs forward-
# filled via a cumulative window). Pure counts-and-division floats —
# no float reductions — so both engines agree exactly; the standard
# ingestion drift monitor between corpus slices.
# ---------------------------------------------------------------------------


@query(
    "q176_ks_drift",
    oracle="""
    WITH l AS (SELECT source, length(text) AS n FROM documents),
    src AS (SELECT source, COUNT(*) AS total FROM l GROUP BY source),
    spine AS (SELECT DISTINCT n FROM l),
    grid AS (SELECT s.source, s.total, v.n FROM src s CROSS JOIN spine v),
    cnt AS (SELECT source, n, COUNT(*) AS c FROM l GROUP BY source, n),
    ecdf AS (
      SELECT g.source, g.n,
             CAST(SUM(COALESCE(c.c, 0)) OVER (
               PARTITION BY g.source ORDER BY g.n
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE) / g.total AS f
      FROM grid g LEFT JOIN cnt c ON c.source = g.source AND c.n = g.n)
    SELECT a.source AS source_a, b.source AS source_b,
           ROUND(MAX(ABS(a.f - b.f)), 6) AS ks_distance
    FROM ecdf a JOIN ecdf b ON a.n = b.n AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def q176_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.length("text").alias("n")
    )
    src = d.groupBy("source").agg(F.count(F.lit(1)).alias("total"))
    spine = d.select("n").distinct()
    grid = src.crossJoin(F.broadcast(spine))
    cnt = d.groupBy("source", "n").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("source")
        .orderBy("n")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ecdf = (
        grid.join(cnt, ["source", "n"], "left")
        .select(
            "source",
            "n",
            (
                F.sum(F.coalesce("c", F.lit(0))).over(w).cast("double")
                / F.col("total")
            ).alias("f"),
        )
    )
    a = ecdf.select(
        F.col("source").alias("source_a"), "n", F.col("f").alias("fa")
    )
    b = ecdf.select(
        F.col("source").alias("source_b"),
        F.col("n").alias("nb"),
        F.col("f").alias("fb"),
    )
    return (
        a.join(
            b,
            (F.col("n") == F.col("nb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias(
                "ks_distance"
            )
        )
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q177 — PMI collocations: top adjacent token pairs by pointwise
# mutual information ln(p(u,v) / (p(u)p(v))) with a minimum pair
# count. The probability ratio is pure integer-count division with a
# mirrored parenthesization, and the single ln is rounded to 6 dp
# (the q131/q156 rounded-ln discipline) — no float reductions at all.
# Collocation mining is the classic first step of tokenizer/phrase
# vocabulary induction.
# ---------------------------------------------------------------------------

_PMI_MIN = 25
_PMI_TOPK = 40


@query(
    "q177_pmi_collocations",
    oracle=f"""
    WITH t AS (SELECT string_split(lower(trim(text)), ' ') AS toks
               FROM documents),
    bg AS (SELECT toks[i+1] AS u, toks[i+2] AS v
           FROM t, unnest(range(greatest(len(toks) - 1, 1))) AS u_(i)
           WHERE toks[i+2] IS NOT NULL),
    uni AS (SELECT tok, COUNT(*) AS c FROM (
              SELECT unnest(toks) AS tok FROM t) WHERE tok <> ''
            GROUP BY tok),
    tot AS (SELECT (SELECT COUNT(*) FROM bg) AS tb,
                   (SELECT SUM(c) FROM uni) AS tu),
    pairs AS (SELECT u, v, COUNT(*) AS cuv FROM bg GROUP BY u, v
              HAVING COUNT(*) >= {_PMI_MIN})
    SELECT p.u, p.v, p.cuv AS pair_count,
           ROUND(LN((CAST(p.cuv AS DOUBLE) / t.tb)
                    / ((CAST(cu.c AS DOUBLE) / t.tu)
                       * (CAST(cv.c AS DOUBLE) / t.tu))), 6) AS pmi
    FROM pairs p, tot t
    JOIN uni cu ON cu.tok = p.u
    JOIN uni cv ON cv.tok = p.v
    ORDER BY pmi DESC, u, v
    LIMIT {_PMI_TOPK}
    """,
)
def q177_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.col("__toks")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__toks", F.split(F.lower(F.trim(F.col("text"))), " ")
    )
    bg = docs.select(
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))
                ),
                lambda i: F.struct(
                    F.element_at(toks, (i + 1).cast("int")).alias("u"),
                    F.element_at(toks, (i + 2).cast("int")).alias("v"),
                ),
            )
        ).alias("p")
    ).select("p.u", "p.v").filter(F.col("v").isNotNull())
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tb = bg.count()  # two driver scalars — the normalization constants
    tu = uni.agg(F.sum("c")).collect()[0][0]
    pairs = (
        bg.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cuv"))
        .filter(F.col("cuv") >= _PMI_MIN)
    )
    cu = uni.selectExpr("tok as u", "c as cu")
    cv = uni.selectExpr("tok as v", "c as cv")
    pmi = F.round(
        F.log(
            (F.col("cuv").cast("double") / F.lit(float(tb)))
            / (
                (F.col("cu").cast("double") / F.lit(float(tu)))
                * (F.col("cv").cast("double") / F.lit(float(tu)))
            )
        ),
        6,
    )
    return (
        pairs.join(F.broadcast(cu), "u")
        .join(F.broadcast(cv), "v")
        .select("u", "v", F.col("cuv").alias("pair_count"), pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "u", "v")
        .limit(_PMI_TOPK)
    )


# ---------------------------------------------------------------------------
# q178 — contiguous global row numbering at scale: range-partition +
# per-partition offsets + parallel intra-partition window
# (operators/indexing.py), vs the oracle's single-sequence
# row_number() OVER (ORDER BY ...). Equality proves the distributed
# decomposition exactly reproduces the one-task global sort that
# would be the bottleneck at 100 TB.
# ---------------------------------------------------------------------------


@query(
    "q178_global_row_number",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS row_num
    FROM orders
    ORDER BY row_num
    """,
)
def q178_global_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.indexing import global_row_number

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    return global_row_number(
        o, ["o_orderdate", "o_orderkey"], out_col="row_num"
    ).orderBy("row_num")


# ---------------------------------------------------------------------------
# q179 — time-series gap fill with linear interpolation: per user,
# the daily value series re-sampled onto a complete day spine
# (min..max observed) with missing days linearly interpolated
# between the bracketing observations — pandas
# asfreq('D').interpolate() at cluster scale, from two
# ignore-nulls window carries + one exact date-fraction blend.
# Interpolation floats are single expressions over decimal-exact
# daily sums and integer day distances — both engines replay them
# identically.
# ---------------------------------------------------------------------------


@query(
    "q179_gap_fill_interpolate",
    oracle=f"""
    WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day,
                      {sql_dsum("value", "v")}
               FROM events GROUP BY user_id, CAST(ts AS DATE)),
    spine AS (SELECT user_id,
                     UNNEST(generate_series(MIN(day), MAX(day),
                                            INTERVAL 1 DAY))::DATE AS day
              FROM d GROUP BY user_id),
    j AS (SELECT s.user_id, s.day, d.v FROM spine s
          LEFT JOIN d ON d.user_id = s.user_id AND d.day = s.day),
    c AS (SELECT user_id, day, v,
            LAST_VALUE(v IGNORE NULLS) OVER w_back AS pv,
            LAST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
              OVER w_back AS pd,
            FIRST_VALUE(v IGNORE NULLS) OVER w_fwd AS nv,
            FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
              OVER w_fwd AS nd
          FROM j
          WINDOW w_back AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 w_fwd AS (PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, day,
           (v IS NULL) AS interpolated,
           ROUND(CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv)
                      * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
                 END, 6) AS value_filled
    FROM c ORDER BY user_id, day
    """,
)
def q179_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"), "value")
        .groupBy("user_id", "day")
        .agg(dsum("value", "v"))
    )
    spine = (
        d.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi")).alias("day"),
        )
    )
    j = spine.join(d, ["user_id", "day"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    c = j.select(
        "user_id",
        "day",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("pd"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff(
        "nd", "pd"
    ).cast("double")
    return c.select(
        "user_id",
        "day",
        F.col("v").isNull().alias("interpolated"),
        F.round(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
                F.col("pv") + (F.col("nv") - F.col("pv")) * frac
            ),
            6,
        ).alias("value_filled"),
    ).orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# q180 — decile lift table: rank orders by total price into deciles
# (total-ordered ntile) and report each decile's share of revenue and
# cumulative gains vs the uniform baseline — the standard model-eval
# / targeting analytics shape (here: how concentrated revenue is in
# the top order deciles).
# ---------------------------------------------------------------------------


@query(
    "q180_decile_lift",
    oracle=f"""
    WITH r AS (SELECT o_totalprice,
                      NTILE(10) OVER (ORDER BY o_totalprice DESC,
                                      o_orderkey) AS decile
               FROM orders),
    d AS (SELECT decile, COUNT(*) AS n_orders,
                 {sql_dsum("o_totalprice", "revenue")}
          FROM r GROUP BY decile),
    t AS (SELECT SUM(revenue) AS total FROM d)
    SELECT decile, n_orders::BIGINT AS n_orders, revenue,
           ROUND(revenue / t.total, 6) AS revenue_share,
           ROUND(SUM(revenue) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / t.total, 6) AS cum_gain,
           ROUND(revenue / t.total * 10, 6) AS lift
    FROM d, t ORDER BY decile
    """,
)
def q180_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.indexing import global_row_number

    o = load_table(spark, sf_dir, "orders")
    # NTILE over a global ORDER BY is the one-task sort cliff q178's
    # operator exists to avoid: derive the decile from a distributed
    # contiguous rank + NTILE's exact size rule (first n%k buckets get
    # ceil(n/k) rows) — identical output, parallel plan.
    n = o.count()
    small, rem = n // 10, n % 10
    big = small + 1
    ranked = global_row_number(
        o.select(
            "o_totalprice",
            (-F.col("o_totalprice")).alias("__neg"),
            "o_orderkey",
        ),
        ["__neg", "o_orderkey"],
        out_col="__rn",
    )
    rn = F.col("__rn")
    decile = F.when(
        rn <= rem * big, ((rn - 1) / big).cast("int") + 1
    ).otherwise(
        F.lit(rem)
        + ((rn - rem * big - 1) / F.lit(max(small, 1))).cast("int")
        + 1
    )
    r = ranked.select("o_totalprice", decile.alias("decile"))
    d = r.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "revenue"),
    )
    total = d.agg(F.sum("revenue")).collect()[0][0]
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        "decile",
        "n_orders",
        "revenue",
        F.round(F.col("revenue") / F.lit(total), 6).alias("revenue_share"),
        F.round(F.sum("revenue").over(w) / F.lit(total), 6).alias(
            "cum_gain"
        ),
        F.round(F.col("revenue") / F.lit(total) * 10, 6).alias("lift"),
    ).orderBy("decile")
