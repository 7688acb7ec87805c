"""Training-data curation operators, batch 4: corpus-level segment
dedup (C4-style), benchmark-contamination detection, repetition
quality metrics (Gopher-style), and domain mixture re-weighting.

The fixture documents are single-line token streams, so "line"
granularity is modeled as consecutive 10-token segments; the n-gram
conventions (lower/trim + single-space split) match llm_ops.py so the
DuckDB oracles tokenize identically. All ratios are integer/integer
IEEE divisions, bit-identical across engines, rounded on output only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import query

def _toks() -> F.Column:
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")


# ---------------------------------------------------------------------------
# C4-style corpus dedup at segment granularity: chunk every document
# into consecutive 10-token segments, count identical segments across
# the whole corpus, and report how much of each document is shared
# with some other document. The shuffle key is the segment string, so
# at scale this is one groupBy over (corpus tokens / 10) rows.
# ---------------------------------------------------------------------------
@query(
    "q104_segment_dedup",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
               FROM documents),
    seg AS (SELECT doc_id,
                   array_to_string(toks[i*10+1:i*10+10], ' ') AS segment
            FROM t, unnest(range(CAST(ceil(len(toks) / 10.0) AS BIGINT)))
                 AS u(i)),
    cnt AS (SELECT segment, count(*) AS n_occ,
                   count(DISTINCT doc_id) AS n_docs
            FROM seg GROUP BY segment)
    SELECT s.doc_id,
           COUNT(*)::BIGINT AS n_segments,
           SUM(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END)::BIGINT
             AS n_shared_segments,
           ROUND(SUM(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END)
                 / COUNT(*), 6)::DOUBLE AS shared_frac
    FROM seg s JOIN cnt c ON s.segment = c.segment
    GROUP BY s.doc_id
    HAVING SUM(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) > 0
    ORDER BY shared_frac DESC, doc_id
    """,
)
def q104_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    seg = (
        d.select("doc_id", _toks().alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0,"
                    " cast(ceil(size(toks) / 10.0) as int) - 1),"
                    " i -> concat_ws(' ', slice(toks, i * 10 + 1, 10)))"
                )
            ).alias("segment"),
        )
    )
    cnt = seg.groupBy("segment").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    shared = F.sum(
        F.when(F.col("n_docs") > 1, F.lit(1)).otherwise(F.lit(0))
    )
    return (
        seg.join(cnt, "segment")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            shared.alias("n_shared_segments"),
            F.round(shared / F.count(F.lit(1)), 6).alias("shared_frac"),
        )
        .filter(F.col("n_shared_segments") > 0)
        .orderBy(F.desc("shared_frac"), "doc_id")
    )


# ---------------------------------------------------------------------------
# Benchmark contamination: every 50th document plays the "held-out
# benchmark"; training docs are scored by how many of their distinct
# word 3-grams appear in the benchmark set. The probe is a semi join
# on the 3-gram string — at scale, hash the gram and broadcast the
# benchmark side (it is tiny relative to the corpus).
# ---------------------------------------------------------------------------
@query(
    "q105_contamination_overlap",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
               FROM documents),
    g AS (SELECT DISTINCT doc_id,
                 array_to_string(toks[i+1:i+3], ' ') AS g3
          FROM t, unnest(range(greatest(len(toks) - 2, 1))) AS u(i)),
    bench AS (SELECT DISTINCT g3 FROM g WHERE doc_id % 50 = 0),
    train AS (SELECT * FROM g WHERE doc_id % 50 <> 0),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id),
    hit AS (SELECT tr.doc_id, count(*) AS n_hits
            FROM train tr JOIN bench b ON tr.g3 = b.g3
            GROUP BY tr.doc_id)
    SELECT tot.doc_id, tot.n_grams::BIGINT AS n_grams,
           hit.n_hits::BIGINT AS n_hits,
           (hit.n_hits / tot.n_grams)::DOUBLE AS contamination
    FROM tot JOIN hit ON tot.doc_id = hit.doc_id
    ORDER BY contamination DESC, tot.doc_id
    LIMIT 20
    """,
)
def q105_contamination_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select("doc_id", _toks().alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(size(toks) - 3, 0)),"
                    " i -> concat_ws(' ', slice(toks, i + 1, 3)))"
                )
            ).alias("g3"),
        )
        .distinct()
    )
    bench = (
        g.filter(F.col("doc_id") % 50 == 0).select("g3").distinct()
    )
    train = g.filter(F.col("doc_id") % 50 != 0)
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hit = (
        train.join(F.broadcast(bench), "g3", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        tot.join(hit, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            # raw exact-operand IEEE division (safe class, r14); the
            # top-20 cut ranks on the raw quotient identically in
            # both engines (bit-identical values, doc_id tie-break)
            (F.col("n_hits") / F.col("n_grams")).alias(
                "contamination"
            ),
        )
        .orderBy(F.desc("contamination"), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Repetition quality metrics per document: duplicate-bigram fraction
# and most-frequent-token share — the Gopher-style signals used to
# drop boilerplate/spammy documents before training. One explode +
# two per-doc aggregations; everything stays in whole-stage codegen.
# ---------------------------------------------------------------------------
@query(
    "q106_repetition_metrics",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
               FROM documents),
    tc AS (SELECT doc_id, w, count(*) AS c
           FROM (SELECT doc_id, unnest(toks) AS w FROM t)
           GROUP BY doc_id, w),
    top AS (SELECT doc_id, max(c) AS top_c, SUM(c)::BIGINT AS n_tok
            FROM tc GROUP BY doc_id),
    g AS (SELECT doc_id, toks[i+1] || ' ' || toks[i+2] AS g2
          FROM t, unnest(range(greatest(len(toks) - 1, 1))) AS u(i)),
    gs AS (SELECT doc_id, count(*) AS n_g,
                  count(DISTINCT g2) AS n_dg
           FROM g GROUP BY doc_id)
    SELECT gs.doc_id,
           top.n_tok,
           (1.0 - gs.n_dg / gs.n_g)::DOUBLE AS dup_bigram_frac,
           (top.top_c / top.n_tok)::DOUBLE AS top_token_frac
    FROM gs JOIN top ON gs.doc_id = top.doc_id
    ORDER BY gs.doc_id
    """,
)
def q106_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, "documents").select(
        "doc_id", _toks().alias("toks")
    )
    tc = (
        t.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = tc.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_tok")
    )
    g = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(toks) - 2, 0)),"
                " i -> concat(toks[i], ' ', toks[i + 1]))"
            )
        ).alias("g2"),
    )
    gs = g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.countDistinct("g2").alias("n_dg"),
    )
    return (
        gs.join(top, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            # raw chains of IEEE primitives over exact int64 counts
            # (safe class, r14)
            (
                F.lit(1.0) - F.col("n_dg") / F.col("n_g")
            ).alias("dup_bigram_frac"),
            (F.col("top_c") / F.col("n_tok")).alias(
                "top_token_frac"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Domain mixture re-weighting: per-source corpus shares and the
# sampling weight that would flatten the mixture to uniform — the
# bookkeeping step before weighted interleaving of training sources.
# ---------------------------------------------------------------------------
@query(
    "q107_domain_mixture_weights",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n_docs,
                      SUM(n_chars)::BIGINT AS n_chars_total
               FROM documents GROUP BY source),
    tot AS (SELECT SUM(n_docs)::BIGINT AS total,
                   count(*) AS n_sources FROM c)
    SELECT c.source, c.n_docs::BIGINT AS n_docs, c.n_chars_total,
           (c.n_docs / tot.total)::DOUBLE AS actual_share,
           (tot.total / (tot.n_sources * c.n_docs))::DOUBLE
             AS uniform_weight
    FROM c, tot
    ORDER BY source
    """,
)
def q107_domain_mixture_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )
    tot = c.agg(
        F.sum("n_docs").alias("total"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        c.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_chars_total",
            # raw exact-operand IEEE divisions (safe class, r14)
            (F.col("n_docs") / F.col("total")).alias(
                "actual_share"
            ),
            (
                F.col("total") / (F.col("n_sources") * F.col("n_docs"))
            ).alias("uniform_weight"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Per-label embedding centroid accumulators: posexplode to
# (label, dim, value) and sum each dimension in exact decimal,
# emitting (sum, count) rather than the divided mean — sum/count can
# land exactly on a .5 rounding boundary (e.g. any odd micro-sum over
# 2000 vectors), where engines disagree on tie-breaking; the
# accumulator form is bit-deterministic and the mean is one division
# away for the consumer. At scale this is a single shuffle keyed on
# (label, dim) with map-side partial aggregation — no UDF, no
# driver-side vectors.
# ---------------------------------------------------------------------------
@query(
    "q108_label_centroids",
    oracle="""
    WITH e AS (SELECT label, embedding::DOUBLE[] AS emb
               FROM embeddings),
    u AS (SELECT label, i,
                 CAST(emb[i+1] AS DECIMAL(28,6)) AS v
          FROM e, unnest(range(len(emb))) AS t(i))
    SELECT label, i::INT AS dim,
           ROUND(SUM(v), 6)::DOUBLE AS dim_sum,
           COUNT(*)::BIGINT AS n_vecs
    FROM u GROUP BY label, i ORDER BY label, dim
    """,
)
def q108_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    u = e.select(
        "label",
        F.posexplode("embedding").alias("dim", "x"),
    )
    return (
        u.groupBy("label", "dim")
        .agg(
            F.round(
                F.sum(F.col("x").cast("double").cast("decimal(28,6)")), 6
            )
            .cast("double")
            .alias("dim_sum"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
        .orderBy("label", "dim")
    )


# ---------------------------------------------------------------------------
# Per-label L2-norm statistics. The norm is a JVM-side sequential fold
# (aggregate over the array), which matches DuckDB's list_dot_product
# loop bit-for-bit on doubles; norms are rounded before the decimal
# sum so the group aggregate is order-independent (sum not mean, for
# the same tie-boundary reason as q108).
# ---------------------------------------------------------------------------
@query(
    "q109_embedding_norm_stats",
    oracle="""
    WITH n AS (SELECT label,
                      ROUND(sqrt(list_dot_product(embedding::DOUBLE[],
                                                  embedding::DOUBLE[])), 6)
                        AS nrm
               FROM embeddings)
    SELECT label, COUNT(*)::BIGINT AS n_vecs,
           ROUND(SUM(CAST(nrm AS DECIMAL(28,6))), 6)::DOUBLE AS sum_norm,
           MIN(nrm)::DOUBLE AS min_norm,
           MAX(nrm)::DOUBLE AS max_norm
    FROM n GROUP BY label ORDER BY label
    """,
)
def q109_embedding_norm_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.round(
        F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc
                + x.cast("double") * x.cast("double"),
            )
        ),
        6,
    )
    n = e.select("label", nrm.alias("nrm"))
    return (
        n.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum(F.col("nrm").cast("decimal(28,6)")), 6)
            .cast("double")
            .alias("sum_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
        .orderBy("label")
    )
