"""Tenth analytics batch (round 9): distributed k-means embedding
clustering and companions.

Cross-engine discipline notes for this batch:

- q242 replays Lloyd's algorithm in the oracle iteration-by-iteration
  with MATERIALIZED CTEs (the q168 pagerank / q189 k-core pattern —
  without MATERIALIZED the unrolled prefix re-evaluates
  exponentially). Every squared-difference term is rounded at 6 dp
  and decimal-summed, assignment ties break on the lower cluster id,
  and centroid updates are ROUND(sum/count, 6) — so the full
  clustering trajectory is engine-independent (see
  operators/clustering.py for the scale design).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ..catalog import load_table
from ..functions.determinism import _half_up

# ---------------------------------------------------------------------------
# q242 — k-means clustering of the embeddings table (Lloyd's, k=8,
# 3 update rounds + final assignment), reporting per-cluster size,
# inertia (exact-decimal sum of assigned squared distances), and the
# final centroid's squared norm. Scale shape (operators/clustering.py):
# assignment is codegen-only with literal broadcast centroids (zero
# shuffle), each update is ONE k-group exchange behind map-side
# combine, per-round collects are bounded at k·(d+1) values, and
# re-literalizing centroids keeps every iteration's plan flat (no
# lineage growth at all).
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3
_KM_DIMS = 64
_KM_HASH_MULT = 2654435761
_KM_HASH_MOD = 2147483647


def _kmeans_oracle(k: int, iters: int, dims: int) -> str:
    sql = f"""
    WITH edims AS MATERIALIZED (
        SELECT vec_id AS id, t.i::INT AS dim, embedding[t.i]::DOUBLE AS v
        FROM embeddings, range(1, {dims + 1}) AS t(i)),
    seeds AS MATERIALIZED (
        SELECT vec_id AS id,
               ROW_NUMBER() OVER (
                   ORDER BY (vec_id * {_KM_HASH_MULT}) % {_KM_HASH_MOD},
                            vec_id)::INT AS cid
        FROM embeddings
        QUALIFY cid <= {k}),
    c0 AS MATERIALIZED (
        SELECT s.cid, e.dim, e.v
        FROM seeds s JOIN edims e ON e.id = s.id)"""
    prev = "c0"
    for r in range(iters):
        sql += f""",
    d{r} AS MATERIALIZED (
        SELECT e.id, c.cid,
               SUM(CAST(ROUND((e.v - c.v) * (e.v - c.v), 6)
                        AS DECIMAL(28,6))) AS d2
        FROM edims e JOIN {prev} c USING (dim)
        GROUP BY e.id, c.cid),
    a{r} AS MATERIALIZED (
        SELECT id, cid FROM (
            SELECT id, cid,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY d2, cid) AS rn
            FROM d{r}) WHERE rn = 1),
    c{r + 1} AS MATERIALIZED (
        SELECT a.cid, e.dim,
               ROUND(CAST(SUM(CAST(e.v AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 6) AS v
        FROM a{r} a JOIN edims e USING (id)
        GROUP BY a.cid, e.dim)"""
        prev = f"c{r + 1}"
    return (
        sql
        + f""",
    dfin AS MATERIALIZED (
        SELECT e.id, c.cid,
               SUM(CAST(ROUND((e.v - c.v) * (e.v - c.v), 6)
                        AS DECIMAL(28,6))) AS d2
        FROM edims e JOIN {prev} c USING (dim)
        GROUP BY e.id, c.cid),
    afin AS MATERIALIZED (
        SELECT id, cid, d2 FROM (
            SELECT id, cid, d2,
                   ROW_NUMBER() OVER (PARTITION BY id
                                      ORDER BY d2, cid) AS rn
            FROM dfin) WHERE rn = 1),
    norms AS (
        SELECT cid,
               ROUND(CAST(SUM(CAST(ROUND(v * v, 6) AS DECIMAL(28,6)))
                          AS DOUBLE), 6) AS centroid_norm
        FROM {prev} GROUP BY cid)
    SELECT a.cid::INT AS cluster_id,
           COUNT(*)::BIGINT AS n_members,
           ROUND(CAST(SUM(a.d2) AS DOUBLE), 6) AS inertia,
           ANY_VALUE(n.centroid_norm) AS centroid_norm
    FROM afin a JOIN norms n ON n.cid = a.cid
    GROUP BY a.cid
    ORDER BY cluster_id"""
    )


@query(
    "q242_kmeans_clusters",
    oracle=_kmeans_oracle(_KM_K, _KM_ITERS, _KM_DIMS),
)
def q242_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = kmeans_lloyd(
        emb, "vec_id", "embedding", k=_KM_K, iterations=_KM_ITERS
    )
    # Final-centroid squared norms, computed driver-side in exact
    # decimal (the centroids are k·d 6-dp doubles already on the
    # driver): term-rounded v² decimal sum, mirroring the oracle.
    norms = assigned.sparkSession.createDataFrame(
        [
            (
                cid,
                _half_up(
                    float(
                        sum(
                            (
                                Decimal(repr(_half_up(v * v, 6)))
                                for v in c
                            ),
                            Decimal(0),
                        )
                    ),
                    6,
                ),
            )
            for cid, c in sorted(centroids.items())
        ],
        "cluster_id int, centroid_norm double",
    )
    return (
        assigned.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.sum("d2").cast("double"), 6).alias("inertia"),
        )
        .join(F.broadcast(norms), "cluster_id")
        .select("cluster_id", "n_members", "inertia", "centroid_norm")
        .orderBy("cluster_id")
    )
