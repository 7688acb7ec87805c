"""Query entries for the LLM-data-pipeline operators (SURVEY.md §2 B10
+ as-of join from B3), wiring operators/* to DuckDB oracles.

Oracle notes: MinHash/SimHash/LSH rely on engine hash functions, so
they get rows-only checks here — their correctness is pinned by unit
tests against exact brute-force results (tests/test_dedup.py,
tests/test_similarity.py). Everything expressible in portable SQL
carries a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join
from ..operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..operators.similarity import cosine_topk, lsh_ann_topk
from ..operators.text import (
    fingerprint,
    language_id,
    quality_score,
    tfidf_top_terms,
    token_stats,
)
from . import query

_MARKER_SQL_VALUES = (
    "('de', ['der','die','und','das','ist']), "
    "('en', ['the','and','of','to','in']), "
    "('es', ['el','la','de','que','los']), "
    "('fr', ['le','la','les','des','est'])"
)


# ---------------------------------------------------------------------------
# As-of join: attach each purchase event's most recent signup (per user).
# ---------------------------------------------------------------------------
@query(
    "q40_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS r_ts, r.value AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    ORDER BY l.event_id
    """,
)
def q40_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["value"],
        tiebreak=["value"],
    ).select("event_id", "user_id", "ts", "r_ts", "r_value").orderBy("event_id")


# ---------------------------------------------------------------------------
# Exact dedup: one row per distinct text, deterministic winner (min doc_id).
# ---------------------------------------------------------------------------
@query(
    "q50_dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    ORDER BY doc_id
    """,
)
def q50_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        exact_dedup(d, key_cols=["text"], order_cols=["doc_id"])
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup pairs (fully SQL-expressible, so this is
# the oracle-checked ground truth the LSH variants are tested against).
#
# The production path engages the stop-shingle cap (max_shingle_df=20):
# shingles appearing in more than 20 documents are boilerplate that
# carries no dedup signal but creates quadratic hot buckets at scale —
# one "the quick brown" shared by 1M docs would make a single bucket
# own the whole job. The oracle prunes the identical shingles so the
# value hash still matches (both sides compute Jaccard over the pruned
# shingle universe).
# ---------------------------------------------------------------------------
MAX_SHINGLE_DF = 20

@query(
    "q51_ngram_jaccard_pairs",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
               FROM documents),
    sh0 AS (SELECT DISTINCT doc_id,
                   toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS s
            FROM t, unnest(range(greatest(len(toks) - 2, 1))) AS u(i)),
    sh AS (SELECT doc_id, s FROM (
             SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS sdf FROM sh0)
           WHERE sdf <= {MAX_SHINGLE_DF}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           (n_common / (sa.n_sh + sb.n_sh - n_common))::DOUBLE AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.4
    ORDER BY doc_a, doc_b
    """,
)
def q51_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(
            d, id_col="doc_id", n=3, threshold=0.4, max_shingle_df=MAX_SHINGLE_DF
        )
        .withColumn("jaccard", F.col("jaccard").cast("double"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Dedup clusters: near-dup pairs → connected components → one canonical
# doc (min id) per cluster. Oracle: DuckDB recursive CTE transitive
# closure over the identical pair set.
# ---------------------------------------------------------------------------
@query(
    "q54_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT doc_id, string_split(lower(trim(text)), ' ') AS toks
      FROM documents),
    sh0 AS (SELECT DISTINCT doc_id,
                   toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] AS s
            FROM t, unnest(range(greatest(len(toks) - 2, 1))) AS u(i)),
    sh AS (SELECT doc_id, s FROM (
             SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS sdf FROM sh0)
           WHERE sdf <= {MAX_SHINGLE_DF}),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    fixed_pairs AS (
      SELECT c.doc_a, c.doc_b
      FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2) c
      JOIN sizes sa ON sa.doc_id = c.doc_a
      JOIN sizes sb ON sb.doc_id = c.doc_b
      WHERE c.n_common / (sa.n_sh + sb.n_sh - c.n_common) >= 0.4
    ),
    edges AS (SELECT doc_a AS s, doc_b AS d FROM fixed_pairs
              UNION SELECT doc_b, doc_a FROM fixed_pairs),
    reach AS (
      SELECT s AS n, s AS m FROM edges
      UNION
      SELECT e.s, r.m FROM edges e JOIN reach r ON e.d = r.n
    )
    SELECT n::BIGINT AS doc_id, MIN(m)::BIGINT AS cluster_id
    FROM reach GROUP BY n
    ORDER BY doc_id
    """,
)
def q54_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, id_col="doc_id", n=3, threshold=0.4, max_shingle_df=MAX_SHINGLE_DF
    )
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    return comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup pairs — engine-hash-dependent → rows-only check;
# exactness pinned against q51's ground truth in tests/test_dedup.py.
# ---------------------------------------------------------------------------
@query("q52_minhash_lsh_pairs")
def q52_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, id_col="doc_id", num_hashes=16, bands=4, n=3, threshold=0.4
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (Hamming ≤ 3 of 64 bits) — rows-only.
# ---------------------------------------------------------------------------
@query("q53_simhash_pairs")
def q53_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, id_col="doc_id", max_hamming=3).orderBy(
        "doc_a", "doc_b"
    )


# ---------------------------------------------------------------------------
# Brute-force cosine top-k: 20 query vectors against the full corpus.
# ---------------------------------------------------------------------------
@query(
    "q55_cosine_topk",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < 20),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e))
                      * sqrt(list_dot_product(c.e, c.e))), 6) AS cosine
      FROM q JOIN v c ON c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cosine::DOUBLE AS cosine, rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored)
    WHERE rank <= 10
    ORDER BY query_id, rank
    """,
)
def q55_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return cosine_topk(queries_df, emb, k=10).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# LSH ANN top-k — approximate; rows-only here, recall vs q55 in tests.
# ---------------------------------------------------------------------------
@query("q56_lsh_ann_topk")
def q56_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    # 5 planes × 12 tables: recall ≥0.6 vs brute force at sf0.1
    # (near-orthogonal corpus, the sign-LSH worst case) — pinned in
    # tests/test_ann_recall_sf01.py
    return lsh_ann_topk(
        queries_df, emb, k=10, n_planes=5, n_tables=12
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# Token statistics per document.
# ---------------------------------------------------------------------------
@query(
    "q60_token_stats",
    oracle="""
    WITH t AS (SELECT *, string_split(lower(trim(text)), ' ') AS toks
               FROM documents)
    SELECT doc_id, lang, source,
           len(toks)::INT AS n_tokens,
           len(list_distinct(toks))::INT AS n_unique_tokens,
           length(text)::INT AS n_chars_computed,
           ROUND(len(list_distinct(toks)) / len(toks), 6)::DOUBLE AS ttr
    FROM t
    ORDER BY doc_id
    """,
)
def q60_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return token_stats(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Quality scoring (C4/Gopher-style heuristics).
# ---------------------------------------------------------------------------
@query(
    "q61_quality_score",
    oracle=f"""
    WITH t AS (SELECT *, string_split(lower(trim(text)), ' ') AS toks
               FROM documents),
    m AS (SELECT ['and','das','de','der','des','die','el','est','in','ist',
                  'la','le','les','los','of','que','the','to','und'] AS stop),
    f AS (
      SELECT doc_id, lang,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_unique,
             len(list_filter(toks, x -> list_contains(m.stop, x))) AS n_stop,
             length(replace(text, ' ', '')) AS n_nonspace
      FROM t, m
    )
    SELECT doc_id, lang,
           n_tokens::INT AS n_tokens,
           ROUND(n_nonspace / n_tokens, 6)::DOUBLE AS mean_token_len,
           ROUND(n_stop / n_tokens, 6)::DOUBLE AS stopword_ratio,
           ROUND(1.0 - n_unique / n_tokens, 6)::DOUBLE AS repetition,
           ROUND(least(n_tokens / 100.0, 1.0)
                 * (1.0 - (1.0 - n_unique / n_tokens)), 6)::DOUBLE AS quality
    FROM f
    ORDER BY doc_id
    """,
)
def q61_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return quality_score(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Heuristic language ID (marker-word argmax, deterministic tie-break).
# ---------------------------------------------------------------------------
@query(
    "q62_language_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang,
                      list_distinct(string_split(lower(trim(text)), ' ')) AS toks
               FROM documents),
    m(lang_code, markers) AS (VALUES {_MARKER_SQL_VALUES}),
    scored AS (
      SELECT doc_id, t.lang, m.lang_code,
             len(list_intersect(toks, m.markers)) AS hits
      FROM t CROSS JOIN m
    ),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY hits DESC, lang_code) AS rn
      FROM scored
    )
    SELECT doc_id, lang AS lang_label,
           CASE WHEN hits > 0 THEN lang_code ELSE 'und' END AS lang_guess,
           hits::INT AS marker_hits
    FROM best WHERE rn = 1
    ORDER BY doc_id
    """,
)
def q62_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return language_id(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# TF-IDF top-5 terms per language.
# ---------------------------------------------------------------------------
@query(
    "q63_tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang AS grp, unnest(string_split(lower(trim(text)), ' ')) AS term
      FROM documents
    ),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
    tf AS (SELECT grp, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df
           FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term)
    SELECT grp, term, tf::BIGINT AS tf, df::BIGINT AS df,
           ROUND(tf * ln(n.n_docs / df), 6)::DOUBLE AS tfidf, rank
    FROM (
      SELECT tf.grp, tf.term, tf.tf, df.df,
             row_number() OVER (PARTITION BY tf.grp
                                ORDER BY tf.tf * ln(n.n_docs / df.df) DESC,
                                         tf.term) AS rank
      FROM tf JOIN df USING (term), n
    ) s, n
    WHERE rank <= 5
    ORDER BY grp, rank
    """,
)
def q63_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, per="lang", k=5).orderBy("grp", "rank")


# ---------------------------------------------------------------------------
# Document fingerprints — md5 of normalized text, so the value carries a
# full cross-engine oracle (both engines collapse the same explicit
# whitespace class and md5 the same bytes). The cheaper xxhash64 twin
# (`fp_xx`) stays engine-internal.
# ---------------------------------------------------------------------------
@query(
    "q64_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '[ \\t\\n\\r]+', ' ', 'g'))
             AS fp
    FROM documents ORDER BY doc_id
    """,
)
def q64_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return fingerprint(d).select("doc_id", "fp").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Multimodal pipeline: blob table → Arrow-batched metadata decode +
# feature extraction (decode step stubbed; plumbing real) — rows-only.
# ---------------------------------------------------------------------------
@query("q65_multimodal_features")
def q65_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        decode_metadata,
        extract_features,
        synthetic_blob_table,
    )

    d = load_table(spark, sf_dir, "documents")
    blobs = synthetic_blob_table(d)
    meta = decode_metadata(blobs)
    feats = extract_features(blobs)
    return (
        meta.join(feats.select("blob_id", "features"), "blob_id")
        .select("blob_id", "media_type", "width", "height",
                F.size("features").alias("feature_dim"))
        .orderBy("blob_id")
    )
