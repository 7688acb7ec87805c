"""Data-quality validation query: the declarative expectations report
over the orders table, oracle-checked (every rule is plain SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.quality import validate
from . import query


@query(
    "q66_data_quality",
    oracle="""
    WITH t AS (SELECT COUNT(*) AS n FROM orders),
    v AS (
      SELECT 'o_orderkey' AS column, 'not_null' AS rule,
             SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_violations
      FROM orders
      UNION ALL
      SELECT 'o_totalprice', 'in_range',
             SUM(CASE WHEN o_totalprice IS NOT NULL
                       AND (o_totalprice < 0 OR o_totalprice > 1000000)
                      THEN 1 ELSE 0 END)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', 'in_set',
             SUM(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('O','F','P')
                      THEN 1 ELSE 0 END)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', 'regexp',
             SUM(CASE WHEN o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$')
                      THEN 1 ELSE 0 END)
      FROM orders
      UNION ALL
      SELECT 'o_orderkey', 'unique',
             COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
      FROM orders
    )
    SELECT v.column, v.rule, v.n_violations::BIGINT AS n_violations,
           t.n::BIGINT AS n_rows, v.n_violations = 0 AS passed
    FROM v, t
    ORDER BY v.column, v.rule
    """,
)
def q66_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rules = [
        {"column": "o_orderkey", "kind": "not_null"},
        {"column": "o_totalprice", "kind": "in_range", "min": 0, "max": 1_000_000},
        {"column": "o_orderstatus", "kind": "in_set", "values": ["O", "F", "P"]},
        {"column": "o_orderpriority", "kind": "regexp", "pattern": r"^[0-9]-[A-Z ]+$"},
        {"column": "o_orderkey", "kind": "unique"},
    ]
    return validate(o, rules).orderBy("column", "rule")


# ---------------------------------------------------------------------------
# Table profile: the standard ingestion audit — per column, non-null /
# null / exact-distinct counts plus min/max rendered to strings. ONE
# pass over the table (a single aggregate; the distinct counts expand
# map-side, so at 100 TB this is one shuffle of partial states, never
# a per-column rescan). A derived NULLIF column exercises the null
# accounting (the synthetic fixtures are fully dense). Numeric min/max
# go through DECIMAL(18,2) so both engines render identical strings.
# ---------------------------------------------------------------------------
@query(
    "q128_table_profile",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_totalprice, o_orderdate, o_orderpriority,
             NULLIF(o_orderstatus, 'O') AS status_nullable
      FROM orders)
    SELECT * FROM (
      SELECT 'o_orderkey' AS col_name,
             COUNT(o_orderkey)::BIGINT AS n_nonnull,
             (COUNT(*) - COUNT(o_orderkey))::BIGINT AS n_null,
             COUNT(DISTINCT o_orderkey)::BIGINT AS n_distinct,
             MIN(o_orderkey)::VARCHAR AS min_s,
             MAX(o_orderkey)::VARCHAR AS max_s
      FROM t
      UNION ALL
      SELECT 'o_totalprice', COUNT(o_totalprice)::BIGINT,
             (COUNT(*) - COUNT(o_totalprice))::BIGINT,
             COUNT(DISTINCT o_totalprice)::BIGINT,
             MIN(o_totalprice)::DECIMAL(18,2)::VARCHAR,
             MAX(o_totalprice)::DECIMAL(18,2)::VARCHAR
      FROM t
      UNION ALL
      SELECT 'o_orderdate', COUNT(o_orderdate)::BIGINT,
             (COUNT(*) - COUNT(o_orderdate))::BIGINT,
             COUNT(DISTINCT o_orderdate)::BIGINT,
             MIN(o_orderdate)::VARCHAR, MAX(o_orderdate)::VARCHAR
      FROM t
      UNION ALL
      SELECT 'o_orderpriority', COUNT(o_orderpriority)::BIGINT,
             (COUNT(*) - COUNT(o_orderpriority))::BIGINT,
             COUNT(DISTINCT o_orderpriority)::BIGINT,
             MIN(o_orderpriority), MAX(o_orderpriority)
      FROM t
      UNION ALL
      SELECT 'status_nullable', COUNT(status_nullable)::BIGINT,
             (COUNT(*) - COUNT(status_nullable))::BIGINT,
             COUNT(DISTINCT status_nullable)::BIGINT,
             MIN(status_nullable), MAX(status_nullable)
      FROM t)
    ORDER BY col_name
    """,
)
def q128_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").withColumn(
        "status_nullable", F.nullif(F.col("o_orderstatus"), F.lit("O"))
    )
    specs = [
        ("o_orderkey", "raw"),
        ("o_totalprice", "dec"),
        ("o_orderdate", "raw"),
        ("o_orderpriority", "str"),
        ("status_nullable", "str"),
    ]
    aggs, fields = [], []
    for c, kind in specs:
        col = F.col(c)
        if kind == "dec":
            mn = F.min(col).cast("decimal(18,2)").cast("string")
            mx = F.max(col).cast("decimal(18,2)").cast("string")
        elif kind == "str":
            mn, mx = F.min(col), F.max(col)
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs += [
            F.count(col).alias(f"nn_{c}"),
            (F.count(F.lit(1)) - F.count(col)).alias(f"nu_{c}"),
            F.count_distinct(col).alias(f"nd_{c}"),
            mn.alias(f"mn_{c}"),
            mx.alias(f"mx_{c}"),
        ]
        fields.append(f"'{c}', nn_{c}, nu_{c}, nd_{c}, mn_{c}, mx_{c}")
    one = o.agg(*aggs)
    return one.selectExpr(
        f"stack({len(specs)}, {', '.join(fields)}) AS "
        "(col_name, n_nonnull, n_null, n_distinct, min_s, max_s)"
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# Count-min term frequencies: the mergeable point-frequency sketch over
# corpus tokens, reported against the exact counts of the top-20 terms.
# Hash-dependent estimates → rows-only; the overestimate/error-bound/
# exact-merge properties are pinned in tests/test_sketches.py. The
# estimates are deterministic (xxhash64), so row counts and schema are
# stable across runs and layouts.
# ---------------------------------------------------------------------------
@query("q129_cms_term_frequencies")
def q129_cms_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.sketches import cms_build, cms_estimate

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"
        )
    ).filter(F.col("term") != "")
    sketch = cms_build(toks, "term", width=2048, depth=4)
    top = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "term")
        .limit(20)
    )
    est = cms_estimate(
        sketch, top.select("term"), "term", width=2048, depth=4
    )
    return (
        top.join(est, "term")
        .select("term", "exact_n", F.col("est").alias("cms_est"))
        .orderBy(F.col("exact_n").desc(), "term")
    )


# ---------------------------------------------------------------------------
# Text normalization: the C4/CCNet pre-dedup pass (lower, strip
# non-alphanumerics, collapse whitespace) — pure regexp chain in
# whole-stage codegen. Both engines apply identical regexes, so the
# normalized text and token recount carry a full value oracle.
# ---------------------------------------------------------------------------
@query(
    "q130_text_normalize",
    oracle="""
    WITH n AS (
      SELECT doc_id,
             trim(regexp_replace(
                 regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                 ' +', ' ', 'g')) AS norm_text
      FROM documents)
    SELECT doc_id, norm_text,
           CASE WHEN norm_text = '' THEN 0
                ELSE len(string_split(norm_text, ' ')) END::INT
             AS norm_tokens
    FROM n
    ORDER BY doc_id
    """,
)
def q130_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    return normalize_text(d).select(
        "doc_id", "norm_text", "norm_tokens"
    ).orderBy("doc_id")


_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _ri_oracle() -> str:
    parts = []
    for child, ck, parent, pk in _FK_EDGES:
        parts.append(f"""
    SELECT '{child}.{ck}->{parent}' AS edge,
           COUNT(*)::BIGINT AS n_child_keys,
           COALESCE(SUM(CASE WHEN p.__p IS NULL THEN 1 END), 0)::BIGINT
             AS n_orphan_keys,
           COALESCE(SUM(CASE WHEN p.__p IS NULL THEN c.__cnt END), 0)::BIGINT
             AS n_orphan_rows
    FROM (SELECT {ck} AS __k, COUNT(*) AS __cnt FROM {child}
          WHERE {ck} IS NOT NULL GROUP BY 1) c
    LEFT JOIN (SELECT DISTINCT {pk} AS __p FROM {parent}) p
      ON c.__k = p.__p""")
    return " UNION ALL ".join(parts) + " ORDER BY edge"


@query("q185_referential_integrity", oracle=_ri_oracle())
def q185_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit over the full TPC-H foreign-key graph — the
    ingestion-gate companion to q66's row rules: every FK edge's
    dangling-key and dangling-row counts in one report.

    Per edge the fact side collapses to (distinct key, row count)
    before any join (operators/quality.py referential_integrity), so
    at 100 TB each edge costs one single-column map-combined exchange
    plus a key-set join — never a row-wise join of the fact table.
    """
    from ..operators.quality import referential_integrity

    tables = {t: load_table(spark, sf_dir, t) for t in
              {e[0] for e in _FK_EDGES} | {e[2] for e in _FK_EDGES}}
    edges = [
        (tables[child], ck, tables[parent], pk, f"{child}.{ck}->{parent}")
        for child, ck, parent, pk in _FK_EDGES
    ]
    return referential_integrity(edges).orderBy("edge")
