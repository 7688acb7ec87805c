"""DDSketch quantile sketch: relative-error bound, exact merge, and
BM25 / z-order operator properties (round-5 batch)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.operators.sketches import (
    qsketch_build,
    qsketch_gamma,
    qsketch_merge,
    qsketch_quantiles,
)

ALPHA = 0.01


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_qsketch_relative_error_bound(spark):
    # long-tailed positive values: exp-distributed via -ln(uniform)
    df = spark.range(1, 20001).selectExpr(
        "exp(CAST(id % 1000 AS DOUBLE) / 100.0) AS v"
    )
    sk = qsketch_build(df, "v", alpha=ALPHA)
    est = {
        r.q: r.est
        for r in qsketch_quantiles(sk, [0.5, 0.95, 0.99], alpha=ALPHA).collect()
    }
    vals = sorted(r.v for r in df.collect())
    n = len(vals)
    for q in (0.5, 0.95, 0.99):
        exact = vals[max(0, math.ceil(q * n) - 1)]  # nearest-rank
        rel = abs(est[q] - exact) / exact
        assert rel <= ALPHA + 1e-6, (q, est[q], exact, rel)


def test_qsketch_merge_equals_whole(spark):
    df = spark.range(1, 5001).selectExpr("CAST(id AS DOUBLE) AS v", "id")
    a = df.filter(F.col("id") <= 2500)
    b = df.filter(F.col("id") > 2500)
    merged = qsketch_merge(
        qsketch_build(a, "v", alpha=ALPHA),
        qsketch_build(b, "v", alpha=ALPHA),
    )
    whole = qsketch_build(df, "v", alpha=ALPHA)
    assert sorted(_rows(merged)) == sorted(_rows(whole))


def test_qsketch_drops_nonpositive_and_validates(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (1.0,), (2.0,)], ["v"]
    )
    sk = qsketch_build(df, "v", alpha=ALPHA)
    assert sk.agg(F.sum("n")).collect()[0][0] == 2
    with pytest.raises(ValueError):
        qsketch_gamma(0.0)
    with pytest.raises(ValueError):
        qsketch_quantiles(sk, [], alpha=ALPHA)


def test_bm25_matches_reference_formula(spark):
    from metadata_ingestion_poc_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (0, "hash join hash hash"),
            (1, "join window"),
            (2, "scan filter sort"),
            (3, "hash"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in bm25_scores(docs, ["hash", "join"]).collect()}
    # reference recompute in python
    toks = {0: ["hash", "join", "hash", "hash"], 1: ["join", "window"],
            2: ["scan", "filter", "sort"], 3: ["hash"]}
    n, avgdl = 4.0, sum(len(t) for t in toks.values()) / 4.0
    df = {"hash": 2.0, "join": 2.0}
    k1, b = 1.2, 0.75

    def score(d):
        s = 0.0
        for t in ("hash", "join"):
            tf = toks[d].count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += round(idf * tf * (k1 + 1.0)
                       / (tf + k1 * (1.0 - b + b * len(toks[d]) / avgdl)), 6)
        return round(s, 6)

    assert set(out) == {0, 1, 3}  # doc 2 hits no term
    for d in (0, 1, 3):
        assert out[d].score == pytest.approx(score(d), abs=2e-6)
    assert out[0].n_terms_hit == 2 and out[3].n_terms_hit == 1
    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_zorder_key_locality_and_sql_twin(spark):
    import duckdb

    from metadata_ingestion_poc_spark.operators.export import (
        zorder_key,
        zorder_key_sql,
        zorder_layout,
    )

    df = spark.range(0, 1024).selectExpr(
        "CAST(id % 32 AS LONG) AS x", "CAST(id / 32 AS LONG) AS y"
    )
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn("z", zorder_key("x", "y", bits=5)).collect()
    }

    def interleave(x, y, bits=5):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for (x, y), z in got.items():
        assert z == interleave(x, y), (x, y, z)

    # SQL twin produces identical keys in DuckDB
    sql = zorder_key_sql("x", "y", bits=5)
    rows = duckdb.sql(
        "SELECT x, y, " + sql + " AS z FROM "
        "(SELECT range % 32 AS x, range // 32 AS y FROM range(0, 1024))"
    ).fetchall()
    for x, y, z in rows:
        assert z == interleave(x, y), (x, y, z)

    # range layout: every output partition holds a contiguous z range
    parts = (
        zorder_layout(df, "x", "y", num_files=4, bits=5)
        .withColumn("pid", F.spark_partition_id())
        .select("pid", "__z")
        .collect()
    )
    by_pid = {}
    for r in parts:
        by_pid.setdefault(r.pid, []).append(r["__z"])
    spans = sorted((min(v), max(v)) for v in by_pid.values())
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans

    with pytest.raises(ValueError):
        zorder_key("x", "y", bits=0)
    # bits=32 would put y's top bit in the long's SIGN bit, flipping
    # the sort order for the upper half of the grid (round-5 advisor)
    with pytest.raises(ValueError):
        zorder_key("x", "y", bits=32)
    from metadata_ingestion_poc_spark.operators.export import zorder_key_sql
    with pytest.raises(ValueError):
        zorder_key_sql("x", "y", bits=32)
    # bits=31 (the documented max) stays non-negative at the extreme
    big = (1 << 31) - 1
    df31 = spark.createDataFrame([(big, big)], ["x", "y"])
    z31 = df31.select(zorder_key("x", "y", bits=31).alias("z")).collect()[0].z
    assert z31 == (1 << 62) - 1 > 0


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL property: pairwise distances survive 64->16 within a bounded
    distortion for the deterministic splitmix64 matrix."""
    import itertools
    import math as m

    from metadata_ingestion_poc_spark.catalog import load_table
    from metadata_ingestion_poc_spark.operators.similarity import rp_project

    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 30)
    rows = rp_project(e, dim=64, out_dim=16).select(
        "vec_id", "embedding", "proj"
    ).collect()

    def dist(a, b):
        return m.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    distortions = []
    for r1, r2 in itertools.combinations(rows, 2):
        d0 = dist(r1.embedding, r2.embedding)
        d1 = dist(r1.proj, r2.proj)
        if d0 > 1e-9:
            distortions.append(d1 / d0)
    # k=16 gives eps ~ sqrt(8 ln n / k) in theory; the deterministic
    # matrix is fixed, so pin a measured-generous envelope rather than
    # the asymptotic constant.
    assert distortions and all(0.4 <= r <= 1.6 for r in distortions), (
        min(distortions), max(distortions)
    )


def test_rp_project_sql_matches_matrix(spark):
    from metadata_ingestion_poc_spark.operators.similarity import (
        rp_matrix,
        rp_project_sql,
    )

    exprs = rp_project_sql(dim=4, out_dim=2)
    m = rp_matrix(4, 2)
    import duckdb

    got = duckdb.sql(
        "SELECT " + ", ".join(f"{e} AS c{j}" for j, e in enumerate(exprs))
        + " FROM (SELECT [1.0, 2.0, 3.0, 4.0]::FLOAT[] AS embedding)"
    ).fetchone()
    for j in range(2):
        want = round(sum((i + 1) * m[j][i] for i in range(4)), 6)
        assert got[j] == want, (j, got[j], want)


def test_zorder_write_locality(spark, sf_dir, tmp_path):
    """After a z-ordered write, rows matching a 2-D-selective predicate
    live in FEW files (tight per-file bounding boxes on both columns);
    after a layout-agnostic write they smear across most files. This is
    the observable behind zone-map/row-group skipping."""
    from metadata_ingestion_poc_spark.catalog import load_table
    from metadata_ingestion_poc_spark.operators.export import zorder_layout

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    zpath, rpath = str(tmp_path / "zorder"), str(tmp_path / "plain")
    zorder_layout(li, "l_partkey", "l_suppkey", num_files=16, bits=8).drop(
        "__z"
    ).write.parquet(zpath)
    li.repartition(16).write.parquet(rpath)

    pred = (F.col("l_partkey") <= 20) & (F.col("l_suppkey") <= 2)

    def files_hit(path):
        return (
            spark.read.parquet(path)
            .filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    z_files, plain_files = files_hit(zpath), files_hit(rpath)
    assert z_files <= 4, z_files
    assert plain_files >= 8, plain_files


def test_referential_integrity_counts_planted_orphans(spark):
    from metadata_ingestion_poc_spark.operators.quality import (
        referential_integrity,
    )

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (99,), (99,), (None,)], ["fk"]
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    out = referential_integrity([(child, "fk", parent, "pk", "c->p")]).collect()
    assert len(out) == 1
    r = out[0]
    # null FK excluded; keys {1,2,99}; orphan key 99 carries 3 rows
    assert (r.edge, r.n_child_keys, r.n_orphan_keys, r.n_orphan_rows) == (
        "c->p", 3, 1, 3,
    )
    with pytest.raises(ValueError):
        referential_integrity([])


def test_bm25_duplicate_query_terms_deduped(spark):
    """Round-5 advisor: duplicate query terms double-counted df and
    per-term contributions. Duplicates must score identically to the
    deduped query."""
    from metadata_ingestion_poc_spark.operators.text import bm25_scores

    docs = spark.createDataFrame(
        [(0, "hash join hash"), (1, "join window"), (2, "scan sort")],
        ["doc_id", "text"],
    )
    a = {r.doc_id: (r.score, r.n_terms_hit)
         for r in bm25_scores(docs, ["hash", "join"]).collect()}
    b = {r.doc_id: (r.score, r.n_terms_hit)
         for r in bm25_scores(docs, ["hash", "join", "hash", "hash"]).collect()}
    assert a == b


def test_referential_integrity_shared_child_one_scan(spark, sf_dir):
    """A child table with several FK columns must be scanned ONCE
    (melted stack), not once per edge — and the counts must match the
    per-edge formulation exactly."""
    from metadata_ingestion_poc_spark.catalog import load_table
    from metadata_ingestion_poc_spark.operators.quality import (
        referential_integrity,
    )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    edges = [
        (li, "l_orderkey", orders, "o_orderkey", "li->orders"),
        (li, "l_partkey", part, "p_partkey", "li->part"),
        (li, "l_suppkey", supplier, "s_suppkey", "li->supplier"),
    ]
    out = referential_integrity(edges)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # 1 melted lineitem scan (or 0 after checkpoint materialization)
    # + 3 parent scans
    assert plan.count("Scan parquet") <= 4, plan
    rows = {r.edge: r for r in out.collect()}
    # same numbers as three single-edge audits (separate frames →
    # no sharing path)
    for child, ck, parent, pk, name in edges:
        solo = referential_integrity([(child, ck, parent, pk, name)]).collect()[0]
        r = rows[name]
        assert (r.n_child_keys, r.n_orphan_keys, r.n_orphan_rows) == (
            solo.n_child_keys, solo.n_orphan_keys, solo.n_orphan_rows,
        ), name
    import pytest as _pt
    with _pt.raises(ValueError):
        referential_integrity(edges + [edges[0]])  # duplicate edge name


def test_tfidf_cosine_pairs_semantics(spark):
    from metadata_ingestion_poc_spark.operators.text import (
        tfidf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha beta gamma"),      # identical to 0 → cosine 1
            (2, "alpha delta delta"),
            (3, "epsilon zeta eta"),      # shares no non-ubiquitous term
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(docs, threshold=0.0).collect()
    }
    assert out[(0, 1)] == 1.0
    assert (0, 3) not in out and (1, 3) not in out
    # df cap: alpha (df=3) dropped at max_df=2 → docs 0/1 still
    # identical on the remaining vocab, 0-2 lose their only shared term
    capped = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(docs, threshold=0.0, max_df=2).collect()
    }
    assert capped[(0, 1)] == 1.0
    assert (0, 2) not in capped


def test_pii_redact_counts_and_order(spark):
    from metadata_ingestion_poc_spark.operators.text import pii_redact

    docs = spark.createDataFrame(
        [
            (0, "mail a@b.com and c@d.org here"),
            (1, "server at 10.0.0.1 call 555-1234"),
            (2, "clean text"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in pii_redact(docs).collect()}
    assert (out[0].n_email, out[0].n_ip, out[0].n_phone) == (2, 0, 0)
    assert out[0].redacted == "mail [EMAIL] and [EMAIL] here"
    assert (out[1].n_email, out[1].n_ip, out[1].n_phone) == (0, 1, 1)
    assert out[1].redacted == "server at [IP] call [PHONE]"
    assert out[2].redacted == "clean text"
    import pytest as _pt
    with _pt.raises(ValueError):
        pii_redact(docs, patterns=[])
    # custom pattern order is honored: a catch-all first consumes
    # everything the second would have matched
    both = pii_redact(
        docs.filter(F.col("doc_id") == 1),
        patterns=[("num", r"\d+", "#"), ("ip", r"\b\d{1,3}\.\d{1,3}\b", "[IP]")],
    ).collect()[0]
    assert both.n_num > 0 and both.n_ip == 0
