"""Physical-plan contracts: the performance properties that must
survive refactors. A correct-but-unpushed scan or a lost broadcast is
a regression even when results match.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.plans import (
    codegen_plan,
    formatted_plan,
    has_broadcast_join,
    num_shuffles,
    physical_plan,
    pushed_filters,
)
from metadata_ingestion_poc_spark.queries import QUERIES


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 100000
    ).select("o_orderkey")
    pf = pushed_filters(df)
    assert "o_totalprice" in pf, pf


def test_column_pruning_reaches_parquet(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = formatted_plan(df)
    assert "l_extendedprice" not in plan  # unneeded column not read


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    df = QUERIES["q08_join_star_multiway"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4


def test_q1_is_single_shuffle(spark, sf_dir):
    """Partial agg means the only exchange is the 4-group shuffle."""
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert num_shuffles(df) <= 2  # group-by exchange + final sort


def test_theta_band_join_no_orders_shuffle(spark, sf_dir):
    df = QUERIES["q41_theta_band_join"](spark, sf_dir)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_join_single_shuffle_on_key(spark, sf_dir):
    df = QUERIES["q40_asof_join"](spark, sf_dir)
    plan = formatted_plan(df)
    # union + window: one exchange for the window partition key, one for
    # the final orderBy — no range-join blowup nodes
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_wholestage_codegen_covers_q1(spark, sf_dir):
    df = QUERIES["q01_pricing_summary"](spark, sf_dir)
    assert "WholeStageCodegen" in codegen_plan(df)


def test_no_inferred_filter_recompute_in_shingles(spark, sf_dir):
    """Guard against InferFiltersFromGenerate re-inlining the O(len²)
    shingle expression below the projection (see operators/dedup.py)."""
    from metadata_ingestion_poc_spark.operators.dedup import _shingle_index

    docs = load_table(spark, sf_dir, "documents")
    idx = _shingle_index(docs, "doc_id", 3, None)
    opt = idx._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("split(") <= 2, "shingle expression duplicated in plan"


def test_tpch_shapes_broadcast_dims_no_cartesian(spark, sf_dir):
    """Q5/Q8/Q16/Q21 shapes: dimension joins resolve to broadcast
    hash joins; nothing degenerates to a cartesian product."""
    for name, min_bhj in [
        ("q96_tpch_q5_local_supplier_volume", 4),
        ("q97_tpch_q8_market_share", 5),
        ("q100_tpch_q16_supplier_count", 2),
        ("q102_tpch_q21_sole_blame_supplier", 1),
    ]:
        plan = physical_plan(QUERIES[name](spark, sf_dir))
        assert plan.count("BroadcastHashJoin") >= min_bhj, name
        assert "CartesianProduct" not in plan, name


def test_contamination_probe_is_broadcast_semi(spark, sf_dir):
    """q105: the benchmark n-gram set probes the corpus as a broadcast
    LeftSemi — the big side never shuffles on the gram string."""
    plan = physical_plan(QUERIES["q105_contamination_overlap"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_global_total_threshold_is_single_row_broadcast(spark, sf_dir):
    """q99: comparing per-part values against the global total must
    broadcast the 1-row aggregate, never shuffle the fact side for it."""
    plan = physical_plan(QUERIES["q99_tpch_q11_important_parts"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_segment_dedup_stays_jvm_side(spark, sf_dir):
    """q104/q106: tokenize + explode + agg never leaves codegen for
    Python."""
    for name in ("q104_segment_dedup", "q106_repetition_metrics"):
        plan = physical_plan(QUERIES[name](spark, sf_dir))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_shard_export_no_join_bounded_shuffles(spark, sf_dir):
    """q122: shard+position from md5(id) is one window shuffle plus the
    presentation sort — never a join, never a global single-partition
    rank."""
    df = QUERIES["q122_shuffle_shard_export"](spark, sf_dir)
    plan = physical_plan(df)
    assert "Join" not in plan
    assert num_shuffles(df) <= 2, physical_plan(df)


def test_boilerplate_and_incremental_no_cartesian(spark, sf_dir):
    """q120/q126: shingle-index joins are equi joins on the shingle key;
    any cartesian/NLJ here would be quadratic in corpus size."""
    for name in ("q120_boilerplate_ngrams", "q126_incremental_dedup"):
        plan = physical_plan(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_snapshot_diff_pushes_date_bounds(spark, sf_dir):
    """q123: each snapshot's date range must reach the parquet scan."""
    df = QUERIES["q123_snapshot_diff"](spark, sf_dir)
    pf = pushed_filters(df)
    assert "o_orderdate" in pf, pf


def test_quantization_stays_jvm_side(spark, sf_dir):
    """q125: the whole quantize/reconstruct/MSE pipeline is JVM list
    math — no Python in the row path."""
    plan = physical_plan(QUERIES["q125_embedding_quantization"](spark, sf_dir))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_exact_percentiles_no_object_agg(spark, sf_dir):
    """q14: the rank-based rewrite must never fall back to the
    ObjectHashAggregate value-buffering percentile, and the tiny target
    frame joins in as a broadcast."""
    df = QUERIES["q14_percentiles"](spark, sf_dir)
    plan = physical_plan(df)
    assert "ObjectHashAggregate" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_span_dedup_one_index_shuffle_no_cartesian(spark, sf_dir):
    """q139: the positional-gram index is shuffled ONCE (the fused
    pair-generation groupBy — the df cap must not add a window
    pre-pass), and no plan node is a cartesian/BNLJ product."""
    df = QUERIES["q139_duplicated_spans"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan  # cap fused into the aggregate
    # index groupBy + diagonal groupBy + pair groupBy + final sort
    assert num_shuffles(df) <= 4, formatted_plan(df)


def test_fuzzy_join_is_equi_not_cartesian(spark, sf_dir):
    """q140: the blocked fuzzy join must plan as an equi join on the
    block key (hash or sort-merge — levenshtein only as a post-filter),
    never a cartesian/nested-loop over probes x names."""
    df = QUERIES["q140_fuzzy_name_match"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_percentiles_single_filescan(spark, sf_dir):
    """Round-6 lineage-cut contract (operators/percentiles.py): the
    rank-based exact-percentile pipeline reads lineitem ONCE (the
    checkpointed rank frame feeds all downstream arms). Was 9
    FileScans before the fix — pin it at 1 so a refactor can't
    silently resurrect the re-scans."""
    plan = physical_plan(QUERIES["q14_percentiles"](spark, sf_dir))
    assert plan.count("FileScan") == 1, plan.count("FileScan")


def test_triangle_count_bounded_exchanges(spark, sf_dir):
    """Round-6 lineage-cut contract (operators/graph.py): the edge
    frame is checkpointed once, so the triangle join tree stays at
    ~9 Exchanges (was 177 when each arm re-derived the edges). The
    checkpoint also removes every FileScan from the returned plan."""
    plan = physical_plan(QUERIES["q174_triangle_count"](spark, sf_dir))
    assert plan.count("Exchange ") <= 20, plan.count("Exchange ")
    assert plan.count("FileScan") == 0, plan.count("FileScan")


def test_high_exchange_queries_audited_and_pinned(spark, sf_dir):
    """Round-8 audit of the five highest-Exchange green plans
    (VERDICT r7): each was read and is either reduced or minimal for
    its shape — pin the counts so regressions surface.

    - q198: ONE documents FileScan (percentile histogram is
      checkpointed); every exchange is over the compact value
      histogram, so the count is cosmetic at scale.
    - q204: one grouped rollup over the tagged per-dep union replaced
      five single-partition aggregates (15 -> 12); the remaining
      2 exchanges/table are intrinsic to per-key distinct counting
      over five DIFFERENT tables.
    - q211: two user_id aggregates + one join at data scale; the rest
      operate on the checkpointed (bounded) latency frame.
    - q142/q51: multi-stage near-dup candidate pipelines (index,
      df-cap, bucket join, pair agg, degree/histogram) — each stage
      shuffles a strictly reduced frame; no meltable shared scan.

    Round-10 additions (VERDICT r9 item 3 — the next three highest
    unpinned plans, each read and confirmed minimal for its shape):

    - q185: 7 FK edges × (child collapsed to distinct-key counts
      BEFORE any join + broadcast parent key-set + a 1-row per-edge
      aggregate) ≈ 25 exchanges. Every exchange is over a key-set or
      a single row — never a row-wise fact join; the per-edge
      SinglePartition exchanges carry exactly one row each.
    - q154: 0 FileScans is the real contract — lineitem collapses to
      a per-group value histogram (≤ groups×50 rows) behind ONE scan
      ended by a localCheckpoint; all 25 exchanges shuffle that tiny
      histogram through the two-median MAD pipeline.
    - q165: ONE FileScan — the weighted-percentile operator's
      branches all feed off the same collapsed value-histogram frame;
      the 18 exchanges are histogram-sized, not row-sized.
    """
    limits = {
        "q198_length_bands": (18, 1),
        "q204_fd_audit": (13, 5),
        "q211_conversion_latency": (15, None),
        "q142_neardup_degree_histogram": (19, None),
        "q51_ngram_jaccard_pairs": (16, None),
        "q185_referential_integrity": (25, None),
        "q154_mad_outliers": (25, 0),
        "q165_weighted_percentiles": (18, 1),
    }
    for name, (max_exch, scans) in limits.items():
        plan = physical_plan(QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        got = plan.count("Exchange ")
        assert got <= max_exch, (name, got)
        if scans is not None:
            assert plan.count("FileScan") == scans, (
                name,
                plan.count("FileScan"),
            )


def test_chunk_dedup_single_scan_no_join(spark, sf_dir):
    """Round-8 review fix contract (q238): chunk text crosses the
    network once — the plan is a combined (text, source) rollup plus
    a window over the collapsed frame, with ONE documents scan and NO
    join back to chunk instances (the original shape joined the
    identity frame onto every instance and checkpointed ~1.3x the
    corpus text)."""
    plan = physical_plan(QUERIES["q238_chunk_dedup"](spark, sf_dir))
    assert plan.count("FileScan") == 1, plan.count("FileScan")
    for node in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        assert node not in plan, node
    # "chunk text crosses the network once": the (text, source) rollup
    # exchange + the window's text exchange + the source rollup + the
    # presentation sort — a second full-instance shuffle busts this cap
    assert plan.count("Exchange ") <= 5, plan.count("Exchange ")


def test_kmeans_assignment_is_codegen_only(spark, sf_dir):
    """Round-9 contract (operators/clustering.py): the k-means
    assignment bakes centroids into the plan as literals — the final
    assigned frame must contain NO join of any kind and exactly the
    k-group aggregation exchanges (plus the broadcast of the tiny
    norms literal in the summary query). A centroid JOIN appearing
    here means the zero-shuffle assignment property regressed."""
    from metadata_ingestion_poc_spark.operators.clustering import (
        kmeans_lloyd,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_lloyd(
        emb, "vec_id", "embedding", k=4, iterations=1
    )
    plan = physical_plan(assigned)
    for node in (
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        assert node not in plan, node
    # round-10: the only exchange allowed is _spread's stats-gated
    # ROUND-ROBIN repartition (full-core scans of a one-split parquet
    # at local scale; a no-op at real scale). A key-partitioned
    # exchange here would mean the zero-shuffle assignment regressed.
    import re

    kinds = set(re.findall(r"Exchange (\w+)", plan))
    assert kinds <= {"RoundRobinPartitioning"}, kinds


def test_pca_covariance_exchange_bounded_by_dims(spark, sf_dir):
    """Round-9 contract (operators/pca.py): covariance comes from ONE
    pass — per-row nested-transform expansion + a d(d+1)/2-group
    rollup. The contract is asserted on the REAL operator's
    pre-collect frame (covariance_rollup, the exact plan
    covariance_upper collects), so a refactor into a corpus self-join
    or an extra shuffle fails here."""
    from metadata_ingestion_poc_spark.operators.pca import (
        covariance_rollup,
        covariance_upper,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    emb_ckpt = emb.localCheckpoint(eager=True)
    means = [0.0] * 8
    plan = physical_plan(covariance_rollup(emb_ckpt, "embedding", 8, means))
    for node in (
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastHashJoin",
        "CartesianProduct",
    ):
        assert node not in plan, node
    assert plan.count("Exchange ") <= 2, plan.count("Exchange ")
    # round-10 tightening: the O(d²) nested-transform expression must
    # be evaluated ONCE per row. Plain explode over the computed array
    # gets an inferred size()>0 filter pushed below the projection
    # with the whole product expression inlined — double evaluation.
    # explode_outer avoids the inference; the transform chain must
    # therefore appear exactly once in the generated plan. (The outer
    # sequence(1, d) constant-folds to an array literal, so match on
    # the flatten(transform( chain, not the sequence literal.)
    assert plan.count("flatten(transform(") == 1, plan
    # and the collecting wrapper produces the full upper triangle
    n = emb_ckpt.count()
    got = covariance_upper(emb_ckpt, "embedding", 8, means, n)
    assert len(got) == 8 * 9 // 2


def test_asof_forward_attribution_plan_pinned(spark, sf_dir):
    """VERDICT r8 #4: q164 was the only >1.5x mover between rounds 7
    and 8 (0.58s -> 0.90s). Its plan is UNCHANGED across both rounds
    (2 exchanges, no join regression — PLANS_r07/r08/r09 all agree),
    so the move was host noise; this pin keeps it that way."""
    plan = physical_plan(
        QUERIES["q164_asof_forward_attribution"](spark, sf_dir)
    )
    assert plan.count("Exchange ") <= 2, plan.count("Exchange ")
    for node in ("SortMergeJoin", "CartesianProduct",
                 "BroadcastNestedLoopJoin"):
        assert node not in plan, node


def test_pq_encode_is_codegen_only(spark, sf_dir):
    """Round-10 contract (operators/pq.py): PQ encoding bakes the
    codebooks into nested-array literals — the coded frame must
    contain NO join and no key-partitioned exchange (only _spread's
    stats-gated round-robin repartition, a no-op at real scale). A
    codebook JOIN here means the zero-shuffle encoding regressed."""
    import re

    from metadata_ingestion_poc_spark.operators.pq import (
        pq_encode,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, ksub=8, iterations=1)
    plan = physical_plan(pq_encode(emb, books))
    for node in (
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        assert node not in plan, node
    kinds = set(re.findall(r"Exchange (\w+)", plan))
    assert kinds <= {"RoundRobinPartitioning"}, kinds


def test_pq_census_single_bounded_exchange(spark, sf_dir):
    """Round-10 contract: pq_reconstruction_stats is ONE scan + one
    m·ksub-group rollup — exactly one key-partitioned exchange (plus
    the round-robin spread and the orderBy's range partition), no
    joins, no second scan of the corpus."""
    import re

    from metadata_ingestion_poc_spark.operators.pq import (
        pq_reconstruction_stats,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, ksub=8, iterations=1)
    plan = physical_plan(pq_reconstruction_stats(emb, books))
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan, node
    kinds = re.findall(r"Exchange (\w+)", plan)
    assert kinds.count("hashpartitioning") == 1, kinds
    assert plan.count("FileScan") <= 1, plan.count("FileScan")


def test_ivfpq_coded_scan_no_window_no_join(spark, sf_dir):
    """Round-10 contract (operators/pq.py ivfpq_build): the corpus
    coding scan emits (id, cell, codes) with the coarse cells assigned
    through normalized-centroid LITERALS — no rank window and no join
    (plain IVF pays a per-row window for the same assignment), and no
    key-partitioned exchange."""
    import re

    from metadata_ingestion_poc_spark.operators.pq import ivfpq_build

    emb = load_table(spark, sf_dir, "embeddings")
    _, _, coded = ivfpq_build(emb, n_cells=8, ksub=8, iterations=1)
    plan = physical_plan(coded)
    for node in (
        "Window",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        assert node not in plan, node
    kinds = set(re.findall(r"Exchange (\w+)", plan))
    assert kinds <= {"RoundRobinPartitioning"}, kinds


def test_round12_training_queries_single_exchange(spark, sf_dir):
    """The sufficient-statistics fits must stay ONE exchange: the
    checkpoint-spread fix must never reintroduce per-iteration
    shuffles, and the DP/median stages must stay driver-side literal
    frames."""
    for q in (
        "q294_huber_irls",
        "q295_voptimal_histogram",
        "q296_ams_f2",
    ):
        df = QUERIES[q](spark, sf_dir)
        plan = physical_plan(df)
        assert "CartesianProduct" not in plan, q
        assert num_shuffles(df) <= 1, (q, num_shuffles(df))


def test_bh_battery_grid_bounded_no_cartesian(spark, sf_dir):
    df = QUERIES["q291_bh_fdr"](spark, sf_dir)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    # the sources × length-spine grid is built via a broadcast NLJ of
    # two bounded frames, never a shuffled product of row-scale inputs
    assert has_broadcast_join(df) or "BroadcastNestedLoopJoin" in plan


def test_band_pruning_keeps_pigeonhole_bands(spark):
    """White-box: at max_hamming=4 the 8-band layout must prune to
    EXACTLY max_hamming+1 = 5 bands (the lossless minimum), chosen by
    exact candidate volume — the constant zero-tail bands must be the
    ones dropped."""
    from metadata_ingestion_poc_spark.operators.multimodal import (
        hamming_banded_pairs,
    )

    # 40 signatures whose top 3 bytes are CONSTANT (zero-tail) and
    # lower bytes spread: the expensive bands are 5, 6, 7
    sig = spark.createDataFrame(
        [(i, (i * 2654435761) % (1 << 40)) for i in range(40)],
        "id long, h long",
    ).localCheckpoint(eager=True)
    out = hamming_banded_pairs(sig, 4, "h")
    plan = physical_plan(out)
    assert "CartesianProduct" not in plan
    # brute-force ground truth on the driver (40 sigs)
    rows = {r.id: r.h for r in sig.collect()}
    import itertools

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if bin(rows[a] ^ rows[b]).count("1") <= 4
    }
    got = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in out.collect()
    }
    assert got == want  # pruning stayed lossless


def test_plan_audit_is_total_over_the_registry():
    """The committed PLANS_r{N}.txt must audit EVERY registered query
    — round 13 shipped a 299-row audit against a 300-query registry
    (q302 landed after the audit ran), which silently weakened the
    zero-cartesian claim. Pin: the newest PLANS file in the repo root
    has exactly one row per registry entry. Regenerate with
    `python tools/audit_plans.py > PLANS_r<N>.txt` AFTER the last
    registry-touching commit of the round."""
    import glob
    import os
    import re

    plans = sorted(
        glob.glob("/root/repo/PLANS_r*.txt"),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    assert plans, "no PLANS_r*.txt committed"
    newest = plans[-1]
    audited = set()
    with open(newest) as fh:
        for line in fh:
            m = re.match(r"(q\d+[a-z]?_\w+)\s", line)
            if m:
                audited.add(m.group(1))
    missing = set(QUERIES) - audited
    assert not missing, (
        f"{os.path.basename(newest)} audits {len(audited)} queries but "
        f"the registry has {len(QUERIES)}; missing: {sorted(missing)[:5]}"
    )
