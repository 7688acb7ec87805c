from __future__ import annotations

from pyspark.sql import Row

from metadata_ingestion_poc_spark.operators.components import (
    connected_components,
)


def test_components_basic_chain_and_islands(spark):
    # chain 1-2-3-4, island 10-11, isolated edge 20-21
    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=4),
         Row(src=10, dst=11), Row(src=21, dst=20)]
    )
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_components_long_path_needs_many_rounds(spark):
    # path of 12 nodes: diameter 11 → exercises the iteration loop
    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(11)]
    )
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 12


def test_components_cycle(spark):
    edges = spark.createDataFrame(
        [Row(src=5, dst=6), Row(src=6, dst=7), Row(src=7, dst=5)]
    )
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert out == {5: 5, 6: 5, 7: 5}


def _chain(spark, length: int):
    return spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(length)])


def test_star_converges_in_log_rounds_vs_propagation_linear(spark):
    # Path graph of L edges: diameter L. Min-label propagation needs
    # ~L rounds; star contraction ~log2(L). This pins the O(log n)
    # claim in the module docstring with an actual round-count bound.
    L = 16
    stats_star: dict = {}
    stats_prop: dict = {}
    star = connected_components(
        _chain(spark, L), algorithm="star", stats=stats_star
    )
    prop = connected_components(
        _chain(spark, L), algorithm="propagation", stats=stats_prop
    )
    expect = {i: 0 for i in range(L + 1)}
    assert {r.node: r.component for r in star.collect()} == expect
    assert {r.node: r.component for r in prop.collect()} == expect
    assert stats_star["converged"] and stats_prop["converged"]
    # log2(16)+2 = 6 rounds for star (plus the fixed-point-confirming
    # round); propagation needs at least L/2 rounds on this diameter.
    assert stats_star["rounds"] <= 7
    assert stats_prop["rounds"] >= L // 2
    assert stats_star["rounds"] < stats_prop["rounds"]


def test_components_reliable_checkpoint(spark, tmp_path):
    # reliable=True uses fault-tolerant checkpoint(): needs a dir.
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = _chain(spark, 8)
    stats: dict = {}
    out = connected_components(edges, reliable=True, stats=stats)
    assert {r.node: r.component for r in out.collect()} == {
        i: 0 for i in range(9)
    }
    assert stats["converged"]


def test_components_max_iter_exhaustion_warns(spark):
    import warnings as _w

    edges = _chain(spark, 16)
    stats: dict = {}
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        connected_components(
            edges, algorithm="star", max_iter=1, stats=stats
        ).collect()
    assert not stats["converged"]
    assert any("max_iter" in str(c.message) for c in caught)
