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
