"""Basket co-occurrence lift (operators/basket.py): planted-pair
recovery, exact count/ratio arithmetic, min-support pruning, top-k
cut determinism, and input validation."""

from __future__ import annotations

import pytest

from metadata_ingestion_poc_spark.operators.basket import pair_lift


def _planted(spark):
    # 12 baskets: X and Y ALWAYS co-occur (6 baskets); Z floats
    # independently across 6 of 12; W appears once with X,Y.
    rows = []
    for b in range(6):
        rows += [(b, "X"), (b, "Y")]
    for b in range(3, 9):
        rows.append((b, "Z"))
    rows.append((0, "W"))
    for b in range(9, 12):
        rows.append((b, "Q"))
    return spark.createDataFrame(rows, "basket int, item string")


def test_planted_pair_tops_lift(spark):
    out = pair_lift(_planted(spark), "basket", "item").collect()
    d = {(r.item_a, r.item_b): r for r in out}
    xy = d[("X", "Y")]
    # perfect co-occurrence: confidence 1, lift = N/n_y = 12/6 = 2
    assert xy.n_pair == 6 and xy.n_a == 6 and xy.n_b == 6
    assert xy.n_baskets == 12
    assert xy.confidence == 1.0
    assert xy.lift == 2.0
    assert xy.support == 0.5
    # the planted pair dominates every cross pair's lift
    assert all(
        xy.lift >= r.lift for r in out
    ), sorted((r.lift, r.item_a, r.item_b) for r in out)
    # X–Z co-occur in 3 of the 6 Z-baskets: lift = 3·12/(6·6) = 1
    xz = d[("X", "Z")]
    assert xz.n_pair == 3 and xz.lift == 1.0


def test_min_support_prunes_before_join(spark):
    out = pair_lift(
        _planted(spark), "basket", "item", min_pair_support=2
    ).collect()
    pairs = {(r.item_a, r.item_b) for r in out}
    assert ("W", "X") not in pairs  # W co-occurs only once
    assert ("X", "Y") in pairs


def test_top_k_cut_is_total_ordered(spark):
    out = pair_lift(_planted(spark), "basket", "item", top_k=2).collect()
    assert len(out) == 2
    assert (out[0].item_a, out[0].item_b) == ("X", "Y")


def test_duplicate_items_in_basket_count_once(spark):
    df = spark.createDataFrame(
        [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B")],
        "basket int, item string",
    )
    out = {(r.item_a, r.item_b): r for r in pair_lift(df, "basket", "item").collect()}
    assert out[("A", "B")].n_pair == 2  # presence, not multiplicity
    assert out[("A", "B")].n_a == 2


def test_min_support_validation(spark):
    with pytest.raises(ValueError, match=">= 1"):
        pair_lift(_planted(spark), "basket", "item", min_pair_support=0)
