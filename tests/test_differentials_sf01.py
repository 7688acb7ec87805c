"""sf0.1 differential gates for operators whose failure modes only
appear above toy scale.

k-core: re-proves the fixed-round contract at 10x the graph.

The driver's sweep verifies q189 at sf0.01 (2,000-node graph, 6 peel
rounds).  This gate re-proves the SAME fixed-round contract at 10x the
graph (20,000 nodes, ~115 mean degree, cascade 20000 -> ... -> 17303)
— the scale where a wrong semi-join restriction, a lineage cut that
drops a round, or an off-by-one in the degree threshold would diverge
while the small graph happens to agree.  Comparison reuses the exact
canonicalization + order-insensitive hash from tools/check.py, so a
pass here means the driver's harness would pass too.

Runtime ~40 s (Spark iterative peel + DuckDB materialized-CTE unroll),
which is why it lives here rather than in the per-round sweep window.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check import table_hash  # noqa: E402

from metadata_ingestion_poc_spark.queries import QUERIES  # noqa: E402
from metadata_ingestion_poc_spark.queries.analytics4 import (  # noqa: E402
    _KCORE_K,
    _KCORE_ROUNDS,
    _kcore_oracle,
)

SF01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 testdata not present"
)


def test_kcore_sf01_matches_unrolled_cte_oracle(spark):
    import duckdb

    sdf = QUERIES["q189_kcore_decomposition"](spark, SF01)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF01}/lineitem.parquet')"
    )
    res = con.execute(_kcore_oracle(_KCORE_K, _KCORE_ROUNDS))
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert len(srows) == len(drows), (len(srows), len(drows))
    assert sorted(scols) == sorted(dcols)
    # the cascade must actually peel — a no-op kcore that returns the
    # whole graph would still hash-match a broken oracle
    assert 0 < len(srows) < 20_000
    assert table_hash(scols, srows) == table_hash(dcols, drows)


def test_decile_lift_sf01_complete(spark):
    """Round-7 regression gate: q180 at sf0.1 lost deciles 5-10 when
    global_row_number's offset collect and final join evaluated the
    range shuffle twice (nondeterministic sampling seed + AQE
    coalescing -> pid mismatch -> inner-join row loss). The operator
    now checkpoints one layout; this pins the visible symptom at the
    scale where it bit."""
    from metadata_ingestion_poc_spark.catalog import load_table

    rows = QUERIES["q180_decile_lift"](spark, SF01).collect()
    assert len(rows) == 10
    n_orders = load_table(spark, SF01, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders


def test_pagerank_sf01_matches_unrolled_oracle(spark):
    """Same gate for the OTHER iterative-float family: 4 unrolled
    pagerank rounds at sf0.1, where the capped co-purchase graph is at
    its sparsest (partner-in-cap probability shrinks with the key
    space) — the regime where a damping/deg-join bug could leave the
    small-SF result intact."""
    import duckdb

    from metadata_ingestion_poc_spark.queries.analytics3 import (
        _PR_ITERS,
        _pagerank_oracle,
    )

    sdf = QUERIES["q168_pagerank"](spark, SF01)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF01}/lineitem.parquet')"
    )
    res = con.execute(_pagerank_oracle(_PR_ITERS))
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows) and len(srows) > 0
    assert sorted(scols) == sorted(dcols)
    assert table_hash(scols, srows) == table_hash(dcols, drows)
