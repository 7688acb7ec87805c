

def test_densest_peel_density_climbs_and_truncates(spark):
    """Round-10 gates for densest_subgraph_peel: (a) on a planted
    clique + pendant fringe, density strictly climbs as the fringe
    peels and the clique survives; (b) a REGULAR graph (every degree
    equal to the average) peels everyone in round 1's cut, so round 2
    truncates — the same contract the oracle's `WHERE n > 0` rows
    encode."""
    from metadata_ingestion_poc_spark.operators.graph import (
        densest_subgraph_peel,
    )

    # K6 clique (ids 0-5) + 12 pendant leaves each hanging off one
    # clique node: leaves have degree 1 < avg, clique degree 5+.
    rows = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    rows += [(i % 6, 100 + i) for i in range(12)]
    edges = spark.createDataFrame(rows, "u long, v long")
    traj = densest_subgraph_peel(edges, rounds=3)
    assert traj[0][1] == 18 and traj[0][2] == 27  # 18 nodes, 27 edges
    dens = [d for _, _, _, d, _ in traj]
    assert dens == sorted(dens) and dens[-1] > dens[0]
    assert traj[-1][1] == 6 and traj[-1][2] == 15  # the clique core

    # 4-cycle: 2-regular, avg degree exactly 2 — everyone peels.
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "u long, v long"
    )
    traj2 = densest_subgraph_peel(cyc, rounds=3)
    assert len(traj2) == 1 and traj2[0][1] == 4
