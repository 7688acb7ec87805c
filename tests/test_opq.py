"""OPQ rotation: geometry, determinism, the planted-anisotropy lift,
and index persistence.

The lift test is the load-bearing one: the synthetic sf* embeddings
are near-isotropic (eigenvalue spread <2×), where OPQ ≈ identity by
design, so the operator's value is pinned here on a PLANTED
anisotropic corpus — variance concentrated in a few directions that
deliberately span PQ's contiguous subspace boundaries, the worst case
for identity-slicing PQ and exactly what eigenvalue allocation fixes.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metadata_ingestion_poc_spark.operators.opq import (
    _allocate_eigs,
    load_opq_ivfpq_index,
    load_opq_pq_index,
    opq_ivfpq_build,
    opq_ivfpq_topk,
    opq_ivfpq_topk_with_index,
    opq_pq_ann_topk,
    opq_pq_build,
    opq_topk_with_index,
    opq_train_rotation,
    rotate_vectors,
    save_opq_ivfpq_index,
    save_opq_pq_index,
)
from metadata_ingestion_poc_spark.operators.pq import (
    pq_ann_topk,
    pq_reconstruction_stats,
    pq_train,
)
from metadata_ingestion_poc_spark.operators.similarity import cosine_topk

D, M, KSUB, N = 16, 4, 8, 400


def _planted_rows():
    """Anisotropic corpus: 4 dominant directions (var 4.0) from a
    seeded random orthogonal basis, the rest near-noise (var 0.0025).
    The dominant directions mix ALL original coordinates, so identity
    PQ sees high variance smeared across every contiguous subspace."""
    rng = np.random.RandomState(7)
    Q, _ = np.linalg.qr(rng.randn(D, D))
    scales = np.full(D, 0.05)
    scales[:4] = 2.0
    X = (rng.randn(N, D) * scales) @ Q.T
    return [(i, [round(float(v), 6) for v in X[i]]) for i in range(N)]


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(
        _planted_rows(), "vec_id int, embedding array<double>"
    ).cache()


@pytest.fixture(scope="module")
def rotation(planted):
    return opq_train_rotation(planted, dims=D, m=M)


def test_rotation_is_orthogonal(rotation):
    R = np.array(rotation)
    assert R.shape == (D, D)
    # entries are 6-dp rounded, so orthogonality holds to ~1e-4
    assert np.abs(R @ R.T - np.eye(D)).max() < 1e-4


def test_rotation_deterministic(planted, rotation):
    again = opq_train_rotation(planted, dims=D, m=M)
    assert again == rotation


def test_rotation_preserves_dots(spark, planted, rotation):
    rows = planted.orderBy("vec_id").limit(20).collect()
    X = np.array([r["embedding"] for r in rows])
    rot = rotate_vectors(
        planted.filter(F.col("vec_id") < 20).orderBy("vec_id"), rotation
    ).collect()
    Y = np.array([r["embedding"] for r in rot])
    assert np.abs(X @ X.T - Y @ Y.T).max() < 1e-3


def test_allocation_balances_products():
    # 8 eigendirections into 4 buckets of 2: the greedy pairs the
    # largest remaining with the smallest log-product bucket, so
    # products even out — and every bucket is exactly full.
    ev = [256.0, 64.0, 16.0, 4.0, 1.0, 0.25, 0.0625, 0.015625]
    buckets = _allocate_eigs(ev, 4, 2)
    assert sorted(len(b) for b in buckets) == [2, 2, 2, 2]
    assert sorted(i for b in buckets for i in b) == list(range(8))
    prods = [np.prod([ev[i] for i in b]) for b in buckets]
    naive = [ev[0] * ev[1], ev[2] * ev[3], ev[4] * ev[5], ev[6] * ev[7]]
    assert max(prods) / min(prods) < max(naive) / min(naive)


def _total_distortion(df, books):
    rows = pq_reconstruction_stats(
        df, books, dims=D, cache=False
    ).collect()
    return sum(r["sum_d2"] for r in rows)


def test_planted_anisotropy_distortion_lift(planted, rotation):
    """The headline claim: on anisotropic data, quantizing in the
    rotated basis cuts total squared reconstruction error by a large
    factor (~20× at this fixture's spectrum) vs identity-subspace PQ
    with the identical codebook budget."""
    books_id = pq_train(planted, dims=D, m=M, ksub=KSUB, iterations=3)
    d_id = _total_distortion(planted, books_id)
    rot_df = rotate_vectors(planted, rotation).localCheckpoint(
        eager=True
    )
    books_r = pq_train(rot_df, dims=D, m=M, ksub=KSUB, iterations=3)
    d_r = _total_distortion(rot_df, books_r)
    assert d_r * 3 < d_id, (
        f"OPQ distortion {d_r} not well below identity-PQ {d_id}"
    )


def test_planted_anisotropy_recall_lift(spark, planted):
    """Recall against brute force: OPQ must not lose to identity PQ on
    the planted corpus (both fully deterministic, so this compares
    exact reproducible quantities)."""
    q = planted.filter(F.col("vec_id") < 40)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(q, planted, k=5).collect()
    }
    dial = dict(k=5, m=M, ksub=KSUB, iterations=2, rerank=25, dims=D)
    got_id = {
        (r.query_id, r.neighbor_id)
        for r in pq_ann_topk(q, planted, **dial).collect()
    }
    got_opq = {
        (r.query_id, r.neighbor_id)
        for r in opq_pq_ann_topk(q, planted, **dial).collect()
    }
    r_id = len(exact & got_id) / len(exact)
    r_opq = len(exact & got_opq) / len(exact)
    assert r_opq >= r_id, (
        f"OPQ recall {r_opq} lost to identity PQ {r_id} on anisotropic "
        f"data"
    )
    assert r_opq >= 0.9, f"OPQ recall unexpectedly low: {r_opq}"


def test_opq_topk_shape_and_ranks(spark, planted):
    q = planted.filter(F.col("vec_id") < 8)
    out = opq_pq_ann_topk(
        q, planted, k=5, m=M, ksub=KSUB, iterations=1, rerank=20, dims=D
    )
    rows = out.collect()
    assert set(out.columns) == {"query_id", "neighbor_id", "cosine",
                                "rank"}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == set(range(8))
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_opq_pq_reload_equals_rebuild(spark, planted, tmp_path):
    rotation, books, codes = opq_pq_build(
        planted, m=M, ksub=KSUB, iterations=1, dims=D
    )
    path = str(tmp_path / "opq_pq_idx")
    save_opq_pq_index(spark, rotation, books, codes, path)
    r2, b2, c2 = load_opq_pq_index(spark, path)
    assert r2 == rotation
    assert b2 == books
    q = planted.filter(F.col("vec_id") < 10)
    fresh = opq_topk_with_index(
        q, rotation, books, codes, planted, k=5, rerank=20, dims=D
    ).collect()
    reloaded = opq_topk_with_index(
        q, r2, b2, c2, planted, k=5, rerank=20, dims=D
    ).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(fresh, key=key) == sorted(reloaded, key=key)


def test_opq_ivfpq_reload_equals_rebuild(spark, planted, tmp_path):
    cents, rotation, books, coded = opq_ivfpq_build(
        planted, n_cells=8, m=M, ksub=KSUB, iterations=1, dims=D
    )
    coded = coded.localCheckpoint(eager=True)
    path = str(tmp_path / "opq_ivfpq_idx")
    save_opq_ivfpq_index(spark, cents, rotation, books, coded, path)
    c2, r2, b2, coded2 = load_opq_ivfpq_index(spark, path)
    assert c2 == cents
    assert r2 == rotation
    assert b2 == books
    q = planted.filter(F.col("vec_id") < 10)
    fresh = opq_ivfpq_topk_with_index(
        q, cents, rotation, books, coded, planted,
        k=5, nprobe=4, rerank=30, dims=D,
    ).collect()
    reloaded = opq_ivfpq_topk_with_index(
        q, c2, r2, b2, coded2, planted,
        k=5, nprobe=4, rerank=30, dims=D,
    ).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(fresh, key=key) == sorted(reloaded, key=key)


def test_opq_ivfpq_topk_one_call(spark, planted):
    q = planted.filter(F.col("vec_id") < 8)
    rows = opq_ivfpq_topk(
        q, planted, k=5, n_cells=8, nprobe=8, m=M, ksub=KSUB,
        iterations=1, rerank=50, dims=D,
    ).collect()
    # nprobe == n_cells probes everything: with a generous rerank the
    # composed path must agree with brute force on the planted corpus
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(q, planted, k=5).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.9, f"full-probe OPQ-IVF-PQ recall low: {recall}"
