"""sf0.1 recall floors for every approximate similarity path.

The small-SF tests in test_similarity.py / test_dedup.py guard wiring;
these gates guard GEOMETRY — a regression in hyperplane generation,
centroid seeding, or band layout can keep row counts and determinism
intact while recall quietly collapses, and the driver's rows-only check
for q56/q58/q90 would never see it. Each floor is measured against
brute force over a 300-query subset at sf0.1 and pinned with the
margin recorded in SCALING.md §ANN. Every path is deterministic
(splitmix64 hyperplanes, id-seeded centroids, pure-function bucketing),
so the measured recall reproduces exactly — the floors are tight by
design, not flaky.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from metadata_ingestion_poc_spark.catalog import load_table
from metadata_ingestion_poc_spark.operators.similarity import (
    ann_topk,
    cosine_topk,
    lsh_ann_topk,
)
from metadata_ingestion_poc_spark.queries import QUERIES

SF01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason="sf0.1 testdata not present"
)


@pytest.fixture(scope="module")
def emb01(spark):
    return load_table(spark, SF01, "embeddings").cache()


@pytest.fixture(scope="module")
def exact_topk(spark, emb01):
    q = emb01.filter(F.col("vec_id") < 300)
    return {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(q, emb01, k=10).collect()
    }


def test_ivf_recall_floor_sf01(spark, emb01, exact_topk):
    # q90's path: ann_topk defaults (ivf, 32 cells, nprobe 16).
    # Measured 0.8173 on 2026-08-14.
    q = emb01.filter(F.col("vec_id") < 300)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk(q, emb01, k=10).collect()
    }
    recall = len(exact_topk & approx) / len(exact_topk)
    assert recall >= 0.8, f"IVF sf0.1 recall regressed: {recall}"


def test_lsh_topk_recall_floor_sf01(spark, emb01, exact_topk):
    # q56's path: 5 planes x 12 tables. Measured 0.6727 on 2026-08-14.
    q = emb01.filter(F.col("vec_id") < 300)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_ann_topk(
            q, emb01, k=10, n_planes=5, n_tables=12
        ).collect()
    }
    recall = len(exact_topk & approx) / len(exact_topk)
    assert recall >= 0.6, f"LSH sf0.1 recall regressed: {recall}"


def test_embedding_near_dup_recall_floor_sf01(spark):
    # q58's path vs the q57 exact audit subset (vec_id < 300, cosine
    # >= 0.3). q58 verifies exact cosine on its candidates, so inside
    # the subset its pairs must be a strict subset of q57's; recall is
    # the LSH candidate-generation dial. Measured 0.649 on 2026-08-14.
    exact = {
        (r.id_a, r.id_b)
        for r in QUERIES["q57_cosine_near_dup_exact"](spark, SF01).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in QUERIES["q58_cosine_near_dup_lsh"](spark, SF01).collect()
        if r.id_a < 300 and r.id_b < 300
    }
    assert got <= exact, "verified pairs must be a subset of exact pairs"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.6, f"near-dup sf0.1 recall regressed: {recall}"


def test_pq_recall_floors_sf01(spark, emb01, exact_topk):
    """PQ ADC + exact re-rank recall vs brute force (round 10).

    Two pinned operating points, both deterministic (id-hash seeds,
    decimal training sums, total-ordered rankings):
    - the registered q250 dial (m=8, ksub=16, 1 iter, rerank=150):
      measured 0.641 on 2026-08-15 — the cheap compressed-domain scan.
    - the quality dial (ksub=32, 2 iters, rerank=400): measured
      0.9457 — the recall/cost dial's other end, still scanning only
      codes + re-ranking 0.4% of the corpus per query.
    """
    from metadata_ingestion_poc_spark.operators.pq import (
        pq_encode,
        pq_topk_with_index,
        pq_train,
    )

    q = emb01.filter(F.col("vec_id") < 300)

    books = pq_train(emb01, ksub=16, iterations=1)
    codes = pq_encode(emb01, books).localCheckpoint(eager=True)
    cheap = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk_with_index(
            q, codes, books, emb01, k=10, rerank=150
        ).collect()
    }
    recall = len(exact_topk & cheap) / len(exact_topk)
    assert recall >= 0.6, f"PQ registered-dial recall regressed: {recall}"

    books_hq = pq_train(emb01, ksub=32, iterations=2)
    codes_hq = pq_encode(emb01, books_hq).localCheckpoint(eager=True)
    hq = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk_with_index(
            q, codes_hq, books_hq, emb01, k=10, rerank=400
        ).collect()
    }
    recall_hq = len(exact_topk & hq) / len(exact_topk)
    assert recall_hq >= 0.9, f"PQ quality-dial recall regressed: {recall_hq}"


def test_ivfpq_recall_floor_sf01(spark, emb01, exact_topk):
    """IVF-PQ composed floor (round 10): at the registered q254 dial
    (32 cells, nprobe 16, ksub=32, 1 train iter, rerank 300) the
    composition measured 0.7793 on 2026-08-15 — within 0.04 of plain
    IVF at the same nprobe (0.8173), i.e. compressed-domain scoring
    plus the bounded re-rank costs almost no recall."""
    from metadata_ingestion_poc_spark.operators.pq import ivfpq_topk

    q = emb01.filter(F.col("vec_id") < 300)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivfpq_topk(
            q, emb01, k=10, nprobe=16, ksub=32, iterations=1, rerank=300
        ).collect()
    }
    recall = len(exact_topk & approx) / len(exact_topk)
    assert recall >= 0.75, f"IVF-PQ sf0.1 recall regressed: {recall}"
