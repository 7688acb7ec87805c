"""Twelfth analytics batch (round 12): OPQ-rotated ANN dials,
multiple-comparison control, audio fingerprinting, and streaming
sketch twins.

Cross-engine discipline notes for this batch follow the module rule
stated in functions/determinism.py (round 12): one IEEE op over exact
operands may ship raw; chained float expressions round at 6 dp in
both engines; integer grid keys derive via FLOOR(x + 0.5), never
ROUND/CAST on a double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from ..catalog import load_table

# ---------------------------------------------------------------------------
# q289 — OPQ-rotated product-quantization ANN (operators/opq.py): the
# q250 dial with a data-trained orthogonal rotation in front of the
# subspace slicing (parametric OPQ, Ge et al. CVPR 2013 — eigenvalue
# allocation over one bounded covariance pass; rotation enters every
# scan as a d² literal matvec, candidate generation runs in the
# rotated space, exact re-rank in the ORIGINAL space so reported
# cosines are bit-identical to the plain paths). rows-only
# (approximate by design, the q250 precedent): the lift is pinned in
# tests/test_opq.py on a planted anisotropic corpus (distortion ≥3×
# lower, recall ≥ identity PQ); on the near-isotropic synthetic
# embeddings OPQ is pinned as no-regression at sf0.1
# (tests/test_ann_recall_sf01.py).
# ---------------------------------------------------------------------------


@query("q289_opq_ann_topk")
def q289_opq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.opq import opq_pq_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return opq_pq_ann_topk(
        queries_df, emb, k=10, ksub=16, iterations=1, rerank=150
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------------------------
# q290 — OPQ-rotated IVF-PQ (operators/opq.py opq_ivfpq_topk): the
# q254 IVFADC dial with the rotation trained on the RESIDUALS (what
# the codebooks actually quantize) and fused into the same single
# zero-shuffle coding scan; the coarse probe and <q, c_cell> stay in
# the original space, the reconstruction norm uses ‖c + Rᵀr̂‖ =
# ‖Rc + r̂‖ so the existing norm-table machinery applies verbatim to
# rotated centroids. rows-only; at the registered dial the composed
# recall HOLDS the probed-cell ceiling exactly (0.8173 at sf0.1 —
# residual PQ already reached it, and no quantizer improvement can
# exceed a probe-budget ceiling; pinned in
# tests/test_ann_recall_sf01.py).
# ---------------------------------------------------------------------------


@query("q290_opq_ivfpq_topk")
def q290_opq_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.opq import opq_ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    return opq_ivfpq_topk(
        queries_df, emb, k=10,
        nprobe=16, m=16, ksub=32, iterations=1, rerank=400,
    ).orderBy("query_id", "rank")
