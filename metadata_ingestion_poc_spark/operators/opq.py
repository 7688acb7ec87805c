"""Optimized Product Quantization (OPQ): a data-trained orthogonal
rotation in front of the PQ / IVF-PQ stack.

PQ slices vectors into m CONTIGUOUS subspaces and quantizes each
independently, so its distortion depends on how the data's variance
happens to fall across that fixed slicing: a corpus whose dominant
directions span subspace boundaries (or pile into one slice) wastes
most of the codebook budget. OPQ fixes the basis, not the budget —
learn an orthogonal d×d rotation R, quantize Rx instead of x. This is
the parametric solution of Ge, He, Ke & Sun, "Optimized Product
Quantization" (CVPR 2013 / TPAMI 2014) — public literature, built
Spark-first here: eigendecompose the data covariance and allocate
eigenvectors to subspaces balancing the per-subspace variance PRODUCT
(the paper's independence+balance criterion under a Gaussian
assumption). No alternating Procrustes loop: the parametric form
needs ONE covariance pass instead of per-iteration d×d cross-moment
passes, and on near-Gaussian data reaches most of the lift.

The 100-TB shape, stage by stage:

- **Training** adds exactly ONE bounded-statistics pass over what PQ
  already pays: the d-group mean rollup + d(d+1)/2-group covariance
  rollup from operators/pca.py (map-side combined; the exchange is
  bounded by d², never by rows). The eigendecomposition runs
  driver-side on the collected d×d matrix — numpy.linalg.eigh on a
  64×64 symmetric matrix, a constant-size object at any corpus scale
  (the power_iteration boundedness argument). Determinism: the
  covariance entries are 6-dp decimal-deterministic under any
  partitioning, eigh is deterministic for identical input on a given
  machine, eigenvalue order is a STABLE descending sort, and each
  eigenvector's sign is fixed (largest-|component| positive, first
  index on ties) — so the rotation literal is reproducible
  build-to-build.
- **Rotation** is pure codegen, zero shuffle: R enters every scan as
  ONE nested-array literal (d² 6-dp doubles — at d=64 the same plan-
  text class as the IVF-PQ reconstruction-norm table) and y = Rx is a
  transform/zip_with matvec per row, fused into the SAME scan that
  slices and encodes — the coding scan stays one zero-shuffle pass.
- **Query**: rotate the query (per-row matvec, |Q| rows), build the
  ADC lookup table from the rotated query against the rotated-space
  codebooks. Because R is orthogonal, <Rq, Rx> = <q, x> and norms are
  preserved, so ADC scores in the rotated space estimate the SAME
  cosine — and the exact re-rank runs in the ORIGINAL space against
  the untouched corpus, producing bit-identical exact scores to the
  plain PQ/IVF-PQ paths (dominance comparisons stay apples-to-apples,
  and the 6-dp rounding of R never touches the reported cosines).
- **IVF-PQ composition**: the rotation is trained on the RESIDUALS
  (what the codebooks actually see) and applied inside the existing
  single coding scan; the coarse probe and the <q, c_cell> term stay
  in the original space. The reconstruction norm uses the identity
  ‖c + Rᵀr̂‖ = ‖Rc + r̂‖: feed the ROTATED centroids to the existing
  norm-table builder and everything downstream is unchanged.

Where it helps: anisotropic corpora (the common case for learned
embeddings after projection heads) — pinned in tests/test_opq.py with
a planted-anisotropy fixture where OPQ cuts PQ distortion ~20× and
strictly lifts recall. Where it can't: the synthetic test embeddings
are near-isotropic (covariance eigenvalue spread <2×, per-subspace
variance products already balanced — measured round 12), so at sf0.1
OPQ is pinned as "no regression vs plain PQ" rather than a lift; and
composed IVF-PQ recall at a given nprobe is CEILINGED by the probed
cells (residual PQ already reaches that ceiling exactly, see
tests/test_ann_recall_sf01.py), so no quantizer improvement can raise
it — OPQ's value there is holding the ceiling at cheaper dials.

Reference parity note: the reference repo (metadata_ingestion, 249
LoC) has no similarity-search surface; this operator belongs to the
[EXT] LLM-data-pipeline family the build brief adds on top.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.determinism import _half_up
from .clustering import _checked_base
from .pca import covariance_upper, dim_means
from .pq import (
    Codebooks,
    RawCells,
    _adc_rerank,
    _cell_topn_expr,
    _codes_from_resid,
    _encode_on_base,
    _guarded_q_norm,
    _lut_expr,
    _norm_table_sql,
    _prepared_cells,
    _read_codebooks,
    _residual_frame,
    _train_books,
    _write_codebooks,
)
from .similarity import with_norm

Rotation = list[list[float]]  # rows = rotated dims; y = R @ x


# ---------------------------------------------------------------------------
# rotation training (driver-side on bounded d×d statistics)
# ---------------------------------------------------------------------------


def _eigh_desc(
    cov_upper: Mapping[tuple[int, int], float], dims: int
) -> tuple[list[float], list[list[float]]]:
    """Eigenvalues (descending, stable) + sign-fixed eigenvectors of
    the symmetric matrix given by its 1-indexed upper triangle.
    Driver-side numpy on a d×d constant-size object; input entries are
    6-dp decimal-deterministic, order and signs are fixed explicitly,
    so the output reproduces build-to-build."""
    C = np.zeros((dims, dims))
    for (i, j), v in cov_upper.items():
        C[i - 1, j - 1] = v
        C[j - 1, i - 1] = v
    ev, U = np.linalg.eigh(C)
    order = np.argsort(-ev, kind="stable")
    ev, U = ev[order], U[:, order]
    vecs: list[list[float]] = []
    for c in range(dims):
        v = U[:, c]
        pivot = int(np.argmax(np.abs(v)))  # first index on ties
        if v[pivot] < 0:
            v = -v
        vecs.append([float(x) for x in v])
    return [float(x) for x in ev], vecs


def _allocate_eigs(
    eigvals: Sequence[float], m: int, dsub: int
) -> list[list[int]]:
    """Eigenvalue allocation (Ge et al. §parametric): walk eigen-
    directions in descending-variance order, assigning each to the
    non-full bucket with the smallest current log-variance PRODUCT
    (lowest bucket index on ties) — the greedy balance of the paper's
    independence+balance objective. Returns m buckets of dsub
    eigenvector indices each."""
    buckets: list[list[int]] = [[] for _ in range(m)]
    logs = [0.0] * m
    for i, lam in enumerate(eigvals):
        cands = [b for b in range(m) if len(buckets[b]) < dsub]
        b = min(cands, key=lambda b: (logs[b], b))
        buckets[b].append(i)
        logs[b] += math.log(max(lam, 1e-12))
    return buckets


def opq_rotation_from_cov(
    cov_upper: Mapping[tuple[int, int], float], dims: int, m: int
) -> Rotation:
    """Rotation matrix (rows = rotated dims, y = R @ x) from a
    covariance upper triangle: eigendecompose, allocate eigenvectors
    to the m subspaces balancing variance products, round entries at
    6 dp (the literal-compactness discipline; orthogonality holds to
    ~1e-5, and nothing downstream depends on it exactly — the exact
    re-rank runs in the original space)."""
    if dims % m:
        raise ValueError(
            f"opq_rotation_from_cov: dims={dims} not divisible by m={m}"
        )
    ev, vecs = _eigh_desc(cov_upper, dims)
    buckets = _allocate_eigs(ev, m, dims // m)
    return [
        [_half_up(x, 6) for x in vecs[i]]
        for bucket in buckets
        for i in bucket
    ]


def opq_train_rotation(
    df: DataFrame,
    id_col: str | None = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    m: int = 8,
    cache: bool = True,
) -> Rotation:
    """Train an OPQ rotation from a vector frame: one mean pass + one
    covariance pass (both bounded-exchange, see operators/pca.py),
    then driver-side eigen-allocation. Validates through
    `_checked_base` like every trainer (a poisoned vector would
    silently drop out of the covariance sums)."""
    base, _, n = _checked_base(
        df, id_col, vec_col, cache, "opq_train_rotation", dims=dims
    )
    if n < 2:
        raise ValueError(
            f"opq_train_rotation: needs >= 2 rows, got {n}"
        )
    means = dim_means(base, vec_col, n)
    cov = covariance_upper(base, vec_col, dims, means, n)
    return opq_rotation_from_cov(cov, dims, m)


# ---------------------------------------------------------------------------
# rotation application (codegen literal matvec, zero shuffle)
# ---------------------------------------------------------------------------


def rotation_expr(vec_col: str, rotation: Rotation) -> str:
    """y = R x as ONE codegen expression: the rotation enters as a
    nested array literal (d² 6-dp doubles) and each output component
    is a zip_with dot product — no join, no shuffle, fuses into
    whatever scan projects it."""
    rows = ", ".join(
        "array(" + ", ".join(repr(float(x)) + "D" for x in row) + ")"
        for row in rotation
    )
    return (
        f"transform(array({rows}), rw -> "
        f"aggregate(zip_with(rw, {vec_col}, "
        f"(r, x) -> r * cast(x as double)), 0.0D, (a, v) -> a + v))"
    )


def rotate_vectors(
    df: DataFrame, rotation: Rotation, vec_col: str = "embedding"
) -> DataFrame:
    """Replace ``vec_col`` with its rotation — a per-row codegen map
    preserving every other column."""
    return df.withColumn(vec_col, F.expr(rotation_expr(vec_col, rotation)))


def _rotated_centroids(
    cents_raw: Mapping[int, Sequence[float]], rotation: Rotation
) -> RawCells:
    """R @ c per coarse cell, driver-side (n_cells·d² flops on
    already-collected state). Used for the IVF-PQ reconstruction-norm
    table via ‖c + Rᵀr̂‖ = ‖Rc + r̂‖."""
    return {
        cell: [
            sum(r * float(x) for r, x in zip(row, vec))
            for row in rotation
        ]
        for cell, vec in cents_raw.items()
    }


# ---------------------------------------------------------------------------
# OPQ + plain PQ
# ---------------------------------------------------------------------------


def opq_pq_build(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> tuple[Rotation, Codebooks, DataFrame]:
    """Train rotation + rotated-space codebooks + codes off ONE
    validated/checkpointed projection (the pq_ann_topk shared-base
    discipline: composing the public pieces would re-validate and
    re-checkpoint the same frame per stage). The rotated projection is
    itself lazily checkpointed — the covariance pass reads the base
    once, then training iterations and the coding scan read the
    rotated copy without re-paying the matvec."""
    if dims % m:
        raise ValueError(
            f"opq_pq_build: dims={dims} not divisible by m={m}"
        )
    base, _, n = _checked_base(corpus, id_col, vec_col, True,
                               "opq_pq_build", dims=dims)
    means = dim_means(base, vec_col, n)
    cov = covariance_upper(base, vec_col, dims, means, n)
    rotation = opq_rotation_from_cov(cov, dims, m)
    rot = rotate_vectors(base, rotation, vec_col).localCheckpoint(
        eager=False
    )
    books = _train_books(rot, id_col, vec_col, dims, m, ksub,
                         iterations, n, who="opq_pq_build")
    codes = _encode_on_base(rot, books, id_col, vec_col, dims)
    return rotation, books, codes


def opq_topk_with_index(
    queries: DataFrame,
    rotation: Rotation,
    codebooks: Codebooks,
    codes: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k cosine via rotated-space ADC + ORIGINAL-space exact
    re-rank (see the module docstring: <Rq, Rx> = <q, x>, so the ADC
    estimate targets the same cosine and the exact stage never sees
    the rotation). Mirrors pq_topk_with_index with the lut built from
    the rotated query — projected once as a named column, the
    CollapseProject multiply-reference rule."""
    q = (
        with_norm(queries, vec_col)
        .withColumn("__rq", F.expr(rotation_expr(vec_col, rotation)))
        .select(
            F.col(id_col).alias("query_id"),
            _guarded_q_norm(vec_col, dims, "opq_topk_with_index").alias(
                "q_norm"
            ),
            F.expr(_lut_expr("__rq", codebooks, dims)).alias("lut"),
            F.lit(0.0).alias("qc"),
        )
    )
    m = len(codebooks)
    rnorm = (
        "sqrt(aggregate(sequence(1, {m}), 0.0D, (a, s) -> "
        "a + element_at(element_at({nsq}, s), element_at(codes, s))))"
    ).format(m=m, nsq=_norm_table_sql(codebooks))
    joined = codes.crossJoin(F.broadcast(q))
    return _adc_rerank(
        joined, codebooks, queries, corpus,
        k=k, rerank=rerank, id_col=id_col, vec_col=vec_col,
        round_dp=round_dp,
        rnorm_sql=rnorm,
    )


def opq_pq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 2,
    rerank: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """OPQ-rotated PQ ANN in one call (the q250 shape plus the
    rotation dial). For the build-nightly / query-all-day split use
    opq_pq_build / save_opq_pq_index and query via
    opq_topk_with_index."""
    rotation, books, codes = opq_pq_build(
        corpus, m=m, ksub=ksub, iterations=iterations,
        id_col=id_col, vec_col=vec_col, dims=dims,
    )
    return opq_topk_with_index(
        queries, rotation, books, codes, corpus,
        k=k, rerank=rerank, id_col=id_col, vec_col=vec_col,
        dims=dims, round_dp=round_dp,
    )


# ---------------------------------------------------------------------------
# OPQ + IVF-PQ (rotation on residuals, inside the one coding scan)
# ---------------------------------------------------------------------------


def opq_ivfpq_build(
    corpus: DataFrame,
    n_cells: int = 32,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> tuple[RawCells, Rotation, Codebooks, DataFrame]:
    """IVF-PQ build with an OPQ rotation trained on the RESIDUALS —
    what the codebooks actually quantize (rotating raw vectors would
    optimize the wrong covariance: the coarse quantizer has already
    absorbed the between-cell structure). Same plan skeleton as
    ivfpq_build plus one bounded covariance pass over the checkpointed
    residual frame; the rotation matvec fuses into the residual
    projection, so coding remains ONE zero-shuffle scan."""
    if dims % m:
        raise ValueError(
            f"opq_ivfpq_build: dims={dims} not divisible by m={m}"
        )
    from .similarity import ivf_build_index

    base, _, n = _checked_base(corpus, id_col, vec_col, True,
                               "opq_ivfpq_build", dims=dims)
    cents, _ = ivf_build_index(
        base, n_cells=n_cells, id_col=id_col, vec_col=vec_col, n_rows=n,
        assignments=False,
    )
    cents_raw: RawCells = {
        int(r["cell"]): [float(x) for x in r["c_vec"]]
        for r in cents.collect()
        if float(r["c_norm"]) > 0
    }
    resid = _residual_frame(base, cents_raw, id_col, vec_col)
    resid = resid.localCheckpoint(eager=False)
    means = dim_means(resid, "rvec", n)
    cov = covariance_upper(resid, "rvec", dims, means, n)
    rotation = opq_rotation_from_cov(cov, dims, m)
    rot = resid.withColumn(
        "rvec", F.expr(rotation_expr("rvec", rotation))
    ).localCheckpoint(eager=False)
    books = _train_books(rot, "id", "rvec", dims, m, ksub,
                         iterations, n, who="opq_ivfpq_build")
    coded = _codes_from_resid(
        rot, books, dims, _rotated_centroids(cents_raw, rotation)
    )
    return cents_raw, rotation, books, coded


def opq_ivfpq_topk_with_index(
    queries: DataFrame,
    cents_raw: Mapping[int, Sequence[float]],
    rotation: Rotation,
    books: Codebooks,
    coded: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    rerank: int = 150,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k against a prebuilt (possibly reloaded) OPQ-IVF-PQ index.
    The probe ranking and the coarse term <q, c_cell> stay in the
    ORIGINAL space (rotation doesn't touch the coarse quantizer); the
    lut comes from the ROTATED query against the rotated-residual
    codebooks, and rn2 was coded with rotated centroids, so the ADC
    decomposition <q, x̂> = <q, c> + <Rq, r̂_rot> holds exactly (up to
    the 6-dp rotation rounding, which only perturbs candidate order —
    the exact re-rank is original-space)."""
    _, cents_norm, _, cnorm = _prepared_cells(cents_raw)
    q = (
        with_norm(queries, vec_col)
        .withColumn("__rq", F.expr(rotation_expr(vec_col, rotation)))
        .select(
            F.col(id_col).alias("query_id"),
            _guarded_q_norm(
                vec_col, dims, "opq_ivfpq_topk_with_index"
            ).alias("q_norm"),
            F.expr(_lut_expr("__rq", books, dims)).alias("lut"),
            F.explode(
                F.expr(_cell_topn_expr(vec_col, cents_norm, nprobe))
            ).alias("p"),
        )
        .select(
            "query_id",
            "q_norm",
            "lut",
            F.col("p.cell").alias("cell"),
            (-F.col("p.nd") * F.expr(f"element_at({cnorm}, p.pos)"))
            .alias("qc"),
        )
    )
    joined = coded.join(F.broadcast(q), "cell")
    return _adc_rerank(
        joined, books, queries, corpus,
        k=k, rerank=rerank, id_col=id_col, vec_col=vec_col,
        round_dp=round_dp,
        rnorm_sql="sqrt(rn2)",
    )


def opq_ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 32,
    nprobe: int = 8,
    m: int = 8,
    ksub: int = 16,
    iterations: int = 1,
    rerank: int = 150,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """OPQ-rotated IVF-PQ in one call (the q254 shape plus the
    rotation dial)."""
    cents_raw, rotation, books, coded = opq_ivfpq_build(
        corpus, n_cells=n_cells, m=m, ksub=ksub, iterations=iterations,
        id_col=id_col, vec_col=vec_col, dims=dims,
    )
    return opq_ivfpq_topk_with_index(
        queries, cents_raw, rotation, books, coded, corpus,
        k=k, nprobe=nprobe, rerank=rerank,
        id_col=id_col, vec_col=vec_col, dims=dims, round_dp=round_dp,
    )


# ---------------------------------------------------------------------------
# persistence (build nightly, query all day)
# ---------------------------------------------------------------------------


def save_opq_rotation(spark, rotation: Rotation, path: str) -> None:
    """Rotation wire format: (i, row) — one parquet row per rotated
    dimension, 1-indexed, shared by both OPQ index layouts."""
    spark.createDataFrame(
        [(i + 1, list(row)) for i, row in enumerate(rotation)],
        "i int, row array<double>",
    ).write.mode("overwrite").parquet(path)


def load_opq_rotation(spark, path: str) -> Rotation:
    rows = {
        r["i"]: [float(x) for x in r["row"]]
        for r in spark.read.parquet(path).collect()
    }
    return [rows[i] for i in sorted(rows)]


def save_opq_pq_index(
    spark, rotation: Rotation, codebooks: Codebooks, codes: DataFrame,
    path: str,
) -> None:
    """Persist an OPQ-PQ index: rotation + rotated-space codebooks +
    codes (the save_pq_index layout plus the rotation)."""
    save_opq_rotation(spark, rotation, f"{path}/rotation")
    _write_codebooks(spark, codebooks, f"{path}/codebooks")
    codes.write.mode("overwrite").parquet(f"{path}/codes")


def load_opq_pq_index(
    spark, path: str
) -> tuple[Rotation, Codebooks, DataFrame]:
    """Reload a persisted OPQ-PQ index; reload ≡ rebuild is pinned in
    tests/test_opq.py."""
    return (
        load_opq_rotation(spark, f"{path}/rotation"),
        _read_codebooks(spark, f"{path}/codebooks"),
        spark.read.parquet(f"{path}/codes"),
    )


def save_opq_ivfpq_index(
    spark,
    cents_raw: Mapping[int, Sequence[float]],
    rotation: Rotation,
    codebooks: Codebooks,
    coded: DataFrame,
    path: str,
) -> None:
    """Persist an OPQ-IVF-PQ index (the save_ivfpq_index layout plus
    the rotation). RAW centroids remain the wire format; the rotated
    centroids the norm table needs are re-derived on load."""
    spark.createDataFrame(
        [(c, list(v)) for c, v in sorted(cents_raw.items())],
        "cell int, c_vec array<double>",
    ).write.mode("overwrite").parquet(f"{path}/cells")
    save_opq_rotation(spark, rotation, f"{path}/rotation")
    _write_codebooks(spark, codebooks, f"{path}/codebooks")
    coded.write.mode("overwrite").parquet(f"{path}/coded")


def load_opq_ivfpq_index(
    spark, path: str
) -> tuple[RawCells, Rotation, Codebooks, DataFrame]:
    """Reload a persisted OPQ-IVF-PQ index; reload ≡ rebuild is pinned
    in tests/test_opq.py."""
    cents_raw = {
        int(r["cell"]): [float(x) for x in r["c_vec"]]
        for r in spark.read.parquet(f"{path}/cells").collect()
    }
    return (
        cents_raw,
        load_opq_rotation(spark, f"{path}/rotation"),
        _read_codebooks(spark, f"{path}/codebooks"),
        spark.read.parquet(f"{path}/coded"),
    )
