"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The Spark-side contract is fully real — schemas, partitioning, UDF
signatures, batch shapes, 1→N frame fan-out via mapInPandas — while the
codec step is a STUB: this environment ships no image/audio libraries,
so decode attempts real codecs (PIL) behind an import-try and otherwise
uses a clearly-marked deterministic fake derived from the bytes. Swap
`_decode_image_bytes` for a real decoder and nothing else changes.

In production the blob column comes from ``spark.read.format(
"binaryFile")`` (path/length/modificationTime/content) or from blob
pointers into object storage; at 100 TB you keep blobs OUT of shuffle
paths — derive features early, project the binary away, and join
features back by key.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOB_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("blob_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def synthetic_blob_table(docs: DataFrame) -> DataFrame:
    """Deterministic binary fixture: document text encoded as bytes.

    Stands in for binaryFile scans so the pipeline shape is testable
    without media files.
    """
    return docs.select(
        F.col("doc_id").alias("blob_id"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.length(F.col("text")).cast("long").alias("n_bytes"),
    )


def _decode_image_bytes(content: bytes) -> tuple[int, int]:
    """STUB decode. Tries a real codec; otherwise a deterministic fake
    (dimensions derived from the byte content) so tests are stable.
    """
    try:  # real path, unavailable in this container
        import io

        from PIL import Image  # type: ignore

        with Image.open(io.BytesIO(content)) as im:
            return im.width, im.height
    except Exception:
        # deterministic fake: NOT a real decode
        n = len(content)
        return (n % 640) + 1, ((n * 7) % 480) + 1


def decode_metadata(blobs: DataFrame) -> DataFrame:
    """Per-blob decoded metadata via mapInPandas (Arrow batches in,
    Arrow batches out; the binary column never round-trips per row)."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            dims = [_decode_image_bytes(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "blob_id": pdf["blob_id"],
                    "media_type": pdf["media_type"],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return blobs.mapInPandas(decode, schema=DECODED_SCHEMA)


def extract_features(blobs: DataFrame, dim: int = 16) -> DataFrame:
    """Fixed-dim feature vector per blob (deterministic stand-in for a
    real encoder). Vectorized over Arrow batches with numpy."""
    from pyspark.sql.pandas.functions import pandas_udf

    def feats(content):
        import numpy as np
        import pandas as pd

        out = []
        for c in content:
            b = np.frombuffer(bytes(c), dtype=np.uint8)
            # deterministic fake embedding: bucketed byte histograms
            hist = np.bincount(b % dim, minlength=dim).astype(np.float32)
            denom = float(len(b)) if len(b) else 1.0
            out.append(hist / denom)
        return pd.Series(out)

    udf = pandas_udf(feats, ArrayType(FloatType()))
    return blobs.select("blob_id", "media_type", udf(F.col("content")).alias("features"))


def sample_frames(blobs: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """1→N fan-out: sample 'frames' (byte slices in the stub) from each
    video blob via mapInPandas — the batch shape a real frame sampler
    (ffmpeg/pyav) plugs into."""

    def frames(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, chunks = [], [], []
            for bid, content in zip(pdf["blob_id"], pdf["content"]):
                data = bytes(content)
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    ids.append(bid)
                    idxs.append(i)
                    chunks.append(data[off : off + every_n_bytes])
            yield pd.DataFrame(
                {"blob_id": ids, "frame_idx": idxs, "frame_bytes": chunks}
            )

    videos = blobs.filter(F.col("media_type").startswith("video/"))
    return videos.mapInPandas(frames, schema=FRAME_SCHEMA)


def _gray32(content: bytes):
    """STUB decode to a 32×32 grayscale float matrix. Tries a real
    codec (PIL, absent in this container); otherwise a deterministic
    fake — the byte stream resampled to a 1024-pixel intensity grid —
    so near-identical blobs land on near-identical matrices and the
    perceptual-hash plumbing is testable without media files. Swap
    this for a real decode+resize and nothing downstream changes."""
    import numpy as np

    try:  # real path, unavailable in this container
        import io

        from PIL import Image  # type: ignore

        with Image.open(io.BytesIO(content)) as im:
            g = im.convert("L").resize((32, 32))
            return np.asarray(g, dtype=np.float64)
    except Exception:
        # pad/truncate, NOT resample: a resampled grid shifts EVERY
        # pixel when the length changes, so a 2-byte append would
        # scramble the whole hash — the opposite of perceptual. With
        # a fixed grid a local byte edit stays a local pixel edit
        # (what a real decoded image gives), at the documented stub
        # cost that bytes past 1024 don't influence the fake hash.
        b = np.frombuffer(content[:1024], dtype=np.uint8)
        img = np.zeros(1024, dtype=np.float64)
        img[: len(b)] = b
        return img.reshape(32, 32)


def _dct32():
    """Orthonormal 32-point DCT-II basis matrix (numpy has no dct;
    one 32×32 cosine table built per executor is free)."""
    import numpy as np

    i = np.arange(32, dtype=np.float64)
    k = i.reshape(-1, 1)
    m = np.cos(np.pi * (2 * i + 1) * k / 64.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / 32.0)


def _phash_udf():
    """The 64-bit DCT pHash as a reusable Arrow-batched pandas UDF —
    shared by phash64 (per-blob) and scene_segments (per-frame), so
    neither has to force its keys through a packed surrogate id."""
    from pyspark.sql.pandas.functions import pandas_udf

    def ph(content):
        import numpy as np
        import pandas as pd

        dct = _dct32()
        weights = (np.int64(1) << np.arange(63, -1, -1, dtype=np.int64))
        out = []
        for c in content:
            img = _gray32(bytes(c))
            coef = dct @ img @ dct.T
            block = coef[:8, :8].copy().ravel()
            med = np.median(block[1:])  # exclude the DC term
            bits = (block > med).astype(np.int64)
            # two's-complement pack: numpy int64 multiply wraps, which
            # IS the desired bit pattern for the sign bit
            out.append(int((bits * weights).sum()))
        return pd.Series(out, dtype="int64")

    return pandas_udf(ph, LongType())


def phash64(
    blobs: DataFrame,
    id_col: str = "blob_id",
    content_col: str = "content",
) -> DataFrame:
    """(id, phash long): 64-bit perceptual hash of each blob.

    The classic pHash construction (public literature: DCT perceptual
    hashing, e.g. Zauner 2010): decode → 32×32 grayscale → 2-D DCT-II
    → keep the 8×8 lowest-frequency block → threshold each coefficient
    against the median of the 63 non-DC values → 64 bits, packed
    row-major into one signed long (two's complement — Spark's
    bit_count/bitwiseXOR are bitwise on longs, so sign never matters).

    Arrow-batched pandas UDF over the binary column (the sanctioned
    UDF case: a DCT matmul has no built-in form); one numpy
    einsum-free double matmul per blob, vectorized per batch. ZERO
    shuffle — a pure map over the corpus, like simhash. Hamming
    distance between hashes tracks perceptual distance, which is what
    the banded near-dup join below exploits."""
    udf = _phash_udf()
    from .dedup import _spread

    return _spread(blobs).select(
        F.col(id_col).alias("id"), udf(F.col(content_col)).alias("phash")
    )


def phash_near_dup_pairs(
    blobs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "blob_id",
    content_col: str = "content",
) -> DataFrame:
    """Near-duplicate blob pairs with pHash Hamming distance ≤
    max_hamming — the multimodal twin of simhash_pairs (dedup.py).

    Band trick (pigeonhole, LOSSLESS for the Hamming metric): split
    the 64 bits into `bands` equal chunks with bands > max_hamming —
    any pair within distance max_hamming is identical in ≥ 1 chunk, so
    banded candidate generation has ZERO recall loss vs the O(n²)
    brute-force scan (pinned in tests/test_multimodal.py). Candidates
    are bucket co-members per (band, chunk) — one shuffle via the
    shared _bucket_pairs rollup — then verified with an exact popcount
    of the XOR; the binary column never enters the join (hashes are
    id + one long, tiny at any corpus size).
    """
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    for bands, width in ((4, 16), (8, 8), (16, 4)):
        if max_hamming < bands:
            break
    else:
        raise ValueError(
            f"max_hamming={max_hamming} needs > 16 bands of a 64-bit "
            f"hash; use a brute-force scan instead"
        )
    from .dedup import _bucket_pairs

    # one materialization: the signature plan (decode + DCT UDF) feeds
    # banding AND both verification sides — without the cut the UDF
    # would run three times over the corpus.
    sig = phash64(blobs, id_col, content_col).localCheckpoint(eager=False)
    mask = (1 << width) - 1
    banded = sig.select(
        F.col("id").alias("doc"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("phash"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.chunk")
    candidates = _bucket_pairs(banded, ["band", "chunk"], "doc").distinct()
    fa = sig.select(F.col("id").alias("doc_a"), F.col("phash").alias("pa"))
    fb = sig.select(F.col("id").alias("doc_b"), F.col("phash").alias("pb"))
    return (
        candidates.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select(
            F.col("doc_a").alias("id_a"),
            F.col("doc_b").alias("id_b"),
            F.bit_count(
                F.col("pa").bitwiseXOR(F.col("pb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def scene_segments(
    frames: DataFrame,
    scene_threshold: int = 8,
) -> DataFrame:
    """Temporal scene-change segmentation over a frame table.

    The classic shot-boundary detector (public literature: threshold
    on inter-frame perceptual distance), Spark-shaped: hash every
    frame with the pHash pandas UDF (zero shuffle, pure map), then ONE
    per-blob window pass — Hamming distance to the previous frame via
    bit_count(xor), a boundary wherever it exceeds ``scene_threshold``,
    and scene ids as the running boundary count. The window partitions
    by blob, so a billion blobs parallelize; frames-per-blob bounds
    the per-partition sort, exactly the bounded-window argument of the
    other sequence operators.

    Returns (blob_id, scene_id, start_frame, n_frames) — one row per
    detected scene, ordered within blob.
    """
    from pyspark.sql import Window

    if scene_threshold < 0 or scene_threshold > 64:
        raise ValueError(f"scene_threshold out of [0, 64]: {scene_threshold}")
    # hash frames in place — (blob_id, frame_idx) ride along, so no
    # surrogate-id packing that a billion-frame blob could overflow
    hashed = frames.select(
        "blob_id",
        "frame_idx",
        _phash_udf()(F.col("frame_bytes")).alias("phash"),
    )
    w = Window.partitionBy("blob_id").orderBy("frame_idx")
    seg = hashed.withColumn(
        "d",
        F.when(F.lag("phash").over(w).isNull(), F.lit(None)).otherwise(
            F.bit_count(
                F.col("phash").bitwiseXOR(F.lag("phash").over(w))
            )
        ),
    ).withColumn(
        "scene_id",
        F.sum(
            F.when(F.col("d") > scene_threshold, 1).otherwise(0)
        ).over(w).cast("int"),
    )
    return (
        seg.groupBy("blob_id", "scene_id")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.count(F.lit(1)).cast("long").alias("n_frames"),
        )
        .orderBy("blob_id", "scene_id")
    )
