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
