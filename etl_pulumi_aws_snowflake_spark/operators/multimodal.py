"""Multimodal (binary) column plumbing (SURVEY.md §2.10).

Images/audio/video are opaque ``binary`` payloads plus a typed metadata
struct.  The Spark-side contract — schema, Arrow batch shape, iterator
``mapInPandas`` signature, partition sizing — is real and tested; only
the media decode itself is stubbed (no codec libraries in this
container): :func:`decode_image` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature
vector so the distributed plumbing can be exercised end-to-end.

Scale notes:
- payloads travel Arrow-batched through ``mapInPandas`` (iterator form:
  one Python worker handles a whole partition without materializing it);
- ``spark.read.format("binaryFile")`` is the production source for
  media files; here payloads are synthesized from the documents table;
- keep binary partitions small (``maxPartitionBytes``) — a 128 MB
  parquet split of 5 MB images is ~25 rows, so row-group sizing, not
  row count, drives parallelism.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def as_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Documents → media-shaped rows: utf-8 payload + typed metadata.
    (Stand-in for ``spark.read.format("binaryFile")`` in production.)"""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


try:  # real decode path where a codec library exists (not this container)
    from PIL import Image as _PILImage  # pragma: no cover

    _HAVE_PIL = True
except ImportError:
    _PILImage = None
    _HAVE_PIL = False


def capabilities() -> dict[str, bool]:
    """One place to ask what the multimodal path can actually do in
    this deployment, instead of discovering a missing codec per-call:
    ``{"image_decode": ...}`` is True only when PIL imported at module
    load.  Callers that need real decode should check this up front;
    the fake/plumbing path is always available."""
    return {"image_decode": _HAVE_PIL}


def decode_image(payload: bytes, fake: bool = False) -> bytes:
    """Decode an image payload to raw RGB pixel bytes.

    Uses PIL when importable (guarded import — verified absent in this
    container, so the real branch is exercised only in codec-equipped
    deployments); ``fake=True`` returns the payload unchanged as a
    deterministic stand-in so the distributed plumbing stays testable
    everywhere."""
    if fake:
        return payload
    if _HAVE_PIL:
        import io

        import numpy as np

        img = _PILImage.open(io.BytesIO(payload))
        return np.asarray(img.convert("RGB")).tobytes()
    raise NotImplementedError(
        "image decode requires a codec library (e.g. PIL) not present "
        "in this environment; pass fake=True for plumbing tests"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads:
    (doc_id, n_bytes, checksum).  The checksum stands in for a real
    embedding/feature step; the iterator form streams partitions
    through one Python worker per core."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [decode_image(p, fake=True) for p in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' for the image-shaped path: deterministic byte-stride
    downsampling of each payload to ≈``target_bytes`` — (doc_id,
    in_bytes, stride, out_bytes, out_checksum).

    The stride pick (``max(1, in_bytes // target)``) and the sampled
    bytes are the deterministic stand-in for the codec-bound step (a
    real deployment swaps in ``PIL.Image.resize`` behind
    :func:`decode_image`); the batch shape — payload in, smaller
    payload-derived row out, one Python worker streaming a partition —
    is the part a real resizer shares.  Size/stride math is
    oracle-checked; the checksum is pytest-verified (bytes-level, not
    SQL-expressible without byte/char assumptions)."""

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("in_bytes", LongType()),
            StructField("stride", LongType()),
            StructField("out_bytes", LongType()),
            StructField("out_checksum", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "in_bytes", "stride", "out_bytes", "out_checksum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                buf = decode_image(payload, fake=True)
                n = len(buf)
                stride = max(1, n // target_bytes)
                out = buf[::stride]
                rows["doc_id"].append(doc_id)
                rows["in_bytes"].append(n)
                rows["stride"].append(stride)
                rows["out_bytes"].append(len(out))
                rows["out_checksum"].append(hashlib.md5(out).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' for the video-shaped path: emit one row per
    byte-offset sample of each payload (UDTF-shaped explode inside
    mapInPandas).  Deterministic fake for the codec-bound step; the
    per-row → many-rows batch shape is the part a real frame sampler
    shares."""

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_no", LongType()),
            StructField("frame_byte", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, vals = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                buf = decode_image(payload, fake=True)
                for i, off in enumerate(range(0, len(buf), every_n_bytes)):
                    ids.append(doc_id)
                    frames.append(i)
                    vals.append(buf[off])
            yield pd.DataFrame({"doc_id": ids, "frame_no": frames, "frame_byte": vals})

    return media.mapInPandas(run, schema)
