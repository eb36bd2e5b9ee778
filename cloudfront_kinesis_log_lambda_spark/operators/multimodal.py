"""Multimodal column support: binary payloads + typed metadata.

Design (SURVEY.md §2.6): image/audio/video travel as opaque ``binary``
columns beside a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched functions over
``mapInPandas`` — the batch shape (one Arrow record batch in, one out)
is what keeps 100 TB of payload bytes off the Python heap at once.

The heavy codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode step is stubbed two ways, both behind real Spark plumbing:

- ``decode_image`` raises ``NotImplementedError`` unless a decoder is
  importable — the production seam;
- ``fake_decode_meta`` / ``byte_histogram_features`` are deterministic
  pure-Python stand-ins, so schema, partitioning, UDF signature, and
  batch shape are all exercised by real tests TODAY.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
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

#: schema of a multimodal asset row: payload + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a fake 'image' payload so the
    multimodal path is exercisable against the driver testdata."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> object:
    """Production decode seam. Raises until a decoder library is present.

    Referenced by :func:`extract_features` when ``real_decode=True``.
    """
    try:
        from PIL import Image  # noqa: F401  (not in this container)
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow, which is not installed in "
            "this environment; use the deterministic fake path instead"
        ) from e
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


def decoded_image_features(payload: bytes, dim: int = 16) -> list[float]:
    """REAL-decode features: grayscale-pixel histogram of the decoded,
    16×16-thumbnailed image — the feature vector actually derived from
    :func:`decode_image`'s output (same ``dim``-float shape as the fake
    path, so downstream similarity ops are oblivious to which path ran).
    Raises the decode seam's NotImplementedError when no decoder
    library is present. NULL/empty payloads yield the zero vector (the
    same graceful contract as the fake path — one corrupt asset row
    must not fail the whole mapInPandas stage)."""
    if not payload:
        return [0.0] * dim
    img = decode_image(payload)
    g = img.convert("L").resize((16, 16))
    px = list(g.getdata())
    counts = [0] * dim
    for p in px:
        counts[int(p) * dim // 256] += 1
    return [c / float(len(px)) for c in counts]


def byte_histogram_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic fake 'embedding': normalized byte histogram folded
    to ``dim`` buckets. Stable across runs/machines — the stand-in for a
    real vision encoder, preserving the exact UDF output shape."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    counts = [0] * dim
    for byt in payload:
        counts[byt % dim] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def extract_features(
    assets: DataFrame, dim: int = 16, real_decode: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    One pandas batch per Arrow record batch: bounded memory regardless of
    table size; no shuffle — runs scan-side, partition-parallel. The
    output schema is fixed (`FEATURE_SCHEMA`) so downstream similarity
    ops (`operators.similarity`) plug in unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        # real_decode actually USES the decode: features come from the
        # decoded pixels (decoded_image_features), not the raw-byte
        # fake — with no decoder installed this raises the seam's
        # NotImplementedError instead of silently serving stub features
        feat_fn = decoded_image_features if real_decode else byte_histogram_features
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "features": pdf["payload"].map(lambda b: feat_fn(b, dim)),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    assets: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """'Resize' plumbing: payload → fixed-size payload + dims metadata.

    The deterministic stand-in samples the byte stream at a uniform
    stride down to exactly ``width*height`` bytes (padding with zeros) —
    the real implementation decodes, resizes (PIL/cv2), re-encodes; the
    Spark surface (binary in/out, metadata struct, Arrow batching, output
    size invariant) is identical and tested today.
    """
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def shrink(payload: bytes | None) -> bytes:
            if not payload:
                return bytes(target)
            if len(payload) >= target:
                stride = len(payload) / target
                return bytes(payload[int(i * stride)] for i in range(target))
            return bytes(payload) + bytes(target - len(payload))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "payload": pdf["payload"].map(shrink),
                    "width": width,
                    "height": height,
                    "n_bytes": target,
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("modality", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_bytes", LongType()),
        ]
    )
    return assets.mapInPandas(run, schema)


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing: emit ≤ ``max_frames`` fixed-offset byte
    slices per asset (the real implementation would emit decoded video
    frames; offsets/batching/explode shape are identical). One input row
    → many output rows, still Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_off, out_chunk = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    off = i * every_n_bytes
                    out_ids.append(aid)
                    out_idx.append(i)
                    out_off.append(off)
                    out_chunk.append(bytes(payload[off : off + 64]))
            yield pd.DataFrame(
                {
                    "asset_id": out_ids,
                    "frame_idx": out_idx,
                    "byte_offset": out_off,
                    "frame_bytes": out_chunk,
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("byte_offset", LongType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )
    return assets.mapInPandas(run, schema)
