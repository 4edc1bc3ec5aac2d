"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no media libraries (PIL/cv2/librosa are absent), so the
*decode kernels* are stubbed behind import-tries with a clearly-marked
deterministic fake; everything Spark-side — schema, partitioning, Arrow
batch shape, ``mapInPandas`` plumbing — is real and tested.

Scale design: media bytes stay in a ``binary`` column co-located with
metadata; decode/feature-extract run as Arrow-batched ``mapInPandas``
(one Python worker per partition, vectorized batches — never a
row-at-a-time UDF); oversized media should be pointered (path + byte
range) rather than inlined, which is a storage-layout decision orthogonal
to these operators.

Fake formats (deterministic, self-describing):
``IMG:{w}x{h}:<payload>`` / ``AUD:{n_samples}@{rate}:<payload>`` /
``VID:{n_frames}x{w}x{h}:<payload>``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("data", BinaryType()),
        StructField("source_doc", LongType()),   # provenance link
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload_hash", StringType()),
    ]
)


def synth_media(spark: SparkSession, n: int = 96) -> DataFrame:
    """Deterministic synthetic media table (the container has no real
    images; the driver testdata has no media column — this feeds the
    plumbing tests and the registry query)."""
    def make(i: int) -> tuple:
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            header = f"IMG:{32 + i % 64}x{16 + i % 32}:"
        elif kind == "audio":
            header = f"AUD:{1000 + i}@16000:"
        else:
            header = f"VID:{4 + i % 8}x{64}x{48}:"
        payload = (header + "p" * (i % 17 + 1)).encode()
        return (i, kind, payload, i % 7)

    return spark.createDataFrame([make(i) for i in range(n)], MEDIA_SCHEMA)


def _decode_real(data: bytes) -> dict | None:
    """Real decode path — requires media libraries absent from this
    container.  Kept as the marked extension point."""
    raise NotImplementedError(
        "real image/audio/video decoding requires PIL/cv2/librosa, which "
        "are not installed; the deterministic fake decoder is used instead"
    )


def _decode_fake(data: bytes) -> tuple[int, int, int]:
    """Parse the self-describing fake header → (width, height, n_frames)."""
    text = bytes(data).split(b":", 2)
    tag = text[0].decode()
    dims = text[1].decode()
    if tag == "IMG":
        w, h = dims.split("x")
        return int(w), int(h), 1
    if tag == "AUD":
        n, _rate = dims.split("@")
        return int(n), 1, 1
    if tag == "VID":
        nf, w, h = dims.split("x")
        return int(w), int(h), int(nf)
    return 0, 0, 0


def decode_media(df: DataFrame) -> DataFrame:
    """Decode metadata from the binary column via Arrow-batched
    ``mapInPandas``.  Batch shape: the iterator yields pandas DataFrames of
    whole Arrow record batches; output conforms to DECODED_SCHEMA."""
    import hashlib

    import pandas as pd

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL  # noqa: F401

            decoder = _decode_real  # pragma: no cover — raises the marked stub
        except ImportError:
            decoder = _decode_fake
        for pdf in batches:
            decoded = [decoder(d) for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "n_bytes": [len(bytes(d)) for d in pdf["data"]],
                    "payload_hash": [
                        hashlib.md5(bytes(d)).hexdigest() for d in pdf["data"]
                    ],
                }
            )

    return df.mapInPandas(decode_batches, DECODED_SCHEMA)


FEATURE_DIM = 8

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over the binary column via ``mapInPandas``.

    The real path would run an image/audio encoder per Arrow batch; with
    media libs absent the kernel is a deterministic fake (md5-seeded
    pseudo-embedding), but the batch shape — one encoder call per Arrow
    batch, output an ``array<float>`` column — is the production shape.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf["data"]:
                digest = hashlib.md5(bytes(data)).digest()
                vec = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
                feats.append((vec.astype(np.float32) / 65535.0).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(encode, FEATURE_SCHEMA)


def resize_images(df: DataFrame, *, width: int, height: int) -> DataFrame:
    """Image resize plan: with PIL absent, rewrites the fake header to the
    target dimensions (payload untouched) — marking exactly where the real
    kernel goes while keeping schema/batching real."""
    import pandas as pd

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL  # noqa: F401
            raise NotImplementedError("real resize requires PIL wiring")
        except ImportError:
            pass
        for pdf in batches:
            out = []
            for data in pdf["data"]:
                raw = bytes(data)
                tag, _dims, payload = raw.split(b":", 2)
                if tag == b"IMG":
                    raw = b"IMG:%dx%d:" % (width, height) + payload
                out.append(raw)
            pdf = pdf.copy()
            pdf["data"] = out
            yield pdf

    return df.mapInPandas(resize, df.schema)


def frame_sample(df: DataFrame, *, every_k: int = 2) -> DataFrame:
    """Video frame sampling plan: one output row per kept frame index.
    Pure Spark (posexplode over a frame-index sequence) — the decode of
    each sampled frame would be another mapInPandas over (media_id,
    frame_idx)."""
    decoded = decode_media(df.filter(F.col("kind") == "video"))
    return (
        decoded.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
            ).alias("frame_idx"),
        )
    )
