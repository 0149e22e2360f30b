"""Multimodal (image/audio/video) column plumbing.

Media items are opaque ``binary`` payloads plus typed metadata — the lake
pattern for 100 TB multimodal corpora: Spark moves/filters/joins the bytes,
Arrow batches carry them into vectorized Python only for the few stages that
must decode. Schema, partitioning, UDF signatures, and batch shapes here are
real and tested; the actual codecs (PIL/ffmpeg) are NOT in this container,
so decoding is stubbed behind an import-try with a clearly-marked
deterministic fake (see :func:`decode_image_meta`).

Everything crossing the Python boundary is ``mapInPandas`` / Arrow — whole
columns per batch, never per-row Python (BASELINE input_hint).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("magic", T.StringType(), True),  # first-4-bytes hex
        T.StructField("entropy", T.DoubleType(), True),  # Shannon bits/byte
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_pixel", T.DoubleType(), True),
        T.StructField("decoder", T.StringType(), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table synthesized from the documents table.

    Stand-in for a real media lake (no image fixtures in the container):
    payload = UTF-8 bytes of the text behind a 4-byte magic header, kind
    cycles by doc_id. Purely so the binary plumbing has honest bytes to chew.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    # ASCII magics (real containers use e.g. \x89PNG) keep the synthetic
    # payload valid UTF-8 so an independent SQL oracle can re-derive hashes.
    magic = F.when(kind == "image", F.lit(b"IMG0"))\
        .when(kind == "audio", F.lit(b"AUD0"))\
        .otherwise(F.lit(b"VID0"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(magic, F.encode(F.col("text"), "UTF-8")).alias("content"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _entropy_bits_per_byte(data: bytes) -> float:
    if not data:
        return 0.0
    counts: dict[int, int] = {}
    for b in data:
        counts[b] = counts.get(b, 0) + 1
    n = len(data)
    return -sum((c / n) * math.log2(c / n) for c in counts.values())


def media_features(media: DataFrame) -> DataFrame:
    """Byte-level features via ``mapInPandas`` (Arrow-batched, vectorized).

    Each batch is a pandas DataFrame of whole columns; per-element work
    (hashing) runs inside the batch without crossing the JVM boundary again.
    Map-only at scale; narrow inputs are spread first so the Python workers
    all participate (see plans/parallelism.py).
    """
    from kafka_connect_plugins_spark.plans.parallelism import spread

    media = spread(media)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype(
                        "int64"
                    ),
                    "sha256": content.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "magic": content.map(
                        lambda b: bytes(b[:4]).hex() if b is not None else None
                    ),
                    "entropy": content.map(
                        lambda b: round(_entropy_bits_per_byte(bytes(b)), 6)
                        if b is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def decode_image_meta(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode stage: real Arrow plumbing, STUBBED codec.

    With a real imaging library on the cluster the body below swaps to
    ``PIL.Image.open(io.BytesIO(b))``; this container has none, so:

    - ``strict=True``  → raise ``NotImplementedError`` (the honest posture
      for production use without a codec), and
    - ``strict=False`` → a clearly-marked DETERMINISTIC FAKE decode whose
      outputs are pure functions of the bytes (size-derived dimensions,
      byte-mean "pixel" mean), keeping schema/batching/test coverage real.
    """
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        has_codec = True
    except ImportError:
        has_codec = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if has_codec:  # pragma: no cover - exercised only on a real cluster
            import io

            import PIL.Image

            for pdf in it:
                out = {"media_id": [], "width": [], "height": [], "mean_pixel": [], "decoder": []}
                for mid, b in zip(pdf["media_id"], pdf["content"]):
                    img = PIL.Image.open(io.BytesIO(bytes(b)))
                    px = list(img.convert("L").getdata())
                    out["media_id"].append(mid)
                    out["width"].append(img.width)
                    out["height"].append(img.height)
                    out["mean_pixel"].append(sum(px) / len(px) if px else None)
                    out["decoder"].append("pillow")
                yield pd.DataFrame(out)
            return
        if strict:
            raise NotImplementedError(
                "no imaging codec available in this environment; "
                "install pillow or run with strict=False for the fake decode"
            )
        for pdf in it:
            body = pdf["content"].map(lambda b: bytes(b[4:]) if b is not None else b"")
            n = body.map(len)
            side = n.map(lambda x: max(int(math.isqrt(max(x, 1))), 1))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": side.astype("int32"),
                    "height": (n // side.clip(lower=1)).clip(lower=1).astype("int32"),
                    "mean_pixel": body.map(
                        lambda b: round(sum(b) / len(b), 6) if len(b) else None
                    ),
                    "decoder": "fake-deterministic",
                }
            )

    return media.mapInPandas(batches, DECODE_SCHEMA)
