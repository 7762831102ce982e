"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed through Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
(clearly marked below): with ``fake=True`` it produces deterministic
hash-derived features so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested; with ``fake=False`` it
raises NotImplementedError where a real ``PIL.Image.open`` / ``soundfile``
call would go.

MEDIA_SCHEMA is the canonical lakehouse layout for binary payloads:
content-addressed id, modality kind, raw bytes, and a typed metadata struct
(so pruning/filtering never touches the blob column — at 100 TB the planner
must be able to select metadata without reading bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "synthetic_media",
    "decode_and_featurize",
    "frame_sample_plan",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),  # content hash
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("bytes", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, feature array<float>, "
    "resized_width int, resized_height int, n_frames_sampled int"
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 7) -> DataFrame:
    """Deterministic fake media rows (bytes = hash-derived), Spark-native."""
    df = spark.range(n).withColumn("__h", F.xxhash64(F.col("id"), F.lit(seed)))
    kind = (
        F.when(F.pmod("__h", F.lit(3)) == 0, "image")
        .when(F.pmod("__h", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(F.repeat(F.md5(F.col("id").cast("string")), 8), "UTF-8")
    return df.select(
        F.md5(F.col("__h").cast("string")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("bytes"),
        F.struct(
            F.when(kind == "image", F.lit("image/jpeg"))
            .when(kind == "audio", F.lit("audio/wav"))
            .otherwise(F.lit("video/mp4"))
            .alias("mime"),
            (F.pmod(F.abs("__h"), F.lit(1920)) + 32).cast("int").alias("width"),
            (F.pmod(F.abs("__h"), F.lit(1080)) + 32).cast("int").alias("height"),
            (F.pmod(F.abs("__h"), F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_and_featurize(
    df: DataFrame,
    *,
    fake: bool = True,
    feature_dim: int = 8,
    resize_to: tuple[int, int] = (224, 224),
    frames_per_video: int = 4,
) -> DataFrame:
    """Decode -> feature-extract -> resize / frame-sample, as ONE
    mapInPandas pass (bytes cross the Arrow boundary once).

    The closure is self-contained (pickled by value — no package import needed
    on executors).  Batch shape: one pandas DataFrame per Arrow batch; output
    rows 1:1 with input (frame sampling yields a count + pooled feature, not
    exploded frames — explode at this layer would multiply blob traffic).
    """
    rw, rh = resize_to

    def featurize(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats, nbytes, frames = [], [], []
            for kind, blob in zip(pdf["kind"], pdf["bytes"]):
                data = bytes(blob) if blob is not None else b""
                nbytes.append(len(data))
                if not fake:
                    # STUB: real decode goes here (PIL / soundfile / pyav) —
                    # codecs are not available in this container.
                    raise NotImplementedError(
                        "real media decode requires image/audio codecs; "
                        "run with fake=True in this environment"
                    )
                # deterministic fake 'embedding': digest-seeded, unit-scaled
                digest = hashlib.sha256(data).digest()
                vec = np.frombuffer(digest[: feature_dim * 4], dtype=np.uint32)
                feats.append((vec.astype(np.float64) / 2**32).astype(np.float32))
                frames.append(frames_per_video if kind == "video" else 1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "feature": [list(map(float, f)) for f in feats],
                    "resized_width": rw,
                    "resized_height": rh,
                    "n_frames_sampled": frames,
                }
            )

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Metadata-only frame-sampling plan: computes which timestamps WOULD be
    decoded per video — pure expression work over ``meta`` (never touches the
    blob column, so the scan prunes ``bytes`` entirely)."""
    n = (F.col("meta.duration_ms") / every_ms).cast("int") + 1
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.transform(F.sequence(F.lit(0), n - 1), lambda i: i * every_ms).alias("sample_ts_ms"),
    )
