"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested — schema contracts,
partitioning, batch shapes, UDF signatures.  The actual media decoding is
STUBBED (`decoder="fake"`) because image/audio libraries are not in this
container: the fake decoder derives deterministic pseudo-metadata and
features from the payload bytes.  Plug a real decoder in by passing
``decoder=callable(payload: bytes) -> dict``; everything around it (Arrow
transfer, batching, schema) is unchanged.

Scale notes: media payloads are large and skew partition sizes — wrap
datasets with :func:`repartition_by_bytes` before heavy stages so each
task sees a bounded byte budget rather than a bounded row count.
``mapInPandas`` streams record batches, so one task never materializes
its whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: contract for a media table: payload + typed metadata struct
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decoder: metadata and an
    8-dim feature derived from the payload digest.  Replace with a real
    decoder (PIL/ffmpeg/...) outside this container."""
    if payload is None:
        return {"n_bytes": None, "width": None, "height": None, "feature": None}
    d = hashlib.md5(payload).digest()
    return {
        "n_bytes": len(payload),
        "width": 16 + d[0],
        "height": 16 + d[1],
        "feature": [b / 255.0 for b in d[:8]],
    }


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], dict] | str = "fake",
    batch_note_col: str | None = None,
) -> DataFrame:
    """Decode payloads to metadata + feature vectors via Arrow-batched
    ``mapInPandas``.  ``decoder="fake"`` uses the deterministic stub;
    ``decoder="raise"`` raises NotImplementedError (marks the real-decoder
    integration point)."""
    if decoder == "raise":
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; pass decoder='fake' or a callable"
        )
    if decoder == "fake":
        # defined inline so cloudpickle ships it BY VALUE: Spark's Python
        # workers must not need whisper_spark on their PYTHONPATH (a
        # driver-side sys.path tweak does not propagate to workers)
        def dec(payload):
            import hashlib as _hl

            if payload is None:
                return {"n_bytes": None, "width": None, "height": None, "feature": None}
            d = _hl.md5(payload).digest()
            return {
                "n_bytes": len(payload),
                "width": 16 + d[0],
                "height": 16 + d[1],
                "feature": [b / 255.0 for b in d[:8]],
            }
    else:
        dec = decoder

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out = pdf[["media_id", "kind"]].copy()
            decoded = [dec(p) for p in pdf["payload"]]
            out["n_bytes"] = pd.array(
                [d["n_bytes"] for d in decoded], dtype="Int64"
            )
            out["width"] = pd.array([d["width"] for d in decoded], dtype="Int32")
            out["height"] = pd.array([d["height"] for d in decoded], dtype="Int32")
            out["feature"] = [d["feature"] for d in decoded]
            yield out

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def frame_sample(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """(media_id, frame_idx, frame_ts_ms): one row per sampled frame of a
    video payload, derived from meta.duration_ms — pure JVM explode, no
    decode needed to *plan* frame extraction (the decode of each frame is
    then a decode_media-style batch stage)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        (F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)
                    ),
                )
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def repartition_by_bytes(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Spread media rows so each partition holds ~target_bytes of payload
    (size skew is the scaling hazard with blob columns)."""
    stats = df.agg(
        F.sum(F.octet_length("payload")).alias("total"),
    ).collect()[0]
    total = stats["total"] or 0
    n = max(1, int(total / target_bytes) + 1)
    return df.repartition(n)
