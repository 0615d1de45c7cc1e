"""Multimodal column plumbing (SURVEY.md §2.9 X9 [D] — north-star scope).

Images/audio/video are modeled as opaque ``binary`` columns plus typed
metadata, processed with Arrow-batched ``mapInPandas`` (per-partition
pandas batches — the idiomatic Spark shape for byte-level feature
extraction). The Spark-side plumbing — schema, partitioning, batch
iteration, UDF signature — is real and tested; the actual codec step is
stubbed (the image/audio libraries are not in this container) behind
``decode_image``, which raises NotImplementedError unless the
deterministic fake decoder is requested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def decode_image(data: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    STUB: real decoding needs an image codec library not present in this
    environment. ``fake=True`` yields a deterministic synthetic size so
    the distributed plumbing can be exercised and oracle-checked.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub decoder"
        )
    n = len(data)
    first = data[0] if n else 0
    return (n % 64 + 1, first % 48 + 1)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize an opaque binary column (UTF-8 bytes of the text).

    Stands in for real image/audio bytes: downstream operators must treat
    it as opaque ``binary``, which is exactly what they'd see from a
    parquet/object-store scan of packed media.
    """
    return df.select(
        F.col(id_col).alias("doc_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Byte-level feature extraction via mapInPandas (Arrow batches).

    Columnar batches cross the JVM→Python boundary once per partition
    chunk; output is a stable typed schema. Swap the body's fake decode
    for a real codec without touching the distributed shape.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            sizes = [decode_image(p, fake=True) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda p: int(p[0]) if len(p) else 0).astype("int32"),
                    "fake_width": pd.Series([w for w, _ in sizes], dtype="int32"),
                    "fake_height": pd.Series([h for _, h in sizes], dtype="int32"),
                }
            )

    return binary_df.mapInPandas(_extract, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_n_bytes", T.LongType()),
        T.StructField("frame_byte_sum", T.LongType()),
    ]
)


def decode_audio(data: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an audio payload to (sample_rate, n_samples).

    STUB: real decoding needs an audio codec library not present in this
    environment; ``fake=True`` is the deterministic stand-in.
    """
    if not fake:
        raise NotImplementedError(
            "audio codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub decoder"
        )
    n = len(data)
    return (8000 if n % 2 else 16000, n * 4)


def resize_image(data: bytes, width: int, height: int, *, fake: bool = False) -> bytes:
    """Resize an image payload to (width, height).

    STUB: needs an image library; ``fake=True`` returns a deterministic
    byte string of the target pixel count so batch shapes are testable.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "for the deterministic stub resizer"
        )
    return bytes((i + (data[0] if data else 0)) % 256 for i in range(width * height))


def sample_frames(binary_df: DataFrame, frame_bytes: int = 64, every: int = 4) -> DataFrame:
    """Every-``every``-th fixed-size frame of a packed video payload.

    The frame-sampling shape of a video pipeline: one input row fans out
    to ~n_bytes/(frame_bytes·every) frame rows inside mapInPandas, so the
    fan-out never materializes on the driver and downstream operators see
    an ordinary (doc_id, frame_idx, ...) relation they can group/join.
    With a real container format the fixed-stride slicing becomes
    keyframe extraction; the distributed shape is identical.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            sums: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, every):
                    chunk = payload[idx * frame_bytes : (idx + 1) * frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(idx)
                    sizes.append(len(chunk))
                    sums.append(sum(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_n_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_byte_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return binary_df.mapInPandas(_frames, FRAME_SCHEMA)
