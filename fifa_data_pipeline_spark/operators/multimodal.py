"""Multimodal-column plumbing: opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The Spark-side design is the real thing — schema, partitioning, UDF
signature, batch shape. The actual image/audio codecs are NOT in this
container, so the decode kernels are deterministic fakes (clearly
marked) behind the same interface; swap ``_fake_decode_batch`` for a
PIL/torchaudio kernel and nothing else changes.

Scale notes: payload bytes ride through the plan as parquet BINARY —
never materialized driver-side; ``mapInPandas`` streams Arrow record
batches, so executor memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × payload size, not
by partition size. Keep payloads out of shuffle keys; aggregate on
the extracted features instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried alongside every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("media_format", T.StringType()),
    ]
)


def attach_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a multimodal table: ``payload binary`` (here: the utf-8
    bytes of the text — a deterministic stand-in for image bytes) plus
    a typed metadata struct derived from the id."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            ((F.col(id_col) % 64 + 1) * 8).cast("int").alias("width"),
            ((F.col(id_col) % 48 + 1) * 8).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit("fake/rgb8").alias("media_format"),
        ).alias("meta"),
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode_batch(payloads: pd.Series) -> pd.DataFrame:
    """Deterministic fake 'decode + feature extract' kernel. A real
    deployment replaces this with e.g. PIL decode + model features;
    the signature (pd.Series of bytes → pd.DataFrame of features) is
    the contract that stays."""
    lens = payloads.map(len)
    checksums = payloads.map(lambda b: sum(b) % 997)
    feats = payloads.map(
        lambda b: [float(len(b)), float(b[0] if b else 0), float(b[-1] if b else 0)]
    )
    return pd.DataFrame(
        {"payload_len": lens, "byte_checksum": checksums, "feat": feats}
    )


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Feature-extract every payload via ``mapInPandas`` (Arrow batch
    transfer, ~10-100x a row-at-a-time Python UDF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _fake_decode_batch(pdf["payload"])
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_len", T.IntegerType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", frame_bytes: int = 256, every: int = 2
) -> DataFrame:
    """'Video' frame sampling: split each payload into fixed-size
    chunks and keep every ``every``-th — a one-to-many ``mapInPandas``
    (each input row yields multiple frame rows), the shape a real
    frame sampler has."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                chunks = [
                    payload[i : i + frame_bytes]
                    for i in range(0, len(payload), frame_bytes)
                ]
                for idx in range(0, len(chunks), every):
                    rows.append(
                        (doc_id, idx, len(chunks[idx]), sum(chunks[idx]) % 997)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_len", "frame_checksum"]
            )

    return df.mapInPandas(run, FRAMES_SCHEMA)


def decode_image_real(df: DataFrame) -> DataFrame:
    """Real image decode — requires PIL/opencv, which this container
    does not ship. The Spark plumbing above is identical; only the
    kernel differs."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "swap _fake_decode_batch for a PIL kernel under the same "
        "mapInPandas contract"
    )


POOL_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("bin_idx", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def pool_bytes(
    df: DataFrame, id_col: str = "doc_id", bin_size: int = 32
) -> DataFrame:
    """Fixed-window byte pooling over the payload — the thumbnail /
    audio-downsample plumbing stub: each complete ``bin_size``-byte
    window reduces to its mean (trailing partial window dropped),
    one output row per (payload, window). The kernel is the REAL
    interface — one-to-many ``mapInPandas``, numpy reshape+mean per
    batch — with the byte-mean standing in for a pooling codec; the
    deterministic arithmetic makes it oracle-checkable (ASCII
    corpus: byte == ord(char), mirrored in DuckDB)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bins, means = [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                n = len(buf) // bin_size
                if n == 0:
                    continue
                pooled = (
                    buf[: n * bin_size]
                    .reshape(n, bin_size)
                    .mean(axis=1)
                    .round(6)
                )
                ids.extend([i] * n)
                bins.extend(range(n))
                means.extend(pooled.tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "bin_idx": bins, "mean_byte": means}
            )

    return df.select(id_col, "payload").mapInPandas(run, POOL_SCHEMA)
