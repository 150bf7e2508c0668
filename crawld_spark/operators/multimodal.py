"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode libraries (PIL/ffmpeg/etc.) are not in this container, so the
*decode step* is a deterministic stub (``_fake_decode``) — but everything
Spark-side is real and tested: the binary column schema, the mapInPandas
batch shape (Arrow RecordBatches of bytes), partition-preserving flow, and
the typed metadata output. Swapping ``_fake_decode`` for a real
``PIL.Image.open(io.BytesIO(b))`` is a one-function change.

At 100 TB scale this is the correct shape: payload bytes never leave the
executor, never hit the driver, and cross the JVM↔Python boundary once per
Arrow batch (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
memory; for multi-MB payloads, lower it per-job).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _fake_decode(b: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for an image decoder: derives (n_bytes, width,
    height, channels) purely from the payload bytes. Replace with a real
    decoder where PIL/cv2 are available."""
    n = len(b)
    return n, n % 640, (n * 31) % 480, 3


def decode_meta_stub(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """binary payload → typed metadata via mapInPandas (Arrow-batched)."""
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("n_bytes", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("channels", IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            metas = [_fake_decode(bytes(x)) for x in b[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: b[id_col].values,
                    "n_bytes": [m[0] for m in metas],
                    "width": [m[1] for m in metas],
                    "height": [m[2] for m in metas],
                    "channels": [m[3] for m in metas],
                }
            )

    return df.mapInPandas(run, out_schema)


def frame_sample_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """Video → sampled frames plumbing: one input row → k output rows
    (frame index + frame bytes). Decode stubbed: 'frames' are deterministic
    slices of the payload; the row-explosion shape is the real thing."""
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_bytes", df.schema[payload_col].dataType, True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, frames = [], [], []
            for i, payload in zip(b[id_col], b[payload_col]):
                raw = bytes(payload)
                n_frames = max(1, len(raw) // max(every_n, 1))
                for k in range(min(n_frames, 8)):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(raw[k * every_n: (k + 1) * every_n])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.mapInPandas(run, out_schema)


def resize_stub(
    df: DataFrame,
    width: int = 224,
    height: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Image resize plumbing: binary payload → binary payload of the target
    geometry, 1:1 rows, executor-side only. The resample itself is stubbed
    (deterministic byte re-sampling at the target size — replace with
    ``PIL.Image.open(...).resize((w, h)).tobytes()``); the Spark shape is
    real: payload bytes cross the JVM↔Python boundary once per Arrow batch
    and the output is again an opaque binary column a downstream writer can
    sink without driver involvement."""
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("payload", df.schema[payload_col].dataType, True),
        ]
    )
    target = max(1, width * height // 64)  # stub geometry: bytes per plane

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            outs = []
            for payload in b[payload_col]:
                raw = bytes(payload)
                if not raw:
                    outs.append(b"")
                    continue
                # deterministic nearest-neighbor byte resample to `target`
                step = max(1, len(raw) // target)
                outs.append(raw[::step][:target])
            yield pd.DataFrame(
                {
                    id_col: b[id_col].values,
                    "width": width,
                    "height": height,
                    "payload": outs,
                }
            )

    return df.mapInPandas(run, out_schema)


def feature_extract_stub(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Payload → embedding (array<float>) plumbing: the feature extractor a
    multimodal dedup/ANN pipeline runs before operators/similarity. The
    model forward pass is stubbed with a deterministic byte-histogram
    projection (no RNG, identical across runs/engines); the output column
    is the exact shape `similarity.srp_lsh_buckets` / `ivf_topk` consume,
    so the full binary→embedding→near-dup chain is composable and tested."""
    from pyspark.sql.types import ArrayType, FloatType

    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType, id_field.nullable),
            StructField("embedding", ArrayType(FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for b in batches:
            vecs = []
            for payload in b[payload_col]:
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                if raw.size == 0:
                    vecs.append([0.0] * dim)
                    continue
                # byte histogram folded to `dim` buckets, L2-normalized —
                # deterministic, locality-ish (similar payloads → similar
                # histograms), cheap
                hist = np.bincount(raw % dim, minlength=dim).astype(np.float64)
                norm = float(np.sqrt((hist * hist).sum())) or 1.0
                vecs.append([float(x) for x in hist / norm])
            yield pd.DataFrame({id_col: b[id_col].values, "embedding": vecs})

    return df.mapInPandas(run, out_schema)
