"""Multimodal (binary) column plumbing for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing here is real and tested — schema, Arrow batch
shape, partition-parallel decode via mapInPandas — while the actual
media decode is STUBBED (the container has no image/audio libs):
``decode_features(..., decoder="stub")`` computes deterministic
byte-level features; ``decoder="pil"`` raises NotImplementedError at
the exact point a real decoder (PIL.Image.open /
soundfile.read / av.open) would be called, so swapping one in is a
one-function change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("id long, n_bytes int, first_byte int, last_byte int, "
                  "byte_sum long")


def attach_binary(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in media blob: the utf-8 bytes of the text
    column (the driver testdata has no binary column; at deployment
    this is the Iceberg ``html``/media column read as-is)."""
    return df.select(F.col(id_col).alias("id"),
                     F.encode(F.col(text_col), "UTF-8").alias("blob"))


def decode_features(blobs: DataFrame, decoder: str = "stub",
                    batch_hint: int = 512) -> DataFrame:
    """Partition-parallel decode: binary -> typed feature struct.

    The mapInPandas batch shape (one Arrow record batch of blobs in,
    one feature frame out) is exactly what a real image/audio decode
    needs — bounded memory per batch, no driver involvement, columnar
    transfer both ways.
    """
    if decoder not in ("stub", "pil"):
        raise ValueError(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "pil":
                # real decoder plug-point:
                #   img = PIL.Image.open(io.BytesIO(b)); arr = np.asarray(img)
                raise NotImplementedError(
                    "media decoding requires an image/audio library not "
                    "present in this environment; use decoder='stub'")
            ids = pdf["id"].to_numpy()
            n = np.empty(len(pdf), dtype=np.int32)
            fb = np.empty(len(pdf), dtype=np.int32)
            lb = np.empty(len(pdf), dtype=np.int32)
            bs = np.empty(len(pdf), dtype=np.int64)
            for i, b in enumerate(pdf["blob"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n[i] = len(arr)
                fb[i] = int(arr[0]) if len(arr) else -1
                lb[i] = int(arr[-1]) if len(arr) else -1
                bs[i] = int(arr.sum(dtype=np.int64))
            yield pd.DataFrame({"id": ids, "n_bytes": n, "first_byte": fb,
                                "last_byte": lb, "byte_sum": bs})

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(blobs: DataFrame, every: int = 64, max_frames: int = 4) -> DataFrame:
    """'Frame sampling' over the blob (video-style strided slicing of
    the byte stream in the stub; a real impl samples decoded frames).
    Emits one row per sampled frame: (id, frame_no, frame_off,
    frame_byte) — the explode shape a video pipeline produces."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fnos, offs, vals = [], [], [], []
            for i, b in enumerate(pdf["blob"]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                k = min(max_frames, 1 + (len(arr) - 1) // every) if len(arr) else 0
                for f in range(k):
                    ids.append(pdf["id"].iloc[i])
                    fnos.append(f)
                    offs.append(f * every)
                    vals.append(int(arr[f * every]))
            yield pd.DataFrame({"id": ids, "frame_no": fnos,
                                "frame_off": offs, "frame_byte": vals})

    return blobs.mapInPandas(
        run, schema="id long, frame_no int, frame_off int, frame_byte int")
