"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are ``mapInPandas``
batch transforms.  The decode step itself is STUBBED in this container
(no image/audio libs): ``decode_image_batch`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (seeded by content hash) produces stable pseudo-pixels so
the Spark-side plumbing — schema, partitioning, UDF signature, Arrow
batch shape — is real and fully tested.

Design notes for 100 TB:
  * binary payloads never pass through Python row-at-a-time: Arrow
    moves them as buffers into mapInPandas batches;
  * metadata (width/height/codec/duration) lives in a sibling struct so
    filters prune on parquet statistics WITHOUT touching payload bytes;
  * payload-heavy stages set a lower maxRecordsPerBatch via
    repartition sizing, not per-row logic.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (content = hash-seeded bytes)."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = ["image", "audio", "video"][i % 3]
        payload = (h * ((256 // len(h)) + 1))[: 128 + (i % 64)]
        meta = (
            (32 + i % 8, 24 + i % 6, 1, 0)
            if kind == "image"
            else (0, 0, 16 + i % 4, 16000)
            if kind == "video"
            else (0, 0, 0, 16000)
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: pixels derived
    from the payload hash — stable across partitions and runs."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    if not fake:
        raise NotImplementedError(
            "real image decoding needs PIL/libvips — not in this container; "
            "pass fake=True for the deterministic stub"
        )
    feats, means = [], []
    metas = pdf["meta"]
    for payload, meta in zip(pdf["payload"], metas):
        w = int(meta["width"]) or 8
        h = int(meta["height"]) or 8
        px = _fake_decode(bytes(payload), w, h)
        # 8-bin intensity histogram as the extracted feature
        hist = np.bincount(px.ravel() >> 5, minlength=8).astype(np.float64)
        feats.append((hist / max(px.size, 1)).tolist())
        means.append(float(px.mean()))
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "feat_hist": feats,
            "mean_intensity": means,
        }
    )


def extract_media_features(
    media: DataFrame, fake: bool = True, kinds: tuple = ("image",)
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Filter on `kind`/meta BEFORE this operator — those predicates push
    to the parquet scan; this stage only ever sees payloads it decodes.
    """
    out_schema = (
        "media_id long, kind string, feat_hist array<double>, "
        "mean_intensity double"
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf):
                yield decode_image_batch(pdf, fake)

    return media.where(F.col("kind").isin(*kinds)).mapInPandas(run, out_schema)


def sample_frames(
    media: DataFrame, every_n: int = 4, fake: bool = True
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame index — a generator-shaped mapInPandas (UDTF analog)."""
    out_schema = "media_id long, frame_idx int, frame_hash long"

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, fh = [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                n_frames = int(meta["n_frames"])
                for k in range(0, n_frames, every_n):
                    if not fake:
                        raise NotImplementedError("real video decode stubbed")
                    d = hashlib.sha256(bytes(payload) + k.to_bytes(4, "big"))
                    ids.append(mid)
                    fidx.append(k)
                    fh.append(
                        int.from_bytes(d.digest()[:8], "big", signed=True)
                    )
            if ids:
                yield pd.DataFrame(
                    {"media_id": ids, "frame_idx": fidx, "frame_hash": fh}
                )

    return media.where(F.col("kind") == "video").mapInPandas(run, out_schema)
