"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are ``mapInPandas``
batch transforms.  Decoding has two modes:

  * REAL (``fake=False``): PPM (P6) and uncompressed 24-bit BMP are
    parsed natively with ``np.frombuffer`` (no image libraries needed);
    any other format goes through PIL behind an import-guard (absent in
    this container) and raises NotImplementedError otherwise.
  * FAKE (``fake=True``): a deterministic hash-seeded decoder produces
    stable pseudo-pixels — used where tests need pixels for payloads
    that are arbitrary bytes.

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


def synth_media(
    spark, n: int = 64, seed: int = 42, real_images: bool = False
) -> DataFrame:
    """Deterministic fake media table (content = hash-seeded bytes).

    real_images=True encodes image payloads as valid binary PPM (P6)
    files of hash-seeded pixels, so the REAL decode path
    (``extract_media_features(fake=False)``) is exercised end-to-end
    without any image library.
    """
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
        if kind == "image" and real_images:
            w, hh = meta[0], meta[1]
            rng = np.random.default_rng(
                int.from_bytes(h[:8], "big") % (2**32)
            )
            px = rng.integers(0, 256, size=(hh, w, 3), dtype=np.uint8)
            payload = encode_ppm(px)
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ----------------------------------------------------- real decoders
# Numpy-only parsers for uncompressed formats (no image libs needed);
# PIL is used opportunistically when importable for everything else.


def encode_ppm(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary PPM (P6) file."""
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _ppm_rgb(data: bytes) -> np.ndarray:
    """Parse binary PPM (P6) → (h, w, 3) uint8 RGB."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace separated, then
    # a single whitespace byte before the raster
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


def _decode_ppm(data: bytes) -> np.ndarray:
    """Parse binary PPM (P6) → (h, w) uint8 grayscale (integer-mean of
    RGB — deterministic, no float rounding)."""
    rgb = _ppm_rgb(data).astype(np.uint16)
    return (rgb.sum(axis=2) // 3).astype(np.uint8)


def _bmp_rgb(data: bytes) -> np.ndarray:
    """Parse uncompressed 24-bit BMP → (h, w, 3) uint8 RGB."""
    if not data.startswith(b"BM"):
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    raster = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    bgr = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1]  # BGR on disk → RGB


def _decode_bmp(data: bytes) -> np.ndarray:
    """Parse uncompressed 24-bit BMP → (h, w) uint8 grayscale."""
    rgb = _bmp_rgb(data).astype(np.uint16)
    return (rgb.sum(axis=2) // 3).astype(np.uint8)


def decode_payload(data: bytes) -> np.ndarray:
    """Real image decode → (h, w) uint8 grayscale.  PPM/BMP are parsed
    with numpy directly; other formats go through PIL when available."""
    data = bytes(data)
    if data.startswith(b"P6"):
        return _decode_ppm(data)
    if data.startswith(b"BM"):
        return _decode_bmp(data)
    try:  # optional dependency — absent in this container
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        raise NotImplementedError(
            "payload is neither PPM nor BMP and PIL is not installed"
        ) from None
    img = Image.open(io.BytesIO(data)).convert("L")
    return np.asarray(img, dtype=np.uint8)


def _rgb_payload(data: bytes) -> np.ndarray:
    """Real image decode → (h, w, 3) uint8 RGB.  PPM/BMP natively;
    other formats through PIL when importable, with an accurate error
    otherwise (mirrors decode_payload's grayscale dispatch)."""
    data = bytes(data)
    if data.startswith(b"P6"):
        return _ppm_rgb(data)
    if data.startswith(b"BM"):
        return _bmp_rgb(data)
    try:  # optional dependency — absent in this container
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        raise NotImplementedError(
            "payload is neither PPM nor BMP and PIL is not installed"
        ) from None
    img = Image.open(io.BytesIO(data)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _fake_decode(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: pixels derived
    from the payload hash — stable across partitions and runs."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    """Per-payload decode within one Arrow batch.  fake=True uses the
    hash-seeded stand-in; fake=False really decodes (PPM/BMP natively,
    PIL if importable for other formats).  The per-payload loop is fine:
    decoding is inherently per-object and payload bytes dominate."""
    feats, means = [], []
    metas = pdf["meta"]
    for payload, meta in zip(pdf["payload"], metas):
        if fake:
            w = int(meta["width"]) or 8
            h = int(meta["height"]) or 8
            px = _fake_decode(bytes(payload), w, h)
        else:
            px = decode_payload(payload)
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


def resize_images(
    media: DataFrame, out_w: int, out_h: int, kinds: tuple = ("image",)
) -> DataFrame:
    """Nearest-neighbor image resize over binary payloads — the third
    mapInPandas media transform (decode → RESIZE → re-encode).  Real
    pixels only: PPM/BMP payloads are parsed natively, resized with a
    pure-numpy index map (row i ← floor(i·h/out_h), col j ←
    floor(j·w/out_w)), and re-encoded as binary PPM (P6) with the meta
    struct's dims updated.  Output payload size is exactly
    header + out_w·out_h·3 bytes, which the driver oracle recomputes
    arithmetically."""
    out_schema = (
        "media_id long, payload binary, "
        "meta struct<width:int, height:int, n_frames:int, sample_rate:int>"
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            ids, payloads, metas = [], [], []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                rgb = _rgb_payload(bytes(payload))
                h, w = rgb.shape[:2]
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                small = rgb[rows][:, cols]
                ids.append(mid)
                payloads.append(encode_ppm(small))
                metas.append(
                    {
                        "width": out_w,
                        "height": out_h,
                        "n_frames": int(meta["n_frames"]),
                        "sample_rate": int(meta["sample_rate"]),
                    }
                )
            yield pd.DataFrame(
                {"media_id": ids, "payload": payloads, "meta": metas}
            )

    return media.where(F.col("kind").isin(*kinds)).mapInPandas(
        run, out_schema
    )


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
