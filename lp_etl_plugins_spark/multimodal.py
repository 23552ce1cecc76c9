"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata — the schema,
partitioning, Arrow batch shape and ``mapInPandas`` UDF signatures are
the real 100 TB design; only the *codec* is stubbed, because no
image/audio library ships in this container.

STUB NOTICE: ``_decode_blob`` first tries Pillow; absent that it falls
back to a DETERMINISTIC FAKE codec that reads the 5-byte header this
module's own :func:`synthetic_media` writes (w_hi, w_lo, h_hi, h_lo,
channels). Swapping in a real codec changes only that function — every
DataFrame-level contract (schemas, batching, explode shapes) is
exercised as-is by the tests.

Scale design:
- decode/resize/frame-sample run as ``mapInPandas`` — Arrow-batched,
  one Python worker per partition, no row-at-a-time serialization;
- blobs never shuffle for per-item ops (narrow transforms); only the
  optional feature aggregations shuffle their small numeric outputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, data binary, meta map<string,string>"
)

DECODED_SCHEMA = (
    "media_id bigint, width int, height int, channels int, mean_byte double"
)

FRAME_SCHEMA = "media_id bigint, frame_no int, frame binary"

FEATURE_SCHEMA = (
    "media_id bigint, n_bytes int, byte_entropy double, hist array<double>"
)

_HEADER = 5  # bytes: w_hi w_lo h_hi h_lo channels

try:  # the real codec, if the environment provides it
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

# magic prefixes of real image containers — routed to Pillow, never to
# the fake codec (a silent fake-decode of a real PNG would be data
# corruption, not a stub)
_IMAGE_MAGIC = (b"\x89PNG", b"\xff\xd8", b"GIF8", b"BM", b"RIFF")


def _is_real_image(data: bytes) -> bool:
    head = bytes(data[:8])
    return any(head.startswith(m) for m in _IMAGE_MAGIC)


def synthetic_media(spark: SparkSession, n: int, kind: str = "image") -> DataFrame:
    """Deterministic fake media blobs for tests: header-encoded
    dimensions + a payload derived from the id (no randomness — results
    reproduce across runs and engines)."""

    def blob(i: int) -> bytes:
        w, h, c = 16 + (i % 8), 12 + (i % 5), 3
        payload = bytes(((i * 31 + j * 7) % 251) for j in range(w * h * c))
        return bytes([w // 256, w % 256, h // 256, h % 256, c]) + payload

    rows = [(i, kind, blob(i), {"codec": "fake", "src": f"synth/{i}"}) for i in range(n)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_blob(data: bytes) -> tuple[int, int, int, float]:
    """→ (width, height, channels, mean pixel/payload byte).

    Dispatch is by container magic, not by which library imports: a
    real image (PNG/JPEG/GIF/BMP/RIFF prefix) decodes with Pillow, or
    raises a crisp NotImplementedError when Pillow is absent — it is
    NEVER fed to the fake codec. Blobs without an image magic use the
    deterministic fake codec (see module STUB NOTICE)."""
    data = bytes(data)
    if _is_real_image(data):
        if _PILImage is None:
            raise NotImplementedError(
                "blob has a real image container magic but no codec is "
                "available in this environment — install Pillow, or use "
                "synthetic_media()'s fake-codec blobs"
            )
        import io

        img = _PILImage.open(io.BytesIO(data))
        px = list(img.getdata())
        flat = [v for p in px for v in (p if isinstance(p, tuple) else (p,))]
        mean = sum(flat) / len(flat) if flat else 0.0
        return img.width, img.height, len(img.getbands()), mean
    w = data[0] * 256 + data[1]
    h = data[2] * 256 + data[3]
    c = data[4]
    payload = data[_HEADER:]
    mean = sum(payload) / len(payload) if payload else 0.0
    return w, h, c, mean


def decode_media(df: DataFrame) -> DataFrame:
    """Decode each blob to typed features via Arrow-batched mapInPandas
    (one Python roundtrip per partition batch, never per row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            decoded = [_decode_blob(bytes(d)) for d in b["data"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "mean_byte": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(run, DECODED_SCHEMA)


def extract_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """Per-blob feature extraction (the feature-extract stage of a
    media training pipeline): payload length, normalized byte
    histogram and byte-entropy, vectorized with numpy over Arrow
    batches — one ``np.bincount`` per blob, no per-byte Python.

    The features are codec-independent (raw payload bytes), so this
    stage is REAL even while the pixel codec is stubbed: swapping in
    a decoder only changes what bytes arrive here. Narrow transform —
    blobs never shuffle; downstream aggregations move only the small
    (id, features) rows."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n_bytes, ents, hists = [], [], []
            for d in b["data"]:
                payload = np.frombuffer(bytes(d), dtype=np.uint8)[_HEADER:]
                n = len(payload)
                counts = (
                    np.bincount(payload // (256 // bins), minlength=bins)[:bins]
                    if n
                    else np.zeros(bins)
                )
                p = counts / n if n else counts
                nz = p[p > 0]
                ents.append(float(-(nz * np.log2(nz)).sum()) if n else 0.0)
                hists.append([float(x) for x in p])
                n_bytes.append(n)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": n_bytes,
                    "byte_entropy": ents,
                    "hist": hists,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(df: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' every blob (fake codec: rewrite the header and truncate /
    pad the payload to w*h*c bytes) — same schema in as out, narrow
    transform, blobs stay on their partitions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for d in b["data"]:
                d = bytes(d)
                c = d[4]
                need = width * height * c
                payload = (d[_HEADER:] * ((need // max(len(d) - _HEADER, 1)) + 1))[:need]
                out.append(
                    bytes([width // 256, width % 256, height // 256, height % 256, c])
                    + payload
                )
            b = b.assign(data=out)
            yield b

    return df.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(df: DataFrame, frame_bytes: int = 64, every_n: int = 2) -> DataFrame:
    """Frame sampling for video blobs: split the payload into fixed-size
    'frames', keep every n-th → one row per sampled frame. The explode
    happens inside the Arrow batch — output rows stay partition-local."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, nos, frames = [], [], []
            for mid, d in zip(b["media_id"], b["data"]):
                payload = bytes(d)[_HEADER:]
                n_frames = len(payload) // frame_bytes
                for f in range(0, n_frames, every_n):
                    ids.append(mid)
                    nos.append(f)
                    frames.append(payload[f * frame_bytes : (f + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(run, FRAME_SCHEMA)
