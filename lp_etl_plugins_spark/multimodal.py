"""Multimodal (image/audio/video) column operators.

Media are opaque ``binary`` columns with typed metadata — the schema,
partitioning, Arrow batch shape and ``mapInPandas`` UDF signatures are
the real 100 TB design; only the *codec* is stubbed, because no
image/audio library ships in this container.

CODEC NOTICE: PNG is decoded for real — a vendored pure-stdlib
decoder (:func:`_decode_png`: zlib inflate + per-scanline unfilter)
handles 8-bit non-interlaced gray/RGB/palette/alpha images with no
third-party dependency, so one genuine container decodes end-to-end
in every environment. Other real containers (JPEG/GIF/BMP/RIFF
magics) route to Pillow when present and raise a crisp
NotImplementedError otherwise — they are NEVER fed to the fake
codec. Blobs without a container magic use a DETERMINISTIC FAKE
codec that reads the 5-byte header this module's own
:func:`synthetic_media` writes (w_hi, w_lo, h_hi, h_lo, channels);
that path stays the oracle-parity substrate. Every DataFrame-level
contract (schemas, batching, explode shapes) is exercised as-is by
the tests.

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


def _decode_png(data: bytes) -> tuple[int, int, int, float]:
    """→ (width, height, channels, mean pixel byte); thin wrapper over
    :func:`_decode_png_pixels` for the decode-features path."""
    width, height, nch, out = _decode_png_pixels(data)
    mean = sum(out) / len(out) if out else 0.0
    return width, height, nch, mean


def _decode_png_pixels(data: bytes) -> tuple[int, int, int, bytes]:
    """Vendored pure-stdlib PNG decoder → (width, height, channels,
    raw pixel bytes). Full chunk walk + zlib inflate + per-scanline
    unfilter (filters 0–4: None/Sub/Up/Average/Paeth) for 8-bit
    non-interlaced images, color types 0 (gray), 2 (RGB), 3 (palette,
    expanded to RGB), 4 (gray+alpha), 6 (RGBA) — the shapes that
    cover virtually all training-corpus PNGs. Exotic shapes (1/2/4/16
    bit depths, Adam7 interlace) raise NotImplementedError rather
    than mis-decode. Deterministic and dependency-free, so the PNG
    path behaves identically on every cluster node and in CI."""
    import struct
    import zlib

    pos = 8  # past the \x89PNG\r\n\x1a\n signature
    width = height = bitdepth = colortype = interlace = None
    idat = bytearray()
    palette = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if width is None:
        raise ValueError("PNG: missing IHDR chunk")
    if bitdepth != 8 or interlace != 0 or colortype not in (0, 2, 3, 4, 6):
        raise NotImplementedError(
            f"PNG shape not supported by the vendored decoder "
            f"(bitdepth={bitdepth}, colortype={colortype}, "
            f"interlace={interlace}); install Pillow for exotic shapes"
        )
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG: truncated scanline data")
    out = bytearray()
    prev = bytearray(stride)
    rp = 0
    for _ in range(height):
        flt = raw[rp]
        rp += 1
        line = bytearray(raw[rp : rp + stride])
        rp += stride
        if flt == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif flt == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif flt == 3:  # Average
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif flt == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif flt != 0:
            raise ValueError(f"PNG: unknown filter type {flt}")
        out += line
        prev = line
    if colortype == 3:  # palette indices → RGB triples
        # a missing/short PLTE must not silently yield truncated
        # pixels (the decoder's contract is raise-rather-than-misdecode)
        if out and len(palette) < 3 * (max(out) + 1):
            raise ValueError(
                f"PNG: palette has {len(palette) // 3} entries but "
                f"scanlines index up to {max(out)}"
            )
        px = bytearray()
        for idx in out:
            px += palette[idx * 3 : idx * 3 + 3]
        out, nch = px, 3
    return width, height, nch, bytes(out)


def encode_png(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Minimal PNG writer (filter-0 scanlines, one IDAT) for fixtures
    and round-trip tests of :func:`_decode_png`; ``payload`` must be
    ``width*height*channels`` bytes, channels ∈ {1, 2, 3, 4}."""
    import struct
    import zlib

    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(payload) != width * height * channels:
        raise ValueError("encode_png: payload size != width*height*channels")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    stride = width * channels
    raw = b"".join(
        b"\x00" + payload[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_blob(data: bytes) -> tuple[int, int, int, float]:
    """→ (width, height, channels, mean pixel/payload byte).

    Dispatch is by container magic, not by which library imports: PNG
    decodes for REAL via the vendored :func:`_decode_png` (identical
    behavior whether or not Pillow is installed); other real
    containers (JPEG/GIF/BMP/RIFF prefixes) decode with Pillow or
    raise a crisp NotImplementedError when it is absent — they are
    NEVER fed to the fake codec. Blobs without an image magic use the
    deterministic fake codec (see module CODEC NOTICE). Thin mean-
    wrapper over :func:`_pixels_blob`, which owns the dispatch."""
    w, h, c, px = _pixels_blob(data)
    mean = sum(px) / len(px) if px else 0.0
    return w, h, c, mean


def _pixels_blob(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, raw pixel bytes), same magic
    dispatch as :func:`_decode_blob`: PNG via the vendored decoder —
    with exotic PNG shapes (16-bit, interlaced) falling back to
    Pillow when it IS installed, so the vendored subset never makes a
    previously-decodable input crash — other real containers via
    Pillow-or-refuse, fake-codec blobs from the header-dimensioned
    payload."""
    data = bytes(data)
    if data.startswith(b"\x89PNG"):
        try:
            return _decode_png_pixels(data)
        except NotImplementedError:
            if _PILImage is None:
                raise
            # fall through to the Pillow branch below
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
        flat = bytes(v for p in px for v in (p if isinstance(p, tuple) else (p,)))
        return img.width, img.height, len(img.getbands()), flat
    w = data[0] * 256 + data[1]
    h = data[2] * 256 + data[3]
    c = data[4]
    return w, h, c, data[_HEADER:]


PHASH_SCHEMA = "media_id bigint, phash string"


def _ahash(w: int, h: int, c: int, px: bytes) -> str:
    """64-bit average-hash over an 8×8 block grid, ALL-INTEGER so the
    bits are engine-exact: per-pixel gray is the channel SUM (no
    division), each pixel lands in block (y*8//h, x*8//w), and the
    mean-threshold compare is cross-multiplied — bit = 1 iff
    S_block · N_total > T_total · n_block — so no float ever enters.
    Requires w ≥ 8 and h ≥ 8 (a thumbnail smaller than the grid has
    empty blocks and no meaningful perceptual hash)."""
    import numpy as np

    if w < 8 or h < 8:
        raise ValueError(f"_ahash: image {w}x{h} smaller than the 8x8 grid")
    a = np.frombuffer(px, dtype=np.uint8).astype(np.int64).reshape(h, w, c)
    gray = a.sum(axis=2)
    total = int(gray.sum())
    n_px = w * h
    r_idx = (np.arange(h) * 8) // h
    c_idx = (np.arange(w) * 8) // w
    bits = []
    for r in range(8):
        rows = gray[r_idx == r]
        for cb in range(8):
            block = rows[:, c_idx == cb]
            bits.append("1" if int(block.sum()) * n_px > total * block.size else "0")
    return "".join(bits)


def perceptual_hash(df: DataFrame) -> DataFrame:
    """Per-blob perceptual fingerprint (aHash) via Arrow-batched
    mapInPandas — the image near-dup primitive: visually identical
    media collide on the 64-bit hash (and near-misses differ in few
    bits, so a Hamming prefilter composes exactly like v6 does for
    embeddings). Pixels are decoded and reduced INSIDE the Python
    worker; only (media_id, 64-char bit string) ever shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hashes = [_ahash(*_pixels_blob(bytes(d))) for d in b["data"]]
            yield pd.DataFrame({"media_id": b["media_id"], "phash": hashes})

    return df.mapInPandas(run, PHASH_SCHEMA)


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
    a decoder only changes what bytes arrive here. Real-container
    blobs (PNG/JPEG/... magic) contribute their FULL byte stream —
    the 5-byte strip is the fake codec's header, not theirs. Narrow
    transform — blobs never shuffle; downstream aggregations move
    only the small (id, features) rows. ``bins`` must divide 256 —
    otherwise the top bytes would silently fall out of the histogram."""
    import numpy as np

    if 256 % bins != 0:
        raise ValueError(f"extract_features: bins={bins} must divide 256")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n_bytes, ents, hists = [], [], []
            for d in b["data"]:
                raw = bytes(d)
                payload = np.frombuffer(raw, dtype=np.uint8)
                if not _is_real_image(raw):
                    payload = payload[_HEADER:]
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
                if _is_real_image(d):
                    # rewriting a real container's first bytes as a fake
                    # header would strip its magic and silently route the
                    # output to the fake codec downstream
                    raise NotImplementedError(
                        "resize_media operates on fake-codec blobs; decode "
                        "real containers to pixels first"
                    )
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
                d = bytes(d)
                if _is_real_image(d):
                    raise NotImplementedError(
                        "sample_frames operates on fake-codec blobs; real "
                        "video containers need a demuxer, not a byte split"
                    )
                payload = d[_HEADER:]
                n_frames = len(payload) // frame_bytes
                for f in range(0, n_frames, every_n):
                    ids.append(mid)
                    nos.append(f)
                    frames.append(payload[f * frame_bytes : (f + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(run, FRAME_SCHEMA)
