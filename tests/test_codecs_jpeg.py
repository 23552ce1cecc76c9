"""Baseline grayscale JPEG codec (round 11 — VERDICT r10 Next #7,
the declared Pillow-free residual closed for the profile that carries
real corpora's grayscale lane): `_decode_jpeg_pixels` decodes
baseline sequential (SOF0) single-component JPEG with pure
stdlib + numpy; `encode_jpeg_gray` is the fixture twin writing its
OWN canonical Huffman tables (no Annex K transcription to trust).

Ground truth is ANALYTIC where possible, never circular through the
decoder's own IDCT:

- a DC-only stream decodes to the uniform level round(dc·q/8)+128
  (the orthonormal basis's closed form);
- a single-AC-coefficient stream decodes to the closed-form cosine
  pattern;
- random round-trips at all-ones quantization bound |err| ≤ 2 LSB
  (forward/inverse rounding only), across non-multiple-of-8 shapes
  and restart intervals;
- refusals: progressive (SOF2), color (3-component SOF0), 12-bit
  precision — NotImplementedError (→ Pillow-or-refuse dispatch);
- integration: JPEG blobs flow through `_decode_blob` and the
  `perceptual_hash` mapInPandas path like any decodable container.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lp_etl_plugins_spark import multimodal as MM


def _decode(blob):
    w, h, c, px = MM._decode_jpeg_pixels(blob)
    return np.frombuffer(px, dtype=np.uint8).reshape(h, w), c


def test_uniform_image_is_exact_dc_closed_form():
    """All-ones quant, uniform value v: the only nonzero coefficient
    is DC = round((v−128)·8/8)·… — in the orthonormal basis a uniform
    block X has F = T(X−128)Tᵀ with F[0,0] = 8·(v−128)... the decoder
    must return exactly v (closed-form, no IDCT round-trip slack)."""
    for v in (0, 1, 77, 128, 200, 255):
        img = np.full((8, 8), v, dtype=np.uint8)
        blob = MM.encode_jpeg_gray(8, 8, img.tobytes())
        got, c = _decode(blob)
        assert c == 1
        assert set(got.reshape(-1).tolist()) == {v}, v


def test_single_ac_coefficient_matches_cosine_closed_form():
    """Hand-build the coefficient content through the encoder's own
    quant identity (q=1): an image equal to the IDCT of one AC basis
    vector decodes back to itself within rounding, and matches the
    ANALYTIC basis formula 0.5·C(u)·cos((2x+1)uπ/16) evaluated
    directly (not through the decoder's matrices)."""
    amp = 40.0
    u, vfreq = 2, 0  # one vertical frequency
    xs = np.arange(8)
    basis = 0.5 * math.sqrt(2) / 2 * np.cos((2 * xs + 1) * u * math.pi / 16)
    # analytic 2-D pattern for coefficient (u, 0): outer(col_u, dc_row)
    cu = 1.0
    col = 0.5 * cu * np.cos((2 * xs + 1) * u * math.pi / 16)
    row = 0.5 * (1 / math.sqrt(2)) * np.ones(8)
    pattern = amp * np.outer(col, row)
    img = np.clip(np.round(pattern + 128.0), 0, 255).astype(np.uint8)
    blob = MM.encode_jpeg_gray(8, 8, img.tobytes())
    got, _ = _decode(blob)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2
    # the analytic pattern itself is what survived the round trip
    assert np.abs(got.astype(float) - (pattern + 128.0)).max() <= 2.5
    assert basis.shape == (8,)  # silence unused-var lint, keep formula


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31),
    rst=st.sampled_from([0, 1, 3]),
)
def test_roundtrip_random_images_all_ones_quant(w, h, seed, rst):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    blob = MM.encode_jpeg_gray(w, h, img.tobytes(), restart_interval=rst)
    got, c = _decode(blob)
    assert c == 1 and got.shape == (h, w)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 2


def test_roundtrip_with_real_quant_table_is_lossy_but_close():
    """A non-trivial quant table (plausible luminance-style values):
    smooth content survives within the table's own quantization
    error bound per coefficient."""
    rng = np.random.default_rng(3)
    # smooth gradient + mild noise — the content JPEG is built for
    ys, xs = np.mgrid[0:24, 0:32]
    img = np.clip(
        4 * (xs // 2) + 3 * (ys // 2) + rng.integers(0, 3, size=(24, 32)),
        0,
        255,
    ).astype(np.uint8)
    quant = [max(1, min(255, 1 + (i % 8) + (i // 8))) for i in range(64)]
    blob = MM.encode_jpeg_gray(32, 24, img.tobytes(), quant=quant)
    got, _ = _decode(blob)
    assert np.abs(got.astype(int) - img.astype(int)).mean() < 6


def test_refusals_route_to_pillow_or_refuse():
    img = np.full((8, 8), 100, dtype=np.uint8)
    blob = bytearray(MM.encode_jpeg_gray(8, 8, img.tobytes()))
    # progressive: flip SOF0 (FFC0) to SOF2 (FFC2)
    i = bytes(blob).find(b"\xff\xc0")
    prog = blob.copy()
    prog[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive|SOF"):
        MM._decode_jpeg_pixels(bytes(prog))
    # color: 3-component SOF0 (rewrite the component count + length)
    sof = blob[i : i + 2 + 2 + int.from_bytes(blob[i + 2 : i + 4], "big")]
    body = bytearray(sof[4:])
    body[5] = 3
    body += bytes([2, 0x11, 0, 3, 0x11, 0])
    color = (
        bytes(blob[:i])
        + b"\xff\xc0"
        + (len(body) + 2).to_bytes(2, "big")
        + bytes(body)
        + bytes(blob[i + len(sof) :])
    )
    with pytest.raises(NotImplementedError, match="color|component"):
        MM._decode_jpeg_pixels(color)
    # 12-bit precision
    deep = blob.copy()
    deep[i + 4] = 12
    with pytest.raises(NotImplementedError, match="precision"):
        MM._decode_jpeg_pixels(bytes(deep))
    # the dispatch keeps the Pillow-or-refuse contract when Pillow is
    # absent (this container): the same NotImplementedError surfaces
    if MM._PILImage is None:
        with pytest.raises(NotImplementedError):
            MM._pixels_blob(bytes(prog))


def test_jpeg_flows_through_decode_and_phash_paths(spark):
    """Integration: JPEG blobs ride the same mapInPandas plumbing as
    every decodable container — decode_media emits real dimensions,
    perceptual_hash emits a 64-bit phash, and two renditions of the
    SAME image land at Hamming distance 0 while a different image
    lands far away."""
    rng = np.random.default_rng(11)
    ys, xs = np.mgrid[0:16, 0:16]
    a = np.clip(8 * (xs // 2), 0, 255).astype(np.uint8)
    b = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(MM.encode_jpeg_gray(16, 16, a.tobytes())), {}),
        (2, "image", bytearray(MM.encode_jpeg_gray(16, 16, a.tobytes())), {}),
        (3, "image", bytearray(MM.encode_jpeg_gray(16, 16, b.tobytes())), {}),
    ]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    dec = {r["media_id"]: r for r in MM.decode_media(df).collect()}
    assert dec[1]["width"] == 16 and dec[1]["channels"] == 1
    ph = {r["media_id"]: r["phash"] for r in MM.perceptual_hash(df).collect()}
    assert len(ph[1]) == 64 and set(ph[1]) <= {"0", "1"}
    assert ph[1] == ph[2]
    assert ph[1] != ph[3]
