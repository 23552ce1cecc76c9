"""Pillow-backed codec lane — the real-container half of the
multimodal family that this container can't execute (VERDICT r6 #9).

`multimodal._pixels_blob` routes non-PNG real containers (JPEG/GIF/
BMP/RIFF magics) to Pillow and refuses loudly when it is absent; that
refusal is tested in tests/test_multimodal.py, but the DECODE branch
itself has never run in CI because Pillow isn't baked into this
environment. This module is the tws-v2 pattern applied to codecs:
``pytest.importorskip`` makes it skip here and execute automatically
in any future environment that has Pillow — no code change needed.

Everything under test is the SAME dispatch path production uses: the
bytes come out of Pillow's own encoders, so the assertions hold for
any Pillow build (no golden blobs that could rot with encoder
versions).
"""

from __future__ import annotations

import io

import pytest

PIL_Image = pytest.importorskip("PIL.Image")

from lp_etl_plugins_spark import multimodal as M


def _encode(img, fmt: str) -> bytes:
    buf = io.BytesIO()
    img.save(buf, format=fmt)
    return buf.getvalue()


def test_bmp_decodes_exactly():
    """A solid-color RGB BMP: dimensions, channel count, and the mean
    are exact (BMP is lossless and Pillow returns the raw pixels)."""
    img = PIL_Image.new("RGB", (4, 3), color=(10, 20, 30))
    data = _encode(img, "BMP")
    assert M._is_real_image(data)
    w, h, c, px = M._pixels_blob(data)
    assert (w, h, c) == (4, 3, 3)
    assert px == bytes([10, 20, 30] * 12)
    assert M._decode_blob(data) == (4, 3, 3, 20.0)


def test_gif_decodes_with_stable_shape():
    """GIF decodes through Pillow's palette mode: dimensions are
    exact, the channel count matches Pillow's band count, and the
    decode is deterministic (same blob → same pixels)."""
    img = PIL_Image.new("P", (5, 2))
    data = _encode(img, "GIF")
    assert M._is_real_image(data)
    w, h, c, px = M._pixels_blob(data)
    assert (w, h) == (5, 2)
    assert c >= 1 and len(px) == 5 * 2 * c
    assert M._pixels_blob(data)[3] == px


def test_jpeg_decodes_dimensions():
    """JPEG is lossy — assert the container plumbing (magic routing,
    dimensions, channels), not pixel values."""
    img = PIL_Image.new("RGB", (16, 16), color=(128, 128, 128))
    data = _encode(img, "JPEG")
    assert data.startswith(b"\xff\xd8")
    w, h, c, px = M._pixels_blob(data)
    assert (w, h, c) == (16, 16, 3)
    assert len(px) == 16 * 16 * 3


def test_real_containers_through_spark_operators(spark):
    """The distributed path: decode_media / extract_features /
    perceptual_hash over a DataFrame of real BMP blobs runs the same
    mapInPandas plumbing the fake-codec tests exercise — proving the
    Pillow branch composes with the Spark operators, not just the
    scalar helpers. Identical blobs must agree on every derived
    column; the two distinct images must phash-differ (one is black,
    one is white — opposite average-hash planes)."""
    black = _encode(PIL_Image.new("RGB", (8, 8), color=(0, 0, 0)), "BMP")
    white = _encode(PIL_Image.new("RGB", (8, 8), color=(255, 255, 255)), "BMP")
    df = spark.createDataFrame(
        [(0, black), (1, black), (2, white)], "media_id long, data binary"
    )
    dec = {r["media_id"]: r for r in M.decode_media(df).collect()}
    assert (dec[0]["width"], dec[0]["height"], dec[0]["channels"]) == (8, 8, 3)
    assert dec[0]["mean_byte"] == 0.0 and dec[2]["mean_byte"] == 255.0
    ph = {r["media_id"]: r["phash"] for r in M.perceptual_hash(df).collect()}
    assert ph[0] == ph[1]
    assert ph[0] != ph[2]
