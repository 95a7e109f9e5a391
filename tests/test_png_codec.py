"""PNG codec (stdlib-only) + real multimodal decode/resize path.

The decoder is proven against a hand-built golden PNG (constructed with
raw struct/zlib in the test — independent of our encoder), the encoder
by encode→decode round-trips across every channel count and all five
scanline filter types, and the Spark integration end-to-end through the
mapInPandas Arrow batch path with NO Pillow in the environment.
"""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from one_stop_cdc_ingestion_toolkit_spark.functions.png_codec import (
    PNG_SIGNATURE,
    PngImage,
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _golden_png() -> bytes:
    """2x2 RGB, filter 0 rows, built with raw stdlib calls only:
    (255,0,0) (0,255,0) / (0,0,255) (255,255,255)."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = bytes([0, 255, 0, 0, 0, 255, 0]) + bytes([0, 0, 0, 255, 255, 255, 255])
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_decode_golden_pixels():
    img = decode_png(_golden_png())
    assert (img.width, img.height, img.channels) == (2, 2, 3)
    assert img.pixel(0, 0) == (255, 0, 0)
    assert img.pixel(1, 0) == (0, 255, 0)
    assert img.pixel(0, 1) == (0, 0, 255)
    assert img.pixel(1, 1) == (255, 255, 255)


def test_is_png():
    assert is_png(_golden_png())
    assert not is_png(b"JFIF not a png")
    assert not is_png(b"")


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters(channels, filter_type):
    """encode(filter f) → decode must reproduce pixels exactly — this is
    what proves each unfilter branch against its filter counterpart."""
    w, h = 5, 4
    pixels = bytes((x * 37 + 11) % 256 for x in range(w * h * channels))
    payload = encode_png(pixels, w, h, channels, filter_type=filter_type)
    img = decode_png(payload)
    assert (img.width, img.height, img.channels) == (w, h, channels)
    assert img.pixels == pixels


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    channels=st.sampled_from([1, 2, 3, 4]),
    filter_type=st.integers(0, 4),
    data=st.data(),
)
def test_roundtrip_property(w, h, channels, filter_type, data):
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * channels,
                max_size=w * h * channels,
            )
        )
    )
    img = decode_png(encode_png(pixels, w, h, channels, filter_type=filter_type))
    assert img.pixels == pixels


def test_encode_deterministic():
    pixels = bytes(range(0, 48))
    assert encode_png(pixels, 4, 4, 3) == encode_png(pixels, 4, 4, 3)


def test_decode_rejects_bad_inputs():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # 16-bit depth
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    p16 = PNG_SIGNATURE + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(p16)
    # palette color type
    ihdr_pal = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    ppal = PNG_SIGNATURE + _chunk(b"IHDR", ihdr_pal) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="color type"):
        decode_png(ppal)
    # interlaced
    ihdr_il = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    pil_ = PNG_SIGNATURE + _chunk(b"IHDR", ihdr_il) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(pil_)
    # truncated: signature + half a chunk header then nothing
    with pytest.raises(ValueError):
        decode_png(PNG_SIGNATURE + b"\x00\x00\x00\x0dIHDR\x00")
    # inflated size mismatch (claims 2x2 but carries 1 row)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    short = zlib.compress(bytes([0, 1, 2, 3, 4, 5, 6]))
    bad = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", short)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(bad)


def test_malformed_ihdr_raises_valueerror():
    """struct/zlib internals must never leak — the contract is ValueError."""
    bad_ihdr = PNG_SIGNATURE + _chunk(b"IHDR", b"\x00" * 5) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="malformed IHDR"):
        decode_png(bad_ihdr)
    # corrupt deflate stream
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    garbage = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\xff\xfe\xfd not deflate")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="deflate"):
        decode_png(garbage)
    # no IDAT at all (zlib.decompress(b'') used to raise zlib.error)
    no_idat = PNG_SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(no_idat)


def test_decompression_bomb_bounded():
    """A tiny-IHDR / huge-inflating-IDAT payload must be rejected without
    materializing the full inflated output."""
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)  # 1x1 gray → 2 bytes
    bomb_raw = b"\x00" * (64 * 1024 * 1024)  # 64 MiB of zeros, ~64 KiB deflated
    payload = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bomb_raw))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(payload)


def test_resize_nearest_exact():
    img = decode_png(_golden_png())
    up = resize_nearest(img, 4, 4)
    # 2x block replication: dst pixel (x,y) maps to src (x*2//4, y*2//4)
    for y in range(4):
        for x in range(4):
            assert up.pixel(x, y) == img.pixel(x // 2, y // 2)
    down = resize_nearest(up, 2, 2)
    assert down.pixels == img.pixels
    one = resize_nearest(img, 1, 1)
    assert one.pixel(0, 0) == img.pixel(0, 0)


# ---------------------------------------------------------------------------
# Spark integration: the real decode path through mapInPandas, no Pillow
# ---------------------------------------------------------------------------


def _blob_df(spark):
    rows = [
        (1, _golden_png()),
        (2, encode_png(bytes(range(30)), 5, 2, 3, filter_type=4)),
        (3, b"GIF89a...no codec for this here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_decode_blobs_real_png_no_pillow(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.multimodal import (
        decode_blobs,
        pil_available,
    )

    assert not pil_available()  # the sandbox premise this test encodes
    df = _blob_df(spark).filter("doc_id <= 2")
    out = {
        r.doc_id: (r.width, r.height, r.n_frames)
        for r in decode_blobs(df, "doc_id", "payload", use_real=True).collect()
    }
    assert out == {1: (2, 2, 1), 2: (5, 2, 1)}


def test_decode_blobs_auto_mixes_real_and_fake(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.multimodal import (
        decode_blobs,
        fake_decode,
    )

    out = {
        r.doc_id: (r.width, r.height, r.n_frames)
        for r in decode_blobs(
            _blob_df(spark), "doc_id", "payload", use_real=None
        ).collect()
    }
    assert out[1] == (2, 2, 1)  # real decode
    f = fake_decode(b"GIF89a...no codec for this here")
    assert out[3] == (f["width"], f["height"], f["n_frames"])  # fake fallback


def test_auto_mode_surfaces_corrupt_png(spark):
    """A payload that CLAIMS PNG but is corrupt must fail the decode, not
    silently fake — auto mode's one non-fallback case."""
    from pyspark.errors.exceptions.captured import PythonException

    from one_stop_cdc_ingestion_toolkit_spark.operators.multimodal import (
        decode_blobs,
    )

    rows = [(1, PNG_SIGNATURE + b"\x00\x00\x00\x05IHDRxxxxx")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    with pytest.raises(PythonException, match="malformed IHDR"):
        decode_blobs(df, "doc_id", "payload", use_real=None).collect()


def test_resize_falls_back_on_undecodable_png(spark):
    """Bulk resize must not die on one out-of-envelope blob — it gets the
    deterministic tag+digest stand-in instead."""
    import hashlib

    from one_stop_cdc_ingestion_toolkit_spark.operators.multimodal import (
        resize_images,
    )

    corrupt = PNG_SIGNATURE + b"\x00\x00\x00\x05IHDRxxxxx"
    df = spark.createDataFrame([(7, corrupt)], "doc_id long, payload binary")
    out = resize_images(df, "doc_id", "payload", 4, 4).collect()
    assert bytes(out[0].payload) == b"resized:4x4:" + hashlib.md5(corrupt).digest()


def test_resize_images_real_png_roundtrip(spark):
    from one_stop_cdc_ingestion_toolkit_spark.operators.multimodal import (
        resize_images,
    )

    df = _blob_df(spark).filter("doc_id = 1")
    out = resize_images(df, "doc_id", "payload", 4, 4).collect()
    assert len(out) == 1 and out[0].width == 4 and out[0].height == 4
    img = decode_png(bytes(out[0].payload))
    src = decode_png(_golden_png())
    assert (img.width, img.height) == (4, 4)
    for y in range(4):
        for x in range(4):
            assert img.pixel(x, y) == src.pixel(x // 2, y // 2)
    # determinism: a rerun (= a retried task) produces identical bytes
    again = resize_images(df, "doc_id", "payload", 4, 4).collect()
    assert bytes(again[0].payload) == bytes(out[0].payload)
