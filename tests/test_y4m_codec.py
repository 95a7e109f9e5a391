"""Y4M codec (stdlib-only) + the a0008 real-decode frame sampler.

The decoder is proven against a hand-built golden stream (constructed
with raw byte literals — independent of our encoder), the encoder by
encode→decode round-trips across colorspaces and frame counts
(hypothesis), and the failure modes (truncation, bad magic, unknown
colorspace, missing dimensions) raise rather than mis-decode — the
test_png_codec.py discipline for the round-9 codec (VERDICT r8 ask #4).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from one_stop_cdc_ingestion_toolkit_spark.functions.y4m_codec import (
    Y4MVideo,
    decode_y4m,
    encode_y4m,
    plane_sizes,
    upsample_chroma,
)


def _golden_y4m() -> bytes:
    """4x2 C420, two frames, hand-muxed: stream header carries the
    tokens in a NON-canonical order plus an X extension; the second
    frame header carries a parameter that must be skipped."""
    header = b"YUV4MPEG2 C420 F30:1 H2 Ip A1:1 W4 XYSCSS=420JPEG Xdummy=1\n"
    # frame 1: Y = 1..8, U = [100, 101], V = [200, 201]
    f1 = b"FRAME\n" + bytes(range(1, 9)) + bytes([100, 101]) + bytes([200, 201])
    # frame 2: Y = 9..16, U = [110, 111], V = [210, 211]
    f2 = (
        b"FRAME Ix\n"
        + bytes(range(9, 17))
        + bytes([110, 111])
        + bytes([210, 211])
    )
    return header + f1 + f2


def test_decode_golden_planes():
    v = decode_y4m(_golden_y4m())
    assert (v.width, v.height, v.colorspace) == (4, 2, "C420")
    assert v.params["F"] == "30:1"
    # X is repeatable — both extension params survive, in header order
    assert v.params["X"] == ["YSCSS=420JPEG", "dummy=1"]
    assert len(v.frames) == 2
    y, u, vv = v.frames[0]
    assert y == bytes(range(1, 9))
    assert u == bytes([100, 101]) and vv == bytes([200, 201])
    y2, u2, v2 = v.frames[1]
    assert y2 == bytes(range(9, 17))
    assert u2 == bytes([110, 111]) and v2 == bytes([210, 211])


def test_upsample_chroma_420_covers_2x2_blocks():
    # 4x2 frame → chroma 2x1: sample A covers pixels (0..1, 0..1) etc.
    up = upsample_chroma(bytes([7, 9]), 4, 2, "C420")
    assert up == bytes([7, 7, 9, 9, 7, 7, 9, 9])
    # 4:4:4 is identity
    assert upsample_chroma(b"abcd", 2, 2, "C444") == b"abcd"


def test_default_colorspace_is_420jpeg():
    data = b"YUV4MPEG2 W2 H2\nFRAME\n" + bytes(4) + bytes(1) + bytes(1)
    v = decode_y4m(data)
    assert v.colorspace == "C420jpeg"
    assert plane_sizes(2, 2, v.colorspace) == (4, 1, 1)


@pytest.mark.parametrize(
    "data,err",
    [
        (b"JUNK W2 H2\n", "magic"),
        (b"YUV4MPEG2 W2\n", "missing W or H"),
        (b"YUV4MPEG2 W2 H2 C999\n", "unsupported"),
        (b"YUV4MPEG2 W3 H3 C420\n", "divisible"),
        (b"YUV4MPEG2 W2 H2\nFRAME\n" + bytes(3), "truncated"),
        (b"YUV4MPEG2 W2 H2\nNOPE\n" + bytes(6), "expected FRAME"),
        (b"YUV4MPEG2 W99999 H99999\n", "budget"),
    ],
)
def test_decode_failure_modes_raise(data, err):
    with pytest.raises(ValueError, match=err):
        decode_y4m(data)


@settings(deadline=None, max_examples=30)
@given(
    w2=st.integers(1, 8),
    h2=st.integers(1, 8),
    n=st.integers(0, 5),
    cs=st.sampled_from(["C420", "C444", "C420mpeg2"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(w2, h2, n, cs, seed):
    """encode→decode is identity on planes, dims, and colorspace for
    arbitrary even dimensions, frame counts (incl. 0), and colorspaces."""
    w, h = 2 * w2, 2 * h2
    ys, us, vs = plane_sizes(w, h, cs)
    rnd = __import__("random").Random(seed)
    frames = [
        (
            bytes(rnd.randrange(256) for _ in range(ys)),
            bytes(rnd.randrange(256) for _ in range(us)),
            bytes(rnd.randrange(256) for _ in range(vs)),
        )
        for _ in range(n)
    ]
    v = decode_y4m(encode_y4m(frames, w, h, cs))
    assert isinstance(v, Y4MVideo)
    assert (v.width, v.height, v.colorspace) == (w, h, cs)
    assert list(v.frames) == frames


def test_encode_rejects_wrong_plane_sizes():
    with pytest.raises(ValueError, match="plane sizes"):
        encode_y4m([(bytes(3), bytes(1), bytes(1))], 2, 2, "C420")


def test_a0008_spark_end_to_end(spark):
    """The a0008 operator decodes genuinely: its per-doc stats over the
    Arrow batch path equal a pure-Python recompute from the raw text."""
    from one_stop_cdc_ingestion_toolkit_spark.operators.round9 import (
        Y4M_DOCS,
        Y4M_FRAME_BYTES,
        Y4M_STEP,
        Y4M_Y_BYTES,
        a0008_y4m_frame_luma,
    )
    from tests.conftest import SF_DIR

    rows = {r["doc_id"]: r for r in a0008_y4m_frame_luma(spark, SF_DIR).collect()}
    assert rows  # the sf0.001 documents table has qualifying docs
    import pyarrow.parquet as pq

    tbl = pq.read_table(SF_DIR + "/documents.parquet", columns=["doc_id", "text"])
    docs = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    for doc_id, r in rows.items():
        t = docs[doc_id]
        assert doc_id <= Y4M_DOCS and len(t) >= Y4M_FRAME_BYTES
        payload = bytes(min(ord(c), 255) for c in t)
        n = len(payload) // Y4M_FRAME_BYTES
        y_sum = uv_sum = 0
        for f in range(0, n, Y4M_STEP):
            chunk = payload[f * Y4M_FRAME_BYTES : (f + 1) * Y4M_FRAME_BYTES]
            y_sum += sum(chunk[:Y4M_Y_BYTES])
            uv_sum += 4 * sum(chunk[Y4M_Y_BYTES:])
        assert (r["n_frames"], r["y_sum"], r["uv_sum"]) == (n, y_sum, uv_sum)
        assert r["n_sampled"] == (n + Y4M_STEP - 1) // Y4M_STEP
