"""vp8i codec: boolean coder, transforms, prediction, frame/WebM
round-trips, rate-distortion sanity."""

import numpy as np
import pytest

from gluon_ocr_spark.kernels import vp8
from gluon_ocr_spark.kernels.codecs import (
    encode_webm_probe_fixture,
    probe_webm,
    webm_vp8i_frames,
)


def test_bool_coder_roundtrip_random():
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, 4000).tolist()
    probs = rng.integers(1, 255, 4000).tolist()
    enc = vp8.BoolEncoder()
    for b, p in zip(bits, probs):
        enc.put(b, p)
    dec = vp8.BoolDecoder(enc.finish())
    assert [dec.get(p) for p in probs] == bits


def test_bool_coder_skewed_probs_compress():
    """1000 zeros at prob 250 must code far below 1000 bits — the
    arithmetic coder is actually entropy coding, not bit packing."""
    enc = vp8.BoolEncoder()
    for _ in range(1000):
        enc.put(0, 250)
    data = enc.finish()
    assert len(data) < 40  # ~0.03 bits/symbol + flush


def test_tree_coder_roundtrip_all_symbols():
    enc = vp8.BoolEncoder()
    syms = list(range(8)) * 40
    for s in syms:
        vp8.encode_tree(enc, vp8.TOKEN_TREE, vp8.TOKEN_PROBS[2], s)
    dec = vp8.BoolDecoder(enc.finish())
    assert [vp8.decode_tree(dec, vp8.TOKEN_TREE, vp8.TOKEN_PROBS[2]) for _ in syms] == syms


def test_transform_roundtrips():
    rng = np.random.default_rng(13)
    for _ in range(100):
        x = rng.integers(-255, 256, (4, 4))
        assert np.abs(vp8.idct4x4(vp8.fdct4x4(x)) - x).max() <= 1
        y = rng.integers(-500, 500, (4, 4))
        assert np.abs(vp8.iwht4x4(vp8.fwht4x4(y)) - y).max() <= 1


def test_idct_dc_only():
    """A DC-only coefficient block reconstructs a flat (dc+4)>>3
    plane — net inverse gain 1/8, matched by the forward's 8×mean DC
    (fdct4x4 of a flat-x block has [0,0] = 8x)."""
    blk = np.zeros((4, 4), dtype=np.int64)
    blk[0, 0] = 80
    out = vp8.idct4x4(blk)
    assert (out == (80 + 4) >> 3).all()
    flat = np.full((4, 4), 9, dtype=np.int64)
    assert vp8.fdct4x4(flat)[0, 0] == 72


@pytest.mark.parametrize("mode", [vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED])
def test_predict_shapes_and_ranges(mode):
    rng = np.random.default_rng(mode)
    above = rng.integers(0, 256, 16)
    left = rng.integers(0, 256, 16)
    p = vp8._predict(16, mode, above, left, 100)
    assert p.shape == (16, 16) and p.min() >= 0 and p.max() <= 255
    # no-context variants
    p0 = vp8._predict(16, mode, None, None, 0)
    assert p0.shape == (16, 16)


def test_frame_roundtrip_error_bounded_by_quantizer():
    rng = np.random.default_rng(17)
    img = np.clip(
        60 + np.cumsum(rng.integers(-3, 4, (48, 64)), axis=1), 0, 255
    ).astype(np.uint8)
    prev_bytes = None
    for q in (0, 8, 24, 48):
        data = vp8.encode_frame(img, q_index=q)
        out = vp8.decode_frame(data)
        dc_q, ac_q = vp8.quant_for_index(q)
        err = np.abs(out["y"].astype(int) - img.astype(int)).max()
        assert err <= ac_q * 2 + 8
        if prev_bytes is not None:
            assert len(data) <= prev_bytes * 1.1  # coarser q never costs much more
        prev_bytes = len(data)
    assert out["width"] == 64 and out["height"] == 48


def test_frame_dims_not_multiple_of_16():
    img = np.full((20, 35), 77, dtype=np.uint8)
    out = vp8.decode_frame(vp8.encode_frame(img, q_index=0))
    assert out["y"].shape == (20, 35)
    assert np.abs(out["y"].astype(int) - 77).max() <= 1


def test_decode_rejects_non_keyframe_and_garbage():
    with pytest.raises(ValueError):
        vp8.decode_frame(b"\x00" * 20)
    img = np.full((16, 16), 50, dtype=np.uint8)
    data = bytearray(vp8.encode_frame(img))
    data[0] |= 1  # flip to interframe
    with pytest.raises(ValueError):
        vp8.decode_frame(bytes(data))


def test_prediction_modes_exploit_structure():
    """Stripes must code dramatically smaller than noise at the same
    quantizer — evidence prediction + entropy coding are real."""
    yy, xx = np.mgrid[0:32, 0:64]
    stripes = (((xx // 8) % 2) * 180 + 30).astype(np.uint8)
    rng = np.random.default_rng(23)
    noise = rng.integers(0, 256, (32, 64)).astype(np.uint8)
    b_stripes = len(vp8.encode_frame(stripes, q_index=8))
    b_noise = len(vp8.encode_frame(noise, q_index=8))
    assert b_stripes * 5 < b_noise


def test_webm_mux_decode_roundtrip():
    img = (np.arange(32 * 48).reshape(32, 48) % 251).astype(np.uint8)
    f1 = vp8.encode_frame(img, q_index=4)
    f2 = vp8.encode_frame(255 - img, q_index=12)
    webm = encode_webm_probe_fixture(48, 32, frame_payloads=[f1, f2])
    frames = webm_vp8i_frames(webm)
    assert [f["decoded"] for f in frames] == [True, True]
    assert frames[0]["q_index"] == 4 and frames[1]["q_index"] == 12
    assert frames[0]["luma_digest"] != frames[1]["luma_digest"]
    # probe path unchanged by real payloads
    meta = probe_webm(webm)
    assert meta["n_blocks"] == 2 and meta["width"] == 48

    # determinism: same input → same bytes → same digest
    assert vp8.encode_frame(img, q_index=4) == f1


def test_legacy_filler_blocks_reported_undecoded():
    legacy = encode_webm_probe_fixture(48, 32, n_frames=3)
    frames = webm_vp8i_frames(legacy)
    assert [f["decoded"] for f in frames] == [False, False, False]


def test_frame_sample_real_vp8i_digests(spark):
    """frame_sample emits decoder='vp8i' + pixel-derived digests for
    WebM blocks carrying vp8i frames; filler blocks keep the marked
    payload-hash path."""
    import numpy as np

    from gluon_ocr_spark.operators.multimodal import frame_sample

    img = (np.arange(32 * 48).reshape(32, 48) % 251).astype(np.uint8)
    f1 = vp8.encode_frame(img, q_index=4)
    f2 = vp8.encode_frame(255 - img, q_index=4)
    real = encode_webm_probe_fixture(48, 32, frame_payloads=[f1, f2])
    filler = encode_webm_probe_fixture(48, 32, n_frames=2)
    df = spark.createDataFrame(
        [("real", bytearray(real)), ("filler", bytearray(filler))],
        "media_id string, payload binary",
    )
    rows = {(r["media_id"], r["frame_idx"]): r for r in frame_sample(df, every_n=1).collect()}
    assert rows[("real", 0)]["decoder"] == "vp8i"
    assert rows[("real", 1)]["decoder"] == "vp8i"
    assert rows[("real", 0)]["frame_digest"] != rows[("real", 1)]["frame_digest"]
    expected = vp8.luma_digest(vp8.decode_frame(f1)["y"])
    assert rows[("real", 0)]["frame_digest"] == f"{expected:016x}"
    assert rows[("filler", 0)]["decoder"] == "stdlib-ebml-probe"


def test_frame_roundtrip_property():
    """Hypothesis: ANY uint8 image (random dims not multiples of 16,
    any content) encodes → decodes with max error bounded by the
    dequant step, and the bytes are deterministic."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(8, 40),
        st.integers(8, 56),
        st.integers(0, 127),
        st.integers(0, 2**31 - 1),
    )
    def check(h, w, q, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w)).astype(np.uint8)
        data = vp8.encode_frame(img, q_index=q)
        assert vp8.encode_frame(img, q_index=q) == data
        out = vp8.decode_frame(data)
        assert out["y"].shape == (h, w)
        dc_q, ac_q = vp8.quant_for_index(q)
        err = np.abs(out["y"].astype(int) - img.astype(int)).max()
        assert err <= ac_q * 2 + 8

    check()
