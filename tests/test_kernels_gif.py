"""GIF codec (kernels/gif.py) — LZW decode with dictionary growth,
interlace, palettes; lossless roundtrip is the oracle."""

import numpy as np
import pytest

from gluon_ocr_spark.kernels.gif import decode_gif, encode_gif, _lzw_decode


def _pal_img(seed=0, h=40, w=60, ncol=200):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
    return pal[rng.integers(0, ncol, (h, w))]


class TestRoundTrip:
    def test_exact_roundtrip_various(self):
        for seed, h, w, ncol in ((0, 20, 30, 4), (1, 64, 64, 256), (2, 33, 47, 31)):
            img = _pal_img(seed, h, w, ncol)
            assert np.array_equal(decode_gif(encode_gif(img)), img), (seed, h, w)

    def test_gray_input_replicates_channels(self):
        g = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 20)
        out = decode_gif(encode_gif(g))
        assert np.array_equal(out, np.stack([g, g, g], axis=2))

    def test_runs_exercise_kwkwk_chains(self):
        pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], np.uint8)
        idx = np.tile(np.repeat(np.arange(3), 50), 30).reshape(30, 150) % 3
        img = pal[idx]
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_dictionary_reset_at_4096(self):
        img = _pal_img(3, 300, 400, 250)
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_too_many_colors_raises(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (40, 40, 3)).astype(np.uint8)  # ~1600 colors
        with pytest.raises(ValueError, match="256"):
            encode_gif(img)


class TestFormat:
    def test_interlaced_image_depermutes(self):
        # hand-build an interlaced variant: permute rows per the 4-pass
        # order, set the interlace flag, and expect the original back
        img = _pal_img(5, 16, 8, 7)
        body = bytearray(encode_gif(img))
        # image descriptor starts after header+LSD+GCT; find 0x2C
        pos = body.index(0x2C, 13)
        flags_pos = pos + 9
        # decode non-interlaced indices via a plain decode first
        plain = decode_gif(bytes(body))
        h = 16
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        permuted = plain[order]  # rows as they'd be STORED interlaced
        re = encode_gif(permuted)
        rb = bytearray(re)
        p2 = rb.index(0x2C, 13)
        rb[p2 + 9] |= 0x40  # set interlace flag
        assert np.array_equal(decode_gif(bytes(rb)), plain)

    def test_rejects_non_gif(self):
        with pytest.raises(ValueError):
            decode_gif(b"\x89PNG\r\n\x1a\n")

    def test_truncated_and_junk_raise_cleanly(self):
        body = encode_gif(_pal_img(6, 24, 24, 16))
        rng = np.random.default_rng(7)
        for frac in (0.2, 0.5, 0.8):
            try:
                decode_gif(body[: int(len(body) * frac)])
            except ValueError:
                pass
        for _ in range(100):
            junk = b"GIF89a" + bytes(rng.integers(0, 256, int(rng.integers(4, 200))).tolist())
            try:
                out = decode_gif(junk)
                assert isinstance(out, np.ndarray)
            except ValueError:
                pass

    def test_extension_blocks_skipped(self):
        img = _pal_img(8, 10, 12, 5)
        body = bytearray(encode_gif(img))
        pos = body.index(0x2C, 13)
        # inject a GCE extension before the image descriptor
        gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
        hacked = bytes(body[:pos]) + gce + bytes(body[pos:])
        assert np.array_equal(decode_gif(hacked), img)

    def test_decode_media_dispatch(self):
        from gluon_ocr_spark.kernels.codecs import decode_media

        img = _pal_img(9, 14, 18, 9)
        meta = decode_media(encode_gif(img))
        assert meta["decoder"] == "stdlib-gif"
        assert meta["kind"] == "image/gif"
        assert np.array_equal(meta["pixels"], img)


class TestLZW:
    def test_kwkwk_direct(self):
        # classic KwKwK stream: encode 'aaaa...' style input and decode
        from gluon_ocr_spark.kernels.gif import _lzw_encode

        indices = [1] * 40
        assert _lzw_decode(_lzw_encode(indices, 2), 2, 40) == indices

    def test_width_bump_boundary(self):
        from gluon_ocr_spark.kernels.gif import _lzw_encode

        rng = np.random.default_rng(10)
        for n in (250, 260, 510, 515, 1030):
            seq = rng.integers(0, 4, n).tolist()
            assert _lzw_decode(_lzw_encode(seq, 2), 2, n) == seq


def test_gif_png_same_pixels_same_dhash():
    """GIF is lossless for palette images: a PNG and a GIF of the SAME
    pixels must produce the IDENTICAL dHash (stronger than the JPEG
    ±2-bit tolerance)."""
    from gluon_ocr_spark.kernels.codecs import decode_media, encode_png
    from gluon_ocr_spark.kernels.nets import bilinear_resize

    img = _pal_img(11, 36, 48, 40)

    def dhash(payload):
        pixels = decode_media(payload)["pixels"]
        gray = pixels[:, :, :3].mean(axis=2)
        grid = bilinear_resize(gray[None, None], 8, 9)[0, 0]
        bits = (grid[:, 1:] > grid[:, :-1]).reshape(-1)
        v = 0
        for b in bits:
            v = (v << 1) | int(b)
        return v

    assert dhash(encode_png(img)) == dhash(encode_gif(img))
