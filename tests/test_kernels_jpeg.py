"""Baseline JPEG codec (kernels/jpeg.py) — the real decode for the
dominant crawl image format (reference decodes via cv2.imread,
data_utils.py:123-131)."""

import numpy as np
import pytest

from gluon_ocr_spark.kernels.jpeg import ZIGZAG, decode_jpeg, encode_jpeg


def _photo(h=40, w=56, seed=5):
    rng = np.random.default_rng(seed)
    base = np.linspace(30, 220, w)[None, :] + np.linspace(0, 40, h)[:, None]
    return np.clip(base[:, :, None] + rng.normal(0, 8, (h, w, 3)), 0, 255).astype(np.uint8)


class TestRoundTrip:
    def test_constant_image_exact(self):
        img = np.full((16, 24, 3), 130, np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (16, 24, 3)
        assert np.array_equal(out, img)

    def test_gradient_near_exact(self):
        x = np.linspace(0, 255, 32)
        img = np.stack([np.tile(x, (24, 1))] * 3, axis=-1).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 95))
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_photo_like_quality(self):
        img = _photo()
        out = decode_jpeg(encode_jpeg(img, 90))
        # mean error ~4.3 at q90: the minimal encoder reuses the luma
        # quant table for chroma, slightly above libjpeg-grade ~3
        assert np.abs(out.astype(float) - img.astype(float)).mean() < 6.0

    def test_grayscale_and_odd_dims(self):
        rng = np.random.default_rng(1)
        g = np.clip(np.linspace(0, 255, 19)[None, :] + rng.normal(0, 5, (17, 19)), 0, 255).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, 92))
        assert out.shape == (17, 19, 1)
        assert np.abs(out[:, :, 0].astype(float) - g.astype(float)).mean() < 4.0

    def test_deterministic_encode(self):
        img = _photo(seed=9)
        assert encode_jpeg(img, 90) == encode_jpeg(img, 90)

    def test_quality_tradeoff(self):
        img = _photo(seed=2)
        lo, hi = encode_jpeg(img, 30), encode_jpeg(img, 95)
        assert len(lo) < len(hi)
        err = lambda b: np.abs(decode_jpeg(b).astype(float) - img).mean()  # noqa: E731
        assert err(hi) < err(lo)


class TestFormat:
    def test_zigzag_is_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"\x89PNG\r\n\x1a\nnope")

    def test_sof2_label_on_sequential_scan_decodes_identically(self):
        # the unified decoder treats a sequential scan under an SOF2
        # label as the degenerate progressive case — same pixels
        body = encode_jpeg(_photo(16, 16), 90)
        idx = body.find(b"\xff\xc0")
        hacked = body[:idx] + b"\xff\xc2" + body[idx + 2 :]
        assert np.array_equal(decode_jpeg(hacked), decode_jpeg(body))

    def test_rejects_lossless_sof3(self):
        body = encode_jpeg(_photo(16, 16), 90)
        idx = body.find(b"\xff\xc0")
        hacked = body[:idx] + b"\xff\xc3" + body[idx + 2 :]
        with pytest.raises(ValueError, match="unsupported SOF"):
            decode_jpeg(hacked)

    def test_truncated_raises_or_decodes_partially(self):
        # totality-on-junk: crawl payloads are often cut; must not hang
        body = encode_jpeg(_photo(24, 24), 90)
        cut = body[: len(body) // 3]
        try:
            decode_jpeg(cut)
        except ValueError:
            pass  # acceptable: clean error, no crash/hang

    def test_decode_media_dispatch(self):
        from gluon_ocr_spark.kernels.codecs import decode_media

        meta = decode_media(encode_jpeg(_photo(20, 28), 90))
        assert meta["decoder"] == "stdlib-jpeg"
        assert meta["kind"] == "image/jpeg"
        assert (meta["height"], meta["width"], meta["channels"]) == (20, 28, 3)


class TestCrossFormatDedup:
    def test_same_image_png_and_jpeg_share_dhash(self):
        """The image_features promise: one image in two container
        formats lands in the same dHash bucket (JPEG is lossy but
        dHash is a gradient-sign fingerprint, robust at q95)."""
        from gluon_ocr_spark.kernels.codecs import decode_media, encode_png
        from gluon_ocr_spark.kernels.nets import bilinear_resize

        img = _photo(32, 44, seed=11)

        def dhash(payload):
            pixels = decode_media(payload)["pixels"]
            gray = pixels[:, :, :3].mean(axis=2)
            grid = bilinear_resize(gray[None, None], 8, 9)[0, 0]
            bits = (grid[:, 1:] > grid[:, :-1]).reshape(-1)
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            return v

        h_png = dhash(encode_png(img))
        h_jpg = dhash(encode_jpeg(img, 95))
        assert bin(h_png ^ h_jpg).count("1") <= 2  # same bucket ±2 bits

    def test_strict_decode_accepts_jpeg_now(self):
        from gluon_ocr_spark.operators.multimodal import decode_media_strict

        meta = decode_media_strict(encode_jpeg(_photo(16, 16), 90))
        assert meta["decoder"] == "stdlib-jpeg"


class TestTotalityFuzz:
    def test_random_junk_never_hangs_or_crashes(self):
        """Crawl payloads are adversarial: random bytes behind an FFD8
        magic must produce a clean ValueError or a decoded array —
        never an unbounded loop or a raw IndexError."""
        rng = np.random.default_rng(0)
        for trial in range(200):
            n = int(rng.integers(4, 400))
            junk = b"\xff\xd8" + bytes(rng.integers(0, 256, n).tolist())
            try:
                out = decode_jpeg(junk)
                assert isinstance(out, np.ndarray)
            except ValueError:
                pass

    def test_bitflipped_valid_jpegs(self):
        base = bytearray(encode_jpeg(_photo(24, 32), 90))
        rng = np.random.default_rng(1)
        for trial in range(60):
            b = bytearray(base)
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
            try:
                decode_jpeg(bytes(b))
            except ValueError:
                pass


class TestProgressive:
    """Progressive (SOF2) decode: spectral selection + successive
    approximation. Oracle: the progressive encoder emits IDENTICAL
    quantized coefficients to the baseline encoder, so both decodes
    must agree byte-for-byte — any entropy/band/refinement bug breaks
    the equality."""

    def test_rgb_444_matches_baseline(self):
        from gluon_ocr_spark.kernels.jpeg import encode_jpeg_progressive

        img = _photo(40, 56)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(img, 90)),
            decode_jpeg(encode_jpeg(img, 90)),
        )

    def test_rgb_420_and_odd_dims(self):
        from gluon_ocr_spark.kernels.jpeg import encode_jpeg_progressive

        for h, w in ((17, 23), (33, 47), (16, 16)):
            img = _photo(h, w, seed=h * w)
            b = decode_jpeg(encode_jpeg(img, 88, subsampling="420"))
            p = decode_jpeg(encode_jpeg_progressive(img, 88, subsampling="420"))
            assert np.array_equal(b, p), (h, w)

    def test_gray_matches(self):
        from gluon_ocr_spark.kernels.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(3)
        g = np.clip(np.linspace(0, 255, 21)[None, :] + rng.normal(0, 5, (15, 21)), 0, 255).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(g, 85)), decode_jpeg(encode_jpeg(g, 85))
        )

    def test_noise_exercises_eob_runs_and_zrl(self):
        # pure noise maximizes nonzero AC (ZRL paths); flat regions
        # maximize EOB runs — mix both in one image
        from gluon_ocr_spark.kernels.jpeg import encode_jpeg_progressive

        rng = np.random.default_rng(9)
        img = np.full((48, 64, 3), 128, np.uint8)
        img[:24] = rng.integers(0, 256, (24, 64, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(img, 75)),
            decode_jpeg(encode_jpeg(img, 75)),
        )

    def test_progressive_decode_via_media_dispatch(self):
        from gluon_ocr_spark.kernels.codecs import decode_media
        from gluon_ocr_spark.kernels.jpeg import encode_jpeg_progressive

        meta = decode_media(encode_jpeg_progressive(_photo(20, 28), 90))
        assert meta["decoder"] == "stdlib-jpeg"
        assert (meta["height"], meta["width"]) == (20, 28)

    def test_truncated_progressive_partial_or_clean_error(self):
        from gluon_ocr_spark.kernels.jpeg import encode_jpeg_progressive

        body = encode_jpeg_progressive(_photo(24, 24), 90)
        for frac in (0.2, 0.5, 0.8):
            cut = body[: int(len(body) * frac)]
            try:
                out = decode_jpeg(cut)
                assert isinstance(out, np.ndarray)  # early scans only: coarse image
            except ValueError:
                pass


class TestRestartMarkers:
    def test_dri_decode_matches_no_dri(self):
        """RSTn markers change the wire layout, not the coefficients:
        decode must equal the marker-free encoding exactly."""
        img = _photo(48, 64, seed=21)
        plain = decode_jpeg(encode_jpeg(img, 90))
        for ri in (1, 3, 7):
            with_rst = decode_jpeg(encode_jpeg(img, 90, restart_interval=ri))
            assert np.array_equal(with_rst, plain), ri

    def test_dri_stream_contains_markers(self):
        body = encode_jpeg(_photo(40, 40, seed=22), 90, restart_interval=2)
        assert b"\xff\xdd" in body  # DRI segment
        assert any(bytes([0xFF, 0xD0 + i]) in body for i in range(8))
