"""Audio feature extraction (kernels/audio.py) + WebM EBML metadata
probe (kernels/codecs.py) — the round-3 multimodal completions."""

import numpy as np
import pytest

from gluon_ocr_spark.kernels.audio import audio_features, frame_signal, mel_filterbank
from gluon_ocr_spark.kernels.codecs import (
    decode_media,
    encode_wav,
    encode_webm_probe_fixture,
    probe_webm,
)


class TestAudioFeatures:
    def _tone(self, f0=440.0, n=8000, rate=16000, amp=12000):
        t = np.arange(n) / rate
        return (amp * np.sin(2 * np.pi * f0 * t)).astype(np.int16)[:, None]

    def test_frame_count_and_windowing(self):
        frames = frame_signal(np.ones(2048), frame=512, hop=256)
        assert frames.shape == (7, 512)
        # Hann window endpoints near zero
        assert abs(frames[0, 0]) < 1e-9

    def test_short_clip_yields_no_frames(self):
        f = audio_features(np.zeros((100, 1), np.int16), 16000)
        assert f["n_frames"] == 0 and f["rms"] == 0.0

    def test_mel_filterbank_covers_spectrum(self):
        fb = mel_filterbank(13, 512, 16000)
        assert fb.shape == (13, 257)
        # every filter has mass; interior frequencies covered
        assert (fb.sum(axis=1) > 0).all()
        assert (fb.sum(axis=0)[3:-3] > 0).all()

    def test_centroid_tracks_tone_frequency(self):
        lo = audio_features(self._tone(300.0), 16000)
        hi = audio_features(self._tone(3000.0), 16000)
        assert abs(lo["centroid_hz"] - 300) < 60
        assert abs(hi["centroid_hz"] - 3000) < 60

    def test_band_energy_peaks_at_tone_band(self):
        f = audio_features(self._tone(1000.0), 16000)
        bands = np.array(f["band_log_energy"])
        fb = mel_filterbank(13, 512, 16000)
        freqs = np.linspace(0, 8000, 257)
        centers = (fb * freqs).sum(axis=1) / fb.sum(axis=1)
        assert abs(centers[int(bands.argmax())] - 1000) < 500

    def test_deterministic(self):
        s = self._tone(700.0)
        a = audio_features(s, 16000)
        b = audio_features(s, 16000)
        assert a == b


class TestWebMProbe:
    def test_probe_roundtrip_video_and_audio(self):
        b = encode_webm_probe_fixture(1920, 1080, 48000, 2)
        m = probe_webm(b)
        assert (m["width"], m["height"]) == (1920, 1080)
        assert (m["sample_rate"], m["channels"], m["n_tracks"]) == (48000, 2, 2)

    def test_probe_video_only(self):
        m = probe_webm(encode_webm_probe_fixture(640, 360))
        assert (m["width"], m["height"], m["n_tracks"]) == (640, 360, 1)
        assert m["sample_rate"] == 0

    def test_decode_media_dispatch_real_metadata(self):
        meta = decode_media(encode_webm_probe_fixture(320, 240))
        assert meta["decoder"] == "stdlib-ebml-probe"
        assert meta["kind"] == "video/webm"
        assert (meta["width"], meta["height"]) == (320, 240)
        assert "pixels" not in meta  # frame decode remains the honest stub

    def test_probe_rejects_non_ebml(self):
        with pytest.raises(ValueError):
            probe_webm(b"RIFF....WAVE")

    def test_truncated_ebml_raises_cleanly(self):
        b = encode_webm_probe_fixture(640, 360, 44100, 1)
        for frac in (0.3, 0.6, 0.9):
            try:
                probe_webm(b[: int(len(b) * frac)])
            except ValueError:
                pass


class TestAudioFeaturesOperator:
    def test_operator_rows_and_null_for_non_audio(self, spark):
        from gluon_ocr_spark.operators.multimodal import audio_features as op

        tone = (
            12000 * np.sin(2 * np.pi * 440 * np.arange(6000) / 16000)
        ).astype(np.int16)[:, None]
        rows = [
            ("a", bytearray(encode_wav(tone, 16000))),
            ("b", bytearray(b"not audio at all")),
        ]
        df = spark.createDataFrame(rows, "media_id string, payload binary")
        got = {r["media_id"]: r for r in op(df).collect()}
        assert got["a"]["n_frames"] > 0
        assert abs(got["a"]["centroid_hz"] - 440) < 60
        assert len(got["a"]["band_log_energy"]) == 13
        assert got["b"]["n_frames"] is None


class TestWebMFrameCount:
    def test_block_count_is_real(self):
        b = encode_webm_probe_fixture(640, 360, n_frames=37)
        assert probe_webm(b)["n_blocks"] == 37
        assert decode_media(b)["n_frames"] == 37

    def test_frame_sample_uses_real_webm_count(self, spark):
        from gluon_ocr_spark.operators.multimodal import frame_sample

        b = encode_webm_probe_fixture(320, 240, n_frames=61)
        df = spark.createDataFrame([("v1", bytearray(b))], "media_id string, payload binary")
        rows = frame_sample(df, every_n=10).collect()
        assert len(rows) == 7  # ceil(61/10)
        assert all(r["decoder"] == "stdlib-ebml-probe" for r in rows)
        assert sorted(r["frame_idx"] for r in rows) == [0, 10, 20, 30, 40, 50, 60]
