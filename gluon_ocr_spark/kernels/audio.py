"""Audio feature extraction — the audio analog of the image
feature-extract stage (decode → frame → spectral features), pure
NumPy over :func:`.codecs.decode_wav` output.

A multimodal training pipeline needs per-clip features for filtering
and dedup the same way it needs dHash/luma grids for images: framed
short-time spectra, mel-spaced band energies, RMS and spectral
centroid. Everything is deterministic closed-form math (Hann window,
rfft power, triangular mel banks), so the Spark operator's rows are
reproducible on any executor and the kernel-parity gate applies.
"""

from __future__ import annotations

import numpy as np

__all__ = ["frame_signal", "mel_filterbank", "audio_features"]


def frame_signal(mono: np.ndarray, frame: int = 512, hop: int = 256) -> np.ndarray:
    """(n,) → (n_frames, frame) Hann-windowed frames (zero-padded tail
    dropped: partial frames are not emitted, matching the usual STFT
    'center=False' convention)."""
    n = len(mono)
    if n < frame:
        return np.empty((0, frame))
    n_frames = 1 + (n - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    return mono[idx] * hann


def mel_filterbank(n_bands: int, n_fft: int, rate: int) -> np.ndarray:
    """(n_bands, n_fft//2+1) triangular filters on the mel scale
    (HTK mel: 2595·log10(1+f/700)), band edges from 0 to rate/2."""
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
    edges = imel(np.linspace(mel(0.0), mel(rate / 2.0), n_bands + 2))
    freqs = np.linspace(0.0, rate / 2.0, n_fft // 2 + 1)
    fb = np.zeros((n_bands, len(freqs)))
    for b in range(n_bands):
        lo, mid, hi = edges[b], edges[b + 1], edges[b + 2]
        up = (freqs - lo) / max(mid - lo, 1e-9)
        down = (hi - freqs) / max(hi - mid, 1e-9)
        fb[b] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def audio_features(
    samples: np.ndarray, rate: int, frame: int = 512, hop: int = 256, n_bands: int = 13
) -> dict:
    """Per-clip features from 16-bit PCM samples ((n, ch) int16):
    frame count, duration, RMS, mean spectral centroid, and the
    log-energy mean per mel band (length ``n_bands``)."""
    s = np.asarray(samples, dtype=np.float64)
    mono = s.mean(axis=1) if s.ndim == 2 else s
    mono = mono / 32768.0
    frames = frame_signal(mono, frame, hop)
    rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
    out = {
        "n_samples": int(len(mono)),
        "duration_s": float(len(mono) / rate) if rate else 0.0,
        "n_frames": int(frames.shape[0]),
        "rms": rms,
        "centroid_hz": 0.0,
        "band_log_energy": [0.0] * n_bands,
    }
    if frames.shape[0] == 0:
        return out
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (n_frames, frame//2+1)
    freqs = np.linspace(0.0, rate / 2.0, frame // 2 + 1)
    power = spec.sum(axis=1)
    nz = power > 0
    centroid = float(((spec @ freqs)[nz] / power[nz]).mean()) if nz.any() else 0.0
    fb = mel_filterbank(n_bands, frame, rate)
    band = spec @ fb.T  # (n_frames, n_bands)
    out["centroid_hz"] = centroid
    out["band_log_energy"] = [float(v) for v in np.log10(band.mean(axis=0) + 1e-12)]
    return out
