"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata, exactly
as the engine treats page payloads.

The decode step is REAL for the formats crawl data actually carries —
PNG (zlib inflate + all five row filters), JPEG both sequential and
progressive (stdlib Huffman + IDCT, :mod:`..kernels.jpeg`, round 3),
BMP, PPM, 16-bit WAV, and WebM container METADATA (EBML element walk,
``stdlib-ebml-probe`` — track count, pixel dims, sample rate) — via
:mod:`..kernels.codecs`; the ``decoder`` output column names the
codec (``stdlib-png``, ``stdlib-jpeg`` …). Since round 4 WebM frames
carrying vp8i key frames (:mod:`..kernels.vp8`) decode to REAL
pixels (``decoder='vp8i'``); only libvpx VP8/VP9 payloads keep the
clearly-marked deterministic payload-hash digests, and anything with
no decoder at all falls back to ``decoder='fake-deterministic'``
with digest-derived dimensions so callers can't mistake it for a
real decode.

The batch shape, schema, Arrow batching and metadata-only shuffle are
the production path; this mirrors how the reference's ``cv2.imdecode``
slots in (``gluonocr/data/data_utils.py:123-131``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, digest string, "
    "width int, height int, n_frames int, decoder string"
)

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"\x1a\x45\xdf\xa3": "video/webm",
}


def sniff_kind(payload: bytes) -> str:
    for magic, kind in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return kind
    return "application/octet-stream"


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in decode: pseudo (width, height, n_frames)
    derived from the content digest. NOT a real decode — marked via
    the ``decoder='fake-deterministic'`` output column."""
    h = hashlib.sha256(payload).digest()
    width = 64 + int.from_bytes(h[0:2], "big") % 4032
    height = 64 + int.from_bytes(h[2:4], "big") % 3024
    n_frames = 1 + int.from_bytes(h[4:6], "big") % 240
    return width, height, n_frames


def decode_media_strict(payload: bytes) -> dict:
    """Real decode: stdlib codecs for PNG / JPEG (sequential +
    progressive) / BMP / PPM / WAV; raises for formats still without
    a decoder (WebM/video) — never fakes."""
    from ..kernels.codecs import decode_media as _decode

    try:
        return _decode(bytes(payload))
    except ValueError as exc:
        raise NotImplementedError(
            f"no stdlib decoder for this payload ({exc}); WebM/video "
            "needs an external codec — plug it in here"
        ) from exc


def media_metadata(media: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """media(media_id, payload binary) → typed metadata table.

    Arrow-batched mapInPandas; payloads never leave the executor, only
    small metadata rows shuffle — the pattern that keeps a 100TB media
    table tractable (bytes stay columnar-local; metadata is the only
    thing that moves)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.codecs import decode_media as _real_decode

        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "n_bytes", "digest", "width", "height", "n_frames", "decoder")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                try:
                    meta = _real_decode(b)
                    kind, decoder = meta["kind"], meta["decoder"]
                    w = meta.get("width", meta.get("sample_rate", 0))
                    h = meta.get("height", meta.get("channels", 0))
                    f = meta.get("n_frames", meta.get("n_samples", 1))
                except ValueError:
                    w, h, f = _fake_decode(b)
                    kind, decoder = sniff_kind(b), "fake-deterministic"
                out["media_id"].append(str(mid))
                out["kind"].append(kind)
                out["n_bytes"].append(len(b))
                out["digest"].append(hashlib.sha256(b).hexdigest()[:16])
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["n_frames"].append(int(f))
                out["decoder"].append(decoder)
            yield pd.DataFrame(out)

    return media.select(id_col, payload_col).mapInPandas(gen, schema=MEDIA_META_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 30, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Frame sampling: one output row per sampled frame index. For
    WebM the frame COUNT is real (EBML SimpleBlock walk,
    :func:`..kernels.codecs.probe_webm`), and since round 4 blocks
    carrying vp8i key frames (kernels/vp8.py) get REAL frame-content
    digests from pixel reconstruction (``decoder='vp8i'``); libvpx
    VP8/VP9 payloads keep the deterministic payload hash, and
    non-EBML payloads fall back to the digest-derived fake count —
    each case clearly marked by ``decoder``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.codecs import decode_media as _decode, webm_vp8i_frames

        for pdf in batches:
            ids, frames, digests, decoders = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                decoded_frames: list = []
                try:
                    meta = _decode(b)
                    n_frames = int(meta.get("n_frames", 1))
                    decoder = meta["decoder"]
                    if decoder == "stdlib-ebml-probe":
                        decoded_frames = webm_vp8i_frames(b)
                except ValueError:
                    _, _, n_frames = _fake_decode(b)
                    decoder = "fake-deterministic"
                for i in range(0, n_frames, every_n):
                    ids.append(str(mid))
                    frames.append(i)
                    if i < len(decoded_frames) and decoded_frames[i].get("decoded"):
                        digests.append(f"{decoded_frames[i]['luma_digest']:016x}")
                        decoders.append("vp8i")
                    else:
                        digests.append(
                            hashlib.sha256(b + i.to_bytes(4, "big")).hexdigest()[:16]
                        )
                        decoders.append(decoder)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": frames, "frame_digest": digests, "decoder": decoders}
            )

    return media.select(id_col, payload_col).mapInPandas(
        gen, schema="media_id string, frame_idx int, frame_digest string, decoder string"
    )


def image_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    size: int = 8,
) -> DataFrame:
    """Decode → grayscale → bilinear-resize → perceptual features, per
    image (the feature-extract stage of a multimodal training
    pipeline). Emits a ``size×size`` luminance grid as an
    array<double> feature (pluggable into the ANN/LSH queries) plus a
    64-bit dHash (gradient sign fingerprint — identical for the same
    pixels regardless of container format, so PNG/BMP/PPM copies of
    one image dedup together). Formats without a stdlib decoder yield
    NULL feature rows rather than failing the batch."""
    from ..kernels.codecs import decode_media as _decode
    from ..kernels.nets import bilinear_resize

    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dhashes, means, feats, decoders = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(str(mid))
                try:
                    meta = _decode(bytes(payload) if payload is not None else b"")
                    pixels = meta.get("pixels")
                    if pixels is None:
                        raise ValueError("not an image")
                except ValueError:
                    dhashes.append(None)
                    means.append(None)
                    feats.append(None)
                    decoders.append(None)
                    continue
                gray = pixels[:, :, :3].mean(axis=2) if pixels.shape[2] >= 3 else pixels[:, :, 0].astype(np.float64)
                # dHash grid is (size, size+1) so each row yields `size` gradients
                grid = bilinear_resize(gray[None, None], size, size + 1)[0, 0]
                bits = (grid[:, 1:] > grid[:, :-1]).reshape(-1)
                dhash = 0
                for b in bits:
                    dhash = (dhash << 1) | int(b)
                feat = bilinear_resize(gray[None, None], size, size)[0, 0]
                dhashes.append(dhash - (1 << 63) if dhash >= (1 << 63) else dhash)  # signed 64
                means.append(float(gray.mean()))
                feats.append([float(v) for v in feat.reshape(-1)])
                decoders.append(meta["decoder"])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "dhash": pd.array(dhashes, dtype="Int64"),
                    "gray_mean": means,
                    "feature": feats,
                    "decoder": decoders,
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        gen,
        schema="media_id string, dhash bigint, gray_mean double, feature array<double>, decoder string",
    )


def audio_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    n_bands: int = 13,
) -> DataFrame:
    """Decode WAV → framed spectral features per clip (the audio
    analog of :func:`image_features`): frame count, duration, RMS,
    mean spectral centroid, mel-band log energies (array<double>,
    pluggable into the ANN/LSH queries like the image features).
    Non-audio payloads yield NULL feature rows rather than failing
    the batch; payload bytes never leave the executor."""
    from ..kernels.audio import audio_features as _feat
    from ..kernels.codecs import decode_media as _decode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "n_frames", "duration_s", "rms", "centroid_hz", "band_log_energy")}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["media_id"].append(str(mid))
                try:
                    meta = _decode(bytes(payload) if payload is not None else b"")
                    samples = meta.get("samples")
                    if samples is None:
                        raise ValueError("not audio")
                    f = _feat(samples, meta["sample_rate"], n_bands=n_bands)
                except ValueError:
                    for k in ("n_frames", "duration_s", "rms", "centroid_hz", "band_log_energy"):
                        rows[k].append(None)
                    continue
                rows["n_frames"].append(f["n_frames"])
                rows["duration_s"].append(f["duration_s"])
                rows["rms"].append(f["rms"])
                rows["centroid_hz"].append(f["centroid_hz"])
                rows["band_log_energy"].append(f["band_log_energy"])
            yield pd.DataFrame(rows)

    return media.select(id_col, payload_col).mapInPandas(
        gen,
        schema=(
            "media_id string, n_frames int, duration_s double, rms double, "
            "centroid_hz double, band_log_energy array<double>"
        ),
    )
