"""Baseline-sequential JPEG codec, pure stdlib+NumPy (ITU-T T.81).

The reference decodes crawl images with ``cv2.imread`` everywhere
(e.g. ``gluonocr/utils/data_utils.py:123-131``); JPEG is the dominant
crawl format, so the multimodal path needs a REAL decode, not the
watermarked fallback. This implements the baseline sequential DCT
process from the public JPEG spec:

* decoder: marker parse (APPn/COM skipped, DQT/SOF0/DHT/DRI/SOS),
  Huffman entropy decode with byte-unstuffing and RSTn handling,
  DC-prediction + AC run-length, dezigzag, dequantize, 8×8 IDCT
  (separable orthonormal DCT-III matrix), sampling-factor chroma
  upsample, YCbCr→RGB (JFIF full-range). Grayscale (1 component),
  4:4:4, 4:2:2 and 4:2:0 sampling supported — progressive (SOF2),
  arithmetic coding, and 12-bit depth raise ``ValueError`` so the
  caller's honest-stub fallback still exists for exotic files.
* encoder (for fixtures/tests — no PIL/cv2 in the container):
  4:4:4 baseline with the spec's Annex-K example quantization
  tables (quality-scaled per the common IJG mapping) and Annex-K
  luminance Huffman tables for all components.

Everything here is from the published spec; no code is taken from
libjpeg or the reference repo.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# Annex K.1 example quantization tables
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])

# Annex K.3: typical luminance Huffman tables (BITS counts per code
# length 1..16, then the symbol values in code order)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8-point DCT matrix: M[u, x] = a(u) cos((2x+1)uπ/16)
_M = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)) * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, canonical code assignment per the spec."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _extend(bits_val: int, size: int) -> int:
    """DC/AC magnitude decode (spec F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return bits_val if bits_val >= (1 << (size - 1)) else bits_val - (1 << size) + 1


class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    unstuffing; RSTn markers are consumed by ``sync_restart``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0xFF  # pad past EOI
                self.nbits += 8
                continue
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # restart/EOI marker: stop feeding real bytes
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self) -> None:
        """Drop pending bits and consume the RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) RGB or (H, W, 1) grayscale uint8.
    Truncated/corrupt payloads raise ``ValueError`` (totality-on-junk:
    crawl bytes must never crash an executor with a raw IndexError)."""
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, struct.error, KeyError, OverflowError) as exc:
        # OverflowError: bit-flipped DC deltas can run the predictor
        # past int32 — corrupt data, same contract as truncation
        raise ValueError(f"corrupt JPEG: {type(exc).__name__}: {exc}") from exc


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) → table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tid] = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8).astype(np.int32)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                htables[(cls, tid)] = _build_huff(bits, vals)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if depth != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0x{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_sel = {}
            for c in range(ns):
                cid, tabs = body[1 + c * 2], body[2 + c * 2]
                scan_sel[cid] = (tabs >> 4, tabs & 0xF)
            return _decode_scan(
                data, pos + 2 + seglen, frame, scan_sel, qtables, htables, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("no SOS marker")


def _decode_scan(data, pos, frame, scan_sel, qtables, htables, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64) for c in comps
    ]
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dc_t = htables.get((0, scan_sel[comp["id"]][0]))
                ac_t = htables.get((1, scan_sel[comp["id"]][1]))
                q = qtables[comp["tq"]]
                if dc_t is None or ac_t is None:
                    raise ValueError("missing Huffman table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = reader.decode_symbol(dc_t)
                        pred[ci] += _extend(reader.read_bits(s), s)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        spatial = _M.T @ block.reshape(8, 8) @ _M + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# minimal 4:4:4 encoder (fixtures/tests only)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    return {v: (length, code) for (length, code), v in _build_huff(bits, vals).items()}


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) RGB or (H, W) gray uint8 → baseline 4:4:4 JPEG."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2 or a.shape[2] == 1
    if gray:
        planes = [a.reshape(a.shape[0], a.shape[1]).astype(np.float64)]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    h, w = planes[0].shape
    q = _quality_scale(QUANT_LUM, quality)
    dc_codes = _encode_codes(DC_BITS, DC_VALS)
    ac_codes = _encode_codes(AC_BITS, AC_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # 1×1 sampling, quant table 0
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    qzz = q[ZIGZAG]  # DQT body is zigzag-ordered per the spec
    dqt = bytes([0]) + bytes(int(v) for v in qzz)
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    head = (
        b"\xff\xd8"
        + seg(0xDB, dqt)
        + seg(0xC0, sof)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
    )

    wr = _BitWriter()
    pred = [0] * ncomp
    for by in range(-(-h // 8)):
        for bx in range(-(-w // 8)):
            for ci, plane in enumerate(planes):
                blk = np.full((8, 8), 128.0)
                ys, xs = min(8, h - by * 8), min(8, w - bx * 8)
                blk[:ys, :xs] = plane[by * 8 : by * 8 + ys, bx * 8 : bx * 8 + xs]
                # edge replicate padding keeps partial blocks clean
                blk[ys:, :xs] = blk[ys - 1, :xs]
                blk[:, xs:] = blk[:, xs - 1 : xs]
                coeff = _M @ (blk - 128.0) @ _M.T
                zz = np.rint(coeff.reshape(64)[ZIGZAG] / qzz).astype(int)
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s = int(diff).bit_length() if diff != 0 else 0
                length, code = dc_codes[s]
                wr.write(code, length)
                if s:
                    wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
                run = 0
                last_nz = max(np.nonzero(zz)[0]) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    if k > last_nz:
                        length, code = ac_codes[0x00]  # EOB
                        wr.write(code, length)
                        break
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        length, code = ac_codes[0xF0]  # ZRL
                        wr.write(code, length)
                        run -= 16
                    s = abs(v).bit_length()
                    length, code = ac_codes[(run << 4) | s]
                    wr.write(code, length)
                    wr.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
    wr.flush()
    return head + bytes(wr.out) + b"\xff\xd9"
