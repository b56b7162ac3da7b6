"""JPEG codec — sequential AND progressive — pure stdlib+NumPy
(ITU-T T.81).

The reference decodes crawl images with ``cv2.imread`` everywhere
(e.g. ``gluonocr/utils/data_utils.py:123-131``); JPEG is the dominant
crawl format, so the multimodal path needs a REAL decode, not the
watermarked fallback.

* decoder: unified coefficient-accumulating scan decoder — a
  sequential (SOF0/SOF1) scan is the degenerate progressive case
  (Ss=0, Se=63, Ah=Al=0). Marker parse (APPn/COM skipped,
  DQT/SOF/DHT/DRI/SOS×N), canonical Huffman with byte-unstuffing and
  RSTn handling, DC prediction + successive-approximation refinement,
  AC run-length with spectral selection, EOB runs and refinement
  correction bits (T.81 G.1.2), dezigzag, dequantize, vectorized 8×8
  IDCT, sampling-factor chroma upsample, YCbCr→RGB (JFIF full-range).
  Grayscale, 4:4:4 / 4:2:2 / 4:2:0, sequential and progressive all
  decode; lossless/arithmetic/hierarchical SOFs raise ``ValueError``
  so the caller's honest-stub fallback survives for true exotica.
* encoders (for fixtures/tests — no PIL/cv2 in the container):
  :func:`encode_jpeg` baseline 4:4:4/4:2:0 with the spec's Annex-K
  tables, and :func:`encode_jpeg_progressive` (SOF2) whose scan
  script exercises every progressive path — DC first/refine, two
  spectral AC bands, AC refinement with cross-block EOB runs. Both
  produce IDENTICAL quantized coefficients at the same settings, so
  the two decodes must agree byte-for-byte — the tests' cross-check.

Everything here is from the published spec; no code is taken from
libjpeg or the reference repo.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg", "encode_jpeg_progressive"]

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
                else:
                    # any marker ends the entropy segment (RSTn are
                    # consumed by sync_restart; DHT/SOS/EOI terminate a
                    # progressive scan): stop feeding real bytes and pad
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
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
    coeffs: list[np.ndarray] | None = None
    restart_interval = 0
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # tolerate fill bytes (0xFF padding before a marker)
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            break
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
                cnt = sum(bits)
                vals = list(body[b + 17 : b + 17 + cnt])
                htables[(cls, tid)] = _build_huff(bits, vals)
                b += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            depth, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if depth != 8:
                raise ValueError("only 8-bit depth supported")
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + c * 3 : 9 + c * 3]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF 0x{marker:02X} (lossless/arithmetic/hierarchical)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if coeffs is None:
                coeffs = _alloc_coeffs(frame)
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tabs = body[1 + c * 2], body[2 + c * 2]
                ci = next(
                    (i for i, cc in enumerate(frame["comps"]) if cc["id"] == cid), None
                )
                if ci is None:
                    raise ValueError("SOS references unknown component")
                scan_comps.append((ci, tabs >> 4, tabs & 0xF))
            ss, se, a = body[1 + ns * 2], body[2 + ns * 2], body[3 + ns * 2]
            ah, al = a >> 4, a & 0xF
            pos = _decode_scan(
                data, pos + 2 + seglen, frame, coeffs, scan_comps,
                ss, se, ah, al, htables, restart_interval,
            )
            continue
        pos += 2 + seglen
    if frame is None or coeffs is None:
        raise ValueError("no SOS marker")
    return _render(frame, coeffs, qtables)


def _comp_geometry(frame: dict) -> tuple[int, int, int, int]:
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _alloc_coeffs(frame: dict) -> list[np.ndarray]:
    """Per-component DCT coefficient planes (raster order within each
    64-vector), sized to the interleaved-MCU padding."""
    _, _, mcus_x, mcus_y = _comp_geometry(frame)
    return [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


class _ScanState:
    __slots__ = ("eobrun",)

    def __init__(self) -> None:
        self.eobrun = 0


def _decode_scan(data, pos, frame, coeffs, scan_comps, ss, se, ah, al, htables, ri):
    """One entropy-coded scan → coefficients. A sequential (baseline)
    scan is the degenerate case ss=0, se=63, ah=al=0; progressive
    scans carry spectral selection (ss..se) and successive
    approximation (ah/al) per T.81 G.1.2. Returns the byte position
    of the terminating marker."""
    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y = _comp_geometry(frame)
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    state = _ScanState()

    def tables(ci_entry):
        ci, dc_tid, ac_tid = ci_entry
        dc_t = htables.get((0, dc_tid))
        ac_t = htables.get((1, ac_tid))
        if ss == 0 and ah == 0 and dc_t is None:
            raise ValueError("missing DC Huffman table")
        if (se > 0 or ss > 0) and ac_t is None and not (ss == 0 and se == 0):
            raise ValueError("missing AC Huffman table")
        return dc_t, ac_t

    def restart(unit_idx: int) -> None:
        if ri and unit_idx and unit_idx % ri == 0:
            reader.sync_restart()
            pred[:] = [0] * len(comps)
            state.eobrun = 0

    if len(scan_comps) > 1:
        # interleaved MCU order (multi-component DC/sequential scans)
        unit = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                restart(unit)
                for entry in scan_comps:
                    ci = entry[0]
                    comp = comps[ci]
                    dc_t, ac_t = tables(entry)
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            blk = coeffs[ci][my * comp["v"] + by, mx * comp["h"] + bx]
                            pred[ci] = _decode_block(
                                reader, blk, dc_t, ac_t, ss, se, ah, al, pred[ci], state
                            )
                unit += 1
    else:
        # non-interleaved: one component over its OWN block grid
        # (ceil(comp pixel dims / 8), NOT the interleaved MCU padding)
        entry = scan_comps[0]
        ci = entry[0]
        comp = comps[ci]
        dc_t, ac_t = tables(entry)
        cw_px = -(-frame["w"] * comp["h"] // hmax)
        ch_px = -(-frame["h"] * comp["v"] // vmax)
        wb = -(-cw_px // 8)
        hb = -(-ch_px // 8)
        unit = 0
        for by in range(hb):
            for bx in range(wb):
                restart(unit)
                blk = coeffs[ci][by, bx]
                pred[ci] = _decode_block(
                    reader, blk, dc_t, ac_t, ss, se, ah, al, pred[ci], state
                )
                unit += 1

    # position of the terminating marker for the outer segment loop
    p = reader.pos
    while p + 1 < len(data) and not (
        data[p] == 0xFF and data[p + 1] != 0x00 and not (0xD0 <= data[p + 1] <= 0xD7)
    ):
        p += 1
    return p


def _decode_block(reader, blk, dc_t, ac_t, ss, se, ah, al, pred, state) -> int:
    """Decode one block's contribution for this scan; returns the new
    DC predictor. ``blk`` is the raster-order 64-vector accumulated
    across scans."""
    if ss == 0:
        if ah == 0:
            s = reader.decode_symbol(dc_t)
            pred += _extend(reader.read_bits(s), s)
            blk[0] = pred << al
        else:  # DC refinement: one correction bit
            if reader.read_bit():
                blk[0] |= 1 << al
        k = 1
        if se == 0:
            return pred
    else:
        k = ss

    if ah == 0:
        # first AC pass (sequential scans take this path too)
        if state.eobrun > 0:
            state.eobrun -= 1
            return pred
        while k <= se:
            rs = reader.decode_symbol(ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state.eobrun = (1 << r) - 1
                if r:
                    state.eobrun += reader.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC index overflow")
            blk[ZIGZAG[k]] = _extend(reader.read_bits(s), s) << al
            k += 1
    else:
        _refine_ac(reader, blk, ac_t, k, se, al, state)
    return pred


def _refine_ac(reader, blk, ac_t, ss, se, al, state) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3): new
    coefficients arrive with magnitude 1<<al; already-nonzero
    coefficients receive one correction bit each as the band is
    traversed; EOB runs carry correction bits for the rest of the
    band."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state.eobrun == 0:
        while k <= se:
            rs = reader.decode_symbol(ac_t)
            r, s = rs >> 4, rs & 0xF
            newval = 0
            if s == 0:
                if r != 15:
                    state.eobrun = 1 << r
                    if r:
                        state.eobrun += reader.read_bits(r)
                    break  # remaining band handled by the EOB tail
                # r == 15: skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if blk[z] != 0:
                    if reader.read_bit() and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval:
                if k > se:
                    raise ValueError("refinement ran past the band")
                blk[ZIGZAG[k]] = newval
            k += 1
    if state.eobrun > 0:
        while k <= se:
            z = ZIGZAG[k]
            if blk[z] != 0 and reader.read_bit() and (blk[z] & p1) == 0:
                blk[z] += p1 if blk[z] > 0 else m1
            k += 1
        state.eobrun -= 1


def _render(frame: dict, coeffs: list[np.ndarray], qtables: dict) -> np.ndarray:
    """Dequantize + IDCT every block (vectorized over the block grid),
    upsample chroma, convert to RGB/gray uint8."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _comp_geometry(frame)
    full = []
    for ci, comp in enumerate(comps):
        q = qtables.get(comp["tq"])
        if q is None:
            raise ValueError("missing quant table")
        q_raster = np.empty(64, dtype=np.int64)
        q_raster[ZIGZAG] = q  # DQT bytes are zigzag-ordered
        hb, wb, _ = coeffs[ci].shape
        deq = coeffs[ci].astype(np.float64) * q_raster
        blocks = deq.reshape(hb, wb, 8, 8)
        spatial = np.einsum("ux,hwuv,vy->hxwy", _M, blocks, _M) + 128.0
        plane = spatial.reshape(hb * 8, wb * 8)
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0), hmax // comp["h"], axis=1)
        full.append(plane[:h, :w])
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


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) RGB or (H, W) gray uint8 → baseline JPEG.
    ``subsampling``: '444' (default; byte-stable since round 3) or
    '420' (2×2-averaged chroma, interleaved 6-block MCUs — the shape
    most web JPEGs use; exercises the decoder's multi-block MCU and
    chroma upsample paths). ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every N MCUs with DC-predictor resets —
    the error-resilience feature real camera/web files carry
    (exercises the decoder's ``sync_restart`` path)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2 or a.shape[2] == 1
    if subsampling == "420" and not gray:
        if restart_interval:
            raise ValueError("restart_interval only wired on the 4:4:4 path")
        return _encode_jpeg_420(a, quality)
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
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
        + (seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b"")
        + seg(0xC4, dht)
        + seg(0xDA, sos)
    )

    wr = _BitWriter()
    pred = [0] * ncomp
    mcu = 0
    rst = 0
    for by in range(-(-h // 8)):
        for bx in range(-(-w // 8)):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wr.flush()  # pad to byte boundary with 1s
                wr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * ncomp  # RSTn resets the DC predictors
            mcu += 1
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


# ---------------------------------------------------------------------------
# progressive encoder (tests/fixtures — exercises the progressive decode)
# ---------------------------------------------------------------------------


def _rgb_planes(a: np.ndarray) -> list[np.ndarray]:
    if a.ndim == 2 or a.shape[2] == 1:
        return [a.reshape(a.shape[0], a.shape[1]).astype(np.float64)]
    r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
    return [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]


def _quantized_zz_blocks(plane: np.ndarray, qzz: np.ndarray) -> list[list[np.ndarray]]:
    """FDCT + quantize each 8×8 block (edge-replicate padding), values
    in ZIGZAG order — same math as the baseline encoder."""
    h, w = plane.shape
    rows = []
    for by in range(-(-h // 8)):
        row = []
        for bx in range(-(-w // 8)):
            blk = np.full((8, 8), 128.0)
            ys, xs = min(8, h - by * 8), min(8, w - bx * 8)
            blk[:ys, :xs] = plane[by * 8 : by * 8 + ys, bx * 8 : bx * 8 + xs]
            blk[ys:, :xs] = blk[ys - 1, :xs]
            blk[:, xs:] = blk[:, xs - 1 : xs]
            coeff = _M @ (blk - 128.0) @ _M.T
            row.append(np.rint(coeff.reshape(64)[ZIGZAG] / qzz).astype(int))
        rows.append(row)
    return rows


# uniform 8-bit Huffman tables covering every progressive symbol,
# including the EOBn run-length symbols (r<<4 | 0) the Annex-K
# sequential tables lack
_PROG_DC_BITS = [0, 0, 0, 0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0]
_PROG_DC_VALS = list(range(12))
_PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
_PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


class _EobState:
    """Cross-block EOB-run accumulator for one scan (T.81 G.1.2.2-3)."""

    def __init__(self, wr: _BitWriter, ac_codes: dict, first_pass: bool):
        self.wr = wr
        self.ac = ac_codes
        self.run = 0
        self.bits: list[int] = []  # buffered correction bits (refine only)
        self.first_pass = first_pass

    def flush(self) -> None:
        if self.run == 0:
            if self.bits:
                raise AssertionError("correction bits without an EOB run")
            return
        r = self.run.bit_length() - 1
        length, code = self.ac[r << 4]
        self.wr.write(code, length)
        if r:
            self.wr.write(self.run - (1 << r), r)
        for b in self.bits:
            self.wr.write(b, 1)
        self.run = 0
        self.bits = []


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """(H, W, 3) RGB or (H, W) gray uint8 → PROGRESSIVE (SOF2) JPEG,
    4:4:4 or 4:2:0. Scan script exercises every progressive decode
    path: DC first (Al=1) → AC first passes in two spectral bands
    (Al=1, per component over its OWN non-interleaved block grid, EOB
    runs across blocks) → DC refinement (raw bits) → AC refinement
    (Ah=1, correction bits + new coefficients + EOB-run correction
    tails). Quantized coefficients are IDENTICAL to
    :func:`encode_jpeg` at the same quality and subsampling, so both
    decodes must produce byte-identical pixels — the cross-check the
    tests pin."""
    a = np.asarray(arr, dtype=np.uint8)
    planes = _rgb_planes(a)
    h, w = planes[0].shape
    if subsampling == "420" and len(planes) == 3:
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [planes[0], _downsample2(planes[1]), _downsample2(planes[2])]
    elif subsampling in ("444", "420"):
        samp = [(1, 1)] * len(planes)
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    q = _quality_scale(QUANT_LUM, quality)
    qzz = q[ZIGZAG]
    # padded per-component grids (DC scans cover MCU padding blocks)
    comps_zz = []
    grids = []  # (padded_hb, padded_wb, own_hb, own_wb)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        phb, pwb = mcus_y * sv, mcus_x * sh
        comps_zz.append(
            [[_zz_quant(_block_at(planes[ci], by, bx), qzz) for bx in range(pwb)] for by in range(phb)]
        )
        cw_px = -(-w * sh // hmax)
        ch_px = -(-h * sv // vmax)
        grids.append((phb, pwb, -(-ch_px // 8), -(-cw_px // 8)))

    dc_codes = _encode_codes(_PROG_DC_BITS, _PROG_DC_VALS)
    ac_codes = _encode_codes(_PROG_AC_BITS, _PROG_AC_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sh, sv = samp[cid - 1]
        sof += bytes([cid, (sh << 4) | sv, 0])
    dqt = bytes([0]) + bytes(int(v) for v in qzz)
    dht = (
        bytes([0x00]) + bytes(_PROG_DC_BITS) + bytes(_PROG_DC_VALS)
        + bytes([0x10]) + bytes(_PROG_AC_BITS) + bytes(_PROG_AC_VALS)
    )
    out = bytearray(b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC2, sof) + seg(0xC4, dht))

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_mcu_order():
        """(ci, by, bx) in interleaved MCU order over padded grids."""
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            yield ci, my * sv + by, mx * sh + bx

    # -- scan 1: DC first pass, all components, Al=1 ----------------
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    wr = _BitWriter()
    pred = [0] * ncomp
    for ci, by, bx in dc_mcu_order():
        v = int(comps_zz[ci][by][bx][0]) >> 1  # arithmetic point transform
        diff = v - pred[ci]
        pred[ci] = v
        s = abs(diff).bit_length()
        length, code = dc_codes[s]
        wr.write(code, length)
        if s:
            wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    wr.flush()
    out += wr.out

    # -- AC first passes: two spectral bands per component, Al=1 ----
    # (non-interleaved: each component's OWN ceil(px/8) grid, which is
    # SMALLER than the padded DC grid for subsampled frames)
    for band in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            out += sos([ci + 1], band[0], band[1], 0, 1)
            wr = _BitWriter()
            eob = _EobState(wr, ac_codes, first_pass=True)
            for by in range(grids[ci][2]):
                for bx in range(grids[ci][3]):
                    zz = comps_zz[ci][by][bx]
                    tv = [
                        (1 if zz[k] > 0 else -1) * (abs(int(zz[k])) >> 1)
                        for k in range(band[0], band[1] + 1)
                    ]
                    nz = [i for i, v in enumerate(tv) if v != 0]
                    if not nz:
                        eob.run += 1
                        if eob.run == 0x7FFF:
                            eob.flush()
                        continue
                    eob.flush()
                    r = 0
                    for i in range(nz[-1] + 1):
                        v = tv[i]
                        if v == 0:
                            r += 1
                            continue
                        while r > 15:
                            length, code = ac_codes[0xF0]
                            wr.write(code, length)
                            r -= 16
                        s = abs(v).bit_length()
                        length, code = ac_codes[(r << 4) | s]
                        wr.write(code, length)
                        wr.write(v if v > 0 else v + (1 << s) - 1, s)
                        r = 0
                    if nz[-1] < len(tv) - 1:
                        eob.run += 1  # trailing zeros fold into an EOB run
            eob.flush()
            wr.flush()
            out += wr.out

    # -- DC refinement: one raw bit per block, all components -------
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    wr = _BitWriter()
    for ci, by, bx in dc_mcu_order():
        wr.write(int(comps_zz[ci][by][bx][0]) & 1, 1)
    wr.flush()
    out += wr.out

    # -- AC refinement: full band per component, Ah=1 Al=0 ----------
    for ci in range(ncomp):
        out += sos([ci + 1], 1, 63, 1, 0)
        wr = _BitWriter()
        eob = _EobState(wr, ac_codes, first_pass=False)
        for by in range(grids[ci][2]):
            for bx in range(grids[ci][3]):
                zz = comps_zz[ci][by][bx]
                absv = [abs(int(zz[k])) for k in range(1, 64)]
                newly = [i for i, t in enumerate(absv) if t == 1]
                eobpos = newly[-1] if newly else -1
                r = 0
                pend: list[int] = []
                for i in range(64 - 1):
                    t = absv[i]
                    if t == 0:
                        r += 1
                        continue
                    # drain ZRLs before ANY nonzero position (spec
                    # ordering: decoder walks interleaved corrections)
                    while r > 15 and i <= eobpos:
                        eob.flush()
                        length, code = ac_codes[0xF0]
                        wr.write(code, length)
                        r -= 16
                        for b in pend:
                            wr.write(b, 1)
                        pend = []
                    if t > 1:
                        pend.append(t & 1)
                        continue
                    eob.flush()
                    length, code = ac_codes[(r << 4) | 1]
                    wr.write(code, length)
                    wr.write(1 if zz[i + 1] > 0 else 0, 1)
                    for b in pend:
                        wr.write(b, 1)
                    pend = []
                    r = 0
                if r > 0 or pend:
                    eob.run += 1
                    eob.bits.extend(pend)
                    if eob.run == 0x7FFF:
                        eob.flush()
        eob.flush()
        wr.flush()
        out += wr.out

    return bytes(out) + b"\xff\xd9"


def _block_at(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
    """8×8 block with edge-replicate padding (plane may be smaller
    than the padded block grid)."""
    h, w = plane.shape
    blk = np.full((8, 8), 128.0)
    y0, x0 = by * 8, bx * 8
    ys, xs = max(0, min(8, h - y0)), max(0, min(8, w - x0))
    if ys and xs:
        blk[:ys, :xs] = plane[y0 : y0 + ys, x0 : x0 + xs]
        blk[ys:, :xs] = blk[ys - 1, :xs]
        blk[:, xs:] = blk[:, xs - 1 : xs]
    elif ys:  # block fully right of image: replicate last column
        blk[:ys, :] = plane[y0 : y0 + ys, w - 1 : w]
        blk[ys:, :] = blk[ys - 1, :]
    elif xs:
        blk[:, :xs] = plane[h - 1 : h, x0 : x0 + xs]
        blk[:, xs:] = blk[:, xs - 1 : xs]
    else:
        blk[:, :] = plane[h - 1, w - 1]
    return blk


def _zz_quant(blk: np.ndarray, qzz: np.ndarray) -> np.ndarray:
    coeff = _M @ (blk - 128.0) @ _M.T
    return np.rint(coeff.reshape(64)[ZIGZAG] / qzz).astype(int)


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 box average with edge replication for odd dims."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def _encode_jpeg_420(a: np.ndarray, quality: int) -> bytes:
    """Baseline interleaved 4:2:0: MCU = 4 Y blocks + Cb + Cr."""
    planes = _rgb_planes(a)
    h, w = planes[0].shape
    y_pl, cb_pl, cr_pl = planes[0], _downsample2(planes[1]), _downsample2(planes[2])
    q = _quality_scale(QUANT_LUM, quality)
    qzz = q[ZIGZAG]
    dc_codes = _encode_codes(DC_BITS, DC_VALS)
    ac_codes = _encode_codes(AC_BITS, AC_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    sos = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    dqt = bytes([0]) + bytes(int(v) for v in qzz)
    dht = (
        bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        + bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    )
    out = bytearray(
        b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof) + seg(0xC4, dht) + seg(0xDA, sos)
    )
    wr = _BitWriter()
    pred = [0, 0, 0]
    mcus_y, mcus_x = -(-h // 16), -(-w // 16)

    def emit_block(plane, by, bx, ci):
        zz = _zz_quant(_block_at(plane, by, bx), qzz)
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = abs(diff).bit_length()
        length, code = dc_codes[s]
        wr.write(code, length)
        if s:
            wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = max(np.nonzero(zz)[0]) if np.any(zz[1:]) else 0
        for k in range(1, 64):
            if k > last_nz:
                length, code = ac_codes[0x00]
                wr.write(code, length)
                break
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_codes[0xF0]
                wr.write(code, length)
                run -= 16
            s = abs(v).bit_length()
            length, code = ac_codes[(run << 4) | s]
            wr.write(code, length)
            wr.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(2):
                for bx in range(2):
                    emit_block(y_pl, my * 2 + by, mx * 2 + bx, 0)
            emit_block(cb_pl, my, mx, 1)
            emit_block(cr_pl, my, mx, 2)
    wr.flush()
    return bytes(out) + bytes(wr.out) + b"\xff\xd9"
