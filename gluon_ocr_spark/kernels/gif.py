"""GIF codec (GIF87a/89a), pure stdlib+NumPy — the remaining common
crawl image format after PNG/JPEG/BMP (:mod:`.codecs`, :mod:`.jpeg`).

Decoder: logical screen descriptor + global/local color tables,
extension blocks skipped (the GCE transparency index is honored as a
palette passthrough — compositing policy is the caller's), FIRST
image descriptor rendered: variable-width LZW decode (clear/end
codes, dictionary growth to 12 bits, the KwKwK self-reference case),
optional interlace de-permutation, palette lookup → (H, W, 3) uint8.
Animated GIFs return the first frame — the training-data convention.

Encoder (tests/fixtures): real LZW with dictionary growth and reset
at 4096 entries, so decode(encode(x)) == x exactly (GIF is lossless)
exercises the whole code path including width bumps; images must
have ≤ 256 distinct colors (raise otherwise — build palette images
in tests).

Written from the published GIF89a specification; no code from
giflib/PIL/the reference.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]


def decode_gif(data: bytes) -> np.ndarray:
    try:
        return _decode_inner(data)
    except (IndexError, struct.error, KeyError, OverflowError) as exc:
        raise ValueError(f"corrupt GIF: {type(exc).__name__}: {exc}") from exc


def _decode_inner(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, bg, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        chunks = []
        while pos < len(data) and data[pos] != 0:
            ln = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1  # block terminator
        indices = _lzw_decode(b"".join(chunks), min_code, w * h)
        if len(indices) < w * h:
            raise ValueError("GIF pixel data truncated")
        idx = np.array(indices[: w * h], dtype=np.int32).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            out_rows = np.empty_like(idx)
            out_rows[order] = idx
            idx = out_rows
        if int(idx.max()) >= len(pal):
            raise ValueError("GIF index out of palette range")
        frame = pal[idx]
        if (left, top, w, h) == (0, 0, sw, sh):
            return frame.copy()
        # sub-rectangle frame: composite onto the background screen
        screen = np.zeros((sh, sw, 3), dtype=np.uint8)
        if gct is not None and bg < len(gct):
            screen[:, :] = gct[bg]
        screen[top : top + h, left : left + w] = frame
        return screen
    raise ValueError("GIF has no image descriptor")


def _lzw_decode(stream: bytes, min_code: int, max_pixels: int) -> list[int]:
    """Variable-width GIF-LZW: clear resets the dictionary; new entry
    per decoded code (prev + first-of-current, the KwKwK rule when
    the code IS the next entry)."""
    clear = 1 << min_code
    end = clear + 1
    bitpos = 0
    nbits = len(stream) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return end  # truncated: treat as end-of-information
        byte0 = bitpos >> 3
        v = int.from_bytes(stream[byte0 : byte0 + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    def fresh() -> list[list[int]]:
        return [[i] for i in range(clear)] + [[], []]

    table = fresh()
    width = min_code + 1
    out: list[int] = []
    prev: list[int] | None = None
    while len(out) < max_pixels:
        code = read_code(width)
        if code == clear:
            table = fresh()
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and code not in (clear, end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # KwKwK
        else:
            raise ValueError("bad LZW code")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def encode_gif(arr: np.ndarray) -> bytes:
    """(H, W, 3) RGB or (H, W) gray uint8 with ≤256 distinct colors →
    single-frame GIF89a with a real growing-dictionary LZW stream."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=2)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"{len(colors)} colors; GIF needs <= 256")
    pal_bits = max(1, int(len(colors) - 1).bit_length())
    pal_n = 1 << pal_bits
    palette = np.zeros((pal_n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    min_code = max(2, pal_bits)
    body = _lzw_encode(inverse.astype(int).tolist(), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([min_code])
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    put(clear, width)
    prefix: tuple[int, ...] = ()
    for sym in indices:
        cand = prefix + (sym,)
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dictionary full: reset
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        prefix = (sym,)
    if prefix:
        put(table[prefix], width)
    put(end, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)
