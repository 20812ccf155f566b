"""GIF87a/89a codec — pure Python + numpy, no media libraries.

Closes the LZW compressed-container slot in the media decode matrix
(multimodal.py): the decoder handles any single-frame GIF — global or
local color table, interlaced or sequential row order, real
variable-width LZW (dictionary growth to 12 bits, CLEAR resets, EOI),
sub-block reassembly, and skips extension blocks (GCE, comments,
application). Animation (multiple image descriptors) decodes its FIRST
frame; transparency is ignored (composited against the palette color
itself) — both documented below rather than guessed at.

The encoder exists to make the decoder testable without PIL in the
container: it builds the palette from the image's own unique colors
when they fit 256, else quantizes deterministically to the RGB-332
cube, and emits REAL LZW (dictionary growth, width bumps, CLEAR on
table overflow) — not the fixed-width "uncompressed GIF" trick — so
the decoder's growth/reset paths run on genuine streams. The
variable-width bit packing is additionally pinned against a
hand-derived code sequence in tests/test_gif.py, which guards against
matched encoder/decoder bugs that a round trip alone cannot see.

Scale note: like jpeg.py, this is per-payload Python invoked only
inside Arrow-batched ``mapInPandas`` stages — the 100 TB story is the
partitioning of payload bytes, not the codec.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width (min_code_size+1 .. 12 bits,
    LSB-first packing), CLEAR emitted first and on dictionary
    overflow, EOI last."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_dict():
        return {(c,): c for c in range(clear)}

    table = fresh_dict()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    cur: tuple = ()
    for px in indices.tolist():
        cand = cur + (px,)
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = next_code
        next_code += 1
        # Width bump is one step LATER than the decoder's
        # len(table) >= 2^w rule because the encoder's table runs one
        # entry ahead: it adds the entry for emission #k at emission
        # time, while the decoder reconstructs it only when processing
        # emission #k+1. `next_code > 2^w` here lands both sides on
        # the same width for every emitted code (pinned by the
        # hand-derived stream in tests/test_gif.py).
        if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code >= (1 << _MAX_CODE_WIDTH):
            emit(clear, width)
            table = fresh_dict()
            next_code = eoi + 1
            width = min_code_size + 1
        cur = (px,)
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Inverse of ``lzw_encode``; returns uint8 palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    pos = 0

    table: list[bytes] = []

    def reset():
        nonlocal table, width, prev
        table = [bytes([c]) for c in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    width = min_code_size + 1
    prev: bytes | None = None
    reset()

    acc = 0
    nbits = 0
    i = 0
    while i <= len(data):
        while nbits < width and i < len(data):
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        if nbits < width:
            break  # truncated stream: stop at what we have
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        # Third-party encoders may DEFER the clear past a full table
        # (emitting frozen-table codes); never grow beyond 2^12 so such
        # streams stay in sync.
        may_grow = len(table) < (1 << _MAX_CODE_WIDTH)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if may_grow:
                table.append(prev + entry[:1])
        elif code == len(table) and may_grow:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise NotImplementedError("corrupt LZW stream: code out of range")
        if len(table) >= (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        n = len(entry)
        if pos + n > n_pixels:
            n = n_pixels - pos
        out[pos : pos + n] = np.frombuffer(entry[:n], dtype=np.uint8)
        pos += n
        if pos >= n_pixels:
            break
        prev = entry
    if pos < n_pixels:
        raise NotImplementedError(
            f"LZW stream ended after {pos}/{n_pixels} pixels"
        )
    return out


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.asarray(rows)


def quantize_332(px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic fallback palette: the RGB-332 cube (256 entries).
    Returns (indices h*w, palette 256x3)."""
    r = px[:, :, 0] >> 5
    g = px[:, :, 1] >> 5
    b = px[:, :, 2] >> 6
    idx = ((r << 5) | (g << 2) | b).astype(np.uint8)
    lev3 = np.round(np.arange(8) * 255 / 7).astype(np.uint8)
    lev2 = np.round(np.arange(4) * 255 / 3).astype(np.uint8)
    pal = np.zeros((256, 3), dtype=np.uint8)
    codes = np.arange(256)
    pal[:, 0] = lev3[(codes >> 5) & 7]
    pal[:, 1] = lev3[(codes >> 2) & 7]
    pal[:, 2] = lev2[codes & 3]
    return idx.reshape(-1), pal


def palette_for(px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(indices, palette): exact palette when the image has <= 256
    unique colors, else the deterministic 332 quantization."""
    flat = px.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        return inverse.astype(np.uint8), colors
    return quantize_332(px)


def encode_gif(px: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 RGB -> single-frame GIF89a with a global color
    table (exact palette if <= 256 unique colors, else RGB-332)."""
    h, w = px.shape[:2]
    idx, pal = palette_for(px)
    # color table size: power of two >= len(pal), at least 4 (GIF's
    # minimum meaningful table; min LZW code size >= 2)
    bits = max(2, int(np.ceil(np.log2(max(2, len(pal))))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += table.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        idx = idx.reshape(h, w)[_interlace_order(h)].reshape(-1)
    min_code = bits
    out.append(min_code)
    payload = lzw_encode(idx, min_code)
    for off in range(0, len(payload), 255):
        chunk = payload[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """Single-frame GIF -> (H, W, 3) uint8 RGB (first frame of an
    animation; transparency ignored)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos)
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise NotImplementedError("GIF image without a color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(data), min_code, w * h)
        if int(idx.max()) >= len(pal):
            raise NotImplementedError("GIF palette index out of range")
        img = pal[idx].reshape(h, w, 3)
        if ipacked & 0x40:
            seq = np.empty_like(img)
            seq[_interlace_order(h)] = img
            img = seq
        return img
    raise NotImplementedError("GIF missing image descriptor")
