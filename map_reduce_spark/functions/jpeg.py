"""Baseline JPEG (ITU T.81 / ISO 10918-1) codec — pure numpy + stdlib.

Closes the last closable compressed-image slot in the media decode
matrix (multimodal.py): the decoder handles any BASELINE sequential
DCT stream — 8-bit samples, Huffman entropy coding, grayscale or
YCbCr with 1x1 (4:4:4) or 2x2-luma (4:2:0) sampling, optional restart
intervals — and is fully TABLE-DRIVEN: quantization and Huffman
tables come from the stream's own DQT/DHT segments, so files from
other encoders (libjpeg's standard Annex-K tables included) decode on
the same path our tests exercise. Progressive (SOF2), arithmetic
coding, and 12-bit precision raise NotImplementedError — those are
the libjpeg-turbo slot.

The encoder exists to make the decoder testable without media
libraries in the container: it emits spec-conformant baseline
streams (Annex-K quantization tables with the libjpeg quality
scaling; canonical Huffman tables BUILT from the image's own symbol
histogram, all-ones codeword reserved per G.; optional restart
markers; 4:4:4 or 4:2:0). Round-trip fidelity is bounded by
quantization, which the tests pin by PSNR and by an
identity-quantization exactness check.

Scale note: this module is plain per-payload Python, invoked only
inside Arrow-batched ``mapInPandas`` decode stages (multimodal.py) —
per-batch amortization, never per-row UDF calls; the 100 TB story is
the partitioning of payload bytes, not the codec.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants -------------------------------------------------------

# Annex K.1/K.2 quantization tables (row-major), the two tables every
# JPEG encoder ships; scaled by the libjpeg quality mapping below.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def _zigzag_positions() -> list[tuple[int, int]]:
    """The 64 (row, col) positions in zigzag scan order, generated
    from the anti-diagonal walk instead of transcribed (typo-proof)."""
    out = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1) if s % 2 == 0 else range(
            max(0, s - 7), min(s, 7) + 1
        )
        out.extend((i, s - i) for i in rng)
    return out


ZIGZAG = _zigzag_positions()
ZZ_ROWS = np.array([p[0] for p in ZIGZAG])
ZZ_COLS = np.array([p[1] for p in ZIGZAG])

# Orthonormal 8-point DCT-II basis: T[u, x] = c(u)/2 cos((2x+1)u pi/16).
_T = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _T.T @ coef @ _T


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality -> table scaling."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --- bit I/O ---------------------------------------------------------


class _BitWriter:
    """MSB-first bit stream with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


class _BitReader:
    """MSB-first reader over entropy-coded data: un-stuffs FF 00,
    stops at markers (leaving position on the FF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed literal FF
            else:
                raise _MarkerHit(self.pos)  # real marker: caller handles
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0


class _MarkerHit(Exception):
    """Raised when the entropy reader runs into a real marker."""

    def __init__(self, pos: int):
        self.pos = pos


# --- Huffman ---------------------------------------------------------


def _canonical_codes(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} per T.81 C.2."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman(freq: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies -> canonical (BITS, HUFFVAL) with max length
    16 and the all-ones codeword reserved (T.81 K.2 guidance): a
    pseudo-symbol with count 1 is added so no real symbol gets the
    all-ones code; code lengths are depth-limited by rebalancing."""
    import heapq

    PSEUDO = 256
    items = dict(freq)
    items[PSEUDO] = 1
    heap = [(n, sym, (sym,)) for sym, n in items.items()]
    heapq.heapify(heap)
    depth = {s: 0 for s in items}
    while len(heap) > 1:
        n1, t1, s1 = heapq.heappop(heap)
        n2, t2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (n1 + n2, min(t1, t2), s1 + s2))
    if len(items) == 1:
        depth = {s: 1 for s in items}
    # depth-limit to 16 (tiny alphabets rarely trip this; the clamp +
    # Kraft fixup is libjpeg's approach reduced to the simple case)
    if max(depth.values()) > 16:
        n = len(items)
        flat = max(1, (n).bit_length())
        depth = {s: flat for s in items}
    # canonical assignment: shorter lengths first, pseudo-symbol last
    # within its length so the all-ones (largest) code lands on it
    order = sorted(depth, key=lambda s: (depth[s], s == PSEUDO, s))
    bits = [0] * 16
    values = []
    for s in order:
        if s != PSEUDO:
            values.append(s)
        bits[depth[s] - 1] += 1
    # drop the pseudo-symbol from the emitted table: its slot is the
    # all-ones code, which simply never occurs in the stream
    bits[depth[PSEUDO] - 1] -= 1
    return bits, values


def _encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} for the encoder."""
    out = {}
    for (length, code), sym in _canonical_codes(bits, values).items():
        out[sym] = (code, length)
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, category-bit pattern) per F.1.2.1."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _extend(v: int, s: int) -> int:
    """Inverse of _magnitude (F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# --- encoder ---------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    H = (h + mh - 1) // mh * mh
    W = (w + mw - 1) // mw * mw
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _component_blocks(plane: np.ndarray, qtbl: np.ndarray) -> list[np.ndarray]:
    """Plane -> list of quantized 8x8 coefficient blocks, raster order."""
    h, w = plane.shape
    out = []
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = plane[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = _fdct(block)
            out.append(np.round(coef / qtbl).astype(np.int32))
    return out


def _block_symbols(block: np.ndarray, pred: int) -> tuple[int, list, int]:
    """Quantized block -> (dc_category_symbol, [(ac_symbol, bits,
    nbits) ...], new predictor). Shared by the histogram pass and the
    emit pass so both see identical symbol streams."""
    zz = block[ZZ_ROWS, ZZ_COLS]
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    acs = []
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))  # ZRL
            run -= 16
        sa, ba = _magnitude(v)
        acs.append(((run << 4) | sa, ba, sa))
        run = 0
    if last < 63:
        acs.append((0x00, 0, 0))  # EOB
    return (s, bits), acs, dc


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes. ``subsampling`` is
    '444' (1x1 chroma) or '420' (2x2-luma MCUs, chroma 2x2-mean
    downsampled). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs."""
    assert pixels.ndim == 3 and pixels.shape[2] == 3 and pixels.dtype == np.uint8
    assert subsampling in ("444", "420")
    h, w = pixels.shape[:2]
    ycc = _rgb_to_ycbcr(pixels)
    qly = _quality_scale(QUANT_LUMA, quality)
    qch = _quality_scale(QUANT_CHROMA, quality)
    if subsampling == "444":
        hv = [(1, 1), (1, 1), (1, 1)]
        mcu_h = mcu_w = 8
        planes = [_pad_edge(ycc[..., i], 8, 8) for i in range(3)]
    else:
        hv = [(2, 2), (1, 1), (1, 1)]
        mcu_h = mcu_w = 16
        y = _pad_edge(ycc[..., 0], 16, 16)
        cb = _pad_edge(ycc[..., 1], 16, 16)
        cr = _pad_edge(ycc[..., 2], 16, 16)
        # 2x2 mean chroma downsample
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
    qtbls = [qly, qch, qch]
    comp_blocks = [
        _component_blocks(p, qtbls[i]) for i, p in enumerate(planes)
    ]

    # interleave blocks in MCU order
    n_mcu_y = planes[0].shape[0] // mcu_h
    n_mcu_x = planes[0].shape[1] // mcu_w
    mcus = []  # list of (comp_idx, block) in scan order
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            mcu = []
            for ci, (hs, vs) in enumerate(hv):
                bw = planes[ci].shape[1] // 8
                for by in range(vs):
                    for bx in range(hs):
                        idx = (my * vs + by) * bw + (mx * hs + bx)
                        mcu.append((ci, comp_blocks[ci][idx]))
            mcus.append(mcu)

    # pass 1: symbol histograms (DC and AC, luma [comp 0] vs chroma)
    def tclass(ci):
        return 0 if ci == 0 else 1

    dc_freq = [{}, {}]
    ac_freq = [{}, {}]
    preds = [0, 0, 0]
    n_since_rst = 0
    for mcu in mcus:
        if restart_interval and n_since_rst == restart_interval:
            preds = [0, 0, 0]
            n_since_rst = 0
        n_since_rst += 1
        for ci, block in mcu:
            (s, _), acs, preds[ci] = _block_symbols(block, preds[ci])
            t = tclass(ci)
            dc_freq[t][s] = dc_freq[t].get(s, 0) + 1
            for sym, _, _ in acs:
                ac_freq[t][sym] = ac_freq[t].get(sym, 0) + 1

    tables = {}
    for t in (0, 1):
        if dc_freq[t]:
            tables[(0, t)] = _build_huffman(dc_freq[t])
        if ac_freq[t]:
            tables[(1, t)] = _build_huffman(ac_freq[t])
    enc = {k: _encode_table(*v) for k, v in tables.items()}

    # pass 2: entropy-coded data
    bw_ = _BitWriter()
    preds = [0, 0, 0]
    n_since_rst = 0
    rst_n = 0
    for mi, mcu in enumerate(mcus):
        if restart_interval and n_since_rst == restart_interval:
            bw_.pad_to_byte()
            bw_.buf += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            preds = [0, 0, 0]
            n_since_rst = 0
        n_since_rst += 1
        for ci, block in mcu:
            t = tclass(ci)
            (s, bits), acs, preds[ci] = _block_symbols(block, preds[ci])
            code, ln = enc[(0, t)][s]
            bw_.write(code, ln)
            if s:
                bw_.write(bits, s)
            for sym, ba, sa in acs:
                code, ln = enc[(1, t)][sym]
                bw_.write(code, ln)
                if sa:
                    bw_.write(ba, sa)
    bw_.pad_to_byte()

    # assemble the stream
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tbl in ((0, qly), (1, qch)):
        zz = tbl[ZZ_ROWS, ZZ_COLS].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for ci, (hs, vs) in enumerate(hv):
        out += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    for (tc, th), (bits, values) in sorted(tables.items()):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), (tc << 4) | th)
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for ci in range(3):
        t = 0 if ci == 0 else 1
        out += bytes([ci + 1, (t << 4) | t])
    out += bytes([0, 63, 0])
    out += bw_.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, 3) uint8 RGB (grayscale
    replicated). Table-driven: everything comes from the stream's own
    DQT/DHT/SOF0/SOS/DRI segments. Progressive / arithmetic / 12-bit
    raise NotImplementedError (the libjpeg-turbo slot)."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros((8, 8), dtype=np.int32)
                vals = np.frombuffer(body, np.uint8, 64, bp + 1)
                tbl[ZZ_ROWS, ZZ_COLS] = vals
                qt[tq] = tbl
                bp += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1 : bp + 17])
                n = sum(bits)
                values = list(body[bp + 17 : bp + 17 + n])
                huff[(tc, th)] = _canonical_codes(bits, values)
                bp += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            comps = []
            for i in range(nc):
                cid, hvb, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hvb >> 4, hvb & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential DCT "
                "supported (libjpeg-turbo slot)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            return _decode_scan(
                payload, pos, frame, scan, qt, huff, restart_interval
            )
        # APPn / COM / others: skipped
    raise NotImplementedError("JPEG stream ended without a scan")


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _decode_scan(payload, pos, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mcu_x = (w + mcu_w - 1) // mcu_w
    n_mcu_y = (h + mcu_h - 1) // mcu_h
    planes = {}
    for cid, hs, vs, _ in comps:
        planes[cid] = np.zeros((n_mcu_y * vs * 8, n_mcu_x * hs * 8), dtype=np.float64)
    preds = {cid: 0 for cid, *_ in comps}
    br = _BitReader(payload, pos)
    n_since_rst = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and n_since_rst == restart_interval:
                br.align()
                # expect RSTn at the current byte position
                if not (
                    payload[br.pos] == 0xFF
                    and 0xD0 <= payload[br.pos + 1] <= 0xD7
                ):
                    raise NotImplementedError("JPEG missing expected RSTn")
                br.pos += 2
                preds = {cid: 0 for cid in preds}
                n_since_rst = 0
            n_since_rst += 1
            for cs, td, ta in scan:
                hs, vs, tq = by_id[cs]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int32)
                        s = _read_symbol(br, huff[(0, td)])
                        diff = _extend(br.read_bits(s), s) if s else 0
                        preds[cs] += diff
                        zz[0] = preds[cs]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(br, huff[(1, ta)])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise NotImplementedError("JPEG AC run overflow")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        block = np.zeros((8, 8), dtype=np.int32)
                        block[ZZ_ROWS, ZZ_COLS] = zz
                        px = _idct(block * qt[tq]) + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = px
    if len(comps) == 1:
        y = np.clip(planes[comps[0][0]][:h, :w].round(), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    # upsample chroma to luma grid by replication, convert
    cid_y, cid_cb, cid_cr = (c[0] for c in comps[:3])
    full = {}
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[cid] = p[:h, :w]
    return _ycbcr_to_rgb(full[cid_y], full[cid_cb], full[cid_cr])
