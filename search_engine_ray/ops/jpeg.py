"""Pure-numpy baseline JPEG codec (ITU-T T.81 public spec).

The container has no image libraries, but Common-Crawl-style media is
overwhelmingly JPEG — so the media stages get a REAL baseline decoder
(DCT, Huffman, 4:4:4/4:2:2/4:2:0 chroma, restart markers) implemented
from the published spec, plus a matching encoder used as the test
fixture.  Scope is baseline sequential 8-bit (SOF0); progressive (SOF2),
arithmetic coding and 12-bit precision raise ``NotImplementedError`` and
flow to the media stage's quarantine path.

Design notes:
- Entropy decode is per-symbol Python (Huffman is inherently serial),
  but everything after it — dequantize, de-zigzag, IDCT, upsample,
  color convert — is batched numpy over ALL blocks at once, so the
  per-pixel work is vectorized.
- The encoder emits canonical single-length Huffman tables built from
  the symbols actually used (the DHT segment fully describes them, so
  the decoder exercises its generic table machinery, not baked-in
  Annex K tables).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> (row, col) in the 8x8 block
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZZ = np.argsort(_ZZ)

# orthonormal 8-point DCT-II matrix: F = T @ f @ T.T, f = T.T @ F @ T
_T = np.array([[np.sqrt((1.0 if u == 0 else 2.0) / 8.0)
                * np.cos((2 * x + 1) * u * np.pi / 16.0)
                for x in range(8)] for u in range(8)])


# ------------------------------------------------------------- bit I/O
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


class _BitReader:
    """Reads the entropy-coded stream of one scan: un-stuffs 0xFF00 and
    stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos          # byte position in `data`
        self.bit = 0            # bits consumed of data[pos]
        self.marker = None      # set when a non-RST marker is reached

    def _cur_byte(self):
        d, p = self.data, self.pos
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt != 0x00:
                raise _MarkerReached(0xFF00 | nxt)
        return b

    def read_bit(self) -> int:
        b = self._cur_byte()
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip stuffed 0x00
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker (n = restart index)."""
        if self.bit:
            self.bit = 0
            self.pos += 1 + (1 if self.data[self.pos] == 0xFF else 0)
        if (self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + n):
            raise ValueError("expected RST marker")
        self.pos += 2


class _MarkerReached(Exception):
    def __init__(self, marker):
        self.marker = marker


def _huff_decode_map(counts, symbols):
    """Canonical Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        s = table.get((length, code))
        if s is not None:
            return s
    raise ValueError("bad Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# --------------------------------------------------------------- decode
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 (h, w, channels) array."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}        # (class, id) -> decode map
    comps = None                        # [(cid, h, v, tq)]
    w = h = 0
    restart = 0
    data = payload
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:                   # EOI
            break
        ln = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + ln]
        if m == 0xDB:                   # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg[i:i + 64], np.uint8).astype(
                        np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(seg[i:i + 128],
                                        ">u2").astype(np.int64)
                    i += 128
                qt[tq] = tab            # zigzag order
        elif m in (0xC0, 0xC1):         # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            from search_engine_ray.ops.limits import check_pixels

            # per-component planes allocate (bh*8, bw*8) each — cap on
            # declared dims before any allocation (decode-bomb guard)
            check_pixels(w * h * max(int(nc), 1), "JPEG SOF")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{m:02x})")
        elif m == 0xC4:                 # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                symbols = list(seg[i + 17:i + 17 + n])
                huff[(tc, th)] = _huff_decode_map(counts, symbols)
                i += 17 + n
        elif m == 0xDD:                 # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:                 # SOS — entropy data follows
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scomp.append((cs, tt >> 4, tt & 0xF))
            return _decode_scan(data, pos + ln, comps, scomp, qt, huff,
                                w, h, restart)
        pos += ln
    raise ValueError("JPEG missing SOS")


def _decode_scan(data, pos, comps, scomp, qt, huff, w, h, restart):
    if comps is None:
        raise ValueError("JPEG missing SOF")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    order = [by_id[cs] for cs, _, _ in scomp]
    dcac = {cs: (dc, ac) for cs, dc, ac in scomp}

    # coefficient accumulators: per component, list of zigzag blocks in
    # MCU-raster order
    blocks = {c[0]: [] for c in comps}
    pred = {c[0]: 0 for c in comps}
    br = _BitReader(data, pos)
    n_mcu = mcux * mcuy
    try:
        for m in range(n_mcu):
            if restart and m and m % restart == 0:
                br.align_and_expect_rst(((m // restart) - 1) % 8)
                pred = {c[0]: 0 for c in comps}
            for cid, ch, cv, _tq in order:
                dct, act = dcac[cid]
                dmap = huff[(0, dct)]
                amap = huff[(1, act)]
                for _ in range(ch * cv):
                    blk = np.zeros(64, dtype=np.int64)
                    size = _read_symbol(br, dmap)
                    diff = _extend(br.read_bits(size), size)
                    pred[cid] += diff
                    blk[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = _read_symbol(br, amap)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16     # ZRL
                                continue
                            break           # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        blk[k] = _extend(br.read_bits(s), s)
                        k += 1
                    blocks[cid].append(blk)
    except _MarkerReached:
        if len(blocks[comps[0][0]]) == 0:
            raise ValueError("empty JPEG scan") from None
        # truncated stream: fall through with what decoded (strict mode
        # callers can compare expected block counts)
        raise ValueError("truncated JPEG entropy stream") from None

    # ---- batched numpy from here on: dequantize, IDCT, assemble
    planes = {}
    for cid, ch, cv, tq in comps:
        bl = np.stack(blocks[cid])                      # (n, 64) zigzag
        coef = (bl * qt[tq][None, :])[:, _UNZZ].reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _T, coef.astype(np.float64),
                        _T) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        # blocks are MCU-raster: per MCU, cv x ch blocks row-major
        bw = mcux * ch                                   # blocks per row
        bh = mcuy * cv
        plane = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
        i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for byy in range(cv):
                    for bxx in range(ch):
                        plane[(my * cv + byy) * 8:(my * cv + byy) * 8 + 8,
                              (mx * ch + bxx) * 8:(mx * ch + bxx) * 8 + 8] \
                            = pix[i]
                        i += 1
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0),
                          hmax // ch, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        return planes[comps[0][0]][:, :, None]
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG")
    y = planes[comps[0][0]].astype(np.float64)
    cb = planes[comps[1][0]].astype(np.float64) - 128.0
    cr = planes[comps[2][0]].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0,
                   255).astype(np.uint8)


# --------------------------------------------------------------- encode
def _quant_table(base: int, quality: int) -> np.ndarray:
    """Frequency-ramped table scaled by quality (1-100).  Any valid DQT
    works — the file carries it, so the decoder is exercised on exactly
    what the encoder used."""
    scale = (5000.0 / quality if quality < 50 else 200.0 - 2 * quality) / 100.0
    uv = np.arange(8)
    tab = base + uv[:, None] + uv[None, :]
    return np.clip(np.round(tab.reshape(64)[_ZZ] * scale),
                   1, 255).astype(np.int64)


def _huff_encode_table(symbols_used):
    """Canonical fixed-length table over the used symbols: counts vector
    + symbol list for DHT, and {symbol: (code, length)} for writing.
    Length L satisfies n <= 2^L - 1 so the all-ones code stays unused
    (T.81 C.2)."""
    syms = sorted(set(symbols_used))
    n = max(1, len(syms))
    L = 1
    while (1 << L) - 1 < n:
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return counts, syms, enc


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(pixels: np.ndarray, quality: int = 90,
                subsample: str = "444", restart: int = 0) -> bytes:
    """uint8 (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB -> baseline
    JPEG bytes.  ``subsample``: '444', '422' or '420' (color only).
    ``restart`` > 0 emits DRI + RSTn every ``restart`` MCUs."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nch = pixels.shape
    if nch not in (1, 3):
        raise ValueError("1 or 3 channels")
    px = pixels.astype(np.float64)
    if nch == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sub = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsample]
        comps = [(1, sub[0], sub[1], 0, y), (2, 1, 1, 1, cb),
                 (3, 1, 1, 1, cr)]
        # sampling factors are relative: Y gets (sh, sv), chroma (1, 1)
    else:
        comps = [(1, 1, 1, 0, px[..., 0])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtabs = {0: _quant_table(8, quality), 1: _quant_table(12, quality)}

    # per component: pad plane to its mcu-aligned size (downsampling
    # chroma = box mean over the subsampling window)
    planes = {}
    for cid, ch_, cv_, tq, plane in comps:
        fy, fx = vmax // cv_, hmax // ch_
        if fy > 1 or fx > 1:
            ph = -(-plane.shape[0] // fy) * fy
            pw = -(-plane.shape[1] // fx) * fx
            pad = np.pad(plane, ((0, ph - plane.shape[0]),
                                 (0, pw - plane.shape[1])), mode="edge")
            plane = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th = mcuy * cv_ * 8
        tw = mcux * ch_ * 8
        plane = np.pad(plane, ((0, th - plane.shape[0]),
                               (0, tw - plane.shape[1])), mode="edge")
        planes[cid] = plane

    # FDCT + quantize every block, batched per component
    zz = {}
    for cid, ch_, cv_, tq, _p in comps:
        plane = planes[cid] - 128.0
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        coef = np.einsum("ux,nxy,vy->nuv", _T,
                         blocks.reshape(-1, 8, 8), _T)
        q = qtabs[tq].astype(np.float64)[_UNZZ].reshape(8, 8)
        qz = np.round(coef / q[None]).astype(np.int64)
        zz[cid] = qz.reshape(-1, 64)[:, _ZZ].reshape(bh, bw, 64)

    # MCU-raster symbol stream (two passes: collect symbols for the
    # Huffman tables, then write)
    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for cid, ch_, cv_, tq, _p in comps:
                    for byy in range(cv_):
                        for bxx in range(ch_):
                            yield cid, zz[cid][my * cv_ + byy,
                                               mx * ch_ + bxx]

    def rle(blk):
        """AC (run, size, value) triples + EOB/ZRL symbols."""
        outsyms = []
        run = 0
        nz = np.flatnonzero(blk[1:64]) + 1
        last = nz[-1] if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                outsyms.append((0xF0, 0, 0))
                run -= 16
            s = _cat(v)
            outsyms.append(((run << 4) | s, s, v))
            run = 0
        if last < 63:
            outsyms.append((0x00, 0, 0))
        return outsyms

    luma_ids = {comps[0][0]}
    dc_syms = {0: [], 1: []}
    ac_syms = {0: [], 1: []}
    pred = {c[0]: 0 for c in comps}
    n_mcu = mcux * mcuy
    stream = []  # (cid, dc_size, dc_val, [ac triples])
    mi = 0
    per_mcu = sum(c[1] * c[2] for c in comps)
    for i, (cid, blk) in enumerate(mcu_blocks()):
        if restart and i % (per_mcu * restart) == 0 and i:
            pred = {c[0]: 0 for c in comps}
        t = 0 if cid in luma_ids else 1
        diff = int(blk[0]) - pred[cid]
        pred[cid] = int(blk[0])
        s = _cat(diff)
        dc_syms[t].append(s)
        acs = rle(blk)
        ac_syms[t].extend(sym for sym, _, _ in acs)
        stream.append((cid, s, diff, acs))

    tables = {}
    for t in (0, 1):
        if dc_syms[t]:
            tables[(0, t)] = _huff_encode_table(dc_syms[t])
            tables[(1, t)] = _huff_encode_table(ac_syms[t] or [0])

    # ---- emit segments
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tq, tab in qtabs.items():
        if any(c[3] == tq for c in comps):
            seg(0xDB, bytes([tq]) + bytes(int(x) for x in tab))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch_, cv_, tq, _p in comps:
        sof += bytes([cid, (ch_ << 4) | cv_, tq])
    seg(0xC0, sof)
    for (tc, th_), (counts, syms, _enc) in sorted(tables.items()):
        seg(0xC4, bytes([(tc << 4) | th_]) + bytes(counts) + bytes(syms))
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    sos = bytes([len(comps)])
    for cid, _ch, _cv, _tq, _p in comps:
        t = 0 if cid in luma_ids else 1
        sos += bytes([cid, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw_ = _BitWriter()
    blocks_per_mcu = per_mcu
    for i, (cid, s, diff, acs) in enumerate(stream):
        if restart and i and i % (blocks_per_mcu * restart) == 0:
            bw_.pad_to_byte()
            out.extend(bw_.out)
            bw_.out = bytearray()
            n = (i // (blocks_per_mcu * restart)) - 1
            out.extend(bytes([0xFF, 0xD0 + (n % 8)]))
        t = 0 if cid in luma_ids else 1
        code, ln = tables[(0, t)][2][s]
        bw_.write(code, ln)
        if s:
            bw_.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        for sym, sz, v in acs:
            code, ln = tables[(1, t)][2][sym]
            bw_.write(code, ln)
            if sz:
                bw_.write(v if v > 0 else v + (1 << sz) - 1, sz)
    bw_.pad_to_byte()
    out.extend(bw_.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
