"""Pure-stdlib GIF codec (GIF87a/89a, CompuServe/W3C public spec).

GIF is palette-based and losslessly LZW-compressed, so — unlike the
baseline-JPEG codec next door — decode is EXACT: the media stages get
real pixels for one of the top web image formats without any external
library.  Scope: full static decode (global/local color tables,
interlacing, 89a transparency as an RGBA alpha channel) plus all frames
of an animated GIF for the video frame-sampling stage.  The matching
encoder (used as the test fixture) writes a single frame with an exact
palette and spec-compliant LZW.

Design notes:
- LZW entropy decode is per-code Python (the dictionary is inherently
  serial) but emits into one flat uint8 buffer; palette mapping,
  de-interlacing and RGBA expansion are numpy over the whole frame.
- The encoder keeps the code width fixed by issuing a CLEAR before the
  dictionary would outgrow it — valid LZW any decoder accepts, with no
  compression-ratio machinery to maintain.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))  # (first row, step) passes


def _sub_blocks(buf: bytes, off: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``off``; returns
    (data, offset past the 0-length terminator)."""
    parts = []
    while True:
        n = buf[off]
        off += 1
        if n == 0:
            return b"".join(parts), off
        parts.append(buf[off:off + n])
        off += n


def _lzw_decode(data: bytes, min_code: int, expect: int) -> np.ndarray:
    """GIF LZW (LSB-first variable-width codes) -> uint8 index stream of
    at most ``expect`` pixels (trailing codes past the frame are legal
    and ignored, matching common decoders)."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    # dictionary as (prefix_link, last_byte) arrays — no per-entry bytes
    prefix = np.full(4096, -1, dtype=np.int32)
    last = np.zeros(4096, dtype=np.uint8)
    last[:clear] = np.arange(clear, dtype=np.uint8)

    def emit(code: int) -> int:
        """Append code's expansion; returns its FIRST byte."""
        stack = bytearray()
        c = code
        while c >= 0:
            stack.append(last[c])
            c = prefix[c]
        stack.reverse()
        out.extend(stack)
        return stack[0]

    width = min_code + 1
    next_code = end + 1
    prev = -1
    acc = 0
    nbits = 0
    pos = 0
    ndata = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= ndata:
                # truncated stream: return what we have (quarantine-able
                # by the caller via the pixel-count check)
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code + 1
            next_code = end + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= next_code:
                raise ValueError("bad first GIF LZW code")
            emit(code)
            prev = code
            continue
        if code < next_code:
            first = emit(code)
        elif code == next_code:
            # KwKwK case: expansion is prev's expansion + its first byte
            first = emit(prev)
            out.append(first)
        else:
            raise ValueError("GIF LZW code out of range")
        if next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return np.frombuffer(bytes(out[:expect]), dtype=np.uint8)


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """All frames of a GIF as (h, w, 4) uint8 RGBA arrays on the logical
    screen, with 89a disposal/transparency composited the way browsers
    render animations."""
    from search_engine_ray.ops.limits import check_pixels

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    check_pixels(sw * sh, "GIF screen")
    total_px = 0
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, off).reshape(n, 3)
        off += 3 * n

    frames: list[np.ndarray] = []
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)  # transparent screen
    transparent = -1
    disposal = 0
    while off < len(payload):
        block = payload[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[off]
            off += 1
            data, off = _sub_blocks(payload, off)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        il, it, iw, ih, ip = struct.unpack_from("<HHHHB", payload, off)
        off += 9
        # frames composite onto sw*sh canvas copies, so the appended
        # list — not just one frame — must stay under the decode cap
        check_pixels(iw * ih, "GIF frame")
        total_px += sw * sh
        check_pixels(total_px, "GIF animation (cumulative frames)")
        table = gct
        if ip & 0x80:
            n = 2 << (ip & 0x07)
            table = np.frombuffer(payload, np.uint8, 3 * n,
                                  off).reshape(n, 3)
            off += 3 * n
        if table is None:
            raise ValueError("GIF frame without a color table")
        min_code = payload[off]
        off += 1
        data, off = _sub_blocks(payload, off)
        idx = _lzw_decode(data, min_code, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError("GIF frame underruns its dimensions")
        if ip & 0x40:  # interlaced: reorder rows into the 4-pass layout
            rows = np.empty(ih, dtype=np.int64)
            k = 0
            for first, step in _INTERLACE:
                npass = len(range(first, ih, step))
                rows[first::step] = np.arange(k, k + npass)
                k += npass
            idx = idx.reshape(ih, iw)[rows].reshape(-1)
        rgba = np.empty((ih * iw, 4), dtype=np.uint8)
        rgba[:, :3] = table[np.minimum(idx, len(table) - 1)]
        rgba[:, 3] = 255
        if transparent >= 0:
            rgba[idx == transparent, 3] = 0
        rgba = rgba.reshape(ih, iw, 4)

        prev = canvas.copy() if disposal == 3 else None
        region = canvas[it:it + ih, il:il + iw]
        opaque = rgba[:, :, 3] == 255
        region[opaque] = rgba[opaque]
        frames.append(canvas.copy())
        if disposal == 2:  # restore background = transparent
            canvas[it:it + ih, il:il + iw] = 0
        elif disposal == 3 and prev is not None:
            canvas = prev
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame as (h, w, 4) uint8 RGBA (exact — GIF is lossless)."""
    return decode_gif_frames(payload)[0]


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    """Fixed-width LZW: emit literal codes at ``min_code + 1`` bits,
    inserting a CLEAR whenever the decoder's dictionary would force a
    width increase — spec-valid output with no string table needed."""
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    room = (1 << width) - end - 2  # literals until width would grow
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    since_clear = 0
    for v in indices.tolist():
        if since_clear == room:
            put(clear)
            since_clear = 0
        put(int(v))
        since_clear += 1
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif_animation(frames: "list[np.ndarray]") -> bytes:
    """Multi-frame 89a GIF from equally-sized (h, w, 3) uint8 frames
    sharing one <=256-color palette (disposal=1 'leave in place', the
    common animation mode) — the test fixture for frame sampling."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w, _ = frames[0].shape
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, idx_all = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors; GIF palettes cap at 256")
    size_field = 0
    while (2 << size_field) < len(palette):
        size_field += 1
    table = np.zeros((2 << size_field, 3), np.uint8)
    table[:len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += table.tobytes()
    min_code = max(2, size_field + 1)
    per = h * w
    for fi in range(len(frames)):
        out += bytes([0x21, 0xF9, 4, 0x04, 0, 0, 0, 0])  # disposal=1
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(
            idx_all[fi * per:(fi + 1) * per].astype(np.int64), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def encode_gif(pixels: np.ndarray, *, interlace: bool = False,
               transparent_color=None) -> bytes:
    """Single-frame GIF from an (h, w, 3) uint8 array with <= 256
    distinct colors (exact palette — decode round-trips bit-exactly).
    ``transparent_color`` (an RGB triple) marks that color transparent
    via an 89a graphic-control extension."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = pixels.shape
    if ch != 3:
        raise ValueError("encode_gif expects (h, w, 3) RGB")
    flat = pixels.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    tflag = -1
    if transparent_color is not None:
        want = np.asarray(transparent_color, dtype=np.uint8)
        hit = np.flatnonzero((palette == want).all(axis=1))
        if len(hit):
            tflag = int(hit[0])
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors; GIF palettes cap at 256")
    # round the table size up to a power of two per the spec field
    size_field = 0
    while (2 << size_field) < len(palette):
        size_field += 1
    table = np.zeros((2 << size_field, 3), np.uint8)
    table[:len(palette)] = palette

    out = bytearray(b"GIF89a" if tflag >= 0 else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += table.tobytes()
    if tflag >= 0:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, tflag, 0])
    ilflag = 0x40 if interlace else 0
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, ilflag)
    idx2 = idx.reshape(h, w)
    if interlace:
        order = [r for first, step in _INTERLACE
                 for r in range(first, h, step)]
        idx2 = idx2[order]
    min_code = max(2, size_field + 1)
    out.append(min_code)
    lzw = _lzw_encode(idx2.reshape(-1).astype(np.int64), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes([0, 0x3B])
    return bytes(out)
