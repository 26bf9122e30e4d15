"""Pure-python GIF codec — LZW decode (87a/89a, interlace, local/global
palettes, first frame), plus a valid literal-code LZW encoder for round
trips.

The reference decodes whatever cv2.imdecode accepts (utils/io_utils.py:42);
web-scraped comic corpora carry GIFs.  Decode implements the full variable-
width LZW with clear/EOI handling and the 4-pass interlace order; animated
files return the FIRST frame composed on the logical screen (cv2's
single-frame behavior).  Malformed payloads raise ``ValueError`` so the
media layer's poison-pill contract applies (ctdray.sources.media).

The encoder emits each pixel as a literal code with a Clear code before the
dictionary would outgrow the current width — a classic valid-but-
uncompressed LZW stream — so round-trip tests exercise the real decoder
paths (width growth, clears, sub-block splits) without a compressor.
"""
from __future__ import annotations

import struct

import numpy as np


def encode_gif(img: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale → GIF89a with a 256-entry grayscale palette
    (literal-code LZW, see module docstring)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_gif expects a 2-D uint8 array")
    h, w = img.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)   # GCT: 256 entries
    g = np.arange(256, dtype=np.uint8)
    out += np.stack([g, g, g], 1).tobytes()          # grayscale palette
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out += bytes([8])                                # LZW min code size
    # literal stream: 9-bit codes, Clear(256) whenever the table would grow
    # past 511 so the code width never leaves 9 bits
    clear, eoi = 256, 257
    bits = bitpos = 0
    acc = bytearray()

    def emit(code):
        nonlocal bits, bitpos
        bits |= code << bitpos
        bitpos += 9
        while bitpos >= 8:
            acc.append(bits & 0xFF)
            bits >>= 8
            bitpos -= 8

    emit(clear)
    next_code = 258
    for px in img.reshape(-1).tolist():
        emit(px)
        next_code += 1
        if next_code >= 511:
            emit(clear)
            next_code = 258
    emit(eoi)
    if bitpos:
        acc.append(bits & 0xFF)
    for i in range(0, len(acc), 255):
        chunk = acc[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def probe_dims(data: bytes) -> tuple[int, int]:
    """Header-only (h, w) from the logical screen descriptor — the decoded
    frame is always composed at screen size (see :func:`decode_gif`)."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack_from("<HH", data, 6)
    if sw <= 0 or sh <= 0 or sw > 1 << 16 or sh > 1 << 16:
        raise ValueError("invalid GIF dimensions")
    return sh, sw


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes → uint8 (h, w) if the palette is grayscale, else
    (h, w, 3) BGR.  First image frame, composed at its screen position."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, count=n * 3,
                            offset=pos).reshape(n, 3)
        pos += n * 3
    if sw <= 0 or sh <= 0 or sw > 1 << 16 or sh > 1 << 16:
        raise ValueError("invalid GIF dimensions")
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                            # trailer before any image
            raise ValueError("GIF contains no image")
        if b == 0x21:                            # extension
            if pos + 2 > len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos + 1]
            pos += 2
            sub_start = pos
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF extension blocks")
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                if pos + n > len(data):
                    raise ValueError("truncated GIF extension sub-block")
                if label == 0xF9 and pos == sub_start + 1 and n >= 4 \
                        and data[pos] & 1:
                    transparent = data[pos + 3]
                pos += n
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        break
    else:
        raise ValueError("GIF contains no image")
    if pos + 10 > len(data):
        raise ValueError("truncated GIF image descriptor")
    ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
    pos += 10
    if iw <= 0 or ih <= 0 or ix + iw > sw or iy + ih > sh:
        raise ValueError("invalid GIF frame geometry")
    pal = gct
    if iflags & 0x80:
        n = 2 << (iflags & 7)
        pal = np.frombuffer(data, np.uint8, count=n * 3,
                            offset=pos).reshape(n, 3)
        pos += n * 3
    if pal is None:
        raise ValueError("GIF frame has no color table")
    if pos >= len(data):
        raise ValueError("truncated GIF image data")
    min_code = data[pos]
    pos += 1
    if not 2 <= min_code <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code}")
    stream = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        stream += data[pos:pos + n]
        if len(data) - pos < n:
            raise ValueError("truncated GIF sub-block")
        pos += n

    indices = _lzw_decode(bytes(stream), min_code, iw * ih)
    if len(indices) < iw * ih:
        raise ValueError("GIF pixel data short")
    idx = np.frombuffer(bytes(indices[: iw * ih]),
                        np.uint8) if isinstance(indices, (bytes, bytearray)) \
        else np.asarray(indices[: iw * ih], dtype=np.int32)
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("GIF index out of palette range")
    frame = np.asarray(idx, dtype=np.int32).reshape(ih, iw)
    if iflags & 0x40:                            # interlaced row order
        out_rows = np.empty(ih, dtype=np.int64)
        r = 0
        for start, step in _INTERLACE:
            rows = np.arange(start, ih, step)
            out_rows[r:r + len(rows)] = rows
            r += len(rows)
        deinter = np.empty_like(frame)
        deinter[out_rows] = frame
        frame = deinter
    gray = bool((pal[:, 0] == pal[:, 1]).all()
                and (pal[:, 1] == pal[:, 2]).all())
    if gray:
        img = pal[:, 0][frame]
    else:
        img = pal[frame][:, :, ::-1]             # RGB → BGR
    if (ix, iy, iw, ih) != (0, 0, sw, sh):
        canvas_shape = (sh, sw) if gray else (sh, sw, 3)
        canvas = np.zeros(canvas_shape, dtype=np.uint8)
        canvas[iy:iy + ih, ix:ix + iw] = img
        img = canvas
    _ = transparent                              # first-frame compose only
    return img


def _lzw_decode(stream: bytes, min_code: int, max_pixels: int) -> list:
    """Variable-width GIF LZW → list of palette indices."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    # dictionary: code → (prefix_code, last_index); roots are implicit
    prefix = [-1] * 4096
    last = list(range(clear)) + [0] * (4096 - clear)
    next_code = eoi + 1
    out: list[int] = []
    prev = -1
    bits = bitpos = 0
    i = 0
    n = len(stream)

    def expand(code):
        chain = []
        c = code
        while c >= clear:
            chain.append(last[c])
            c = prefix[c]
        chain.append(c)
        return chain[::-1]

    while len(out) < max_pixels:
        while bitpos < width:
            if i >= n:
                raise ValueError("GIF LZW stream exhausted")
            bits |= stream[i] << bitpos
            bitpos += 8
            i += 1
        code = bits & ((1 << width) - 1)
        bits >>= width
        bitpos -= width
        if code == clear:
            width = min_code + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev == -1:
            if code >= clear:
                raise ValueError("GIF LZW bad first code")
            out.append(code)
            prev = code
            continue
        if code < next_code:
            chain = expand(code)
        elif code == next_code:
            chain = expand(prev)
            chain.append(chain[0])
        else:
            raise ValueError("GIF LZW code out of range")
        out.extend(chain)
        if next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = chain[0]
            next_code += 1
            # giflib/Pillow synchronization: the decoder widens once the next
            # free slot itself no longer fits in the current width (the
            # encoder's RunningCode >= MaxCode1 rule lands on the same code
            # boundary).  GIF has no TIFF-style early change.
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out
