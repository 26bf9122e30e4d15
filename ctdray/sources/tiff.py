"""Pure-numpy TIFF codec — uncompressed (Compression=1) grayscale and RGB,
both byte orders, strip-based layout.

The reference decodes whatever cv2.imdecode accepts (utils/io_utils.py:42);
scanner output is commonly uncompressed or LZW TIFF.  This codec covers the
no-entropy-coder subset exactly: baseline TIFF 6.0 IFD parsing (II/MM),
8-bit samples, 1 or 3 samples/pixel, chunky planar config, any strip split.
Unsupported features (LZW/JPEG compression, tiles, 16-bit, palette) raise
``ValueError`` so the media layer's poison-pill contract applies.  Encode
writes a minimal single-strip little-endian baseline file.
"""
from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 baseline)
_W, _H = 256, 257
_BITS, _COMP, _PHOTO = 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _PREDICTOR = 284, 317


def _lzw_decode_tiff(stream: bytes, max_bytes: int) -> bytearray:
    """TIFF-variant LZW → bytes: MSB-first bit packing and EARLY code-width
    change (TIFF 6.0 §13: the writer switches one code sooner than GIF, so
    the reader widens at 2^w − 1 where the GIF reader widens at 2^w — the
    libtiff rule, i.e. right after storing string #510 at 9 bits).
    Clear=256, EOI=257, first entry 258."""
    clear, eoi = 256, 257
    width = 9
    prefix = [-1] * 4096
    last = list(range(256)) + [0] * (4096 - 256)
    next_code = eoi + 1
    out = bytearray()
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

    while len(out) < max_bytes:
        while bitpos < width:
            if i >= n:
                raise ValueError("TIFF LZW stream exhausted")
            bits = (bits << 8) | stream[i]
            bitpos += 8
            i += 1
        code = (bits >> (bitpos - width)) & ((1 << width) - 1)
        bitpos -= width
        bits &= (1 << bitpos) - 1
        if code == clear:
            width = 9
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev == -1:
            if code >= clear:
                raise ValueError("TIFF LZW bad first code")
            out.append(code)
            prev = code
            continue
        if code < next_code:
            chain = expand(code)
        elif code == next_code:
            chain = expand(prev)
            chain.append(chain[0])
        else:
            raise ValueError("TIFF LZW code out of range")
        out.extend(chain)
        if next_code < 4096:
            prefix[next_code] = prev
            last[next_code] = chain[0]
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = code
    return out

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8}


def encode_tiff(img: np.ndarray) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) BGR → little-endian baseline
    TIFF, one strip, uncompressed (RGB stored per the spec)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_tiff expects uint8 (h, w) or (h, w, 3)")
    h, w = img.shape[:2]
    if img.ndim == 3:
        if img.shape[2] != 3:
            raise ValueError("encode_tiff expects 3 channels for color")
        spp, photo = 3, 2
        body = np.ascontiguousarray(img[:, :, ::-1]).tobytes()  # BGR→RGB
    else:
        spp, photo = 1, 1                                       # BlackIsZero
        body = np.ascontiguousarray(img).tobytes()

    # layout: header(8) | pixel data | [bits array if spp==3] | IFD
    data_off = 8
    bits_extra_off = data_off + len(body)
    bits_extra = b""
    if spp == 3:
        bits_extra = struct.pack("<3H", 8, 8, 8)
    ifd_off = bits_extra_off + len(bits_extra)

    def entry(tag, typ, count, value):
        return struct.pack("<HHI4s", tag, typ, count, value)

    def short(v):
        return struct.pack("<HH", v, 0)

    def long(v):
        return struct.pack("<I", v)

    entries = [
        entry(_W, 3, 1, short(w)),
        entry(_H, 3, 1, short(h)),
        entry(_BITS, 3, spp,
              long(bits_extra_off) if spp == 3 else short(8)),
        entry(_COMP, 3, 1, short(1)),
        entry(_PHOTO, 3, 1, short(photo)),
        entry(_STRIP_OFF, 4, 1, long(data_off)),
        entry(_SPP, 3, 1, short(spp)),
        entry(_ROWS_PER_STRIP, 3, 1, short(h)),
        entry(_STRIP_CNT, 4, 1, long(len(body))),
        entry(_PLANAR, 3, 1, short(1)),
    ]
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + long(0)
    return (struct.pack("<2sHI", b"II", 42, ifd_off)
            + body + bits_extra + ifd)


def _read_tag_values(data: bytes, endian: str, typ: int, count: int,
                     raw: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise ValueError(f"unknown TIFF field type {typ}")
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        if off + total > len(data):
            raise ValueError("TIFF tag value out of bounds")
        buf = data[off:off + total]
    fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
    if fmt is None:
        raise ValueError(f"unsupported TIFF field type {typ}")
    return list(struct.unpack(endian + fmt * count, buf))


def _read_header(data: bytes) -> tuple[str, dict[int, list[int]]]:
    """Parse + validate the first IFD (header-level only, no pixel reads)
    → (endian, tags).  Shared by :func:`decode_tiff` and
    :func:`probe_dims` so both enforce identical support checks."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF payload")
    endian = "<" if data[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(endian + "HI", data, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    if ifd_off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(endian + "H", data, ifd_off)
    if ifd_off + 2 + n_entries * 12 > len(data):
        raise ValueError("truncated TIFF IFD entries")
    tags: dict[int, list[int]] = {}
    critical = {_W, _H, _BITS, _COMP, _PHOTO, _STRIP_OFF, _SPP,
                _ROWS_PER_STRIP, _STRIP_CNT, _PLANAR, _PREDICTOR}
    for i in range(n_entries):
        off = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(endian + "HHI", data, off)
        # Only the tags needed for pixel decode get typed parsing; anything
        # else (ASCII Software/DateTime, RATIONAL X/YResolution, vendor
        # tags of any type) is skipped so ordinary scanner output decodes.
        # A DECODE-CRITICAL tag carrying an unparseable type must still
        # fail loudly — skipping Compression/BitsPerSample would mean
        # misdecoding the pixel data with defaults, not tolerating
        # metadata.
        if typ not in (1, 3, 4):
            if tag in critical:
                raise ValueError(
                    f"unsupported TIFF field type {typ} for required "
                    f"tag {tag}")
            continue
        tags[tag] = _read_tag_values(data, endian, typ, count,
                                     data[off + 8:off + 12])
    if _W not in tags or _H not in tags:
        raise ValueError("TIFF missing required dimension tags")
    w, h = tags[_W][0], tags[_H][0]
    comp = tags.get(_COMP, [1])[0]
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])
    planar = tags.get(_PLANAR, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    if comp not in (1, 5):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if planar != 1:
        raise ValueError("unsupported TIFF planar configuration")
    if spp not in (1, 3) or any(b != 8 for b in bits):
        raise ValueError("unsupported TIFF sample layout")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if w <= 0 or h <= 0 or w > 1 << 20 or h > 1 << 20:
        raise ValueError("invalid TIFF dimensions")
    return endian, tags


def probe_dims(data: bytes) -> tuple[int, int]:
    """Header-only (h, w): the full IFD parse + support validation of
    :func:`decode_tiff` without touching a single pixel strip."""
    _, tags = _read_header(data)
    return tags[_H][0], tags[_W][0]


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes → uint8 (h, w) grayscale or (h, w, 3) BGR.  Uncompressed
    8-bit chunky only; raises ValueError otherwise."""
    endian, tags = _read_header(data)
    w, h = tags[_W][0], tags[_H][0]
    try:
        strip_offs = tags[_STRIP_OFF]
        strip_cnts = tags[_STRIP_CNT]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from e
    comp = tags.get(_COMP, [1])[0]
    spp = tags.get(_SPP, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    if len(strip_offs) != len(strip_cnts):
        raise ValueError("TIFF strip tables disagree")
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0]
    parts = []
    for si, (off, cnt) in enumerate(zip(strip_offs, strip_cnts)):
        if off + cnt > len(data):
            raise ValueError("truncated TIFF strip")
        raw = data[off:off + cnt]
        if comp == 5:
            n_rows = min(rows_per_strip, h - si * rows_per_strip)
            if n_rows <= 0:
                raise ValueError("TIFF strip beyond image height")
            decoded = _lzw_decode_tiff(raw, n_rows * w * spp)
            if len(decoded) < n_rows * w * spp:
                raise ValueError("TIFF LZW strip short")
            parts.append(np.frombuffer(bytes(decoded), np.uint8,
                                       count=n_rows * w * spp))
        else:
            parts.append(np.frombuffer(data, np.uint8, count=cnt,
                                       offset=off))
    flat = np.concatenate(parts) if len(parts) > 1 else parts[0]
    if flat.size != h * w * spp:
        raise ValueError("TIFF pixel data size mismatch")
    if predictor == 2:
        # horizontal differencing per row, per sample channel — undo with a
        # wrap-around cumulative sum along the columns
        px = flat.reshape(h, w, spp).astype(np.uint8)
        flat = np.cumsum(px, axis=1, dtype=np.uint8).reshape(-1)
    if spp == 1:
        img = flat.reshape(h, w)
        if tags.get(_PHOTO, [1])[0] == 0:      # WhiteIsZero → invert
            img = 255 - img
        return img.copy() if img.base is not None else img
    return flat.reshape(h, w, 3)[:, :, ::-1].copy()   # RGB → BGR
