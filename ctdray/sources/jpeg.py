"""Baseline JPEG codec in pure numpy — no cv2/PIL.

The reference decodes pages with ``cv2.imdecode`` (utils/io_utils.py:42)
and its bundled example corpus is JPEG (data/examples/*.jpg); this module
closes that format-parity gap in environments without cv2 (S2, SURVEY.md
§2.2).  Scope is sequential baseline DCT (SOF0) AND progressive DCT
(SOF2, spectral selection + successive approximation — see decode_jpeg),
8-bit, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, optional
restart intervals.  Arithmetic coding (SOF9+) raises ``ValueError``.

Design: the entropy (Huffman) layer is the only bit-serial part and runs
as a Python loop over coefficients using 16-bit peek lookup tables (O(1)
per symbol); everything around it — dequantize, zigzag, IDCT, plane
reassembly, chroma upsampling, color conversion — is vectorized numpy
over all blocks at once.  The encoder exists for fixtures and sink
parity: encode→decode round-trips are the in-sandbox correctness oracle.

Tables (quantization Annex K.1, Huffman Annex K.3) are the public JPEG
ITU-T T.81 defaults, quality-scaled with the classic libjpeg formula.
"""
from __future__ import annotations

import numpy as np

# --- constants --------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    dtype=np.int64).reshape(8, 8)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64).reshape(8, 8)

# Annex K.3 default Huffman specs: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix: F = M @ X @ M.T, X = M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    _M[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)
del _u, _c


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = lambda t: np.clip((t * scale + 50) // 100, 1, 255).astype(np.int64)
    return q(_Q_LUM), q(_Q_CHR)


# --- shared small pieces -----------------------------------------------------

def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 → (n, 8, 8) in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _magnitude(v: int) -> tuple[int, int]:
    """value → (ssss category, appended bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _extend(v: int, s: int) -> int:
    """Received s-bit magnitude → signed value (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# --- encoder -----------------------------------------------------------------

class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)

    def flush(self):
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)   # pad with 1-bits


def _huff_encode_table(spec) -> dict[int, tuple[int, int]]:
    bits, values = spec
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _encode_component_blocks(blocks_q: np.ndarray, dc_tab, ac_tab, bw,
                             pred: int) -> int:
    """Entropy-code zigzagged quantized blocks (n, 64); returns new DC
    predictor."""
    for blk in blocks_q:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s, bits = _magnitude(diff)
        code, ln = dc_tab[s]
        bw.put(code, ln)
        if s:
            bw.put(bits, s)
        nz = np.nonzero(blk[1:])[0]
        k = 1
        for idx in nz:
            pos = int(idx) + 1
            run = pos - k
            while run >= 16:
                code, ln = ac_tab[0xF0]      # ZRL
                bw.put(code, ln)
                run -= 16
            s, bits = _magnitude(int(blk[pos]))
            code, ln = ac_tab[(run << 4) | s]
            bw.put(code, ln)
            bw.put(bits, s)
            k = pos + 1
        if k <= 63:
            code, ln = ac_tab[0x00]          # EOB
            bw.put(code, ln)
    return pred


def _bgr_to_ycbcr(img: np.ndarray) -> np.ndarray:
    b, g, r = (img[..., 0].astype(np.float64), img[..., 1].astype(np.float64),
               img[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_bgr(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([b, g, r], axis=-1), 0, 255)\
        .round().astype(np.uint8)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_baseline_jpeg(img: np.ndarray, quality: int = 90,
                         subsampling: str = "444",
                         restart_interval: int = 0) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) BGR → baseline JFIF bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_baseline_jpeg expects uint8")
    h, w = img.shape[:2]
    gray = img.ndim == 2
    q_lum, q_chr = _quality_tables(quality)

    if gray:
        samp = [(1, 1)]
        planes = [img.astype(np.float64)]
        qtabs = [q_lum]
    else:
        sx, sy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        ycc = _bgr_to_ycbcr(img)
        yp = ycc[..., 0]
        # chroma downsample by box averaging
        def down(p):
            pp = _pad_to(p, sy, sx)
            return pp.reshape(pp.shape[0] // sy, sy,
                              pp.shape[1] // sx, sx).mean(axis=(1, 3))
        planes = [yp, down(ycc[..., 1]), down(ycc[..., 2])]
        samp = [(sx, sy), (1, 1), (1, 1)]
        qtabs = [q_lum, q_chr, q_chr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized zigzag blocks per component, in MCU-interleaved order
    comp_blocks = []
    for (sh, sv), plane, qt in zip(samp, planes, qtabs):
        pw, ph = 8 * mcus_x * sh, 8 * mcus_y * sv
        plane = _pad_to(plane, ph, pw)[:ph, :pw]
        blocks = _to_blocks(plane) - 128.0
        coeffs = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M)
        qz = np.round(coeffs / qt).astype(np.int64)
        flat = qz.reshape(-1, 64)[:, ZIGZAG]
        # raster block order → MCU order: (my, sv, mx, sh) → (my, mx, sv, sh)
        flat = (flat.reshape(mcus_y, sv, mcus_x, sh, 64)
                .transpose(0, 2, 1, 3, 4).reshape(-1, 64))
        comp_blocks.append(flat)

    dc_lum = _huff_encode_table(_DC_LUM)
    ac_lum = _huff_encode_table(_AC_LUM)
    dc_chr = _huff_encode_table(_DC_CHR)
    ac_chr = _huff_encode_table(_AC_CHR)
    htabs = [(dc_lum, ac_lum)] + [(dc_chr, ac_chr)] * (len(planes) - 1)

    # entropy-coded scan, MCU-interleaved, optional restart markers
    bpm = [sh * sv for sh, sv in samp]          # blocks per MCU per comp
    n_mcus = mcus_x * mcus_y
    scan = bytearray()
    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            scan += bw.buf
            scan += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * len(planes)
        for ci in range(len(planes)):
            blks = comp_blocks[ci][m * bpm[ci]:(m + 1) * bpm[ci]]
            preds[ci] = _encode_component_blocks(
                blks, htabs[ci][0], htabs[ci][1], bw, preds[ci])
    bw.flush()
    scan += bw.buf

    # --- markers ---
    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    out = bytearray(b"\xff\xd8")                 # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(q_lum.flatten()[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(q_chr.flatten()[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC0, bytes(sof))
    for cls, tid, spec in [(0, 0, _DC_LUM), (1, 0, _AC_LUM)] + (
            [] if gray else [(0, 1, _DC_CHR), (1, 1, _AC_CHR)]):
        bits, values = spec
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(values))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        td = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (td << 4) | td])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"                           # EOI
    return bytes(out)


# --- progressive encoder -----------------------------------------------------

# One FLAT Huffman table for every progressive scan: a complete canonical
# code with symbol 0x00 at 7 bits and 0x01..0xFE at 8 bits (Kraft 1/128 +
# 254/256 = 1).  Progressive AC scans emit EOBn symbols (0x10, 0x20, …)
# that the Annex K.3 baseline tables do not contain; a flat table covers
# every (run, size) pair without a per-scan frequency pass.  Bloats the
# stream a little — these fixtures exist for decoder parity, not size.
_FLAT_HUFF = ([0, 0, 0, 0, 0, 0, 1, 254, 0, 0, 0, 0, 0, 0, 0, 0],
              [0x00] + list(range(0x01, 0xFF)))


class _EobState:
    """EOB-run accumulator shared by the progressive AC scan emitters
    (T.81 G.1.2.2-3): ``run`` counts early-ended blocks, ``bits`` buffers
    the refinement correction bits owed after the next EOBn symbol."""

    __slots__ = ("run", "bits")

    def __init__(self):
        self.run = 0
        self.bits = []

    def flush(self, bw, ac_tab):
        if self.run > 0:
            nbits = self.run.bit_length() - 1
            code, ln = ac_tab[nbits << 4]
            bw.put(code, ln)
            if nbits:
                bw.put(self.run - (1 << nbits), nbits)
            self.run = 0
        for b in self.bits:
            bw.put(b, 1)
        self.bits = []


def _trunc_shift(v: int, al: int) -> int:
    """v / 2^al truncated toward zero (T.81 G.1.2.2 point transform)."""
    return -((-v) >> al) if v < 0 else v >> al


def _emit_ac_first(bw, blocks, ss, se, al, ac_tab, eob: _EobState):
    for blk in blocks:
        r = 0
        for k in range(ss, se + 1):
            t = _trunc_shift(int(blk[k]), al)
            if t == 0:
                r += 1
                continue
            eob.flush(bw, ac_tab)
            while r > 15:
                code, ln = ac_tab[0xF0]          # ZRL
                bw.put(code, ln)
                r -= 16
            s, bits = _magnitude(t)
            code, ln = ac_tab[(r << 4) | s]
            bw.put(code, ln)
            bw.put(bits, s)
            r = 0
        if r > 0:
            eob.run += 1
            if eob.run == 0x7FFF:
                eob.flush(bw, ac_tab)


def _emit_ac_refine(bw, blocks, ss, se, al, ac_tab, eob: _EobState):
    for blk in blocks:
        absval = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
        eobpos = -1                              # last newly-significant k
        for j, t in enumerate(absval):
            if t == 1:
                eobpos = ss + j
        r = 0
        br: list[int] = []                       # pending correction bits
        for k in range(ss, se + 1):
            t = absval[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eobpos:
                eob.flush(bw, ac_tab)
                code, ln = ac_tab[0xF0]          # ZRL
                bw.put(code, ln)
                r -= 16
                for b in br:
                    bw.put(b, 1)
                br = []
            if t > 1:                            # history: correction bit
                br.append(t & 1)
                continue
            eob.flush(bw, ac_tab)
            code, ln = ac_tab[(r << 4) | 1]
            bw.put(code, ln)
            bw.put(1 if int(blk[k]) > 0 else 0, 1)
            for b in br:
                bw.put(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            eob.run += 1
            eob.bits.extend(br)
            if eob.run == 0x7FFF:
                eob.flush(bw, ac_tab)


def encode_progressive_jpeg(img: np.ndarray, quality: int = 90,
                            subsampling: str = "444",
                            restart_interval: int = 0) -> bytes:
    """uint8 (H, W) grayscale or (H, W, 3) BGR → progressive (SOF2) JFIF:
    spectral selection (DC scan, split AC bands) AND successive
    approximation (Al=1 first passes + refinement scans), so a decoder must
    exercise every progressive scan kind to reproduce the image.  Exact
    coefficient round-trip with :func:`decode_jpeg` by construction.

    ``restart_interval`` (MCUs for the DC scans, blocks for the AC scans —
    T.81 units per scan kind) emits RSTn markers with DC-predictor and
    EOB-run state reset at each boundary, matching the decoder's per-segment
    reset."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_progressive_jpeg expects uint8")
    h, w = img.shape[:2]
    gray = img.ndim == 2
    q_lum, q_chr = _quality_tables(quality)

    if gray:
        samp = [(1, 1)]
        planes = [img.astype(np.float64)]
        qtabs = [q_lum]
    else:
        sx, sy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
        ycc = _bgr_to_ycbcr(img)

        def down(p):
            pp = _pad_to(p, sy, sx)
            return pp.reshape(pp.shape[0] // sy, sy,
                              pp.shape[1] // sx, sx).mean(axis=(1, 3))
        planes = [ycc[..., 0], down(ycc[..., 1]), down(ycc[..., 2])]
        samp = [(sx, sy), (1, 1), (1, 1)]
        qtabs = [q_lum, q_chr, q_chr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # quantized zigzag coefficient grids per component, RASTER block order
    grids = []
    used = []
    for (sh, sv), plane, qt in zip(samp, planes, qtabs):
        pw, ph = 8 * mcus_x * sh, 8 * mcus_y * sv
        plane = _pad_to(plane, ph, pw)[:ph, :pw]
        blocks = _to_blocks(plane) - 128.0
        coeffs = np.einsum("ux,nxy,vy->nuv", _M, blocks, _M)
        qz = np.round(coeffs / qt).astype(np.int64)
        grids.append(qz.reshape(mcus_y * sv, mcus_x * sh, 64)[:, :, ZIGZAG])
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        used.append((-(-ch // 8), -(-cw // 8)))   # (uh, uw)

    tab = _huff_encode_table(_FLAT_HUFF)
    ncomp = len(planes)

    rst_counter = [0]

    def _rst_marker() -> bytes:
        m = bytes([0xFF, 0xD0 + (rst_counter[0] & 7)])
        rst_counter[0] += 1
        return m

    def dc_scan_bytes(ah: int, al: int) -> bytes:
        rst_counter[0] = 0                       # modulo-8 index per scan
        out = bytearray()
        bw = _BitWriter()
        preds = [0] * ncomp
        for m in range(mcus_x * mcus_y):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()
                out += bw.buf + _rst_marker()
                bw = _BitWriter()
                preds = [0] * ncomp
            my, mx = divmod(m, mcus_x)
            for ci in range(ncomp):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        v = int(grids[ci][my * sv + by, mx * sh + bx, 0])
                        if ah == 0:              # first pass: diffs of v>>al
                            t = v >> al          # arithmetic shift (G.1.2.1)
                            diff = t - preds[ci]
                            preds[ci] = t
                            s, bits = _magnitude(diff)
                            code, ln = tab[s]
                            bw.put(code, ln)
                            if s:
                                bw.put(bits, s)
                        else:                    # refinement: bit al
                            bw.put((v >> al) & 1, 1)
        bw.flush()
        return bytes(out + bw.buf)

    def ac_scan_bytes(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        rst_counter[0] = 0
        out = bytearray()
        uh, uw = used[ci]
        blocks = [grids[ci][by, bx]
                  for by in range(uh) for bx in range(uw)]
        emit = _emit_ac_first if ah == 0 else _emit_ac_refine
        ri = restart_interval or len(blocks)
        bw = _BitWriter()
        first = True
        for lo in range(0, len(blocks), ri):
            if not first:
                out += bw.buf + _rst_marker()
                bw = _BitWriter()
            first = False
            eob = _EobState()                    # EOB runs never span a RST
            emit(bw, blocks[lo:lo + ri], ss, se, al, tab, eob)
            eob.flush(bw, tab)
            bw.flush()
        return bytes(out + bw.buf)

    # --- markers ---
    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    def sos(comp_sel, ss, se, ah, al):
        p = bytearray([len(comp_sel)])
        for ci in comp_sel:
            p += bytes([ci + 1, 0x00])           # flat table id 0 both classes
        p += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, bytes(p))

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(q_lum.flatten()[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(q_chr.flatten()[ZIGZAG].astype(np.uint8)))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xC2, bytes(sof))                 # SOF2: progressive
    bits, values = _FLAT_HUFF
    for cls in (0, 1):
        out += seg(0xC4, bytes([(cls << 4)]) + bytes(bits) + bytes(values))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))

    all_comps = list(range(ncomp))
    out += sos(all_comps, 0, 0, 0, 1) + dc_scan_bytes(0, 1)
    # comp 0's AC split into two spectral bands; chroma in one band each
    out += sos([0], 1, 5, 0, 1) + ac_scan_bytes(0, 1, 5, 0, 1)
    out += sos([0], 6, 63, 0, 1) + ac_scan_bytes(0, 6, 63, 0, 1)
    for ci in range(1, ncomp):
        out += sos([ci], 1, 63, 0, 1) + ac_scan_bytes(ci, 1, 63, 0, 1)
    out += sos(all_comps, 0, 0, 1, 0) + dc_scan_bytes(1, 0)
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 1, 0) + ac_scan_bytes(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -----------------------------------------------------------------

class _HuffLookup:
    """Canonical Huffman → 16-bit peek tables: sym[peek16], len[peek16]."""

    __slots__ = ("sym", "ln")

    def __init__(self, bits, values):
        self.sym = np.zeros(1 << 16, dtype=np.int16)
        self.ln = np.zeros(1 << 16, dtype=np.int8)
        code, i = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                self.sym[lo:hi] = values[i]
                self.ln[lo:hi] = length
                code += 1
                i += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over de-stuffed scan bytes."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00\x00"
        self.pos = 0
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        i = self.pos >> 3
        w = int.from_bytes(self.data[i:i + 4], "big")
        return (w >> (16 - (self.pos & 7))) & 0xFFFF

    def read(self, n: int) -> int:
        v = self.peek16() >> (16 - n) if n else 0
        self.pos += n
        return v


def _destuff(scan: bytes) -> tuple[list[bytes], int]:
    """Entropy-coded bytes → restart segments with 0xFF00 stuffing removed.
    Returns (segments, index just past the last consumed byte)."""
    segs, cur = [], bytearray()
    i, n = 0, len(scan)
    while i < n:
        b = scan[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = scan[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:               # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:                                    # EOI / next marker
            break
    segs.append(bytes(cur))
    return segs, i


def _read_huff(br: _BitReader, lut: _HuffLookup, what: str) -> int:
    p = br.peek16()
    ln = int(lut.ln[p])
    if ln == 0:
        raise ValueError(f"bad Huffman code in {what} stream")
    br.pos += ln
    return int(lut.sym[p])


def _decode_block_baseline(br, blk, c, preds, ci):
    """Full sequential block: DC diff + AC run-length (T.81 F.2.2)."""
    s = _read_huff(br, c["dc"], "DC")
    if s:
        preds[ci] += _extend(br.read(s), s)
    blk[0] = preds[ci]
    k = 1
    while k <= 63:
        rs = _read_huff(br, c["ac"], "AC")
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break                                # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        blk[k] = _extend(br.read(s), s)
        k += 1


def _decode_scan(segs, scan_cis, comps, grids, geom, ss, se, ah, al,
                 restart_interval, progressive):
    """One entropy-coded scan into the per-component raster coefficient
    grids.  Handles interleaved (ns>1) and non-interleaved (ns==1) block
    orders, baseline full blocks, and the four progressive scan kinds
    (DC/AC × first/refinement) with EOB-run state (T.81 F.2 / G.2)."""
    mcus_x, mcus_y, hmax, vmax, w, h = geom
    ns = len(scan_cis)
    if ns == 1:
        ci0 = scan_cis[0]
        c0 = comps[ci0]
        # non-interleaved: raster over the component's USED block grid only
        # (ceil(comp pixel extent / 8), NOT the MCU-padded grid — T.81 A.2.2)
        cw = -(-(w * c0["h"]) // hmax)
        ch = -(-(h * c0["v"]) // vmax)
        uw = -(-cw // 8)
        uh = -(-ch // 8)
        units = uw * uh
    else:
        units = mcus_x * mcus_y
    dc_scan = ss == 0
    p1 = 1 << al
    m1 = -p1

    unit = 0
    for seg in segs:
        if unit >= units:
            break
        br = _BitReader(seg)
        preds = [0] * len(comps)
        eobrun = 0
        limit = (min(unit + restart_interval, units) if restart_interval
                 else units)
        while unit < limit and (br.pos < br.nbits or eobrun > 0):
            if ns == 1:
                blocks = [(ci0, grids[ci0][unit // uw, unit % uw])]
            else:
                my, mx = divmod(unit, mcus_x)
                blocks = []
                for ci in scan_cis:
                    c = comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blocks.append(
                                (ci, grids[ci][my * c["v"] + by,
                                               mx * c["h"] + bx]))
            for ci, blk in blocks:
                c = comps[ci]
                if not progressive:
                    _decode_block_baseline(br, blk, c, preds, ci)
                elif dc_scan and ah == 0:        # DC first (G.2.1)
                    s = _read_huff(br, c["dc"], "DC")
                    if s:
                        preds[ci] += _extend(br.read(s), s)
                    blk[0] = preds[ci] << al
                elif dc_scan:                    # DC refinement: 1 bit/block
                    if br.read(1):
                        blk[0] = int(blk[0]) | p1
                elif ah == 0:                    # AC first (G.2.2 first pass)
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        rs = _read_huff(br, c["ac"], "AC")
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read(r)
                            break
                        k += r
                        if k > se:
                            raise ValueError("AC run past spectral end")
                        blk[k] = _extend(br.read(s), s) << al
                        k += 1
                else:                            # AC refinement (G.2.2)
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            rs = _read_huff(br, c["ac"], "AC")
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    eobrun = 1 << r
                                    if r:
                                        eobrun += br.read(r)
                                    break        # EOB section below
                                val = 0          # ZRL: skip 16 zero-history
                            else:
                                if s != 1:
                                    raise ValueError(
                                        "bad refinement magnitude")
                                val = p1 if br.read(1) else m1
                            while k <= se:
                                coef = int(blk[k])
                                if coef:
                                    if br.read(1) and (coef & p1) == 0:
                                        blk[k] = coef + \
                                            (p1 if coef >= 0 else m1)
                                else:
                                    if r == 0:
                                        break
                                    r -= 1
                                k += 1
                            if val and k <= se:
                                blk[k] = val
                            k += 1
                    if eobrun > 0:
                        while k <= se:           # correction bits only
                            coef = int(blk[k])
                            if coef and br.read(1) and (coef & p1) == 0:
                                blk[k] = coef + (p1 if coef >= 0 else m1)
                            k += 1
                        eobrun -= 1
            unit += 1
    if unit < units:
        raise ValueError(f"truncated scan: decoded {unit}/{units} units")


def probe_dims(data: bytes) -> tuple[int, int]:
    """Header-only (h, w): walk the marker stream to the first SOF segment
    — no entropy decode.  Rejects the same unsupported coding processes
    (arithmetic/lossless SOF markers) as :func:`decode_jpeg`."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[i + 1]
        if marker == 0xFF:                       # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:   # standalone
            i += 2
            continue
        length = int.from_bytes(data[i + 2:i + 4], "big")
        if length < 2 or i + 2 + length > n:
            raise ValueError("truncated JPEG segment")
        if marker in (0xC0, 0xC1, 0xC2):         # SOF0/1 (seq) / SOF2
            payload = data[i + 4:i + 2 + length]
            if len(payload) < 5:
                raise ValueError("truncated JPEG SOF")
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            if h <= 0 or w <= 0:
                raise ValueError("invalid JPEG dimensions")
            return h, w
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02X};"
                " baseline sequential and progressive are implemented)")
        if marker == 0xDA:                       # SOS without SOF
            break
        i += 2 + length
    raise ValueError("truncated JPEG: missing SOF")


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes → uint8 (H, W) grayscale or (H, W, 3) BGR.  Baseline
    sequential (SOF0/1, incl. non-interleaved multi-scan) and progressive
    (SOF2: spectral selection + successive approximation) — the formats of
    real scanned-manga corpora the reference decodes via cv2.imdecode
    (utils/io_utils.py:42).  Arithmetic coding (SOF9+) raises ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffLookup] = {}
    comps = None
    grids = None
    geom = None
    h = w = 0
    progressive = False
    restart_interval = 0
    i = 2
    n = len(data)
    got_scan = False
    while i < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xFF:                       # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        length = int.from_bytes(data[i + 2:i + 4], "big")
        payload = data[i + 4:i + 2 + length]
        if marker == 0xDB:                       # DQT
            j = 0
            while j < len(payload):
                prec, tid = payload[j] >> 4, payload[j] & 15
                if prec:
                    vals = np.frombuffer(payload[j + 1:j + 129],
                                         dtype=">u2").astype(np.int64)
                    j += 129
                else:
                    vals = np.frombuffer(payload[j + 1:j + 65],
                                         dtype=np.uint8).astype(np.int64)
                    j += 65
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = vals
                qtabs[tid] = qt.reshape(8, 8)
        elif marker == 0xC4:                     # DHT
            j = 0
            while j < len(payload):
                cls, tid = payload[j] >> 4, payload[j] & 15
                bits = list(payload[j + 1:j + 17])
                nv = sum(bits)
                values = list(payload[j + 17:j + 17 + nv])
                htabs[(cls, tid)] = _HuffLookup(bits, values)
                j += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):       # SOF0/1 (seq) / SOF2 (prog)
            progressive = marker == 0xC2
            h = int.from_bytes(payload[1:3], "big")
            w = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            geom = (mcus_x, mcus_y, hmax, vmax, w, h)
            # raster block-grid coefficient store per component (MCU-padded)
            grids = [np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64),
                              dtype=np.int64) for c in comps]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF marker 0x{marker:02X};"
                " baseline sequential and progressive are implemented)")
        elif marker == 0xDD:                     # DRI
            restart_interval = int.from_bytes(payload[:2], "big")
        elif marker == 0xDA:                     # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_cis = []
            for c in range(ns):
                cs, tdta = payload[1 + 2 * c:3 + 2 * c]
                matches = [k for k, cc in enumerate(comps)
                           if cc["id"] == cs]
                if not matches:
                    raise ValueError(f"SOS references unknown component {cs}")
                ci = matches[0]
                td, ta = tdta >> 4, tdta & 15
                if (0, td) in htabs:
                    comps[ci]["dc"] = htabs[(0, td)]
                if (1, ta) in htabs:
                    comps[ci]["ac"] = htabs[(1, ta)]
                scan_cis.append(ci)
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            elif ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be single-comp")
            scan_start = i + 2 + length
            segs, consumed = _destuff(data[scan_start:])
            _decode_scan(segs, scan_cis, comps, grids, geom, ss, se, ah, al,
                         restart_interval, progressive)
            got_scan = True
            i = scan_start + consumed
            continue
        i += 2 + length
    if comps is None or not got_scan:
        raise ValueError("truncated JPEG: missing SOF/SOS")
    mcus_x, mcus_y, hmax, vmax, w, h = geom

    # vectorized dequantize → de-zigzag → IDCT → plane assembly
    planes = []
    for c, grid in zip(comps, grids):
        qt = qtabs[c["tq"]].reshape(-1)
        gh, gw = grid.shape[:2]
        flat = grid.reshape(-1, 64)
        deq = (flat[:, UNZIGZAG] * qt[None, :]).reshape(-1, 8, 8)
        px = np.einsum("xu,nuv,yv->nxy", _M.T, deq.astype(np.float64), _M.T)
        px += 128.0
        plane = (px.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(gh * 8, gw * 8))
        # upsample to full-resolution grid by pixel replication
        sh, sv = c["h"], c["v"]
        if sh != hmax:
            plane = np.repeat(plane, hmax // sh, axis=1)
        if sv != vmax:
            plane = np.repeat(plane, vmax // sv, axis=0)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).round().astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    return _ycbcr_to_bgr(*planes)


# Historical name (the decoder now also handles progressive SOF2).
decode_baseline_jpeg = decode_jpeg
