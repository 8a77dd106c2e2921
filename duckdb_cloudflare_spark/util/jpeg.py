"""Pure-Python baseline JPEG codec (stdlib ``struct`` + numpy only) — the
second REAL codec for the multimodal operators (r5 verdict #8): actual
ITU-T T.81 baseline sequential DCT, 8-bit GRAYSCALE (one component), in a
standards-valid JFIF container.

Scope (honest contract, mirrors util/png.py's):

- encode: level shift → 8×8 orthonormal FDCT → quantization (Annex-K
  luminance table, IJG quality scaling) → zigzag → DC difference +
  AC run-length → canonical Huffman (Annex-K K.3.1/K.3.2 typical tables)
  → byte-stuffed entropy stream inside SOI/APP0/DQT/SOF0/DHT/SOS/EOI.
  Output decodes in any standards-compliant viewer.
- decode: marker walk, DQT/DHT/SOF0/SOS parse, canonical Huffman rebuild,
  entropy decode with byte unstuffing, dequantize, dezigzag, IDCT, level
  unshift, clamp. Dimensions come from SOF0; pixels from the full
  entropy-coded path.
- anything outside baseline grayscale — progressive (SOF2), arithmetic
  coding, multi-component (color) scans, 12-bit precision, restart
  intervals — raises ``JpegFormatError`` with a clear message rather than
  mis-decoding. Color support would add chroma subsampling + YCbCr
  conversion on the same block path; grayscale exercises every baseline
  coding stage (DCT, quant, Huffman, stuffing) without it.

Exactness property used by the p62 oracle anchor: for a SOLID-gray image
at quality 75 the only nonzero coefficient is the block DC = 8*(v-128),
and the scaled Annex-K table has Q[0,0] = 8, so quantization is lossless
and decode(encode(img)) == img bit-exactly — a closed-form, hash-checkable
path through the entire DCT/Huffman machinery. (General images are lossy
by design; tests pin reconstruction error bounds instead.)

JPEG spec: ITU-T T.81 / ISO 10918-1 (public specification). Quant and
Huffman tables are the spec's own Annex K examples; quality scaling is the
Independent JPEG Group's public formula.
"""

from __future__ import annotations

import struct

import numpy as np

SOI = b"\xff\xd8"


class JpegFormatError(ValueError):
    pass


# Annex K.1 — typical luminance quantization table, zigzag order source in
# natural (row-major) order here.
_STD_LUMA_QUANT = np.array(
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
    dtype=np.int64,
)

# Zigzag index order: _ZIGZAG[k] = (row-major) position of the k-th zigzag
# coefficient.
def _zigzag_order() -> np.ndarray:
    idx = np.arange(64).reshape(8, 8)
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()
        out.extend(idx[i, j] for i, j in diag)
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()

# Annex K.3.1 — typical Huffman table for luminance DC: BITS + HUFFVAL.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

# Annex K.3.2 — typical Huffman table for luminance AC.
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
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


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), per the spec's canonical assignment
    (Annex C): codes of each length are consecutive, lengths ascending."""
    if len(bits) != 16 or sum(bits) > len(vals):
        raise JpegFormatError("malformed Huffman table specification")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


def _decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _scaled_quant(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K table (public formula)."""
    if not 1 <= quality <= 100:
        raise JpegFormatError(f"quality must be in 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (_STD_LUMA_QUANT * scale + 50) // 100
    return np.clip(q, 1, 255)


# Orthonormal 8x8 DCT-II matrix; JPEG's FDCT S(u,v) = 1/4 C(u)C(v) ΣΣ ...
# equals D @ block @ D.T with this normalization (S(0,0) = 8 * mean shift).
def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    d = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    d[0, :] = 1.0 / np.sqrt(8.0)
    return d


_DCT = _dct_matrix()


def _size_cat(v: int) -> int:
    """JPEG magnitude category (number of bits to represent |v|)."""
    return 0 if v == 0 else int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _put_amplitude(w: _BitWriter, v: int, size: int) -> None:
    if size == 0:
        return
    if v < 0:
        v = v + (1 << size) - 1  # one's-complement encoding of negatives
    w.put(v, size)


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">HH", tag, len(payload) + 2) + payload


def encode_jpeg(pixels: bytes, width: int, height: int, quality: int = 75) -> bytes:
    """Encode raw 8-bit grayscale pixels (row-major, ``width*height`` bytes)
    into a baseline JFIF JPEG."""
    if len(pixels) != width * height:
        raise JpegFormatError(
            f"pixel buffer is {len(pixels)} bytes; expected {width * height}"
        )
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise JpegFormatError(f"bad dimensions: {width}x{height}")
    quant = _scaled_quant(quality)

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    ph, pw = -height % 8, -width % 8
    if ph or pw:  # pad by edge replication (the conventional MCU fill)
        img = np.pad(img, ((0, ph), (0, pw)), mode="edge")
    h8, w8 = img.shape[0] // 8, img.shape[1] // 8

    # All-blocks FDCT in one shot: (h8, w8, 8, 8) einsum with the DCT matrix.
    blocks = img.reshape(h8, 8, w8, 8).transpose(0, 2, 1, 3).astype(np.float64) - 128.0
    coeffs = np.einsum("ux,bcxy,vy->bcuv", _DCT, blocks.reshape(h8, w8, 8, 8), _DCT)
    qcoef = np.rint(coeffs / quant).astype(np.int64)

    w = _BitWriter()
    prev_dc = 0
    for by in range(h8):
        for bx in range(w8):
            zz = qcoef[by, bx].reshape(64)[_ZIGZAG]
            # DC difference
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            size = _size_cat(diff)
            code, ln = _DC_CODES[size]
            w.put(code, ln)
            _put_amplitude(w, diff, size)
            # AC run-length
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_CODES[0xF0]  # ZRL
                    w.put(code, ln)
                    run -= 16
                size = _size_cat(v)
                code, ln = _AC_CODES[(run << 4) | size]
                w.put(code, ln)
                _put_amplitude(w, v, size)
                run = 0
            if last_nz < 63:
                code, ln = _AC_CODES[0x00]  # EOB
                w.put(code, ln)
    scan = w.flush()

    dqt = _marker(0xFFDB, b"\x00" + bytes(int(quant.reshape(64)[_ZIGZAG[k]]) for k in range(64)))
    sof0 = _marker(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    )
    dht = _marker(
        0xFFC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = _marker(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    app0 = _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return SOI + app0 + dqt + sof0 + dht + sos + scan + b"\xff\xd9"


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegFormatError("truncated entropy-coded segment")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegFormatError("truncated after 0xFF in scan")
            nxt = self.data[self.pos]
            if nxt == 0x00:  # stuffed byte
                self.pos += 1
            elif nxt == 0xD9:
                # EOI reached mid-read: spec B.1.1.5 requires even padding
                # 0xFF bytes to be stuffed, so a bare FF D9 here means the
                # decoder over-ran the entropy data — raise loudly rather
                # than silently decoding past the marker.
                raise JpegFormatError("truncated entropy-coded segment")
            else:
                raise JpegFormatError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF  # bounded accumulator
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_meta(blob: bytes) -> tuple[int, int, int]:
    """Header-only probe: (width, height, n_components) from SOF0 without
    touching the entropy-coded data — the cheap metadata path."""
    w, h, n, _, _, _ = _parse_headers(blob)
    return w, h, n


def _parse_headers(blob: bytes):
    if blob[:2] != SOI:
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    size = ncomp = None
    comp_spec = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at offset {pos}")
        tag = blob[pos + 1]
        if tag == 0xD9:
            break
        seglen = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        if pos + 2 + seglen > len(blob):
            raise JpegFormatError("truncated marker segment")
        seg = blob[pos + 4 : pos + 2 + seglen]
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int64)
                t[_ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                quant[tq] = t.reshape(8, 8)
                p += 65
        elif tag == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nval = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nval])
                (dc_tables if tc == 0 else ac_tables)[th] = _decode_map(bits, vals)
                p += 17 + nval
        elif tag == 0xC0:  # SOF0 baseline
            prec, h_, w_, n = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegFormatError(f"{prec}-bit precision unsupported")
            if n != 1:
                raise JpegFormatError(
                    "only single-component (grayscale) baseline JPEG is "
                    "supported by this codec"
                )
            samp, tq = seg[7], seg[8]
            if samp != 0x11:
                raise JpegFormatError("subsampled grayscale is not valid")
            size, ncomp, comp_spec = (w_, h_), n, tq
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegFormatError(
                f"SOF{tag - 0xC0}: only baseline sequential (SOF0) supported"
            )
        elif tag == 0xDD:
            raise JpegFormatError("restart intervals unsupported")
        elif tag == 0xDA:  # SOS — headers done
            ns = seg[0]
            if ns != 1:
                raise JpegFormatError("multi-component scan unsupported")
            td, ta = seg[2] >> 4, seg[2] & 0x0F
            if size is None:
                raise JpegFormatError("SOS before SOF0")
            return (
                size[0], size[1], ncomp,
                (quant, comp_spec),
                (dc_tables.get(td), ac_tables.get(ta)),
                pos + 2 + seglen,
            )
        pos += 2 + seglen
    if size is None:
        raise JpegFormatError("no SOF0 frame header found")
    return size[0], size[1], ncomp, (quant, comp_spec), (None, None), -1


def decode_jpeg(blob: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline grayscale JPEG → (width, height, pixels)."""
    width, height, _, (quant, tq), (dc_map, ac_map), scan_pos = _parse_headers(blob)
    if scan_pos < 0:
        raise JpegFormatError("no scan data (SOS) found")
    if tq not in quant:
        raise JpegFormatError(f"missing quantization table {tq}")
    if dc_map is None or ac_map is None:
        raise JpegFormatError("missing Huffman table(s) for scan")
    q = quant[tq]

    h8, w8 = (height + 7) // 8, (width + 7) // 8
    out = np.empty((h8 * 8, w8 * 8), dtype=np.uint8)
    r = _BitReader(blob, scan_pos)
    prev_dc = 0
    for by in range(h8):
        for bx in range(w8):
            zz = np.zeros(64, dtype=np.int64)
            size = _read_symbol(r, dc_map)
            prev_dc += _extend(r.bits(size), size)
            zz[0] = prev_dc
            k = 1
            while k < 64:
                rs = _read_symbol(r, ac_map)
                if rs == 0x00:  # EOB
                    break
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run != 15:
                        raise JpegFormatError(f"bad AC symbol {rs:#x}")
                    k += 16  # ZRL
                    continue
                k += run
                if k > 63:
                    raise JpegFormatError("AC run past end of block")
                zz[k] = _extend(r.bits(size), size)
                k += 1
            block = np.zeros(64, dtype=np.int64)
            block[_ZIGZAG] = zz
            spatial = _DCT.T @ (block.reshape(8, 8) * q).astype(np.float64) @ _DCT
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(spatial + 128.0), 0, 255
            ).astype(np.uint8)
    return width, height, out[:height, :width].tobytes()
