"""Dependency-free baseline JPEG codec (ITU-T T.81, public spec).

Why this exists: the engine's multimodal decode chain
(``operators/multimodal.py::decode_image_py``) parses PNG/PPM/PGM/BMP
without codec libraries, but JPEG previously required Pillow — which the
target container cannot install (no network), so the JPEG lane only ran
as an opt-in venv script and the per-round pytest output showed a SKIP.
This module closes that gap with a from-scratch implementation of the
baseline sequential DCT process from the published standard:

- **decode**: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS parsing, canonical
  Huffman decode with 0xFF00 unstuffing and RSTn handling, dequantize +
  inverse zigzag + separable float IDCT per 8x8 block, for grayscale and
  interleaved YCbCr scans with sampling factors 1 or 2 (4:4:4 / 4:2:2 /
  4:2:0). Output is the 8-bit LUMA plane — exactly what the feature path
  needs — so chroma blocks are entropy-decoded (the bitstream demands
  it) but never reconstructed. Progressive (SOF2) and arithmetic coding
  raise ``NotImplementedError`` and fall through to PIL when present.
- **encode**: grayscale baseline with the Annex K luminance quant /
  Huffman tables and libjpeg's quality scaling — enough to synthesize
  real JPEG bitstreams for hermetic tests (round-trip PSNR, and
  cross-validated against Pillow in the opt-in venv lane, where PIL both
  decodes our output and produces inputs for our decoder).

Scale note: this runs inside the same Arrow-batched ``mapInPandas``
decoders as the other formats — per-payload numpy work, no driver
involvement, no extra shuffle. It is a correctness/portability lane, not
a throughput claim; installations with Pillow keep using it for formats
this module rejects.

Reference parity: the reference repo has no media path at all; this
backs the extended multimodal surface (SURVEY.md LLM-pipeline section).
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables (ITU-T T.81 Annex K, public) -----------------------------

# zigzag[i] = natural (row-major) index of the i-th coefficient in scan order
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K table K.1 — luminance quantization, natural order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# Annex K tables K.3/K.5 — luminance DC/AC Huffman specs:
# (counts per code length 1..16, symbol values in canonical order)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis T with T @ x giving the 1-D DCT; orthonormal, so
    the inverse is T.T. Separable 2-D: coeff = T @ block @ T.T."""
    n = np.arange(8)
    k = n.reshape(-1, 1)
    T = np.cos((2 * n + 1) * k * np.pi / 16) / 2.0
    T[0, :] *= 1 / np.sqrt(2)
    return T


_T = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under JPEG canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


# --- decoder ----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops (raises _MarkerHit) at any real marker so the scan loop can
    consume RSTn or end at EOI."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
            # marker code; swallow them (libjpeg does the same) so a
            # padded RSTn/EOI is still recognized and FF FF 00 decodes
            # as a stuffed 0xFF data byte.
            j = self.pos + 1
            while self.data[j] == 0xFF:
                j += 1
            nxt = self.data[j]
            if nxt == 0x00:
                self.pos = j + 1
            else:
                raise _MarkerHit(0xFF00 | nxt, j - 1)
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bitbuf = 0
        self.nbits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int, pos: int):
        self.marker = marker
        self.pos = pos


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude code to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: Huffman code longer than 16 bits")


def _decode_block(
    r: _BitReader,
    dc_tab: dict[tuple[int, int], int],
    ac_tab: dict[tuple[int, int], int],
    quant: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    """One 8x8 block: Huffman + RLE -> dequantized natural-order coeffs."""
    zz = np.zeros(64, dtype=np.float64)
    s = _huff_decode(r, dc_tab)
    diff = _extend(r.receive(s), s) if s else 0
    pred += diff
    zz[0] = pred * quant[0]
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("invalid JPEG: AC run past end of block")
        zz[ZIGZAG[k]] = _extend(r.receive(size), size) * quant[k]
        k += 1
    block = _T.T @ zz.reshape(8, 8) @ _T
    return block, pred


def decode_jpeg_luma(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a baseline-sequential JPEG to (width, height, 8-bit luma
    row-major). Grayscale and interleaved YCbCr (sampling 1 or 2 per
    axis); chroma is entropy-decoded to keep bitstream position but not
    reconstructed. Raises NotImplementedError for progressive /
    arithmetic / non-interleaved streams (PIL handles those when
    installed) and ValueError for corrupt data (truncation and malformed
    lengths are normalized to ValueError, never IndexError)."""
    try:
        return _decode_jpeg_luma(payload)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"invalid JPEG: truncated or malformed ({exc})") from None


def _decode_jpeg_luma(payload: bytes) -> tuple[int, int, list[int]]:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (w, h, [(comp_id, hs, vs, tq)])
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        pos += 1
        while pos < n and payload[pos] == 0xFF:
            pos += 1  # T.81 B.1.1.2: optional fill bytes before the marker code
        if pos >= n:
            break  # trailing fill with no marker -> falls to "no scan data"
        marker = payload[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        seg_len = struct.unpack(">H", payload[pos : pos + 2])[0]
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec:
                    vals = struct.unpack(f">{64}H", seg[i : i + 128])
                    i += 128
                else:
                    vals = seg[i : i + 64]
                    i += 64
                q = np.zeros(64, dtype=np.int32)
                for zz_i, v in enumerate(vals):
                    q[zz_i] = v  # keep zigzag order; blocks index via ZIGZAG
                quant[tid] = q
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(seg[i + 17 : i + 17 + cnt])
                (huff_ac if cls else huff_dc)[tid] = _decode_table(bits, vals)
                i += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            h, w, ncomp = struct.unpack(">HHB", seg[1:6])
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential JPEG is supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                scan_tabs[cid] = (tt >> 4, tt & 0x0F)
            w, h, comps = frame
            if ns != len(comps):
                raise NotImplementedError("non-interleaved scans are not supported")
            return _decode_scan(
                payload, pos + seg_len, w, h, comps, scan_tabs,
                quant, huff_dc, huff_ac, restart_interval,
            )
        pos += seg_len
    raise ValueError("invalid JPEG: no scan data")


def _decode_scan(payload, pos, w, h, comps, scan_tabs, quant, huff_dc, huff_ac, dri):
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise NotImplementedError("sampling factors above 2 are not supported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    # Reconstruct only the luma plane (first component in a YCbCr frame,
    # the only component in grayscale).
    luma_id, lh, lv, _ = comps[0]
    plane = np.zeros((mcus_y * 8 * lv, mcus_x * 8 * lh), dtype=np.float64)
    r = _BitReader(payload, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu = 0
    total = mcus_x * mcus_y
    while mcu < total:
        if dri and mcu and mcu % dri == 0:
            # expect RSTn between restart intervals
            r.align()
            try:
                r._fill()
            except _MarkerHit as m:
                if 0xFFD0 <= m.marker <= 0xFFD7:
                    r.pos = m.pos + 2
                    r.align()
                    preds = {cid: 0 for cid in preds}
                else:
                    raise ValueError("invalid JPEG: expected restart marker")
            else:
                raise ValueError("invalid JPEG: expected restart marker")
        my, mx = divmod(mcu, mcus_x)
        try:
            for cid, hs, vs, tq in comps:
                dc_t = huff_dc[scan_tabs[cid][0]]
                ac_t = huff_ac[scan_tabs[cid][1]]
                q = quant[tq]
                for by in range(vs):
                    for bx in range(hs):
                        block, preds[cid] = _decode_block(r, dc_t, ac_t, q, preds[cid])
                        if cid == luma_id:
                            y0 = (my * lv + by) * 8
                            x0 = (mx * lh + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = block
        except _MarkerHit as m:
            if m.marker == 0xFFD9:
                break
            raise ValueError(f"invalid JPEG: unexpected marker {m.marker:#x} mid-scan")
        mcu += 1
    px = np.clip(np.round(plane + 128), 0, 255).astype(np.int64)
    return w, h, px[:h, :w].reshape(-1).tolist()


# --- encoder (grayscale baseline, for hermetic fixtures) --------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81


def _quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality->scale mapping (quality 1..100)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg_gray(
    pixels: np.ndarray | list[list[int]], *, quality: int = 90
) -> bytes:
    """Encode an 8-bit grayscale image (H x W array) as baseline JPEG
    using the Annex K luminance tables at the given libjpeg-style
    quality. Deterministic byte output for a given (pixels, quality)."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    h, w = px.shape
    q_nat = _quality_scaled(QUANT_LUMA, quality)  # natural order
    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    bw = _BitWriter()
    pred = 0
    pad_y, pad_x = (-h) % 8, (-w) % 8
    padded = np.pad(px, ((0, pad_y), (0, pad_x)), mode="edge")
    for y0 in range(0, padded.shape[0], 8):
        for x0 in range(0, padded.shape[1], 8):
            block = padded[y0 : y0 + 8, x0 : x0 + 8] - 128.0
            coeff = _T @ block @ _T.T
            qz = np.round(coeff.reshape(-1) / q_nat).astype(np.int64)
            zz = qz[ZIGZAG]  # zigzag scan order
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            s = _category(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
            # AC: run-length of zeros + magnitude
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            k = 1
            while k <= last_nz:
                run = 0
                while zz[k] == 0:
                    run += 1
                    k += 1
                while run >= 16:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.write(code, ln)
                    run -= 16
                v = int(zz[k])
                s = _category(v)
                code, ln = ac_codes[(run << 4) | s]
                bw.write(code, ln)
                bw.write(v if v > 0 else v + (1 << s) - 1, s)
                k += 1
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (zigzag order on the wire)
    q_zz = bytes(int(q_nat[ZIGZAG[i]]) for i in range(64))
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 64, 0x00) + q_zz
    # SOF0: 8-bit, 1 component, sampling 1x1, quant table 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    # DHT x2
    for cls, bits, vals in ((0, DC_LUMA_BITS, DC_LUMA_VALS), (1, AC_LUMA_BITS, AC_LUMA_VALS)):
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + len(vals), cls << 4)
        out += bytes(bits) + bytes(vals)
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2, 1) + bytes([1, 0x00, 0, 63, 0])
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
