"""Baseline-sequential AND progressive JPEG (ITU-T T.81) codec,
stdlib+numpy only.

The reference decodes JPEG corpora through cv2 (`DecodeImage`,
ppocr/data/imaug/operators.py:30-68; `check_and_read`,
ppocr/utils/utility.py:119-152); no imaging library ships in this
container, so the format is implemented directly: marker segment walk
(SOI/APPn/COM/DQT/DHT/SOF0/SOF2/SOS/EOI), canonical Huffman table
construction from DHT, entropy-coded segment decoding with 0xFF00
byte-unstuffing, DC prediction, EOB/ZRL run handling, zigzag
de-serialization, dequantization, and a float64 2-D IDCT with
round-and-clamp sample reconstruction.

Progressive (SOF2) decode implements the full T.81 Annex G machinery
for the single-component case: spectral-selection bands, successive
approximation (DC point transform + refinement bit; AC first scans with
EOBn end-of-band run codes; AC refinement scans with embedded
correction bits), coefficients accumulated across scans and
reconstructed once at EOI. The progressive ENCODER exists for fixture
synthesis (same policy as the baseline writer below) and emits a
4-scan progression — DC@Al=1, DC refine, AC 1-63@Al=1, AC refine —
that exercises every scan type the decoder supports.

Scope: 8-bit precision, single-component (grayscale), no chroma
subsampling, no restart intervals. Anything else raises loudly.

The encoder exists for deterministic fixture synthesis (same policy as
the GIF/WAV/Y4M writers in operators/media.py): it emits custom but
fully valid DHT tables (12 four-bit DC codes; 162 eight-bit AC codes),
which the decoder must parse generically — nothing about the tables is
assumed shared between the two sides except the bytes in the file.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# fixture-writer Huffman layout: BITS counts per code length 1..16 and
# the symbol order. Canonical codes are derived exactly as T.81 C.2.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), per T.81 Annex C code assignment."""
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


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per F.1.2.3
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits) — negative values are stored in
    one's complement of the magnitude (T.81 F.1.2.1)."""
    size = abs(v).bit_length()
    if v >= 0:
        return size, v
    return size, v + (1 << size) - 1


def jpeg_encode_blocks(
    blocks: list[list[int]], nx: int, ny: int, quant: list[int]
) -> bytes:
    """Write a baseline grayscale JPEG from QUANTIZED coefficient blocks
    (zigzag order, len 64 each, row-major block order, ny*nx blocks).
    Working at coefficient level keeps fixture synthesis closed-form:
    the decoder's recovered coefficients must equal these exactly."""
    assert len(blocks) == nx * ny
    w, h = nx * 8, ny * 8
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: Pq=0 Tq=0, zigzag order
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(quant)
    # SOF0: 8-bit, 1 component, no subsampling
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    # DHT: DC class 0 id 0, AC class 1 id 0
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([cls << 4]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0, 0, 63, 0])
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = 0
    for blk in blocks:
        diff = blk[0] - pred
        pred = blk[0]
        size, amp = _magnitude(diff)
        code, length = dc_codes[size]
        bw.put(code, length)
        if size:
            bw.put(amp, size)
        run = 0
        for k in range(1, 64):
            v = blk[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                bw.put(code, length)
                run -= 16
            size, amp = _magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            bw.put(code, length)
            bw.put(amp, size)
            run = 0
        if run:
            code, length = ac_codes[0x00]  # EOB
            bw.put(code, length)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _div_pt(v: int, al: int) -> int:
    """AC point transform: v / 2^Al truncated TOWARD ZERO (T.81 G.1.2.1
    — unlike the DC transform, which is an arithmetic shift)."""
    return -((-v) >> al) if v < 0 else v >> al


# progressive AC table: the baseline symbols plus the EOBn end-of-band
# run codes (r<<4, r=1..14) Annex G scans need; 176 codes all at length
# 8 is a valid canonical table (< 256), and the decoder reads whatever
# DHT the file declares, so the two encoders stay independent
_AC_VALS_PROG = [0x00, 0xF0] + [r << 4 for r in range(1, 15)] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS_PROG), 0, 0, 0, 0, 0, 0, 0, 0]


def jpeg_encode_blocks_progressive(
    blocks: list[list[int]], nx: int, ny: int, quant: list[int]
) -> bytes:
    """Write a PROGRESSIVE grayscale JPEG (SOF2) from the same quantized
    coefficient blocks jpeg_encode_blocks takes — so the two encoders
    are feature-identical under decode. Progression:

      scan 1: DC,  Ss=0 Se=0,  Ah=0 Al=1   (first approximation)
      scan 2: DC,  Ss=0 Se=0,  Ah=1 Al=0   (refinement bit)
      scan 3: AC,  Ss=1 Se=63, Ah=0 Al=1   (first scan, EOBn runs)
      scan 4: AC,  Ss=1 Se=63, Ah=1 Al=0   (refinement, correction bits)
    """
    assert len(blocks) == nx * ny
    w, h = nx * 8, ny * 8
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes(quant)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, h, w, 1)  # SOF2
    out += bytes([1, 0x11, 0])
    for cls, bits, vals in (
        (0, _DC_BITS, _DC_VALS), (1, _AC_BITS_PROG, _AC_VALS_PROG)
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
        out += bytes([cls << 4]) + bytes(bits) + bytes(vals)
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS_PROG, _AC_VALS_PROG)

    def sos(ss, se, ah, al):
        return (b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, 1, 0, ss, se, (ah << 4) | al]))

    # --- scan 1: DC first, Al=1 (arithmetic shift per G.1.2.1) ---
    out += sos(0, 0, 0, 1)
    bw = _BitWriter()
    pred = 0
    for blk in blocks:
        v = blk[0] >> 1
        size, amp = _magnitude(v - pred)
        pred = v
        code, length = dc_codes[size]
        bw.put(code, length)
        if size:
            bw.put(amp, size)
    out += bw.flush()

    # --- scan 2: DC refinement, one raw bit per block ---
    out += sos(0, 0, 1, 0)
    bw = _BitWriter()
    for blk in blocks:
        bw.put(blk[0] & 1, 1)
    out += bw.flush()

    # --- scan 3: AC first scan, band 1..63, Al=1, EOBn run codes ---
    out += sos(1, 63, 0, 1)
    bw = _BitWriter()
    eobrun = 0

    def flush_eobrun():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun = 0

    for blk in blocks:
        tv = [_div_pt(blk[k], 1) for k in range(64)]
        last = max((k for k in range(1, 64) if tv[k]), default=0)
        if last == 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
            continue
        flush_eobrun()
        run = 0
        for k in range(1, last + 1):
            if tv[k] == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]
                bw.put(code, length)
                run -= 16
            size, amp = _magnitude(tv[k])
            code, length = ac_codes[(run << 4) | size]
            bw.put(code, length)
            bw.put(amp, size)
            run = 0
        if last < 63:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eobrun()
    flush_eobrun()
    out += bw.flush()

    # --- scan 4: AC refinement, Ah=1 -> Al=0 (G.1.2.3: newly
    # significant coefficients code runs over zero-HISTORY positions,
    # correction bits of passed-over nonzero-history positions are
    # embedded right after each run's sign bit; EOB runs carry the
    # remaining correction bits of every block they cover) ---
    out += sos(1, 63, 1, 0)
    bw = _BitWriter()
    eobrun = 0
    pending: list[list[int]] = []  # correction bits per buffered block

    def flush_eobrun_refine():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(eobrun - (1 << r), r)
            for corr in pending:
                for bit in corr:
                    bw.put(bit, 1)
            eobrun = 0
            pending = []

    for blk in blocks:
        hist = [_div_pt(blk[k], 1) for k in range(64)]  # prior-scan value
        newly = [
            k for k in range(1, 64) if hist[k] == 0 and blk[k] != 0
        ]
        last_new = newly[-1] if newly else 0
        if last_new == 0:
            # no new significance: block is one EOB unit; its
            # nonzero-history correction bits ride the EOB run
            eobrun += 1
            pending.append([abs(blk[k]) & 1 for k in range(1, 64) if hist[k]])
            if eobrun == 0x7FFF:
                flush_eobrun_refine()
            continue
        flush_eobrun_refine()
        run = 0          # zero-history positions since last emit
        corr: list[int] = []  # correction bits passed over in this run
        for k in range(1, last_new + 1):
            if hist[k] != 0:
                corr.append(abs(blk[k]) & 1)
                continue
            if blk[k] == 0:
                run += 1
                if run == 16:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.put(code, length)
                    for bit in corr:
                        bw.put(bit, 1)
                    corr = []
                    run = 0
                continue
            # newly significant: (run, 1) + sign + passed-over bits
            code, length = ac_codes[(run << 4) | 1]
            bw.put(code, length)
            bw.put(1 if blk[k] > 0 else 0, 1)
            for bit in corr:
                bw.put(bit, 1)
            corr = []
            run = 0
        # tail: correction bits after the last newly-significant coeff.
        # A block whose last new coefficient sits AT the band end exits
        # the decoder's symbol loop naturally (k > Se) and consumes no
        # EOB unit — counting it here would shift every later block's
        # correction bits by one EOB unit.
        if last_new < 63:
            tail = [
                abs(blk[k]) & 1 for k in range(last_new + 1, 64) if hist[k]
            ]
            eobrun += 1
            pending.append(corr + tail)
            if eobrun == 0x7FFF:
                flush_eobrun_refine()
    flush_eobrun_refine()
    out += bw.flush()

    out += b"\xff\xd9"
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bits(self, length: int) -> int:
        while self.n < length:
            if self.pos >= len(self.data):
                raise ValueError("entropy-coded segment exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("marker inside entropy-coded segment")
                self.pos += 1  # unstuff
            self.acc = (self.acc << 8) | byte
            self.n += 8
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huffman(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(amp: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map amplitude bits back to a signed value."""
    if size == 0:
        return 0
    if amp < (1 << (size - 1)):
        return amp - (1 << size) + 1
    return amp


def _idct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos((2 * n[:, None] + 1) * n[None, :] * np.pi / 16)
    scale = np.full(8, np.sqrt(2.0 / 8.0))
    scale[0] = np.sqrt(1.0 / 8.0)
    return c * scale[None, :]


_IDCT = _idct_matrix()


def _idct2(coeffs: np.ndarray) -> np.ndarray:
    return _IDCT @ coeffs @ _IDCT.T


def _ecs_end(payload: bytes, start: int) -> int:
    """End of an entropy-coded segment: the next real marker (0xFF
    followed by anything but a stuffed 0x00 or an RSTn)."""
    i = start
    n = len(payload)
    while i < n - 1:
        if payload[i] == 0xFF:
            nxt = payload[i + 1]
            if nxt != 0x00 and not 0xD0 <= nxt <= 0xD7:
                return i
        i += 1
    return n


def _reconstruct(w, h, quant, blocks):
    nx = w // 8
    pixels = np.zeros((h, w), dtype=np.uint8)
    for i, blk in enumerate(blocks):
        by, bx = divmod(i, nx)
        coeffs = np.zeros(64)
        for k in range(64):
            coeffs[ZIGZAG[k]] = blk[k] * quant[k]
        img = _idct2(coeffs.reshape(8, 8)) + 128.0
        pixels[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
            np.rint(img), 0, 255
        ).astype(np.uint8)
    return w, h, quant, blocks, pixels


def jpeg_decode(payload: bytes):
    """(width, height, quant, blocks, pixels) from baseline OR
    progressive grayscale JPEG bytes. `blocks` are the recovered
    QUANTIZED coefficients (zigzag order, the encoder's exact
    integers); `pixels` is the uint8 image after dequantize + IDCT +
    level shift. Progressive scans accumulate into the coefficient
    array; reconstruction happens once at EOI."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    quants: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comp_tq = 0
    progressive = False
    blocks: list[list[int]] | None = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and blocks is not None:
                return _reconstruct(w, h, quants[comp_tq], blocks)
            raise ValueError("EOI before SOS")
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                quants[tq] = list(seg[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                lut = {
                    (length, code): sym
                    for sym, (code, length) in _canonical_codes(
                        bits, vals
                    ).items()
                }
                huff[(cls, tid)] = lut
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 / SOF2
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component supported")
            if seg[7] != 0x11:
                raise ValueError("no subsampling supported")
            comp_tq = seg[8]
            progressive = marker == 0xC2
            if progressive:
                if w % 8 or h % 8:
                    raise ValueError("non-multiple-of-8 dims")
                blocks = [[0] * 64 for _ in range((w // 8) * (h // 8))]
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("only SOF0/SOF2 supported")
        elif marker == 0xDA:  # SOS: entropy data follows the header
            # seg: Ns(1) Cs(1) Td/Ta(1) Ss Se AhAl — selector is seg[2]
            td, ta = seg[2] >> 4, seg[2] & 0x0F
            ss, se = seg[3], seg[4]
            ah, al = seg[5] >> 4, seg[5] & 0x0F
            data_start = pos + seglen
            if not progressive:
                end = payload.rindex(b"\xff\xd9")
                return _decode_scan(
                    payload[data_start:end],
                    w, h, quants[comp_tq],
                    huff[(0, td)], huff[(1, ta)],
                )
            end = _ecs_end(payload, data_start)
            _decode_scan_progressive(
                payload[data_start:end], blocks, ss, se, ah, al,
                huff.get((0, td)), huff.get((1, ta)),
            )
            pos = end
            continue
        # APPn / COM / anything else: skip
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan_progressive(data, blocks, ss, se, ah, al, dc_lut, ac_lut):
    """One progressive scan accumulated into `blocks` (T.81 Annex G,
    single-component so block order is raster order, no MCU interleave).
    Four scan types: DC first / DC refine / AC first (EOBn runs) /
    AC refine (correction bits)."""
    br = _BitReader(data)
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        if ah == 0:
            pred = 0
            for blk in blocks:
                size = br.huffman(dc_lut)
                pred += _extend(br.bits(size), size)
                blk[0] = pred << al
        else:
            for blk in blocks:
                if br.bits(1):
                    blk[0] |= 1 << al
        return
    if ah == 0:  # AC first scan
        eobrun = 0
        for blk in blocks:
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = br.huffman(ac_lut)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.bits(r)
                        break
                    k += 16  # ZRL
                else:
                    k += r
                    if k > se:
                        raise ValueError("AC run past end of band")
                    blk[k] = _extend(br.bits(s), s) << al
                    k += 1
        return
    # AC refinement scan (G.1.2.3)
    p1 = 1 << al
    eobrun = 0
    for blk in blocks:
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = br.huffman(ac_lut)
                r, s = sym >> 4, sym & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.bits(r)
                        break
                    # ZRL: pass 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("refinement size must be 1")
                    newval = p1 if br.bits(1) else -p1
                while k <= se:
                    if blk[k] != 0:
                        if br.bits(1) and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else -p1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if blk[k] != 0:
                    if br.bits(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else -p1
                k += 1
            eobrun -= 1


def _decode_scan(data, w, h, quant, dc_lut, ac_lut):
    if w is None or w % 8 or h % 8:
        raise ValueError("frame header missing or non-multiple-of-8 dims")
    nx, ny = w // 8, h // 8
    br = _BitReader(data)
    blocks: list[list[int]] = []
    pixels = np.zeros((h, w), dtype=np.uint8)
    pred = 0
    for by in range(ny):
        for bx in range(nx):
            blk = [0] * 64
            size = br.huffman(dc_lut)
            pred += _extend(br.bits(size), size)
            blk[0] = pred
            k = 1
            while k < 64:
                sym = br.huffman(ac_lut)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                k += sym >> 4
                if k > 63:
                    raise ValueError("AC run past end of block")
                size = sym & 0x0F
                blk[k] = _extend(br.bits(size), size)
                k += 1
            blocks.append(blk)
            coeffs = np.zeros(64)
            for k in range(64):
                coeffs[ZIGZAG[k]] = blk[k] * quant[k]
            img = _idct2(coeffs.reshape(8, 8)) + 128.0
            pixels[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(img), 0, 255
            ).astype(np.uint8)
    return w, h, quant, blocks, pixels
