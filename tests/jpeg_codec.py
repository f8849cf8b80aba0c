"""Minimal baseline-JPEG ENCODER — test fixture generator only.

The engine's decoder (``operators/multimodal.py resize_images``) needs
spec-conformant baseline byte streams to be tested against, and this
container has no image library. This encoder is deliberately
independent of the decoder under test: it operates at the QUANTIZED-
COEFFICIENT level (callers hand it natural-order coefficient blocks;
``encode_gray`` adds a forward-DCT convenience), emits custom canonical
Huffman tables sized to the symbols actually used (which also exercises
the decoder's generic DHT parsing — standard Annex K tables would only
ever exercise one table shape), and supports restart intervals and
h/v-subsampled multi-component frames.

Spec: ITU-T T.81 (public). Not part of the engine — fixtures only.
"""

from __future__ import annotations

import numpy as np

#: zigzag index map: ZZ[zigzag_pos] = natural_pos (T.81 figure A.6)
ZZ = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14,
     21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23,
     30, 37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60,
     61, 54, 47, 55, 62, 63], np.int32)

FLAT_Q16 = np.full(64, 16, np.int32)  # uniform table, natural order


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, raw bits) encoding of a DC diff / AC value per T.81
    F.1.2.1: negative values store their ones'-complement."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _canonical_table(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """Fixed-length canonical Huffman table over ``symbols``: BITS
    counts, ordered HUFFVAL, and symbol -> (length, code). Length is
    the smallest L with |symbols| <= 2^L - 1 (the all-ones code must
    stay unused per the spec)."""
    syms = sorted(symbols)
    L = 1
    while len(syms) > (1 << L) - 1:
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    codes = {s: (L, c) for c, s in enumerate(syms)}
    return counts, syms, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.nacc = 0, 0

    def pad_to_byte(self):
        if self.nacc:
            self.put((1 << (8 - self.nacc)) - 1, 8 - self.nacc)  # 1-fill


def encode_baseline(
    width: int,
    height: int,
    planes: list[tuple[int, int, int, np.ndarray]],
    qtable: np.ndarray = FLAT_Q16,
    dri: int = 0,
) -> bytes:
    """Emit a baseline JFIF byte stream.

    ``planes``: per component ``(cid, h_samp, v_samp, coefs)`` where
    ``coefs`` has shape (blocks_y, blocks_x, 64) of QUANTIZED
    coefficients in NATURAL order, with blocks_y = mcu_rows * v_samp
    and blocks_x = mcu_cols * h_samp. One shared quant table and one
    shared DC/AC Huffman table pair for all components.
    """
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    single = len(planes) == 1
    if single:
        # ns=1 scan is NON-interleaved (T.81 A.2.2): data units walk
        # the component's own block grid (= the full frame grid, since
        # a lone component samples at full resolution whatever factors
        # the SOF declares); DRI counts blocks
        _, _, _, coefs0 = planes[0]
        assert coefs0.shape[:2] == (-(-height // 8), -(-width // 8)), (
            coefs0.shape, height, width)
    else:
        for cid, h, v, coefs in planes:
            assert coefs.shape[:2] == (mcuy * v, mcux * h), (
                cid, coefs.shape, mcuy * v, mcux * h)

    # ---- pass 1: symbol stream in interleaved MCU order -------------
    # tokens: ("dc"|"ac", symbol, extra_nbits, extra_value) plus
    # ("rst",) sentinels where a restart marker goes
    tokens: list[tuple] = []
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    pred = {p[0]: 0 for p in planes}
    mcus_done = 0

    def emit_block(cid, blk):
        diff = int(blk[0]) - pred[cid]
        pred[cid] = int(blk[0])
        s, bits = _mag_bits(diff)
        tokens.append(("dc", s, s, bits))
        dc_syms.add(s)
        zz = blk[ZZ]  # natural -> zigzag scan order
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        last = (last_nz[-1] + 1) if len(last_nz) else 0
        for k in range(1, last + 1):
            val = int(zz[k])
            if val == 0:
                run += 1
                if run == 16:
                    tokens.append(("ac", 0xF0, 0, 0))
                    ac_syms.add(0xF0)
                    run = 0
                continue
            s, bits = _mag_bits(val)
            sym = (run << 4) | s
            tokens.append(("ac", sym, s, bits))
            ac_syms.add(sym)
            run = 0
        if last < 63:
            tokens.append(("ac", 0x00, 0, 0))  # EOB
            ac_syms.add(0x00)

    if single:
        cid0, _, _, coefs0 = planes[0]
        for by in range(coefs0.shape[0]):
            for bx in range(coefs0.shape[1]):
                if dri and mcus_done and mcus_done % dri == 0:
                    tokens.append(("rst",))
                    pred = {p[0]: 0 for p in planes}
                emit_block(cid0, coefs0[by, bx])
                mcus_done += 1
    else:
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcus_done and mcus_done % dri == 0:
                    tokens.append(("rst",))
                    pred = {p[0]: 0 for p in planes}
                for cid, h, v, coefs in planes:
                    for by in range(v):
                        for bx in range(h):
                            emit_block(cid, coefs[my * v + by, mx * h + bx])
                mcus_done += 1

    dc_counts, dc_vals, dc_codes = _canonical_table(dc_syms or {0})
    ac_counts, ac_vals, ac_codes = _canonical_table(ac_syms or {0})

    # ---- pass 2: emit ------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qtable[ZZ]))  # DQT zz
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(len(planes))
    for cid, h, v, _ in planes:
        sof.extend([cid, (h << 4) | v, 0])
    seg(0xC0, bytes(sof))
    seg(0xC4, bytes([0x00] + dc_counts) + bytes(dc_vals))  # DHT DC 0
    seg(0xC4, bytes([0x10] + ac_counts) + bytes(ac_vals))  # DHT AC 0
    if dri:
        seg(0xDD, dri.to_bytes(2, "big"))
    sos = bytearray([len(planes)])
    for cid, *_ in planes:
        sos.extend([cid, 0x00])  # DC table 0, AC table 0
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))

    bw = _BitWriter()
    rst = 0
    for tok in tokens:
        if tok[0] == "rst":
            bw.pad_to_byte()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            continue
        kind, sym, nbits, bits = tok
        codes = dc_codes if kind == "dc" else ac_codes
        ln, code = codes[sym]
        bw.put(code, ln)
        if nbits:
            bw.put(bits, nbits)
    bw.pad_to_byte()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def fdct_quantize(pixels: np.ndarray, qtable: np.ndarray = FLAT_Q16) -> np.ndarray:
    """Forward DCT + quantize an (H, W) uint8 gray image into natural-
    order coefficient blocks shaped (H//8, W//8, 64)."""
    h, w = pixels.shape
    assert h % 8 == 0 and w % 8 == 0
    xs = np.arange(8)
    A = np.cos((2 * xs[:, None] + 1) * xs[None, :] * np.pi / 16) / 2
    A[:, 0] *= 1 / np.sqrt(2)
    qn = qtable.reshape(8, 8).astype(np.float64)
    out = np.empty((h // 8, w // 8, 64), np.int32)
    shifted = pixels.astype(np.float64) - 128.0
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coef = A.T @ blk @ A
            out[by, bx] = np.round(coef / qn).astype(np.int32).reshape(64)
    return out


def encode_gray(pixels: np.ndarray, qtable: np.ndarray = FLAT_Q16,
                dri: int = 0) -> bytes:
    """Encode an (H, W) uint8 grayscale image (dims multiple of 8)."""
    coefs = fdct_quantize(pixels, qtable)
    return encode_baseline(
        pixels.shape[1], pixels.shape[0], [(1, 1, 1, coefs)], qtable, dri
    )


def encode_progressive(
    width: int,
    height: int,
    planes: list[tuple[int, int, int, np.ndarray]],
    qtable: np.ndarray = FLAT_Q16,
    scans: list[tuple[list[int], int, int, int, int]] | None = None,
) -> bytes:
    """Emit a PROGRESSIVE (SOF2) JFIF byte stream — spectral selection
    + successive approximation per T.81 annex G, mirroring libjpeg's
    encoder semantics (EOB runs, ZRL folding, buffered correction
    bits). ``planes`` as in :func:`encode_baseline` (MCU-padded
    grids). ``scans`` is a list of ``(comp_ids, Ss, Se, Ah, Al)``;
    default is the libjpeg-style script (approximated DC, banded AC,
    two refinement passes per component). Fixture generator only —
    verification pairs it with the baseline encoder over the SAME
    coefficients: both must decode identically."""
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    byid = {p[0]: p for p in planes}
    for cid, h, v, coefs in planes:
        assert coefs.shape[:2] == (mcuy * v, mcux * h)

    def ungridded(cid):
        _, h, v, coefs = byid[cid]
        bw = -(-(-(-width * h // hmax)) // 8)
        bh = -(-(-(-height * v // vmax)) // 8)
        return coefs, bw, bh

    if scans is None:
        all_ids = [p[0] for p in planes]
        scans = [(all_ids, 0, 0, 0, 1)]
        for cid, *_ in planes:
            scans += [([cid], 1, 5, 0, 2), ([cid], 6, 63, 0, 2),
                      ([cid], 1, 63, 2, 1), ([cid], 1, 63, 1, 0)]
        scans += [(all_ids, 0, 0, 1, 0)]

    def blocks_for(scan_ids):
        """Yield (cid, block) in the scan's walk order."""
        if len(scan_ids) == 1:
            coefs, bw, bh = ungridded(scan_ids[0])
            for by in range(bh):
                for bx in range(bw):
                    yield scan_ids[0], coefs[by, bx]
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    for cid in scan_ids:
                        _, h, v, coefs = byid[cid]
                        for by in range(v):
                            for bx in range(h):
                                yield cid, coefs[my * v + by, mx * h + bx]

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in qtable[ZZ]))
    sof = bytearray([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof.append(len(planes))
    for cid, h, v, _ in planes:
        sof.extend([cid, (h << 4) | v, 0])
    seg(0xC2, bytes(sof))

    for scan_ids, Ss, Se, Ah, Al in scans:
        # tokens: ("sym", s) -> huffman; ("bits", value, nbits) -> raw
        tokens: list[tuple] = []
        syms: set[int] = set()

        def sym(s):
            tokens.append(("sym", s))
            syms.add(s)

        def bits(v, nb):
            if nb:
                tokens.append(("bits", v & ((1 << nb) - 1), nb))

        if Ss == 0 and Ah == 0:  # DC first
            pred = {cid: 0 for cid in scan_ids}
            for cid, blk in blocks_for(scan_ids):
                t = int(blk[0]) >> Al  # arithmetic shift (libjpeg)
                s, b_ = _mag_bits(t - pred[cid])
                pred[cid] = t
                sym(s)
                bits(b_, s)
        elif Ss == 0:  # DC refine: one raw bit per block, no huffman
            for _cid, blk in blocks_for(scan_ids):
                bits((int(blk[0]) >> Al) & 1, 1)
        elif Ah == 0:  # AC first, with EOB runs
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun > 0:
                    nb = eobrun.bit_length() - 1
                    sym(nb << 4)
                    bits(eobrun - (1 << nb), nb)
                    eobrun = 0

            for _cid, blk in blocks_for(scan_ids):
                zz = blk[ZZ]
                r = 0
                any_nz = False
                for k in range(Ss, Se + 1):
                    v = int(zz[k])
                    t = (abs(v) >> Al)
                    if t == 0:
                        r += 1
                        continue
                    any_nz = True
                    flush_eob()
                    while r > 15:
                        sym(0xF0)
                        r -= 16
                    s, b_ = _mag_bits(t if v > 0 else -t)
                    sym((r << 4) | s)
                    bits(b_, s)
                    r = 0
                if r > 0 or not any_nz:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
        else:  # AC refine: libjpeg encode_mcu_AC_refine semantics
            p_eobrun = 0
            BE: list[int] = []  # correction bits buffered with EOBRUN

            def flush_eob_refine():
                nonlocal p_eobrun
                if p_eobrun > 0:
                    nb = p_eobrun.bit_length() - 1
                    sym(nb << 4)
                    bits(p_eobrun - (1 << nb), nb)
                    p_eobrun = 0
                for bit in BE:
                    bits(bit, 1)
                BE.clear()

            for _cid, blk in blocks_for(scan_ids):
                zz = blk[ZZ]
                absval = [abs(int(zz[k])) >> Al for k in range(Se + 1)]
                EOB = 0
                for k in range(Ss, Se + 1):
                    if absval[k] == 1:
                        EOB = k
                r = 0
                BR: list[int] = []
                for k in range(Ss, Se + 1):
                    t = absval[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= EOB:
                        flush_eob_refine()
                        sym(0xF0)
                        r -= 16
                        for bit in BR:
                            bits(bit, 1)
                        BR = []
                    if t > 1:
                        BR.append(t & 1)
                        continue
                    flush_eob_refine()
                    sym((r << 4) | 1)
                    bits(1 if int(zz[k]) > 0 else 0, 1)
                    for bit in BR:
                        bits(bit, 1)
                    BR = []
                    r = 0
                if r > 0 or BR:
                    p_eobrun += 1
                    BE.extend(BR)
                    if p_eobrun == 0x7FFF or len(BE) > 900:
                        flush_eob_refine()
            flush_eob_refine()

        # per-scan DHT (class 0 for DC-first, class 1 for AC scans;
        # DC-refine consumes no huffman symbols -> no table needed)
        tc = 0 if Ss == 0 else 1
        if syms:
            counts, vals, codes = _canonical_table(syms)
            seg(0xC4, bytes([(tc << 4)] + counts) + bytes(vals))
        else:
            codes = {}
        sos = bytearray([len(scan_ids)])
        for cid in scan_ids:
            sos.extend([cid, 0x00])
        sos.extend([Ss, Se, (Ah << 4) | Al])
        seg(0xDA, bytes(sos))
        bw = _BitWriter()
        for tok in tokens:
            if tok[0] == "sym":
                ln, code = codes[tok[1]]
                bw.put(code, ln)
            else:
                bw.put(tok[1], tok[2])
        bw.pad_to_byte()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
