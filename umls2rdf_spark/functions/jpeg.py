"""Pure-stdlib baseline JPEG codec (ITU T.81 sequential DCT) for the
multimodal operators — covers the dominant web image format in
image_ahash / resize_images when PIL is absent.

Decoder: baseline and extended-sequential Huffman JPEG (SOF0/SOF1),
arbitrary DQT/DHT tables, chroma subsampling, restart markers; emits
the LUMA plane as a (h, w) uint8 numpy array — exactly what the
perceptual-hash and grayscale-feature paths consume. Progressive
(SOF2), hierarchical, and arithmetic-coded JPEGs raise
``NotImplementedError`` with a clear message (the callers' contract:
never silently fake a decode).

Encoder: minimal grayscale baseline writer (single component, no
subsampling, standard Annex-K luminance quant table, single-length
canonical Huffman tables emitted in the DHT segment) — enough to
BUILD real JPEGs in tests without any imaging library, so the
decoder's round-trip is exercised end-to-end in this container.

Worker shipping: no Spark imports; register_pickle_by_value'd by
callers around their mapInPandas calls (operators/pq.py pattern).

Performance note: this is the fallback path — entropy decode is
bit-by-bit Python. Real deployments put PIL/libjpeg on executors
(image_module injection); the Spark-side plumbing is identical.
"""

from __future__ import annotations

# zigzag scan order: position k in the entropy stream -> index in the
# row-major 8x8 block
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

# Annex K luminance quantization table (quality-50 reference)
STD_LUMA_QUANT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def _dct_matrix():
    """Orthonormal 8-point DCT-II matrix: forward F = C @ x @ C.T,
    inverse x = C.T @ F @ C — the JPEG definition with the 1/sqrt(2)
    DC scaling folded in."""
    import math

    import numpy as np

    C = np.zeros((8, 8), dtype=np.float64)
    for k in range(8):
        a = math.sqrt(1.0 / 8.0) if k == 0 else math.sqrt(2.0 / 8.0)
        for n in range(8):
            C[k, n] = a * math.cos((2 * n + 1) * k * math.pi / 16.0)
    return C


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; surfaces RSTn markers to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            byte = d[self.pos]
            self.pos += 1
            if byte != 0xFF:
                return byte
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            # a real marker: signal end-of-segment to the caller by
            # rewinding so peek_marker sees it
            self.pos -= 1
            raise _MarkerReached()

    def read_bit(self) -> int:
        if self.nbits == 0:
            self.bits = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0

    def at_marker(self) -> int | None:
        """The marker byte if the stream sits at FFxx (xx != 0)."""
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and d[p + 1] != 0x00:
            return d[p + 1]
        return None

    def skip_marker(self) -> None:
        self.pos += 2


class _MarkerReached(Exception):
    pass


def _build_huffman(bits: list[int], values: list[int]) -> dict:
    """(length, code) -> symbol map from a DHT segment's canonical
    (bits, values) description."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_gray(b: bytes):
    """Baseline/extended-sequential JPEG bytes → (h, w) uint8 luma
    plane. Raises NotImplementedError for non-JPEG bytes and for
    progressive/arithmetic variants; ValueError for corrupt streams.
    """
    import numpy as np

    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        raise NotImplementedError(
            "stdlib codec: not a JPEG (no SOI marker)"
        )
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, comps) with comps [(cid, ch, cv, tq)]
    dri = 0
    scan = None

    try:
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                raise ValueError("JPEG marker expected")
            marker = b[pos + 1]
            if marker == 0xD9:  # EOI
                break
            seg_len = (b[pos + 2] << 8) | b[pos + 3]
            seg = b[pos + 4:pos + 2 + seg_len]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq_, tq = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    n = 64 * (2 if pq_ else 1)
                    raw = seg[i:i + n]
                    i += n
                    if pq_:
                        vals = [
                            (raw[2 * j] << 8) | raw[2 * j + 1]
                            for j in range(64)
                        ]
                    else:
                        vals = list(raw)
                    qtables[tq] = vals
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    bits = list(seg[i + 1:i + 17])
                    n = sum(bits)
                    values = list(seg[i + 17:i + 17 + n])
                    htables[(tc, th)] = _build_huffman(bits, values)
                    i += 17 + n
            elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
                h = (seg[1] << 8) | seg[2]
                w = (seg[3] << 8) | seg[4]
                ncomp = seg[5]
                comps = []
                for c in range(ncomp):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
                frame = (h, w, comps)
            elif marker == 0xC2:
                raise NotImplementedError(
                    "stdlib codec: progressive JPEG not supported "
                    "(baseline/extended-sequential only)"
                )
            elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"stdlib codec: JPEG SOF{marker - 0xC0} variant "
                    "not supported"
                )
            elif marker == 0xDD:  # DRI
                dri = (seg[0] << 8) | seg[1]
            elif marker == 0xDA:  # SOS
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cid = seg[1 + 2 * c]
                    tt = seg[2 + 2 * c]
                    scan.append((cid, tt >> 4, tt & 0x0F))
                pos = pos + 2 + seg_len
                break
            pos = pos + 2 + seg_len
    except IndexError as e:
        raise ValueError("truncated JPEG header") from e

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("JPEG with zero dimension")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # luma = the first frame component (JFIF convention)
    luma_id = comps[0][0]
    scan_by_id = {cid: (td, ta) for cid, td, ta in scan}
    C = _dct_matrix()

    y_ch, y_cv = comps[0][1], comps[0][2]
    plane = np.zeros((mcuy * y_cv * 8, mcux * y_ch * 8), dtype=np.float64)

    reader = _BitReader(b, pos)
    dc_pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    zz = np.array(ZIGZAG)

    def decode_block(cid: int, tq: int):
        td, ta = scan_by_id[cid]
        dc_tab = htables.get((0, td))
        ac_tab = htables.get((1, ta))
        if dc_tab is None or ac_tab is None:
            raise ValueError("JPEG scan references missing DHT")
        coef = np.zeros(64, dtype=np.float64)
        s = _decode_symbol(reader, dc_tab)
        diff = _extend(reader.read_bits(s), s)
        dc_pred[cid] += diff
        coef[0] = dc_pred[cid]
        k = 1
        while k < 64:
            rs = _decode_symbol(reader, ac_tab)
            r, size = rs >> 4, rs & 0x0F
            if size == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC index out of range")
            coef[k] = _extend(reader.read_bits(size), size)
            k += 1
        q = qtables.get(tq)
        if q is None:
            # validate BEFORE the chroma early-return: a component
            # referencing an absent DQT is structurally invalid and
            # must keep failing/quarantining even when its pixels
            # would be discarded
            raise ValueError("JPEG scan references missing DQT")
        if cid != luma_id:
            # chroma pixels are discarded (luma-only decode) — the
            # entropy decode above still had to run to advance the
            # bit stream and the DC predictor, but dequant + IDCT
            # would be pure waste (~1/3 of all blocks in 4:2:0)
            return None
        deq = coef * np.asarray(q, dtype=np.float64)
        block = np.zeros(64, dtype=np.float64)
        block[zz] = deq
        block = block.reshape(8, 8)
        return C.T @ block @ C

    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcu_count and mcu_count % dri == 0:
                    reader.align()
                    m = reader.at_marker()
                    if m is not None and 0xD0 <= m <= 0xD7:
                        reader.skip_marker()
                        for cid in dc_pred:
                            dc_pred[cid] = 0
                for cid, ch, cv, tq in comps:
                    for v in range(cv):
                        for hh in range(ch):
                            blk = decode_block(cid, tq)
                            if cid == luma_id:
                                r0 = (my * cv + v) * 8
                                c0 = (mx * ch + hh) * 8
                                plane[r0:r0 + 8, c0:c0 + 8] = blk
                mcu_count += 1
    except _MarkerReached as e:
        raise ValueError("JPEG entropy stream ended early") from e

    out = np.clip(np.round(plane + 128.0), 0, 255).astype(np.uint8)
    y_h = (h * y_cv + vmax - 1) // vmax
    y_w = (w * y_ch + hmax - 1) // hmax
    out = out[:y_h, :y_w]
    if out.shape != (h, w):
        ys = (np.arange(h) * out.shape[0]) // h
        xs = (np.arange(w) * out.shape[1]) // w
        out = out[ys][:, xs]
    return out


# ── minimal grayscale baseline encoder (tests + fallback writes) ────


def _encode_huffman_spec(symbols: list[int], length: int):
    """Single-length canonical Huffman over the distinct ``symbols``:
    (bits, values, code map). Valid JPEG as long as
    len(symbols) < 2^length (the all-ones code stays unused)."""
    values = sorted(set(symbols))
    if len(values) >= (1 << length) - 1:
        raise ValueError("too many symbols for single-length table")
    bits = [0] * 16
    bits[length - 1] = len(values)
    codes = {v: (length, i) for i, v in enumerate(values)}
    return bits, values, codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        while self.nacc:
            self.write(1, 1)  # pad with 1s per spec


def encode_jpeg_gray(img) -> bytes:
    """(h, w) uint8 array → baseline grayscale JPEG bytes (single
    component, standard luminance quant table, single-length Huffman
    tables declared in DHT)."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    padded = np.empty((ph, pw), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1:h, :]
    padded[:, w:] = padded[:, w - 1:w]
    padded -= 128.0
    C = _dct_matrix()
    zz = np.array(ZIGZAG)
    # STD_LUMA_QUANT is printed in ROW-MAJOR block order (Annex K);
    # the entropy stream and the DQT segment both use zigzag order
    qzig = np.asarray(STD_LUMA_QUANT, dtype=np.float64).reshape(64)[zz]

    # first pass: quantized zigzag coefficients per block + the
    # symbol sets the Huffman tables must cover
    dc_syms, ac_syms = [], []
    blocks = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            blk = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            F = C @ blk @ C.T
            flat = F.reshape(64)[zz]
            y = flat / qzig
            qz = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
            blocks.append(qz)

    def category(v: int) -> int:
        return 0 if v == 0 else int(v if v > 0 else -v).bit_length()

    runs_per_block = []
    prev_dc = 0
    for qz in blocks:
        dc = int(qz[0])
        diff = dc - prev_dc
        prev_dc = dc
        s = category(diff)
        dc_syms.append(s)
        acs = []
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if qz[k] != 0:
                last_nz = k
        for k in range(1, last_nz + 1):
            v = int(qz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))
                ac_syms.append(0xF0)
                run -= 16
            size = category(v)
            acs.append(((run << 4) | size, v, size))
            ac_syms.append((run << 4) | size)
            run = 0
        if last_nz < 63:
            acs.append((0x00, 0, 0))
            ac_syms.append(0x00)
        runs_per_block.append((diff, s, acs))

    dc_bits, dc_vals, dc_codes = _encode_huffman_spec(dc_syms or [0], 5)
    ac_bits, ac_vals, ac_codes = _encode_huffman_spec(ac_syms or [0], 9)

    wtr = _BitWriter()
    for diff, s, acs in runs_per_block:
        ln, code = dc_codes[s]
        wtr.write(code, ln)
        if s:
            v = diff if diff > 0 else diff + (1 << s) - 1
            wtr.write(v, s)
        for sym, v, size in acs:
            ln, code = ac_codes[sym]
            wtr.write(code, ln)
            if size:
                extra = v if v > 0 else v + (1 << size) - 1
                wtr.write(extra, size)
    wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, bytes([0]) + bytes(
        int(qzig[i]) for i in range(64)
    ))  # DQT id 0, zigzag order
    out += seg(0xC0, struct.pack(
        ">BHHB", 8, h, w, 1
    ) + bytes([1, 0x11, 0]))  # SOF0: 1 comp, 1x1 sampling, tq 0
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
