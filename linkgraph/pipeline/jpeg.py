"""Baseline JPEG codec in stdlib + numpy (public spec: ITU-T T.81 /
ISO 10918-1).

Decoder: baseline, extended-sequential, and progressive Huffman JPEG
(SOF0/SOF1/SOF2) — marker walk, DQT/DHT/DRI/SOS parsing, entropy decode
with byte unstuffing and restart markers, progressive
spectral-selection + successive-approximation scan accumulation
(T.81 G.2 / F.2.2.4), dequantize, 8x8 IDCT (orthonormal DCT-III,
T.81 A.3.3), per-component plane assembly with (h,v) sampling factors,
nearest-neighbor chroma upsample, YCbCr->RGB (JFIF full-range matrix).
Arithmetic-coded / lossless / hierarchical streams raise
NotImplementedError — callers fall back to the SOF header walk for
dimensions.

Encoder: minimal but spec-conformant baseline + progressive writers for
fixtures and round-trip tests — 4:4:4 or 4:2:0, all-ones quantization
(max coef error 0.5, so round-trips are near-lossless), fixed-length
canonical Huffman tables written to DHT (valid prefix codes, just not
optimal), optional restart intervals to exercise the decoder's RST
path, and for progressive: spectral-selection bands plus optional
successive-approximation DC/AC refinement scans (the jcphuff-style
EOB-run + buffered-correction-bit algorithm, T.81 G.1.2).

This backs linkgraph.pipeline.multimodal.decode_image_bytes; the same
honest-stub rule as the rest of the multimodal surface applies: what we
can't decode for real raises clearly and routes to on_error handling.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index z -> position (row*8+col) in the 8x8 block
ZIGZAG = np.array(
    [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
     12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
     35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
     58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix; forward Y = T @ X @ T.T matches
# T.81 A.3.3's FDCT scaling exactly, inverse X = T.T @ Y @ T
_T = np.zeros((8, 8))
for _k in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _k == 0 else 1.0
    for _n in range(8):
        _T[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
del _k, _c, _n


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman table (T.81 C.2): {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[vi]
            vi += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over one entropy-coded segment (already
    unstuffed)."""

    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0
        self.nbits = len(data) * 8

    def read_bit(self) -> int:
        if self.bitpos >= self.nbits:
            raise ValueError("corrupt JPEG: entropy data exhausted")
        b = (self.data[self.bitpos >> 3] >> (7 - (self.bitpos & 7))) & 1
        self.bitpos += 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """DC/AC magnitude decode (T.81 F.2.2.1 EXTEND)."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_scan(blob: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded data starting at ``pos``; split into
    segments at RSTn markers. Returns (segments, pos_after_scan)."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(blob)
    while pos < n:
        b = blob[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            break
        m = blob[pos + 1]
        if m == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # EOI or the next real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, pos


class _ProgState:
    """Progressive-JPEG coefficient accumulator (T.81 G.2 / F.2.2.4):
    every scan deposits spectral-selection / successive-approximation
    bits into per-component DCT-coefficient buffers; ``reconstruct``
    runs the shared dequant + IDCT + upsample + color transform once all
    scans are in. DC scans may be interleaved or single-component; AC
    scans are single-component by spec (over the component's OWN block
    grid, not the MCU-padded one)."""

    def __init__(self, frame):
        fh, fw, comps = frame
        if fh == 0 or fw == 0:
            raise ValueError("corrupt JPEG: zero dimensions")
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = (fw + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcus_y = (fh + 8 * self.vmax - 1) // (8 * self.vmax)
        self.geom: dict[int, tuple] = {}
        self.coefs: dict[int, np.ndarray] = {}
        for cid, hs, vs, tq in comps:
            comp_w = (fw * hs + self.hmax - 1) // self.hmax
            comp_h = (fh * vs + self.vmax - 1) // self.vmax
            own_bx = (comp_w + 7) // 8
            own_by = (comp_h + 7) // 8
            full_bx = self.mcus_x * hs
            full_by = self.mcus_y * vs
            self.geom[cid] = (hs, vs, tq, comp_w, comp_h, own_bx, own_by)
            self.coefs[cid] = np.zeros((full_by, full_bx, 64), dtype=np.int64)
        self.preds: dict[int, int] = {}
        self.any_scan = False

    def decode_scan(self, scan_comps, ss, se, ah, al, dc_tabs, ac_tabs, ri, segs):
        self.any_scan = True
        if ss == 0 and se != 0:
            raise ValueError("corrupt JPEG: DC scan with Se != 0")
        if ss > se or se > 63:
            raise ValueError("corrupt JPEG: bad spectral selection")
        if ss == 0:
            self._decode_dc_scan(scan_comps, ah, al, dc_tabs, ri, segs)
        else:
            if len(scan_comps) != 1:
                raise ValueError("corrupt JPEG: interleaved AC scan")
            cs, _td, ta = scan_comps[0]
            if ah == 0 and ta not in ac_tabs:
                raise ValueError("corrupt JPEG: missing AC Huffman table")
            self._decode_ac_scan(cs, ss, se, ah, al, ac_tabs.get(ta), ri, segs)

    # -- DC scans (first pass Huffman-coded diffs, refinement raw bits) --

    def _dc_units(self, scan_comps):
        """Yield (cid, block_y, block_x) in scan order: MCU-interleaved
        when the scan has several components, the component's own grid
        row-major when it has one (T.81 A.2)."""
        if len(scan_comps) > 1:
            for mcu in range(self.mcus_x * self.mcus_y):
                my, mx = divmod(mcu, self.mcus_x)
                for cs, _td, _ta in scan_comps:
                    hs, vs = self.geom[cs][0], self.geom[cs][1]
                    for by in range(vs):
                        for bx in range(hs):
                            yield cs, my * vs + by, mx * hs + bx
        else:
            cs = scan_comps[0][0]
            _hs, _vs, _tq, _cw, _ch, own_bx, own_by = self.geom[cs]
            for b in range(own_bx * own_by):
                yield cs, b // own_bx, b % own_bx

    def _dc_restart_units(self, scan_comps):
        """Restart-interval unit count per Ri: MCUs when interleaved,
        blocks when single-component."""
        if len(scan_comps) > 1:
            per_mcu = sum(
                self.geom[cs][0] * self.geom[cs][1] for cs, _t, _a in scan_comps
            )
            return per_mcu
        return 1

    def _decode_dc_scan(self, scan_comps, ah, al, dc_tabs, ri, segs):
        for cs, td, _ta in scan_comps:
            if cs not in self.geom:
                raise ValueError("corrupt JPEG: scan references unknown component")
            if ah == 0:
                if td not in dc_tabs:
                    raise ValueError("corrupt JPEG: missing DC Huffman table")
                self.preds[cs] = 0
        tabs = {cs: dc_tabs.get(td) for cs, td, _ta in scan_comps}
        per_unit = self._dc_restart_units(scan_comps)
        reader = _BitReader(segs[0])
        seg_i = 0
        unit = 0
        for cs, by, bx in self._dc_units(scan_comps):
            if ri and unit and unit % (ri * per_unit) == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("corrupt JPEG: missing restart segment")
                reader = _BitReader(segs[seg_i])
                for c in self.preds:
                    self.preds[c] = 0
            coef = self.coefs[cs]
            if ah == 0:
                s = reader.decode_huff(tabs[cs])
                if s > 11:
                    raise ValueError("corrupt JPEG: bad DC magnitude")
                self.preds[cs] += _extend(reader.read(s), s)
                coef[by, bx, 0] = self.preds[cs] << al
            else:  # refinement: one raw bit per block
                if reader.read_bit():
                    coef[by, bx, 0] |= 1 << al
            unit += 1

    # -- AC scans (EOB-run coded; refinement per F.2.2.4) --

    def _decode_ac_scan(self, cs, ss, se, ah, al, ac_tab, ri, segs):
        if cs not in self.geom:
            raise ValueError("corrupt JPEG: scan references unknown component")
        _hs, _vs, _tq, _cw, _ch, own_bx, own_by = self.geom[cs]
        coef = self.coefs[cs]
        reader = _BitReader(segs[0])
        seg_i = 0
        eobrun = 0
        for b in range(own_bx * own_by):
            if ri and b and b % ri == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ValueError("corrupt JPEG: missing restart segment")
                reader = _BitReader(segs[seg_i])
                eobrun = 0
            by, bx = b // own_bx, b % own_bx
            block = coef[by, bx]
            if ah == 0:
                eobrun = self._ac_first(reader, block, ss, se, al, ac_tab, eobrun)
            else:
                eobrun = self._ac_refine(reader, block, ss, se, al, ac_tab, eobrun)

    @staticmethod
    def _ac_first(reader, block, ss, se, al, ac_tab, eobrun):
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = reader.decode_huff(ac_tab)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                break
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC band overflow")
            block[ZIGZAG[k]] = _extend(reader.read(s), s) << al
            k += 1
        return eobrun

    @staticmethod
    def _ac_refine(reader, block, ss, se, al, ac_tab, eobrun):
        """Successive-approximation AC refinement (T.81 G.1.2.3 /
        F.2.2.4): newly-significant coefficients arrive as ±1<<Al;
        already-significant coefficients crossed on the way (and the
        whole band tail during an EOB run) each consume one correction
        bit."""
        p1, m1 = 1 << al, -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode_huff(ac_tab)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r < 15:
                        # unlike the first-scan convention, the run
                        # INCLUDES the current block: the tail walk below
                        # must still consume its correction bits
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("corrupt JPEG: bad refinement magnitude")
                    val = p1 if reader.read_bit() else m1
                while k <= se:
                    z = ZIGZAG[k]
                    if block[z] != 0:
                        if reader.read_bit() and (block[z] & p1) == 0:
                            block[z] += p1 if block[z] > 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if val and k <= se:
                    block[ZIGZAG[k]] = val
                k += 1
        if eobrun > 0:
            while k <= se:
                z = ZIGZAG[k]
                if block[z] != 0:
                    if reader.read_bit() and (block[z] & p1) == 0:
                        block[z] += p1 if block[z] > 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    # -- final reconstruction --

    def reconstruct(self, qt) -> np.ndarray:
        fh, fw, comps = self.frame
        full = []
        for cid, hs, vs, tq in comps:
            if tq not in qt:
                raise ValueError("corrupt JPEG: missing quant table")
            q_nat = np.empty(64, dtype=np.float64)
            q_nat[ZIGZAG] = qt[tq]
            _hs, _vs, _tq, comp_w, comp_h, own_bx, own_by = self.geom[cid]
            blocks = (
                self.coefs[cid][:own_by, :own_bx].reshape(-1, 64).astype(np.float64)
                * q_nat
            ).reshape(-1, 8, 8)
            px = np.matmul(np.matmul(_T.T, blocks), _T) + 128.0
            plane = (
                px.reshape(own_by, own_bx, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(own_by * 8, own_bx * 8)[:comp_h, :comp_w]
            )
            if hs != self.hmax or vs != self.vmax:
                plane = np.repeat(
                    np.repeat(plane, self.vmax // vs, axis=0), self.hmax // hs, axis=1
                )
            full.append(plane[:fh, :fw])
        if len(full) == 1:
            return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        if len(full) == 3:
            y, cb, cr = full
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            rgb = np.stack([r, g, b], axis=-1)
            return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        raise NotImplementedError(f"{len(full)}-component JPEG not supported")


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline, extended-sequential, or progressive Huffman
    JPEG to uint8 pixels: (h, w) gray or (h, w, 3) RGB. Raises
    NotImplementedError for arithmetic-coded/lossless/hierarchical
    streams and ValueError for corrupt ones."""
    if not blob.startswith(b"\xff\xd8"):
        raise ValueError("corrupt JPEG: missing SOI")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (h, w, [(cid, hs, vs, tq), ...])
    progressive = False
    prog = None  # _ProgState once the first progressive scan arrives
    i = 2
    n = len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = blob[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", blob, i + 2)
        if seg_len < 2 or i + 2 + seg_len > n:
            raise ValueError("corrupt JPEG: bad segment length")
        data = blob[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 15
                p += 1
                if p + (64 if pq == 0 else 128) > len(data):
                    raise ValueError("corrupt JPEG: truncated DQT")
                if pq == 0:
                    tbl = np.frombuffer(data[p : p + 64], dtype=np.uint8).astype(np.float64)
                    p += 64
                else:  # 16-bit precision
                    tbl = np.frombuffer(data[p : p + 128], dtype=">u2").astype(np.float64)
                    p += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                if p + 17 > len(data):
                    raise ValueError("corrupt JPEG: truncated DHT")
                tc, th = data[p] >> 4, data[p] & 15
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = data[p + 17 : p + 17 + nv]
                if len(vals) != nv:
                    raise ValueError("corrupt JPEG: truncated DHT values")
                p += 17 + nv
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_huffman(bits, vals)
        elif marker == 0xDD:  # DRI
            if len(data) < 2:
                raise ValueError("corrupt JPEG: truncated DRI")
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext seq / progressive
            _prec, fh, fw, nc = struct.unpack_from(">BHHB", data, 0)
            if len(data) < 6 + 3 * nc:
                raise ValueError("corrupt JPEG: truncated SOF component list")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", data, 6 + 3 * c)
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("corrupt JPEG: sampling factor out of range")
                comps.append((cid, hs, vs, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline/extended-sequential/progressive Huffman JPEG "
                f"is decoded (got SOF marker 0x{marker:02x})"
            )
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            if not data or len(data) < 1 + 2 * data[0] + 3:
                raise ValueError("corrupt JPEG: truncated SOS header")
            ns = data[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = data[1 + 2 * c], data[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 15))
            ss, se, ahal = data[1 + 2 * ns : 4 + 2 * ns]
            segs, after = _split_scan(blob, i)
            if progressive:
                # accumulate this scan into the coefficient buffers and
                # keep walking markers — progressive has many scans
                if prog is None:
                    prog = _ProgState(frame)
                prog.decode_scan(scan_comps, ss, se, ahal >> 4, ahal & 15,
                                 dc_tabs, ac_tabs, restart_interval, segs)
                i = after
                continue
            # baseline: exactly one scan covering every component
            if ns < len(frame[2]):
                # sequential multi-scan (one scan per component) is
                # legal but rare; decoding only scan 1 would silently
                # return wrong pixels — degrade to header dims instead
                raise NotImplementedError(
                    "non-interleaved multi-scan sequential JPEG not decoded"
                )
            return _decode_scan(frame, scan_comps, qt, dc_tabs, ac_tabs,
                                restart_interval, segs)
    if prog is not None and prog.any_scan:
        return prog.reconstruct(qt)
    raise ValueError("corrupt JPEG: no SOS marker")


def _decode_scan(frame, scan_comps, qt, dc_tabs, ac_tabs, ri, segs) -> np.ndarray:
    fh, fw, comps = frame
    if fh == 0 or fw == 0:
        raise ValueError("corrupt JPEG: zero dimensions")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    by_id = {c[0]: c for c in comps}
    order = []  # (plane_idx, hs, vs, quant, dc_table, ac_table)
    planes = []
    for idx, (cs, td, ta) in enumerate(scan_comps):
        if cs not in by_id:
            raise ValueError("corrupt JPEG: scan references unknown component")
        _cid, hs, vs, tq = by_id[cs]
        if tq not in qt or td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("corrupt JPEG: missing quant/Huffman table")
        planes.append(np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64))
        order.append((idx, hs, vs, qt[tq], dc_tabs[td], ac_tabs[ta]))

    # DQT stores entries in zigzag order; rearrange to natural order so
    # dequantization is one elementwise multiply per block
    nat_q = []
    for o in order:
        q_nat = np.empty(64, dtype=np.float64)
        q_nat[ZIGZAG] = o[3]
        nat_q.append(q_nat.reshape(8, 8))

    seg_i = 0
    reader = _BitReader(segs[0])
    preds = [0] * len(order)
    coef_zz = np.zeros(64, dtype=np.float64)
    total_mcus = mcus_x * mcus_y
    for mcu in range(total_mcus):
        if ri and mcu and mcu % ri == 0:  # restart boundary
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("corrupt JPEG: missing restart segment")
            reader = _BitReader(segs[seg_i])
            preds = [0] * len(order)
        my, mx = divmod(mcu, mcus_x)
        for ci, (pi, hs, vs, _q, dct, act) in enumerate(order):
            for by in range(vs):
                for bx in range(hs):
                    coef_zz[:] = 0.0
                    s = reader.decode_huff(dct)
                    if s > 11:
                        raise ValueError("corrupt JPEG: bad DC magnitude")
                    preds[ci] += _extend(reader.read(s), s)
                    coef_zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_huff(act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC index overflow")
                        coef_zz[k] = _extend(reader.read(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = coef_zz
                    block = block.reshape(8, 8) * nat_q[ci]
                    px = _T.T @ block @ _T + 128.0
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[pi][y0 : y0 + 8, x0 : x0 + 8] = px

    # upsample each plane to full resolution, crop to (fh, fw)
    full = []
    for (pi, hs, vs, *_rest) in order:
        p = planes[pi]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) == 3:  # JFIF YCbCr -> RGB (full range, CCIR 601)
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise NotImplementedError(f"{len(full)}-component JPEG not supported")


# ---------------------------------------------------------------------------
# minimal baseline encoder (fixtures / round-trip tests)
# ---------------------------------------------------------------------------

# fixed-length canonical tables: 12 DC symbols at 5 bits, 176 AC symbols
# at 8 bits — valid (incomplete) prefix codes, written verbatim to DHT.
# s=0 rows cover EOB0..EOB14 (progressive EOB runs) plus ZRL (0xF0).
_DC_BITS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [r << 4 for r in range(16)]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]


def _encode_map(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    return {sym: (ln, code) for (ln, code), sym in _build_huffman(bits, vals).items()}


_DC_ENC = _encode_map(_DC_BITS, _DC_VALS)
_AC_ENC = _encode_map(_AC_BITS, _AC_SYMBOLS)


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                    self.out.append(0x00)
                self.acc = 0
                self.nacc = 0

    def flush(self) -> None:
        if self.nacc:
            self.write((1 << (8 - self.nacc)) - 1, 8 - self.nacc)  # 1-pad


def _encode_block(w: _BitWriter, block: np.ndarray, pred: int) -> int:
    """FDCT + quant(1) + zigzag + Huffman-encode one 8x8 block; returns
    the new DC predictor."""
    coef = _T @ (block - 128.0) @ _T.T
    q = np.round(coef).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = int(abs(diff)).bit_length()
    ln, code = _DC_ENC[s]
    w.write(code, ln)
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        w.write(v, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            ln, code = _AC_ENC[0xF0]
            w.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = _AC_ENC[(run << 4) | s]
        w.write(code, ln)
        vv = v if v >= 0 else v + (1 << s) - 1
        w.write(vv, s)
        run = 0
    if last_nz < 63:
        ln, code = _AC_ENC[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (bh - h % bh) % bh
    pw = (bw - w % bw) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _prep_planes(pixels: np.ndarray, subsampling: str):
    """Shared color-transform + subsample + pad-to-MCU-grid front half of
    both writers. Returns (h, w, samp, planes, mcus_x, mcus_y)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
    else:
        px = pixels.astype(np.float64)
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        elif subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        _pad_to(p, mcus_y * vs * 8, mcus_x * hs * 8)[: mcus_y * vs * 8, : mcus_x * hs * 8]
        for p, (hs, vs) in zip(planes, samp)
    ]
    return h, w, samp, planes, mcus_x, mcus_y


def encode_jpeg(
    pixels: np.ndarray, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Baseline JPEG writer: (h, w) gray or (h, w, 3) RGB uint8.
    All-ones quant tables (near-lossless), 4:4:4 or 4:2:0."""
    h, w, samp, planes, mcus_x, mcus_y = _prep_planes(pixels, subsampling)
    out = bytearray(b"\xff\xd8")
    # DQT: one all-ones 8-bit table, id 0
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    # SOF0
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(samp):
        sof += struct.pack(">BBB", ci + 1, (hs << 4) | vs, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC id 0 + AC id 0
    dht = bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
    dht += bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMBOLS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    writer = _BitWriter()
    preds = [0] * nc
    total_mcus = mcus_x * mcus_y
    rst = 0
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            writer = _BitWriter()
            preds = [0] * nc
        my, mx = divmod(mcu, mcus_x)
        for ci, (hs, vs) in enumerate(samp):
            for by in range(vs):
                for bx in range(hs):
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    block = planes[ci][y0 : y0 + 8, x0 : x0 + 8]
                    preds[ci] = _encode_block(writer, block, preds[ci])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2 fixtures: spectral selection + successive approx)
# ---------------------------------------------------------------------------


def _sym(w: _BitWriter, enc: dict, sym: int) -> None:
    ln, code = enc[sym]
    w.write(code, ln)


def _amp(w: _BitWriter, v: int, s: int) -> None:
    w.write(v if v >= 0 else v + (1 << s) - 1, s)


class _ScanWriter:
    """One scan's entropy stream: per-restart-interval segments joined
    with RSTn markers, each segment 1-padded to a byte boundary."""

    def __init__(self) -> None:
        self.chunks: list[bytes] = []
        self.w = _BitWriter()
        self.rst = 0

    def restart(self) -> None:
        self.w.flush()
        self.chunks.append(bytes(self.w.out))
        self.chunks.append(bytes([0xFF, 0xD0 + (self.rst & 7)]))
        self.rst += 1
        self.w = _BitWriter()

    def done(self) -> bytes:
        self.w.flush()
        self.chunks.append(bytes(self.w.out))
        return b"".join(self.chunks)


def _plane_coefs(plane: np.ndarray) -> np.ndarray:
    """FDCT + quant(1) every 8x8 block of a padded plane; returns
    (by, bx, 64) int64 in ZIGZAG order (index k = zigzag position k)."""
    hh, ww = plane.shape
    by, bx = hh // 8, ww // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    q = np.round(np.matmul(np.matmul(_T, blocks - 128.0), _T.T)).astype(np.int64)
    return q.reshape(by, bx, 64)[..., ZIGZAG]


def _pt_ac(v: int, al: int) -> int:
    """AC point transform (T.81 G.1.2.1): magnitude shift, sign kept."""
    return -((-v) >> al) if v < 0 else v >> al


def _emit_dc_first(coefs, samp, mcus_x, mcus_y, al, ri) -> bytes:
    """First DC scan: Huffman-coded diffs of the point-transformed DC,
    MCU-interleaved across all components (T.81 G.1.2.1)."""
    sw = _ScanWriter()
    preds = [0] * len(samp)
    for mcu in range(mcus_x * mcus_y):
        if ri and mcu and mcu % ri == 0:
            sw.restart()
            preds = [0] * len(samp)
        my, mx = divmod(mcu, mcus_x)
        for ci, (hs, vs) in enumerate(samp):
            for by in range(vs):
                for bx in range(hs):
                    v = int(coefs[ci][my * vs + by, mx * hs + bx, 0]) >> al
                    diff = v - preds[ci]
                    preds[ci] = v
                    s = abs(diff).bit_length()
                    _sym(sw.w, _DC_ENC, s)
                    if s:
                        _amp(sw.w, diff, s)
    return sw.done()


def _emit_dc_refine(coefs, samp, mcus_x, mcus_y, al, ri) -> bytes:
    """DC refinement scan: one raw bit (bit ``al`` of the DC) per block,
    same interleaved order as the first scan (T.81 G.1.2.1)."""
    sw = _ScanWriter()
    for mcu in range(mcus_x * mcus_y):
        if ri and mcu and mcu % ri == 0:
            sw.restart()
        my, mx = divmod(mcu, mcus_x)
        for ci, (hs, vs) in enumerate(samp):
            for by in range(vs):
                for bx in range(hs):
                    v = int(coefs[ci][my * vs + by, mx * hs + bx, 0])
                    sw.w.write((v >> al) & 1, 1)
    return sw.done()


_MAX_EOBRUN = 32767  # EOB14 + 14 extra bits (r=15 is ZRL, not EOB15)


def _emit_ac_first(comp_coefs, own_by, own_bx, ss, se, al, ri) -> bytes:
    """First AC scan of one component/band: zero-runs + amplitudes with
    cross-block EOB runs (T.81 G.1.2.2)."""
    sw = _ScanWriter()
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            _sym(sw.w, _AC_ENC, r << 4)
            if r:
                sw.w.write(eobrun - (1 << r), r)
            eobrun = 0

    for b in range(own_by * own_bx):
        if ri and b and b % ri == 0:
            flush_eob()
            sw.restart()
        zz = comp_coefs[b // own_bx, b % own_bx]
        tv = [_pt_ac(int(zz[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(tv) if v]
        if not nz:
            eobrun += 1
            if eobrun == _MAX_EOBRUN:
                flush_eob()
            continue
        flush_eob()
        last = nz[-1]
        run = 0
        for i in range(last + 1):
            v = tv[i]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                _sym(sw.w, _AC_ENC, 0xF0)
                run -= 16
            s = abs(v).bit_length()
            _sym(sw.w, _AC_ENC, (run << 4) | s)
            _amp(sw.w, v, s)
            run = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == _MAX_EOBRUN:
                flush_eob()
    flush_eob()
    return sw.done()


def _emit_ac_refine(comp_coefs, own_by, own_bx, ss, se, al, ri) -> bytes:
    """AC successive-approximation refinement (T.81 G.1.2.3, the
    jcphuff algorithm): newly-significant coefficients are coded as
    (run<<4)|1 + sign; already-significant coefficients crossed since
    the last emitted symbol contribute buffered correction bits emitted
    right after that symbol; blocks with nothing new fold into EOB runs
    whose correction bits ride behind the EOBn symbol."""
    sw = _ScanWriter()
    eobrun = 0
    pend: list[int] = []  # correction bits owed by pending EOB-run blocks

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            _sym(sw.w, _AC_ENC, r << 4)
            if r:
                sw.w.write(eobrun - (1 << r), r)
            eobrun = 0
            for bit in pend:
                sw.w.write(bit, 1)
            pend.clear()

    for b in range(own_by * own_bx):
        if ri and b and b % ri == 0:
            flush_eob()
            sw.restart()
        zz = comp_coefs[b // own_bx, b % own_bx]
        tv = [_pt_ac(int(zz[k]), al) for k in range(ss, se + 1)]
        newly = [i for i, v in enumerate(tv) if abs(v) == 1]
        eobpos = newly[-1] if newly else -1
        cur: list[int] = []  # correction bits since the last symbol
        r = 0
        for i, v in enumerate(tv):
            a = abs(v)
            if a == 0:
                r += 1
                continue
            # ZRLs are only real (not folded into the EOB run) while a
            # newly-significant coefficient still lies ahead
            while r > 15 and i <= eobpos:
                flush_eob()
                _sym(sw.w, _AC_ENC, 0xF0)
                r -= 16
                for bit in cur:
                    sw.w.write(bit, 1)
                cur = []
            if a > 1:
                cur.append(a & 1)
                continue
            flush_eob()
            _sym(sw.w, _AC_ENC, (r << 4) | 1)
            sw.w.write(1 if v > 0 else 0, 1)
            for bit in cur:
                sw.w.write(bit, 1)
            cur = []
            r = 0
        if r > 0 or cur:
            eobrun += 1
            pend.extend(cur)
            if eobrun == _MAX_EOBRUN:
                flush_eob()
    flush_eob()
    return sw.done()


def _sos_header(comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
    sos = bytes([len(comps)])
    for cid, td, ta in comps:
        sos += bytes([cid, (td << 4) | ta])
    sos += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos


def encode_jpeg_progressive(
    pixels: np.ndarray,
    subsampling: str = "444",
    restart_interval: int = 0,
    successive: bool = False,
    bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """Progressive (SOF2) JPEG writer: (h, w) gray or (h, w, 3) RGB
    uint8, all-ones quant. Scan script: interleaved DC first scan, then
    per-component AC first scans over ``bands``; with
    ``successive=True`` the first scans carry Al=1 and matching DC/AC
    refinement scans (Ah=1, Al=0) follow — exercising every decoder
    path in ``_ProgState``."""
    for ss, se in bands:
        if not (1 <= ss <= se <= 63):
            raise ValueError(f"bad spectral band ({ss}, {se})")
    h, w, samp, planes, mcus_x, mcus_y = _prep_planes(pixels, subsampling)
    coefs = [_plane_coefs(p) for p in planes]
    nc = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    own = []  # per-component own block grid (AC scans run over this)
    for hs, vs in samp:
        comp_w = (w * hs + hmax - 1) // hmax
        comp_h = (h * vs + vmax - 1) // vmax
        own.append(((comp_h + 7) // 8, (comp_w + 7) // 8))

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hs, vs) in enumerate(samp):
        sof += struct.pack(">BBB", ci + 1, (hs << 4) | vs, 0)
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(_DC_BITS) + _DC_VALS
    dht += bytes([0x10]) + bytes(_AC_BITS) + _AC_SYMBOLS
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    al1 = 1 if successive else 0
    all_comps = [(ci + 1, 0, 0) for ci in range(nc)]
    out += _sos_header(all_comps, 0, 0, 0, al1)
    out += _emit_dc_first(coefs, samp, mcus_x, mcus_y, al1, restart_interval)
    for ci in range(nc):
        for ss, se in bands:
            out += _sos_header([(ci + 1, 0, 0)], ss, se, 0, al1)
            out += _emit_ac_first(
                coefs[ci], own[ci][0], own[ci][1], ss, se, al1, restart_interval
            )
    if successive:
        out += _sos_header(all_comps, 0, 0, 1, 0)
        out += _emit_dc_refine(coefs, samp, mcus_x, mcus_y, 0, restart_interval)
        for ci in range(nc):
            for ss, se in bands:
                out += _sos_header([(ci + 1, 0, 0)], ss, se, 1, 0)
                out += _emit_ac_refine(
                    coefs[ci], own[ci][0], own[ci][1], ss, se, 0, restart_interval
                )
    out += b"\xff\xd9"
    return bytes(out)
