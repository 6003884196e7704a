"""JFIF (JPEG) codec -- numpy + stdlib only, no third-party image
libraries (none are installed in this container).

Closes the image-codec stubs in the multimodal path
(multimodal.extract_features / resize_images): baseline sequential
AND progressive DCT JPEGs -- together virtually all crawl images --
decode for real; only arithmetic-coded/lossless variants remain in
the documented stub slot.

Decoder coverage: baseline sequential (SOF0) and progressive (SOF2,
T.81 Annex G: spectral selection, successive approximation for DC and
AC, EOB runs, interleaved DC / single-component AC scans), 8-bit, 1
or 3 components, any sampling factors in {1, 2} (4:4:4, 4:2:2,
4:2:0), byte-stuffed entropy data, restart markers (DRI), multiple
DQT/DHT segments. Chroma upsampling is nearest-neighbor replication
(the libjpeg "fancy upsampling off" behavior) -- deterministic and
exactly invertible for the 4:4:4 fixtures the tests round-trip
per-pixel.

Encoder (test/fixture side): baseline sequential or progressive
(``progressive=True``; libjpeg's standard 10-scan script by default,
custom scan scripts via ``scans``), 4:4:4 or 4:2:0, Annex-K standard
Huffman tables (plus a flat custom AC table for progressive scans --
Annex K has no EOBn symbols), caller-supplied quality. Progressive
and baseline encode the SAME quantized coefficients, so their decodes
are bit-identical -- the per-pixel round-trip tests pin exactly that.

Everything is built inside `jpeg_codec_kernel()` and shipped to Spark
workers BY VALUE (cloudpickle serializes nested functions): executors
do not have this repo on their PYTHONPATH, so the kernel must not
reference module globals (same discipline as multimodal's
_png_codec_kernel / _wav_codec_kernel).

Reference parity note: the reference dashboard has no image pipeline
at all (its media handling is browser-side); this module belongs to
the training-data-pipeline extension surface.
"""

from __future__ import annotations


def jpeg_codec_kernel():
    """Build (decode, encode) as self-contained closures.

    decode(bytes) -> (H, W, 3) uint8 RGB array (grayscale replicated);
        handles baseline (SOF0) and progressive (SOF2) streams
    encode(img, quality=95, subsample=False, restart_interval=0,
           progressive=False, scans=None) -> JFIF bytes
        (img: (H, W, 3) uint8; quality 1..100, 100 = all-ones tables;
         subsample=True -> 4:2:0, else 4:4:4; progressive=True emits
         SOF2 with the default 10-scan script or a custom `scans`
         list of (kind, comp_indices, ss, se, ah, al) tuples)
    """
    import struct

    import numpy as np

    # ---- shared constants -------------------------------------------------
    ZIGZAG = np.array(
        [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
        ],
        dtype=np.int32,
    )
    UNZIGZAG = np.argsort(ZIGZAG)

    # 2-D DCT as a matrix sandwich: F = D @ B @ D.T, B = D.T @ F @ D
    k = np.arange(8)
    D = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    D[0, :] = np.sqrt(1 / 8)

    # Annex K Table K.1 / K.2 base quantization tables (natural order)
    QL_BASE = np.array(
        [
            16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
            14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
            18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
            49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
        ],
        dtype=np.int32,
    )
    QC_BASE = np.array(
        [
            17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
            24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        ],
        dtype=np.int32,
    )

    # Annex K standard Huffman tables: (bits[1..16], values)
    DC_L = (
        [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    DC_C = (
        [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)),
    )
    AC_L = (
        [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
        [
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
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ],
    )
    AC_C = (
        [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
        [
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
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ],
    )

    def build_codes(bits, values):
        """Canonical Huffman: {symbol: (code, length)}."""
        codes, code, idx = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[values[idx]] = (code, length)
                code += 1
                idx += 1
            code <<= 1
        return codes

    def build_lut(bits, values):
        """Decoder lookup: {(length, code): symbol}."""
        lut, code, idx = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lut[(length, code)] = values[idx]
                code += 1
                idx += 1
            code <<= 1
        return lut

    # ---- decoder ----------------------------------------------------------
    class _BitReader:
        """Entropy-segment bit reader: un-stuffs FF00, stops at markers."""

        def __init__(self, data, pos):
            self.data = data
            self.pos = pos
            self.bits = 0
            self.nbits = 0
            self.marker = None  # restart/terminating marker encountered

        def _fill(self):
            d = self.data
            while self.nbits <= 24:
                if self.pos >= len(d):
                    self.bits = (self.bits << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                b = d[self.pos]
                if b == 0xFF:
                    nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                    if nxt == 0x00:
                        self.pos += 2
                    else:
                        # real marker: pad with zero bits, remember it
                        self.marker = 0xFF00 | nxt
                        self.bits = (self.bits << 8) & 0xFFFFFFFF
                        self.nbits += 8
                        continue
                else:
                    self.pos += 1
                self.bits = ((self.bits << 8) | b) & 0xFFFFFFFF
                self.nbits += 8

        def read(self, n):
            if n == 0:
                return 0
            if self.nbits < n:
                self._fill()
            v = (self.bits >> (self.nbits - n)) & ((1 << n) - 1)
            self.nbits -= n
            return v

        def huff(self, lut):
            code = 0
            for length in range(1, 17):
                code = (code << 1) | self.read(1)
                sym = lut.get((length, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid JPEG Huffman code")

        def align_restart(self):
            """Byte-align and consume an RSTn marker in the raw stream."""
            self.bits = 0
            self.nbits = 0
            self.marker = None
            d = self.data
            # skip to the marker (decoder may have padded past it)
            while self.pos + 1 < len(d):
                if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                    self.pos += 2
                    return
                self.pos += 1
            raise ValueError("truncated JPEG (missing restart marker)")

    def extend(v, s):
        """JPEG EXTEND: s-bit magnitude v -> signed value."""
        return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v

    def decode(data):
        """Public decode: malformed input ALWAYS fails with the
        documented ValueError (or NotImplementedError for non-baseline
        frames) -- raw struct/index/key errors from corrupt segment
        tables are normalized at this boundary (pinned by the fuzz
        test: SOI-signed garbage, truncations, bit flips)."""
        try:
            return _decode(data)
        except (ValueError, NotImplementedError):
            raise
        except Exception as e:
            raise ValueError(
                f"malformed JPEG ({type(e).__name__}: {e})"
            ) from e

    def _decode(data):
        b = bytes(data)
        if len(b) < 4 or b[0:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        qt = {}  # Tq -> natural-order int32[64]
        huff_dc, huff_ac = {}, {}
        comps = None  # list of dicts: id, h, v, tq (SOF order)
        H = W = 0
        restart_interval = 0
        progressive = False
        pstate = None  # progressive coefficient state, built at first SOS
        pos = 2
        while pos + 4 <= len(b):
            if b[pos] != 0xFF:
                raise ValueError("bad JPEG marker stream")
            marker = b[pos + 1]
            if marker == 0xD8:  # stray SOI
                pos += 2
                continue
            if marker == 0xD9:  # EOI: progressive frames finish here
                break
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            seg = b[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    i += 1
                    if pq == 0:
                        tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                            np.int32
                        )
                        i += 64
                    else:
                        tbl = (
                            np.frombuffer(seg[i : i + 128], dtype=">u2")
                            .astype(np.int32)
                        )
                        i += 128
                    qt[tq] = tbl  # kept in ZIGZAG order (as stored)
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                progressive = marker == 0xC2
                _prec, H, W, nc = struct.unpack_from(">BHHB", seg, 0)
                comps = []
                for c in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                    )
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"unsupported JPEG frame (SOF{marker - 0xC0}) -- "
                    "baseline sequential (SOF0) and progressive (SOF2) "
                    "are implemented"
                )
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    bits = list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    values = list(seg[i + 17 : i + 17 + n])
                    (huff_dc if tc == 0 else huff_ac)[th] = build_lut(bits, values)
                    i += 17 + n
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:  # SOS -> entropy data follows
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cid, tdta = struct.unpack_from(">BB", seg, 1 + 2 * c)
                    ci = next(
                        i for i, cc in enumerate(comps) if cc["id"] == cid
                    )
                    scan.append(
                        {**comps[ci], "ci": ci,
                         "dc": tdta >> 4, "ac": tdta & 0x0F}
                    )
                if not progressive:
                    return _decode_scan(
                        b, pos + 2 + seglen, scan, qt, huff_dc, huff_ac,
                        H, W, restart_interval,
                    )
                ss, se, ahal = struct.unpack_from(
                    ">BBB", seg, 1 + 2 * ns
                )
                if pstate is None:
                    pstate = _init_progressive(comps, H, W)
                pos = _progressive_scan(
                    b, pos + 2 + seglen, scan, pstate,
                    huff_dc, huff_ac, ss, se, ahal >> 4, ahal & 0x0F,
                    restart_interval,
                )
                continue
            # APPn / COM / others: skip
            pos += 2 + seglen
        if progressive and pstate is not None:
            return _assemble_progressive(pstate, comps, qt, H, W)
        raise ValueError("truncated JPEG (no SOS)")

    def _init_progressive(comps, H, W):
        """Per-component coefficient planes (zigzag order), sized to
        the MCU-padded grid so interleaved DC scans fit; also the real
        (unpadded) block grid non-interleaved scans iterate."""
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcux = -(-W // (8 * hmax))
        mcuy = -(-H // (8 * vmax))
        state = {
            "hmax": hmax, "vmax": vmax, "mcux": mcux, "mcuy": mcuy,
            "coef": [], "grid": [],
        }
        for c in comps:
            cw = -(-(W * c["h"]) // hmax)
            ch = -(-(H * c["v"]) // vmax)
            state["coef"].append(
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
            )
            state["grid"].append((-(-ch // 8), -(-cw // 8)))
        return state

    def _next_marker(b, p):
        """Position of the next real (non-stuffed, non-restart) marker
        at or after p -- where the post-scan segment loop resumes."""
        while p + 1 < len(b):
            if (
                b[p] == 0xFF
                and b[p + 1] != 0x00
                and not (0xD0 <= b[p + 1] <= 0xD7)
            ):
                return p
            p += 1
        return len(b)

    def _progressive_scan(
        b, pos, scan, state, huff_dc, huff_ac, ss, se, ah, al, dri
    ):
        """One SOS of a progressive frame: updates the coefficient
        planes in place, returns the stream position of the next
        marker. T.81 Annex G semantics: DC scans may be interleaved
        (se == 0); AC scans are single-component with spectral band
        [ss, se] and successive-approximation bit position al (ah = 0
        on the first pass, ah = al + 1 on refinements)."""
        reader = _BitReader(b, pos)
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan with se != 0")
            _dc_scan(reader, scan, state, ah, al, dri, huff_dc)
        else:
            if len(scan) != 1:
                raise ValueError("progressive AC scan must be single-component")
            _ac_scan(reader, scan[0], state, ss, se, ah, al, dri, huff_ac)
        return _next_marker(b, reader.pos)

    def _dc_scan(reader, scan, state, ah, al, dri, huff_dc):
        interleaved = len(scan) > 1
        if interleaved:
            nx, ny = state["mcux"], state["mcuy"]
        else:
            ny, nx = state["grid"][scan[0]["ci"]]
        pred = [0] * len(scan)
        mcu_i = 0
        for my in range(ny):
            for mx in range(nx):
                if dri and mcu_i and mcu_i % dri == 0:
                    reader.align_restart()
                    pred = [0] * len(scan)
                for si, c in enumerate(scan):
                    coef = state["coef"][c["ci"]]
                    blocks = (
                        [(my * c["v"] + by, mx * c["h"] + bx)
                         for by in range(c["v"]) for bx in range(c["h"])]
                        if interleaved
                        else [(my, mx)]
                    )
                    for by, bx in blocks:
                        if ah == 0:
                            s = reader.huff(huff_dc[c["dc"]])
                            pred[si] += extend(reader.read(s), s)
                            coef[by, bx, 0] = pred[si] << al
                        elif reader.read(1):
                            coef[by, bx, 0] |= 1 << al
                mcu_i += 1

    def _ac_scan(reader, c, state, ss, se, ah, al, dri, huff_ac):
        coef = state["coef"][c["ci"]]
        bh, bw = state["grid"][c["ci"]]
        ac_lut = huff_ac[c["ac"]]
        eobrun = 0
        blk_i = 0
        for by in range(bh):
            for bx in range(bw):
                if dri and blk_i and blk_i % dri == 0:
                    reader.align_restart()
                    eobrun = 0
                zz = coef[by, bx]
                if ah == 0:
                    eobrun = _ac_first_block(
                        reader, ac_lut, zz, ss, se, al, eobrun
                    )
                else:
                    eobrun = _ac_refine_block(
                        reader, ac_lut, zz, ss, se, al, eobrun
                    )
                blk_i += 1

    def _ac_first_block(reader, ac_lut, zz, ss, se, al, eobrun):
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = reader.huff(ac_lut)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                return eobrun
            k += r
            if k > se:
                raise ValueError("JPEG AC band overflow")
            zz[k] = extend(reader.read(s), s) << al
            k += 1
        return 0

    def _ac_refine_block(reader, ac_lut, zz, ss, se, al, eobrun):
        # T.81 G.1.2.3 correction-bit pass (the libjpeg refinement
        # control flow, re-derived from the spec)
        p1, m1 = 1 << al, -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.huff(ac_lut)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError("bad progressive AC refinement")
                    newval = p1 if reader.read(1) else m1
                elif r != 15:
                    # EOBn COUNTS THE CURRENT BLOCK: even EOB0 must
                    # run the correction pass below over k..se before
                    # the run is spent (libjpeg's EOBRUN = 1 << r)
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read(r)
                    break  # remaining band refined in the EOB pass
                # advance past r zero-history coefficients, emitting a
                # correction bit for every already-nonzero one
                while k <= se:
                    if zz[k] != 0:
                        if reader.read(1) and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:
                if zz[k] != 0 and reader.read(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    def _assemble_progressive(state, comps, qt, H, W):
        """Dequantize + IDCT every (padded-grid) block, stitch planes,
        then reuse the baseline upsample/color tail."""
        planes = []
        for ci, c in enumerate(comps):
            cz = state["coef"][ci].astype(np.float64)
            deq = cz * qt[c["tq"]][None, None, :]
            blocks = deq[:, :, UNZIGZAG].reshape(cz.shape[0], cz.shape[1], 8, 8)
            pix = np.einsum("ij,yxjk,kl->yxil", D.T, blocks, D) + 128.0
            planes.append(
                pix.transpose(0, 2, 1, 3).reshape(
                    cz.shape[0] * 8, cz.shape[1] * 8
                )
            )
        return _compose(planes, comps, state["hmax"], state["vmax"], H, W)

    def _decode_scan(b, pos, scan, qt, huff_dc, huff_ac, H, W, dri):
        hmax = max(c["h"] for c in scan)
        vmax = max(c["v"] for c in scan)
        mcux = -(-W // (8 * hmax))
        mcuy = -(-H // (8 * vmax))
        planes = []
        for c in scan:
            pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
            planes.append(np.zeros((ph, pw), dtype=np.float64))
        reader = _BitReader(b, pos)
        pred = [0] * len(scan)
        mcu_i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcu_i and mcu_i % dri == 0:
                    reader.align_restart()
                    pred = [0] * len(scan)
                for ci, c in enumerate(scan):
                    dc_lut, ac_lut = huff_dc[c["dc"]], huff_ac[c["ac"]]
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coeffs = np.zeros(64, dtype=np.int32)
                            s = reader.huff(dc_lut)
                            diff = extend(reader.read(s), s)
                            pred[ci] += diff
                            coeffs[0] = pred[ci]
                            kk = 1
                            while kk < 64:
                                rs = reader.huff(ac_lut)
                                r, s = rs >> 4, rs & 0x0F
                                if s == 0:
                                    if r == 15:  # ZRL
                                        kk += 16
                                        continue
                                    break  # EOB
                                kk += r
                                if kk > 63:
                                    raise ValueError("JPEG AC index overflow")
                                coeffs[kk] = extend(reader.read(s), s)
                                kk += 1
                            block = (coeffs * q)[UNZIGZAG].reshape(8, 8)
                            pix = D.T @ block @ D + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
                mcu_i += 1
        return _compose(planes, scan, hmax, vmax, H, W)

    def _compose(planes, comps, hmax, vmax, H, W):
        """Upsample to full resolution (nearest replication), crop,
        color-convert -- shared by the baseline and progressive paths."""
        full = []
        for ci, c in enumerate(comps):
            p = planes[ci]
            if c["h"] != hmax or c["v"] != vmax:
                p = np.repeat(
                    np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0
                )
            full.append(p[:H, :W])
        if len(full) == 1:
            g = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
            return np.stack([g, g, g], axis=-1)
        Y, Cb, Cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = Y + 1.402 * Cr
        g = Y - 0.344136 * Cb - 0.714136 * Cr
        bl = Y + 1.772 * Cb
        rgb = np.stack([r, g, bl], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

    # ---- encoder ----------------------------------------------------------
    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.nacc = 0

        def write(self, code, length):
            self.acc = (self.acc << length) | code
            self.nacc += length
            while self.nacc >= 8:
                byte = (self.acc >> (self.nacc - 8)) & 0xFF
                self.out.append(byte)
                if byte == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.nacc -= 8
            self.acc &= (1 << self.nacc) - 1

        def flush(self):
            if self.nacc:
                pad = 8 - self.nacc
                self.write((1 << pad) - 1, pad)  # 1-pad per spec

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dht(tc, th, table):
        bits, values = table
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(values))

    def _quant_tables(quality):
        if quality >= 100:
            return np.ones(64, dtype=np.int32), np.ones(64, dtype=np.int32)
        scale = 5000 // quality if quality < 50 else 200 - 2 * quality
        ql = np.clip((QL_BASE * scale + 50) // 100, 1, 255)
        qc = np.clip((QC_BASE * scale + 50) // 100, 1, 255)
        return ql.astype(np.int32), qc.astype(np.int32)

    def _cat(v):
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    def _encode_block(w, block, q_nat, dc_codes, ac_codes, pred):
        coeffs = np.round((D @ (block - 128.0) @ D.T) / q_nat.reshape(8, 8))
        zz = coeffs.reshape(-1)[ZIGZAG].astype(np.int64)
        diff = int(zz[0]) - pred
        s = _cat(diff)
        code, ln = dc_codes[s]
        w.write(code, ln)
        if s:
            w.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        last = last_nz[-1] + 1 if len(last_nz) else 0
        for kk in range(1, last + 1):
            v = int(zz[kk])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                w.write(code, ln)
                run -= 16
            s = _cat(v)
            code, ln = ac_codes[(run << 4) | s]
            w.write(code, ln)
            w.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_codes[0x00]
            w.write(code, ln)
        return int(zz[0])

    def encode(
        img, quality=95, subsample=False, restart_interval=0,
        progressive=False, scans=None,
    ):
        img = np.asarray(img, dtype=np.float64)
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError("encode expects (H, W, 3) RGB")
        H, W = img.shape[:2]
        R, G, B = img[..., 0], img[..., 1], img[..., 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
        Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0
        ql, qc = _quant_tables(quality)
        ql_nat = np.zeros(64, dtype=np.int32)
        ql_nat[ZIGZAG] = ql
        qc_nat = np.zeros(64, dtype=np.int32)
        qc_nat[ZIGZAG] = qc
        hY = vY = 2 if subsample else 1
        mcux = -(-W // (8 * hY))
        mcuy = -(-H // (8 * vY))

        def pad(p, ph, pw):
            out = np.empty((ph, pw), dtype=np.float64)
            out[: p.shape[0], : p.shape[1]] = p
            out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
            out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
            return out

        Yp = pad(Y, mcuy * 8 * vY, mcux * 8 * hY)
        if subsample:
            # 2x2 box-average chroma (pad to even first)
            Cbp = pad(Cb, mcuy * 16, mcux * 16)
            Crp = pad(Cr, mcuy * 16, mcux * 16)
            Cbp = Cbp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
            Crp = Crp.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
        else:
            Cbp = pad(Cb, mcuy * 8, mcux * 8)
            Crp = pad(Cr, mcuy * 8, mcux * 8)

        if progressive:
            return _encode_progressive(
                (Yp, Cbp, Crp), ql, qc, ql_nat, qc_nat,
                H, W, hY, vY, mcux, mcuy, restart_interval,
                scans if scans is not None else _PROG_SCANS,
            )

        dc_l, dc_c = build_codes(*DC_L), build_codes(*DC_C)
        ac_l, ac_c = build_codes(*AC_L), build_codes(*AC_C)
        w = _BitWriter()
        pred = [0, 0, 0]
        mcu_i = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                    w.flush()
                    w.out += bytes(
                        [0xFF, 0xD0 + ((mcu_i // restart_interval - 1) % 8)]
                    )
                    pred = [0, 0, 0]
                mcu_i += 1
                for by in range(vY):
                    for bx in range(hY):
                        y0, x0 = (my * vY + by) * 8, (mx * hY + bx) * 8
                        pred[0] = _encode_block(
                            w, Yp[y0 : y0 + 8, x0 : x0 + 8], ql_nat,
                            dc_l, ac_l, pred[0],
                        )
                for ci, plane in ((1, Cbp), (2, Crp)):
                    y0, x0 = my * 8, mx * 8
                    pred[ci] = _encode_block(
                        w, plane[y0 : y0 + 8, x0 : x0 + 8], qc_nat,
                        dc_c, ac_c, pred[ci],
                    )
        w.flush()

        out = bytearray(b"\xff\xd8")
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += seg(0xDB, bytes([0x00]) + bytes(ql.tolist()))
        out += seg(0xDB, bytes([0x01]) + bytes(qc.tolist()))
        out += seg(
            0xC0,
            struct.pack(">BHHB", 8, H, W, 3)
            + bytes([1, hY << 4 | vY, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        out += dht(0, 0, DC_L) + dht(1, 0, AC_L)
        out += dht(0, 1, DC_C) + dht(1, 1, AC_C)
        if restart_interval:
            out += seg(0xDD, struct.pack(">H", restart_interval))
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        out += w.out
        out += b"\xff\xd9"
        return bytes(out)

    # ---- progressive encoder (T.81 Annex G) -------------------------------
    # Flat custom AC Huffman table: the Annex K baseline AC tables have
    # no EOBn (n > 0) symbols, which progressive AC scans need for
    # multi-block end-of-band runs. 255 nine-bit codes + 1 ten-bit code
    # cover all 256 RS values with a valid canonical table (the all-1s
    # prefix stays reserved). Costs compression, not correctness -- the
    # decoder round-trip is what this encoder exists for.
    PROG_AC = ([0] * 8 + [255, 1] + [0] * 6, list(range(256)))

    # libjpeg's standard 10-scan script (DC with one successive-
    # approximation level, luma AC split into two spectral bands, all
    # AC refined 2 -> 1 -> 0): exercises every progressive decode path
    _PROG_SCANS = [
        ("dc_first", (0, 1, 2), 0, 0, 0, 1),
        ("ac_first", (0,), 1, 5, 0, 2),
        ("ac_first", (2,), 1, 63, 0, 1),
        ("ac_first", (1,), 1, 63, 0, 1),
        ("ac_first", (0,), 6, 63, 0, 2),
        ("ac_refine", (0,), 1, 63, 2, 1),
        ("dc_refine", (0, 1, 2), 0, 0, 1, 0),
        ("ac_refine", (2,), 1, 63, 1, 0),
        ("ac_refine", (1,), 1, 63, 1, 0),
        ("ac_refine", (0,), 1, 63, 1, 0),
    ]

    def _zz_blocks(plane, q_nat):
        """Quantized zigzag coefficients for every 8x8 block of a
        padded plane: int64[bh, bw, 64] (same rounding as the baseline
        `_encode_block`)."""
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        coeffs = np.round(
            np.einsum("ij,yxjk,kl->yxil", D, blocks, D.T)
            / q_nat.reshape(8, 8)[None, None]
        ).astype(np.int64)
        return coeffs.reshape(bh, bw, 64)[:, :, ZIGZAG]

    def _encode_progressive(
        planes, ql, qc, ql_nat, qc_nat, H, W, hY, vY, mcux, mcuy, dri, script
    ):
        cz = [
            _zz_blocks(planes[0], ql_nat),
            _zz_blocks(planes[1], qc_nat),
            _zz_blocks(planes[2], qc_nat),
        ]
        comps_hv = [(hY, vY), (1, 1), (1, 1)]
        # real (unpadded) per-component block grids for AC scans
        grids = []
        for h, v in comps_hv:
            cw = -(-(W * h) // hY)
            ch = -(-(H * v) // vY)
            grids.append((-(-ch // 8), -(-cw // 8)))
        dc_codes = [build_codes(*DC_L), build_codes(*DC_C), build_codes(*DC_C)]
        ac_codes = build_codes(*PROG_AC)

        def emit_rst(w, n):
            w.flush()
            w.out += bytes([0xFF, 0xD0 + (n % 8)])

        def dc_bits(w, codes, diff):
            s = _cat(diff)
            code, ln = codes[s]
            w.write(code, ln)
            if s:
                w.write(diff if diff > 0 else diff + (1 << s) - 1, s)

        def scan_dc_first(w, cis, al):
            pred = [0] * len(cis)
            mcu_i = rst = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and mcu_i and mcu_i % dri == 0:
                        emit_rst(w, rst)
                        rst += 1
                        pred = [0] * len(cis)
                    for si, ci in enumerate(cis):
                        h, v = comps_hv[ci]
                        for by in range(v):
                            for bx in range(h):
                                dc = int(cz[ci][my * v + by, mx * h + bx, 0]) >> al
                                dc_bits(w, dc_codes[ci], dc - pred[si])
                                pred[si] = dc
                    mcu_i += 1

        def scan_dc_refine(w, cis, al):
            mcu_i = rst = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and mcu_i and mcu_i % dri == 0:
                        emit_rst(w, rst)
                        rst += 1
                    for ci in cis:
                        h, v = comps_hv[ci]
                        for by in range(v):
                            for bx in range(h):
                                w.write(
                                    (int(cz[ci][my * v + by, mx * h + bx, 0])
                                     >> al) & 1,
                                    1,
                                )
                    mcu_i += 1

        def scan_ac_first(w, ci, ss, se, al):
            bh, bw = grids[ci]
            state = {"eob": 0}

            def flush_eob():
                if state["eob"]:
                    rb = state["eob"].bit_length() - 1
                    code, ln = ac_codes[rb << 4]
                    w.write(code, ln)
                    if rb:
                        w.write(state["eob"] - (1 << rb), rb)
                    state["eob"] = 0

            blk = rst = 0
            for by in range(bh):
                for bx in range(bw):
                    if dri and blk and blk % dri == 0:
                        flush_eob()
                        emit_rst(w, rst)
                        rst += 1
                    zz = cz[ci][by, bx]
                    r = 0
                    for k in range(ss, se + 1):
                        t = int(zz[k])
                        t2 = (t if t >= 0 else -t) >> al
                        if t2 == 0:
                            r += 1
                            continue
                        flush_eob()
                        while r > 15:
                            code, ln = ac_codes[0xF0]
                            w.write(code, ln)
                            r -= 16
                        s = t2.bit_length()
                        code, ln = ac_codes[(r << 4) | s]
                        w.write(code, ln)
                        w.write(t2 if t > 0 else (1 << s) - 1 - t2, s)
                        r = 0
                    if r:
                        state["eob"] += 1
                        if state["eob"] == 0x7FFF:
                            flush_eob()
                    blk += 1
            flush_eob()

        def scan_ac_refine(w, ci, ss, se, al):
            bh, bw = grids[ci]
            state = {"eob": 0, "be": []}

            def flush_eob():
                if state["eob"]:
                    rb = state["eob"].bit_length() - 1
                    code, ln = ac_codes[rb << 4]
                    w.write(code, ln)
                    if rb:
                        w.write(state["eob"] - (1 << rb), rb)
                    for bit in state["be"]:
                        w.write(bit, 1)
                    state["eob"] = 0
                    state["be"] = []

            blk = rst = 0
            for by in range(bh):
                for bx in range(bw):
                    if dri and blk and blk % dri == 0:
                        flush_eob()
                        emit_rst(w, rst)
                        rst += 1
                    zz = cz[ci][by, bx]
                    absv = [
                        (int(zz[k]) if zz[k] >= 0 else -int(zz[k])) >> al
                        for k in range(ss, se + 1)
                    ]
                    eob_idx = ss - 1
                    for k in range(ss, se + 1):
                        if absv[k - ss] == 1:
                            eob_idx = k
                    r = 0
                    br = []
                    for k in range(ss, se + 1):
                        t = absv[k - ss]
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and k <= eob_idx:
                            flush_eob()
                            code, ln = ac_codes[0xF0]
                            w.write(code, ln)
                            r -= 16
                            for bit in br:
                                w.write(bit, 1)
                            br = []
                        if t > 1:  # history coefficient: correction bit
                            br.append(t & 1)
                            continue
                        flush_eob()
                        code, ln = ac_codes[(r << 4) | 1]
                        w.write(code, ln)
                        w.write(1 if int(zz[k]) > 0 else 0, 1)
                        for bit in br:
                            w.write(bit, 1)
                        br = []
                        r = 0
                    if r or br:
                        state["eob"] += 1
                        state["be"].extend(br)
                        if state["eob"] == 0x7FFF:
                            flush_eob()
                    blk += 1
            flush_eob()

        out = bytearray(b"\xff\xd8")
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += seg(0xDB, bytes([0x00]) + bytes(ql.tolist()))
        out += seg(0xDB, bytes([0x01]) + bytes(qc.tolist()))
        out += seg(
            0xC2,
            struct.pack(">BHHB", 8, H, W, 3)
            + bytes([1, hY << 4 | vY, 0, 2, 0x11, 1, 3, 0x11, 1]),
        )
        out += dht(0, 0, DC_L) + dht(0, 1, DC_C)
        out += dht(1, 0, PROG_AC) + dht(1, 1, PROG_AC)
        if dri:
            out += seg(0xDD, struct.pack(">H", dri))
        for kind, cis, ss, se, ah, al in script:
            body = bytes([len(cis)])
            for ci in cis:
                tbl = 0 if ci == 0 else 1
                body += bytes([ci + 1, (tbl << 4) | tbl])
            body += bytes([ss, se, (ah << 4) | al])
            out += seg(0xDA, body)
            w = _BitWriter()
            if kind == "dc_first":
                scan_dc_first(w, cis, al)
            elif kind == "dc_refine":
                scan_dc_refine(w, cis, al)
            elif kind == "ac_first":
                scan_ac_first(w, cis[0], ss, se, al)
            else:
                scan_ac_refine(w, cis[0], ss, se, al)
            w.flush()
            out += w.out
        out += b"\xff\xd9"
        return bytes(out)

    return decode, encode


def make_is_jpeg():
    """Signature sniff (by-value for workers): SOI + 0xFF marker."""

    def is_jpeg(payload) -> bool:
        b = bytes(payload[:3]) if payload is not None else b""
        return len(b) == 3 and b[0:2] == b"\xff\xd8" and b[2] == 0xFF

    return is_jpeg
