"""Pure-Python JPEG codec (ITU-T T.81, Huffman, 8-bit): baseline
sequential (SOF0) AND progressive (SOF2).

The environment ships no image codec libraries, and the multimodal
decode path refused to fake JPEG (operators/multimodal.py) — this
module closes that gap honestly: a real decoder for baseline JPEGs
(sequential Huffman, 8-bit; grayscale and interleaved YCbCr at any
sampling factors incl. 4:4:4 and 4:2:0; restart markers honored) and
progressive JPEGs (all four Annex G scan kinds — DC/AC, first/
refinement — with spectral selection, successive approximation, and
EOB-run coding; every scan accumulates into per-component coefficient
grids and one dequantize+IDCT runs at EOI, so both frame types share
every code path after entropy decoding). Matching encoders (baseline,
and a progressive one with the classic DC-first / banded-AC /
refinement scan script plus per-scan Huffman table builds) let the
round-trip tests prove correctness without any external codec or
fixture file: both encoders quantize through the same code, so a
progressive stream must decode to bit-identical pixels as the baseline
stream of the same image.

Everything is numpy float64 + integer bit twiddling — deterministic
across platforms. Arithmetic coding, lossless/hierarchical frames, and
12-bit precision raise NotImplementedError: stating the supported
envelope beats decoding them wrong.

All table constants below are the public interchange defaults from the
JPEG specification (ITU-T T.81 Annex K): the zigzag scan order, the
example luminance/chrominance quantization matrices, and the typical
Huffman tables.
"""

from __future__ import annotations



def _make_codec():
    """Build the codec as NESTED defs: their qualnames are not
    importable, so cloudpickle serializes them BY VALUE and executor
    Python workers never need this package on their sys.path — the
    closure rule operators/multimodal.py documents. Everything the two
    public functions touch (tables, DCT basis, bit I/O classes) lives
    in this closure and ships with them."""
    import numpy as np


    # Zigzag index -> natural (row-major) index, T.81 Figure A.6.
    ZIGZAG = np.array(
        [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
        ],
        dtype=np.int64,
    )

    # T.81 Annex K.1 example quantization tables (quality ~50), written
    # below in the spec's natural (row-major) layout for legibility and
    # permuted into ZIGZAG order at definition: everywhere this codec
    # handles a quant table — DQT bytes, encoder division, decoder
    # multiplication — the convention is zigzag order, matching the DQT
    # wire format, so the shipped constants must be zigzag too (a
    # natural-order table here would apply each step size to the wrong
    # frequency versus the documented standard tables).
    QUANT_LUMA = np.array(
        [
            16, 11, 10, 16, 24, 40, 51, 61,
            12, 12, 14, 19, 26, 58, 60, 55,
            14, 13, 16, 24, 40, 57, 69, 56,
            14, 17, 22, 29, 51, 87, 80, 62,
            18, 22, 37, 56, 68, 109, 103, 77,
            24, 35, 55, 64, 81, 104, 113, 92,
            49, 64, 78, 87, 103, 121, 120, 101,
            72, 92, 95, 98, 112, 100, 103, 99,
        ],
        dtype=np.int64,
    )[ZIGZAG]
    QUANT_CHROMA = np.array(
        [
            17, 18, 24, 47, 99, 99, 99, 99,
            18, 21, 26, 66, 99, 99, 99, 99,
            24, 26, 56, 99, 99, 99, 99, 99,
            47, 66, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99,
            99, 99, 99, 99, 99, 99, 99, 99,
        ],
        dtype=np.int64,
    )[ZIGZAG]

    # T.81 Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL).
    DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    DC_LUMA_VALS = list(range(12))
    DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
    DC_CHROMA_VALS = list(range(12))
    AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    AC_LUMA_VALS = [
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
    ]
    AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
    AC_CHROMA_VALS = [
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
    ]

    # 8x8 DCT-II basis: A[k, n] = c(k)/2 * cos((2n+1) k pi / 16).
    # Forward DCT of block B = A @ B @ A.T; inverse = A.T @ C @ A.
    _A = np.zeros((8, 8))
    for _k in range(8):
        _c = (1.0 / np.sqrt(2.0)) if _k == 0 else 1.0
        for _n in range(8):
            _A[_k, _n] = 0.5 * _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


    def _build_huffman_decoder(bits: list[int], vals: list[int]) -> dict:
        """Canonical Huffman: (code_length, code) -> symbol (T.81 C.2)."""
        table, code, i = {}, 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                table[(length, code)] = vals[i]
                code += 1
                i += 1
            code <<= 1
        return table


    def _build_huffman_encoder(bits: list[int], vals: list[int]) -> dict:
        """symbol -> (code_length, code)."""
        return {v: k for k, v in _build_huffman_decoder(bits, vals).items()}


    def _extend(v: int, s: int) -> int:
        """T.81 F.2.2.1 EXTEND: map the s received bits to a signed value."""
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


    class _BitReader:
        """MSB-first bit reader over entropy-coded data with 0xFF00
        byte-stuffing removal; stops at any other marker."""

        def __init__(self, data: bytes, pos: int):
            self.data = data
            self.pos = pos
            self.bitbuf = 0
            self.nbits = 0
            self.marker: int | None = None

        def _fill(self) -> None:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed FF
                else:
                    # a real marker: expose it, feed 0 bits (T.81 allows the
                    # decoder to pad past the end of a correctly-coded scan)
                    self.marker = nxt
                    b = 0
                    self.pos += 0
                    self.bitbuf = (self.bitbuf << 8) | b
                    self.nbits += 8
                    return
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

        def read_bit(self) -> int:
            if self.nbits == 0:
                self._fill()
            self.nbits -= 1
            return (self.bitbuf >> self.nbits) & 1

        def read_bits(self, n: int) -> int:
            v = 0
            for _ in range(n):
                v = (v << 1) | self.read_bit()
            return v

        def decode_symbol(self, table: dict) -> int:
            length, code = 0, 0
            while length < 16:
                code = (code << 1) | self.read_bit()
                length += 1
                sym = table.get((length, code))
                if sym is not None:
                    return sym
            raise ValueError("invalid Huffman code in entropy-coded segment")

        def align_and_expect_rst(self, n: int) -> None:
            """Byte-align and consume the RSTn marker (restart intervals)."""
            self.bitbuf = 0
            self.nbits = 0
            if (
                self.pos + 1 < len(self.data)
                and self.data[self.pos] == 0xFF
                and self.data[self.pos + 1] == 0xD0 + (n & 7)
            ):
                self.pos += 2
            else:
                raise ValueError(f"expected RST{n & 7} marker")


    def _next_marker(data: bytes, pos: int) -> tuple[int, int]:
        """Scan forward for the next marker (0xFF + non-stuffing byte),
        skipping entropy padding and 0xFF fill bytes; returns
        (marker, position after the marker)."""
        while pos < len(data) - 1:
            if data[pos] != 0xFF or data[pos + 1] in (0x00,):
                pos += 1
                continue
            if data[pos + 1] == 0xFF:  # fill byte
                pos += 1
                continue
            return data[pos + 1], pos + 2
        raise ValueError("ran off the end looking for a marker")

    def _frame_geometry(frame: dict) -> None:
        """Attach the block-grid geometry each scan needs: the
        MCU-aligned grid (interleaved scans) and the component's own
        ceil(samples/8) grid (non-interleaved scans, T.81 A.2.2 — it
        can be SMALLER than the MCU grid, whose extra blocks are
        inter-MCU padding never coded in a non-interleaved scan)."""
        w, h, comps = frame["w"], frame["h"], frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        frame["hmax"], frame["vmax"] = hmax, vmax
        frame["mcus_x"] = -(-w // (8 * hmax))
        frame["mcus_y"] = -(-h // (8 * vmax))
        for c in comps:
            cw = -(-(w * c["h"]) // hmax)
            ch = -(-(h * c["v"]) // vmax)
            c["bx"], c["by"] = -(-cw // 8), -(-ch // 8)
            c["bx_mcu"] = frame["mcus_x"] * c["h"]
            c["by_mcu"] = frame["mcus_y"] * c["v"]

    def _decode_scan_into(
        reader, frame, scan, spectral, huff_dc, huff_ac, restart_interval,
        coefs, progressive, eob_state,
    ) -> None:
        """Decode ONE scan's entropy-coded data into the per-component
        coefficient arrays (zigzag order). Handles all four progressive
        scan kinds (T.81 G.1.2: DC first/refine, AC first/refine with
        EOB runs) plus sequential scans (the baseline case: DC+AC in
        one pass), interleaved or single-component, with restart
        markers resetting predictors AND the EOB run."""
        Ss, Se, Ah, Al = spectral
        if progressive:
            # T.81 G.1: DC scans carry exactly band [0,0]; AC scans are
            # single-component and never include DC
            if Ss == 0 and Se != 0:
                raise ValueError(
                    f"progressive DC scan must have Se=0, got Se={Se}"
                )
            if Ss > 0 and len(scan) > 1:
                raise ValueError("progressive AC scans are single-component")
            if Ss > Se or Se > 63:
                raise ValueError(f"bad spectral band [{Ss},{Se}]")
        elif spectral != (0, 63, 0, 0):
            raise ValueError(
                f"sequential scan must cover [0,63] at full precision, "
                f"got {spectral}"
            )
        comps = frame["comps"]
        pred = {ci: 0 for ci, _dc, _ac in scan}
        rst = {"n": 0, "count": 0}
        eob_state["run"] = 0

        def maybe_restart():
            if (
                restart_interval
                and rst["count"]
                and rst["count"] % restart_interval == 0
            ):
                reader.align_and_expect_rst(rst["n"])
                rst["n"] = (rst["n"] + 1) & 7
                for ci in pred:
                    pred[ci] = 0
                eob_state["run"] = 0

        def decode_dc(block, ci, dc_tab):
            if Ah == 0:
                s = reader.decode_symbol(dc_tab)
                diff = _extend(reader.read_bits(s), s) if s else 0
                pred[ci] += diff
                block[0] = pred[ci] << Al
            else:  # refinement: one raw bit per block
                if reader.read_bit():
                    block[0] |= 1 << Al

        def decode_ac_first(block, ac_tab):
            if eob_state["run"] > 0:
                eob_state["run"] -= 1
                return
            k = Ss
            while k <= Se:
                rs = reader.decode_symbol(ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL: sixteen zeros
                        k += 16
                        continue
                    # EOBn: run of (1<<r)+extra all-done blocks,
                    # INCLUDING this one
                    eob_state["run"] = (1 << r) + (
                        reader.read_bits(r) if r else 0
                    ) - 1
                    return
                k += r
                if k > Se:
                    raise ValueError("AC run past the spectral band")
                block[k] = _extend(reader.read_bits(s), s) << Al
                k += 1

        def decode_ac_refine(block, ac_tab):
            # T.81 G.1.2.3: correction bits for already-nonzero
            # coefficients are interleaved with the runs that position
            # newly-nonzero ones
            p1, m1 = 1 << Al, -1 << Al
            k = Ss
            if eob_state["run"] == 0:
                while k <= Se:
                    rs = reader.decode_symbol(ac_tab)
                    r, s = rs >> 4, rs & 0xF
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eob_state["run"] = (1 << r) + (
                                reader.read_bits(r) if r else 0
                            )
                            break
                        # r == 15: ZRL — skip 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError(
                                "AC refinement symbol with size != 1"
                            )
                        newval = p1 if reader.read_bit() else m1
                    while k <= Se:
                        if block[k] != 0:
                            if reader.read_bit() and not (block[k] & p1):
                                block[k] += p1 if block[k] >= 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= Se:
                        block[k] = newval
                    k += 1
            if eob_state["run"] > 0:
                while k <= Se:
                    if block[k] != 0:
                        if reader.read_bit() and not (block[k] & p1):
                            block[k] += p1 if block[k] >= 0 else m1
                    k += 1
                eob_state["run"] -= 1

        def decode_sequential(block, ci, dc_tab, ac_tab):
            s = reader.decode_symbol(dc_tab)
            diff = _extend(reader.read_bits(s), s) if s else 0
            pred[ci] += diff
            block[0] = pred[ci]
            k = 1
            while k < 64:
                rs = reader.decode_symbol(ac_tab)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:  # ZRL: sixteen zeros
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                block[k] = _extend(reader.read_bits(s), s)
                k += 1

        def decode_block(block, ci, dc_tab, ac_tab):
            if not progressive:
                decode_sequential(block, ci, dc_tab, ac_tab)
            elif Ss == 0:
                decode_dc(block, ci, dc_tab)
            elif Ah == 0:
                decode_ac_first(block, ac_tab)
            else:
                decode_ac_refine(block, ac_tab)

        if len(scan) > 1:  # interleaved: iterate MCUs
            for my in range(frame["mcus_y"]):
                for mx in range(frame["mcus_x"]):
                    maybe_restart()
                    for ci, dc_tab, ac_tab in scan:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                decode_block(
                                    coefs[ci][my * c["v"] + by, mx * c["h"] + bx],
                                    ci, dc_tab, ac_tab,
                                )
                    rst["count"] += 1
        else:  # non-interleaved: iterate the component's own block grid
            ci, dc_tab, ac_tab = scan[0]
            c = comps[ci]
            for byi in range(c["by"]):
                for bxi in range(c["bx"]):
                    maybe_restart()
                    decode_block(coefs[ci][byi, bxi], ci, dc_tab, ac_tab)
                    rst["count"] += 1

    def _assemble_pixels(frame, coefs, quant) -> dict:
        """Dequantize + IDCT every component's coefficient grid and
        assemble the final image — one vectorized einsum per component
        instead of a per-block Python loop."""
        w, h, comps = frame["w"], frame["h"], frame["comps"]
        hmax, vmax = frame["hmax"], frame["vmax"]
        full = []
        for ci, c in enumerate(comps):
            cf = coefs[ci]  # (BY, BX, 64) zigzag-order int64
            by_n, bx_n = cf.shape[:2]
            deq = (cf * quant[c["tq"]]).astype(np.float64)
            spec = np.zeros((by_n, bx_n, 64), dtype=np.float64)
            spec[:, :, ZIGZAG] = deq
            spec = spec.reshape(by_n, bx_n, 8, 8)
            spatial = (
                np.einsum("ij,abjk,kl->abil", _A.T, spec, _A) + 128.0
            )
            p = spatial.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8)
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
            full.append(p[:h, :w])

        if len(comps) == 1:
            pixels = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
            pixels = pixels[:, :, None]
        elif len(comps) == 3:
            y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
            r = y + 1.402 * cr
            g = y - 0.344136 * cb - 0.714136 * cr
            b = y + 1.772 * cb
            pixels = np.clip(
                np.round(np.stack([r, g, b], axis=2)), 0, 255
            ).astype(np.uint8)
        else:
            raise NotImplementedError(f"{len(comps)}-component frames")

        return {
            "width": w,
            "height": h,
            "channels": pixels.shape[2],
            "maxval": 255,
            "pixels": pixels,
            "pixel_sum": int(pixels.astype(np.int64).sum()),
            "n_pixel_bytes": int(pixels.size),
        }

    def decode_baseline_jpeg(payload: bytes) -> dict:
        """Decode a baseline (SOF0) or progressive (SOF2) JPEG to
        pixels + metadata.

        Returns {"width", "height", "channels", "maxval", "pixels"
        (HxWxC uint8 ndarray, RGB for color), "pixel_sum",
        "n_pixel_bytes"} — the same stats surface as the netpbm parser
        in operators/multimodal.py, plus the plane itself.

        All scans accumulate into per-component zigzag coefficient
        grids; dequantization + IDCT happen once at EOI, so baseline
        (one sequential scan) and progressive (many partial scans) share
        every code path after entropy decoding.
        """
        if payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        pos = 2
        quant: dict[int, np.ndarray] = {}
        huff_dc: dict[int, dict] = {}
        huff_ac: dict[int, dict] = {}
        frame = None
        progressive = False
        coefs = None
        restart_interval = 0
        eob_state = {"run": 0}
        saw_scan = False

        while pos < len(payload):
            if payload[pos] != 0xFF:
                raise ValueError(f"expected marker at byte {pos}")
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI
                break
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # bare markers
                continue
            seg_len = int.from_bytes(payload[pos : pos + 2], "big")
            seg = payload[pos + 2 : pos + seg_len]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    if pq != 0:
                        raise NotImplementedError("16-bit quantization tables")
                    quant[tq] = np.frombuffer(
                        seg[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    bits = list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17 : i + 17 + n])
                    table = _build_huffman_decoder(bits, vals)
                    (huff_dc if tc == 0 else huff_ac)[th] = table
                    i += 17 + n
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                precision = seg[0]
                if precision != 8:
                    raise NotImplementedError(f"{precision}-bit precision")
                height = int.from_bytes(seg[1:3], "big")
                width = int.from_bytes(seg[3:5], "big")
                ncomp = seg[5]
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                    )
                frame = {"w": width, "h": height, "comps": comps}
                progressive = marker == 0xC2
                _frame_geometry(frame)
                coefs = [
                    np.zeros((c["by_mcu"], c["bx_mcu"], 64), dtype=np.int64)
                    for c in comps
                ]
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                raise NotImplementedError(
                    f"SOF{marker - 0xC0}: only baseline sequential (SOF0) "
                    "and progressive (SOF2) are supported"
                )
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS -> entropy-coded data follows
                if frame is None:
                    raise ValueError("SOS before SOF")
                ns = seg[0]
                by_id = {c["id"]: ci for ci, c in enumerate(frame["comps"])}
                scan = []
                for c in range(ns):
                    cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    ci = by_id[cid]
                    scan.append(
                        (
                            ci,
                            huff_dc.get(tt >> 4),
                            huff_ac.get(tt & 0xF),
                        )
                    )
                Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                a = seg[3 + 2 * ns]
                spectral = (Ss, Se, a >> 4, a & 0xF)
                reader = _BitReader(payload, pos + seg_len)
                _decode_scan_into(
                    reader, frame, scan, spectral, huff_dc, huff_ac,
                    restart_interval, coefs, progressive, eob_state,
                )
                saw_scan = True
                marker, after = _next_marker(payload, reader.pos)
                pos = after - 2  # let the main loop parse it
                continue
            # APPn / COM / anything else: skip
            pos += seg_len
        if not saw_scan:
            raise ValueError("no scan data (missing SOS)")
        return _assemble_pixels(frame, coefs, quant)


    # ---------------------------------------------------------------------------
    # Encoder (round-trip test harness; grayscale / 4:4:4 / 4:2:0)
    # ---------------------------------------------------------------------------


    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.nbits = 0

        def write(self, code: int, length: int) -> None:
            for i in range(length - 1, -1, -1):
                self.acc = (self.acc << 1) | ((code >> i) & 1)
                self.nbits += 1
                if self.nbits == 8:
                    self.out.append(self.acc)
                    if self.acc == 0xFF:
                        self.out.append(0x00)  # byte stuffing
                    self.acc = 0
                    self.nbits = 0

        def flush(self) -> None:
            while self.nbits:
                self.write(1, 1)  # pad with 1s per spec


    def _category(v: int) -> int:
        return int(v).bit_length() if v >= 0 else int(-v).bit_length()


    def _dct_quant_block(block: np.ndarray, q: np.ndarray) -> np.ndarray:
        """DCT -> quantize -> zigzag for one 8x8 spatial block — shared
        by the baseline and progressive encoders so both transmit
        bit-identical coefficients (the parity tests rely on it)."""
        coeffs = _A @ (block - 128.0) @ _A.T
        return np.round(coeffs.reshape(64)[ZIGZAG] / q).astype(np.int64)

    def _encode_block(
        writer: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
        dc_enc: dict, ac_enc: dict,
    ) -> int:
        """DCT -> quantize -> zigzag -> Huffman. Returns the new DC pred."""
        zz = _dct_quant_block(block, q)
        dc = int(zz[0])
        diff = dc - pred
        s = _category(diff)
        length, code = dc_enc[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = int(np.nonzero(zz[1:])[0].max()) + 1 if np.any(zz[1:]) else 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_enc[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s = _category(v)
            length, code = ac_enc[(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            length, code = ac_enc[0x00]  # EOB
            writer.write(code, length)
        return dc


    def _prepare_frame(pixels, subsampling, quant_luma, quant_chroma):
        """Color-convert / subsample / MCU-pad an input array — the
        shared front half of the baseline and progressive encoders."""
        pixels = np.asarray(pixels)
        gray = pixels.ndim == 2 or pixels.shape[2] == 1
        if gray and pixels.ndim == 3:
            pixels = pixels[:, :, 0]
        h, w = pixels.shape[:2]
        ql = (quant_luma if quant_luma is not None else QUANT_LUMA).astype(np.int64)
        qc = (
            quant_chroma if quant_chroma is not None else QUANT_CHROMA
        ).astype(np.int64)

        if gray:
            planes = [pixels.astype(np.float64)]
            samp = [(1, 1)]
            qids = [0]
        else:
            p = pixels.astype(np.float64)
            r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
            if subsampling == "444":
                planes, samp = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
            elif subsampling == "420":
                # pad to even dims, then 2x2 mean-subsample the chroma
                he, we = h + (h & 1), w + (w & 1)
                cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
                crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
                cb2 = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
                cr2 = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
                planes, samp = [y, cb2, cr2], [(2, 2), (1, 1), (1, 1)]
            else:
                raise ValueError(f"unsupported subsampling {subsampling!r}")
            qids = [0, 1, 1]

        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))

        padded = []
        for (sh, sv), plane in zip(samp, planes):
            ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
            padded.append(
                np.pad(
                    plane,
                    ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                    mode="edge",
                )
            )
        return gray, h, w, padded, samp, qids, mcus_x, mcus_y, ql, qc

    def encode_baseline_jpeg(
        pixels: np.ndarray,
        subsampling: str = "444",
        quant_luma: np.ndarray | None = None,
        quant_chroma: np.ndarray | None = None,
        restart_interval: int = 0,
    ) -> bytes:
        """Encode an HxW (grayscale) or HxWx3 (RGB) uint8 array as a
        baseline JPEG. ``subsampling``: '444' or '420' (color only).
        Custom quantization tables (zigzag order, 64 ints) allow
        near-lossless round-trip tests with all-ones tables;
        ``restart_interval`` emits DRI + RSTn markers every that many MCUs
        (exercises the decoder's restart path)."""
        (gray, h, w, padded, samp, qids, mcus_x, mcus_y, ql, qc) = (
            _prepare_frame(pixels, subsampling, quant_luma, quant_chroma)
        )

        out = bytearray(b"\xff\xd8")  # SOI

        def seg(marker: int, body: bytes) -> None:
            out.extend(b"\xff" + bytes([marker]))
            out.extend((len(body) + 2).to_bytes(2, "big"))
            out.extend(body)

        seg(0xDB, bytes([0x00]) + bytes(ql.tolist()))
        if not gray:
            seg(0xDB, bytes([0x01]) + bytes(qc.tolist()))

        ncomp = 1 if gray else 3
        sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
        for ci in range(ncomp):
            sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
        seg(0xC0, sof)

        tables = [
            (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
            (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        ]
        if not gray:
            tables += [
                (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
                (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
            ]
        for tc_th, bits, vals in tables:
            seg(0xC4, bytes([tc_th] + bits + vals))

        if restart_interval:
            seg(0xDD, restart_interval.to_bytes(2, "big"))

        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([0, 63, 0])
        seg(0xDA, sos)

        dc_l = _build_huffman_encoder(DC_LUMA_BITS, DC_LUMA_VALS)
        ac_l = _build_huffman_encoder(AC_LUMA_BITS, AC_LUMA_VALS)
        dc_c = _build_huffman_encoder(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _build_huffman_encoder(AC_CHROMA_BITS, AC_CHROMA_VALS)

        writer = _BitWriter()
        pred = [0] * ncomp
        mcu_count = 0
        rst_n = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    writer.flush()
                    writer.out.extend(b"\xff" + bytes([0xD0 + rst_n]))
                    rst_n = (rst_n + 1) & 7
                    pred = [0] * ncomp
                mcu_count += 1
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    q = ql if qids[ci] == 0 else qc  # applied in zigzag order
                    dc_enc = dc_l if ci == 0 else dc_c
                    ac_enc = ac_l if ci == 0 else ac_c
                    for by in range(sv):
                        for bx in range(sh):
                            y0 = (my * sv + by) * 8
                            x0 = (mx * sh + bx) * 8
                            block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                            pred[ci] = _encode_block(
                                writer, block, q, pred[ci], dc_enc, ac_enc
                            )
        writer.flush()
        out.extend(writer.out)
        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)

    # -----------------------------------------------------------------
    # Progressive encoder (T.81 Annex G): spectral selection +
    # successive approximation, with EOB-run coding and a two-pass
    # per-scan Huffman table build. The coefficient grids come from the
    # SAME _dct_quant_block as the baseline encoder, so a progressive
    # stream decodes to bit-identical pixels (the parity tests).
    # -----------------------------------------------------------------

    def _build_fixed_table(symbols) -> tuple[list[int], list[int]]:
        """A JPEG-legal canonical Huffman table giving every observed
        symbol the same code length L (smallest with n <= 2^L - 1, so
        the all-ones code stays unused as T.81 C.2 requires). Not
        size-optimal — this encoder is a test harness — but valid for
        any decoder, and deliberately DIFFERENT from the K.3 tables so
        round trips also exercise table redefinition between scans."""
        vals = sorted(symbols)
        n = max(1, len(vals))
        L = 1
        while n > (1 << L) - 1:
            L += 1
        bits = [0] * 16
        bits[L - 1] = len(vals)
        return bits, vals

    class _ScanEmitter:
        """Two-pass emission: stats mode collects the symbol alphabet
        (pass 1 -> Huffman table), write mode entropy-codes (pass 2).
        Both passes run the identical control flow."""

        def __init__(self, writer=None, table=None):
            self.writer = writer
            self.table = table
            self.symbols: set[int] = set()

        def symbol(self, sym: int) -> None:
            if self.writer is None:
                self.symbols.add(sym)
            else:
                length, code = self.table[sym]
                self.writer.write(code, length)

        def bits(self, v: int, n: int) -> None:
            if self.writer is not None and n:
                self.writer.write(v, n)

    def _dc_scan_blocks(frame_geo, samp):
        """Yield (ci, by, bx) block coordinates in interleaved MCU
        order over every component (the DC scans' traversal)."""
        mcus_x, mcus_y = frame_geo
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (sh, sv) in enumerate(samp):
                    for by in range(sv):
                        for bx in range(sh):
                            yield ci, my * sv + by, mx * sh + bx

    def _encode_ac_scan(emit, grid, nby, nbx, Ss, Se, Ah, Al) -> None:
        """One component's AC scan over its non-interleaved block grid.
        Ah == 0: first scan (magnitudes at precision Al, EOB-run coded).
        Ah > 0: refinement (correction bits for known-nonzero
        coefficients buffered and flushed after the next symbol — the
        Figure G.7 discipline)."""
        eobrun = 0
        pending: list[int] = []  # correction bits owed to a future EOB

        def emit_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                emit.symbol(nbits << 4)
                if nbits:
                    emit.bits(eobrun & ((1 << nbits) - 1), nbits)
                eobrun = 0
                for b in pending:
                    emit.bits(b, 1)
                pending.clear()

        for byi in range(nby):
            for bxi in range(nbx):
                block = grid[byi, bxi]
                if Ah == 0:
                    r = 0
                    wrote_to_end = False
                    for k in range(Ss, Se + 1):
                        v = int(block[k])
                        t = (v if v >= 0 else -v) >> Al
                        if t == 0:
                            r += 1
                            continue
                        emit_eobrun()
                        while r > 15:
                            emit.symbol(0xF0)  # ZRL
                            r -= 16
                        s = t.bit_length()
                        emit.symbol((r << 4) | s)
                        tv = t if v >= 0 else -t
                        emit.bits(tv if tv >= 0 else tv + (1 << s) - 1, s)
                        r = 0
                        wrote_to_end = k == Se
                    if not wrote_to_end:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            emit_eobrun()
                else:
                    absv = [
                        (int(block[k]) if block[k] >= 0 else -int(block[k]))
                        >> Al
                        for k in range(Ss, Se + 1)
                    ]
                    # last newly-nonzero position: runs beyond it fold
                    # into the EOB run instead of ZRLs
                    eob_rel = max(
                        (i for i, t in enumerate(absv) if t == 1), default=-1
                    )
                    r = 0
                    br: list[int] = []
                    for i, t in enumerate(absv):
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and i <= eob_rel:
                            emit_eobrun()
                            emit.symbol(0xF0)
                            r -= 16
                            for b in br:
                                emit.bits(b, 1)
                            br = []
                        if t > 1:
                            br.append(t & 1)
                            continue
                        emit_eobrun()
                        emit.symbol((r << 4) | 1)
                        emit.bits(1 if block[Ss + i] > 0 else 0, 1)
                        for b in br:
                            emit.bits(b, 1)
                        br = []
                        r = 0
                    if r > 0 or br:
                        eobrun += 1
                        pending.extend(br)
                        if eobrun == 0x7FFF:
                            emit_eobrun()
        emit_eobrun()

    def encode_progressive_jpeg(
        pixels: np.ndarray,
        subsampling: str = "444",
        quant_luma: np.ndarray | None = None,
        quant_chroma: np.ndarray | None = None,
        dc_al: int = 1,
        ac_al: int = 2,
        band_split: int = 5,
    ) -> bytes:
        """Encode as a progressive (SOF2) JPEG with the classic script:
        DC first at Al=dc_al -> per-component AC first in two spectral
        bands ([1,band_split], [band_split+1,63]) at Al=ac_al ->
        per-component AC refinements down to full precision -> DC
        refinements. Coefficients are computed by the same
        DCT/quantize/round as encode_baseline_jpeg, so the decoded
        pixels are bit-identical to the baseline stream's."""
        # band_split=63 would emit a second AC scan with Ss=64, which
        # decoders (including ours) reject; validate up front
        if not 1 <= band_split <= 62:
            raise ValueError(
                f"band_split must be in 1..62, got {band_split}"
            )
        (gray, h, w, padded, samp, qids, mcus_x, mcus_y, ql, qc) = (
            _prepare_frame(pixels, subsampling, quant_luma, quant_chroma)
        )
        ncomp = 1 if gray else 3
        qtabs = [ql if qid == 0 else qc for qid in qids]

        # coefficient grids over the MCU-aligned padding (DC scans are
        # interleaved and cover every MCU block)
        coef_grids = []
        for ci in range(ncomp):
            plane = padded[ci]
            nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
            grid = np.zeros((nby, nbx, 64), dtype=np.int64)
            for by in range(nby):
                for bx in range(nbx):
                    grid[by, bx] = _dct_quant_block(
                        plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                        qtabs[ci],
                    )
            coef_grids.append(grid)

        # AC scans traverse the component's own ceil(samples/8) grid
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        ac_dims = []
        for ci in range(ncomp):
            cw = -(-(w * samp[ci][0]) // hmax)
            ch = -(-(h * samp[ci][1]) // vmax)
            ac_dims.append((-(-ch // 8), -(-cw // 8)))

        out = bytearray(b"\xff\xd8")  # SOI

        def seg(marker: int, body: bytes) -> None:
            out.extend(b"\xff" + bytes([marker]))
            out.extend((len(body) + 2).to_bytes(2, "big"))
            out.extend(body)

        seg(0xDB, bytes([0x00]) + bytes(ql.tolist()))
        if not gray:
            seg(0xDB, bytes([0x01]) + bytes(qc.tolist()))

        sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
            [ncomp]
        )
        for ci in range(ncomp):
            sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], qids[ci]])
        seg(0xC2, sof)  # SOF2: progressive

        # DC tables: the standard K.3 ones carry all 12 categories
        dc_tabs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS)]
        if not gray:
            dc_tabs.append((0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
        for tc_th, bits, vals in dc_tabs:
            seg(0xC4, bytes([tc_th] + bits + vals))
        dc_enc = _build_huffman_encoder(DC_LUMA_BITS, DC_LUMA_VALS)
        if not gray:
            dc_enc_c = _build_huffman_encoder(DC_CHROMA_BITS, DC_CHROMA_VALS)

        def sos(comp_specs: list[tuple[int, int]], Ss, Se, Ah, Al) -> None:
            body = bytes([len(comp_specs)])
            for cid, tt in comp_specs:
                body += bytes([cid, tt])
            body += bytes([Ss, Se, (Ah << 4) | Al])
            seg(0xDA, body)

        class _MuxEmitter:
            """DC-scan emitter routing symbols through per-component
            tables (luma vs chroma) while sharing one bit stream."""

            def __init__(self, writer, tables):
                self.writer = writer
                self.tables = tables
                self.ci = 0
                self.symbols = [set() for _ in tables]

            def symbol(self, sym):
                if self.writer is None:
                    self.symbols[self.ci].add(sym)
                else:
                    length, code = self.tables[self.ci][sym]
                    self.writer.write(code, length)

            def bits(self, v, n):
                if self.writer is not None and n:
                    self.writer.write(v, n)

        # --- scan 1: DC first, all components interleaved ---
        tables = [dc_enc] + ([dc_enc_c, dc_enc_c] if not gray else [])
        sos([(ci + 1, 0x00 if ci == 0 else 0x11) for ci in range(ncomp)],
            0, 0, 0, dc_al)
        writer = _BitWriter()
        emit = _MuxEmitter(writer, tables)

        # route per-block table choice through the emitter
        def dc_scan(emitter, Ah, Al):
            pred = [0] * ncomp
            for ci, by, bx in _dc_scan_blocks((mcus_x, mcus_y), samp):
                emitter.ci = ci
                dc = int(coef_grids[ci][by, bx, 0])
                if Ah == 0:
                    v = dc >> Al
                    diff = v - pred[ci]
                    pred[ci] = v
                    s = _category(diff)
                    emitter.symbol(s)
                    if s:
                        emitter.bits(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
                else:
                    emitter.bits((dc >> Al) & 1, 1)

        dc_scan(emit, 0, dc_al)
        writer.flush()
        out.extend(writer.out)

        # --- AC scans: per component, two spectral bands, then the
        # successive-approximation refinements down to Al=0 ---
        bands = [(1, band_split), (band_split + 1, 63)]
        ac_passes = [(0, ac_al, bands)]
        for al in range(ac_al - 1, -1, -1):
            ac_passes.append((al + 1, al, [(1, 63)]))
        for ah, al, scan_bands in ac_passes:
            for ci in range(ncomp):
                nby, nbx = ac_dims[ci]
                for Ss, Se in scan_bands:
                    # pass 1: collect the symbol alphabet
                    stats = _ScanEmitter()
                    _encode_ac_scan(
                        stats, coef_grids[ci], nby, nbx, Ss, Se, ah, al
                    )
                    bits, vals = _build_fixed_table(stats.symbols or {0x00})
                    th = 0 if ci == 0 else 1
                    seg(0xC4, bytes([0x10 | th] + bits + vals))
                    enc_table = _build_huffman_encoder(bits, vals)
                    sos([(ci + 1, th)], Ss, Se, ah, al)
                    writer = _BitWriter()
                    _encode_ac_scan(
                        _ScanEmitter(writer, enc_table),
                        coef_grids[ci], nby, nbx, Ss, Se, ah, al,
                    )
                    writer.flush()
                    out.extend(writer.out)

        # --- final scans: DC refinements down to Al=0 (raw bits) ---
        for al in range(dc_al - 1, -1, -1):
            sos([(ci + 1, 0x00) for ci in range(ncomp)], 0, 0, al + 1, al)
            writer = _BitWriter()
            dc_scan(_MuxEmitter(writer, tables), al + 1, al)
            writer.flush()
            out.extend(writer.out)

        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)

    return (
        encode_baseline_jpeg,
        encode_progressive_jpeg,
        decode_baseline_jpeg,
        ZIGZAG,
        QUANT_LUMA,
        QUANT_CHROMA,
    )


(
    encode_baseline_jpeg,
    encode_progressive_jpeg,
    decode_baseline_jpeg,
    ZIGZAG,
    QUANT_LUMA,
    QUANT_CHROMA,
) = _make_codec()
