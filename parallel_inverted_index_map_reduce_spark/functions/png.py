"""Pure-Python PNG codec (RFC 2083 / ISO 15948), stdlib zlib only.

PNG's DEFLATE layer ships in CPython's ``zlib``, so unlike JPEG no
external codec is needed at all — this is a complete, lossless decoder
for the 8-bit-per-sample formats (grayscale, gray+alpha, RGB, RGBA, and
PLTE-indexed palette — the most common real-corpus variant) with all
five scanline filters (None/Sub/Up/Average/Paeth), Adam7 interlacing
(each of the seven passes unfiltered as its own sub-image and scattered
back), and tRNS transparency (palette alpha table, and the gray/RGB
color-key forms — decode expands to an explicit alpha channel), plus
matching encoders (any of those color types, any fixed filter type,
``interlace=True``, tRNS; ``encode_palette_png`` for color type 3) used
by the round-trip tests. Sub-8-bit and 16-bit depths raise
NotImplementedError — the honest envelope rule of functions/jpeg.py.

Decode is exact by construction (PNG is lossless), which is what lets
the multimodal registry entry verify it against a closed-form SQL
oracle over a deterministic gradient image: any pixel mismatch anywhere
flips the hash.
"""

from __future__ import annotations


def _make_codec():
    """Nested defs -> cloudpickle serializes BY VALUE, so executor
    Python workers never need this package importable (the closure
    rule operators/multimodal.py documents)."""
    import struct
    import zlib

    import numpy as np

    SIGNATURE = b"\x89PNG\r\n\x1a\n"
    CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel
    # Adam7 pass origins/steps (x0, y0, dx, dy), ISO 15948 §8.2: each
    # pass is an independent sub-image with its own scanline filtering
    ADAM7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def _unfilter(raw: bytes, start: int, h: int, w: int, ch: int):
        """Reverse the five scanline filters over ``h`` lines of
        ``w``-pixel rows starting at byte ``start`` of the decompressed
        stream; returns ((h, w*ch) uint8 plane, bytes consumed). The
        previous-line state is local: interlaced passes each restart
        from a zero line, exactly the per-pass filtering the spec
        defines."""
        stride = w * ch
        need = h * (stride + 1)
        if start + need > len(raw):
            raise ValueError(
                f"scanline data truncated: need {need} bytes at {start}, "
                f"have {len(raw) - start}"
            )
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            base = start + y * (stride + 1)
            ftype = raw[base]
            line = np.frombuffer(
                raw[base + 1 : base + 1 + stride], dtype=np.uint8
            ).astype(np.int64)
            cur = np.zeros(stride, dtype=np.int64)
            if ftype == 0:  # None
                cur = line
            elif ftype == 2:  # Up
                cur = (line + prev) & 0xFF
            elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    b = prev[x]
                    if ftype == 1:
                        v = line[x] + a
                    elif ftype == 3:
                        v = line[x] + (a + b) // 2
                    else:
                        c = prev[x - ch] if x >= ch else 0
                        v = line[x] + _paeth(int(a), int(b), int(c))
                    cur[x] = v & 0xFF
            else:
                raise ValueError(f"unknown filter type {ftype}")
            out[y] = cur.astype(np.uint8)
            prev = cur
        return out, need

    def _pass_dims(w: int, h: int):
        """(x0, y0, dx, dy, wp, hp) per Adam7 pass; empty passes (wp or
        hp zero) contribute NO bytes to the stream, not even filter
        bytes."""
        for x0, y0, dx, dy in ADAM7:
            wp = (w - x0 + dx - 1) // dx if w > x0 else 0
            hp = (h - y0 + dy - 1) // dy if h > y0 else 0
            yield x0, y0, dx, dy, wp, hp

    def decode_png(payload: bytes) -> dict:
        """Decode a PNG to {"width", "height", "channels", "maxval",
        "pixels" (HxWxC uint8), "pixel_sum", "n_pixel_bytes"} — the
        multimodal stats surface plus the plane. tRNS transparency is
        made explicit: palette alpha tables expand to RGBA, gray/RGB
        color keys to GA/RGBA with alpha 0 on matching pixels."""
        if payload[:8] != SIGNATURE:
            raise ValueError("not a PNG (bad signature)")
        pos = 8
        ihdr = None
        palette = None
        trns = None
        idat = bytearray()
        while pos < len(payload):
            (length,) = struct.unpack(">I", payload[pos : pos + 4])
            ctype = payload[pos + 4 : pos + 8]
            data = payload[pos + 8 : pos + 8 + length]
            pos += 12 + length  # length + type + data + crc
            if ctype == b"IHDR":
                w, h, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
                if depth != 8:
                    raise NotImplementedError(f"{depth}-bit samples")
                if color != 3 and color not in CHANNELS:
                    raise NotImplementedError(f"color type {color}")
                if interlace not in (0, 1):
                    raise ValueError(f"interlace method {interlace}")
                if comp or filt:
                    raise ValueError("invalid compression/filter method")
                # palette streams carry 1-byte indices (bpp=1 for the
                # unfilter), expanded via PLTE after reassembly
                ihdr = (w, h, 1 if color == 3 else CHANNELS[color],
                        color, interlace)
            elif ctype == b"PLTE":
                if length == 0 or length % 3 or length > 768:
                    raise ValueError(f"bad PLTE length {length}")
                palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif ctype == b"tRNS":
                trns = bytes(data)
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
        if ihdr is None:
            raise ValueError("missing IHDR")
        w, h, ch, color, interlace = ihdr
        if color == 3 and palette is None:
            raise ValueError("palette image without a PLTE chunk")
        raw = zlib.decompress(bytes(idat))
        if interlace:
            flat = np.zeros((h, w, ch), dtype=np.uint8)
            at = 0
            for x0, y0, dx, dy, wp, hp in _pass_dims(w, h):
                if wp == 0 or hp == 0:
                    continue
                sub, used = _unfilter(raw, at, hp, wp, ch)
                at += used
                flat[y0::dy, x0::dx] = sub.reshape(hp, wp, ch)
            if at != len(raw):
                raise ValueError(
                    f"scanline data is {len(raw)} bytes, expected {at}"
                )
            pixels = flat
        else:
            expected = h * (w * ch + 1)
            if len(raw) != expected:
                raise ValueError(
                    f"scanline data is {len(raw)} bytes, expected {expected}"
                )
            plane, _ = _unfilter(raw, 0, h, w, ch)
            pixels = plane.reshape(h, w, ch)
        if color == 3:
            if int(pixels.max(initial=0)) >= palette.shape[0]:
                raise ValueError(
                    f"palette index {int(pixels.max())} out of range "
                    f"({palette.shape[0]} entries)"
                )
            idx = pixels[:, :, 0]  # (h, w) indices
            rgb = palette[idx]  # -> (h, w, 3)
            if trns is not None:
                # per-entry alpha table, short tables pad opaque
                if len(trns) > palette.shape[0]:
                    raise ValueError(
                        f"tRNS has {len(trns)} entries for a "
                        f"{palette.shape[0]}-entry palette"
                    )
                alphas = np.full(palette.shape[0], 255, dtype=np.uint8)
                alphas[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
                pixels = np.dstack([rgb, alphas[idx]])
                ch = 4
            else:
                pixels = rgb
                ch = 3
        elif trns is not None:
            # color-key transparency: 16-bit sample values per channel
            # (low byte carries the value at depth 8); keyed pixels get
            # alpha 0, everything else 255
            if color == 0:
                if len(trns) != 2:
                    raise ValueError(f"gray tRNS must be 2 bytes, got {len(trns)}")
                (key,) = struct.unpack(">H", trns)
                matches = pixels[:, :, 0] == (key & 0xFF)
            elif color == 2:
                if len(trns) != 6:
                    raise ValueError(f"RGB tRNS must be 6 bytes, got {len(trns)}")
                keys = struct.unpack(">HHH", trns)
                matches = np.logical_and.reduce(
                    [pixels[:, :, i] == (keys[i] & 0xFF) for i in range(3)]
                )
            else:
                raise ValueError(
                    f"tRNS is invalid for color type {color} (has alpha)"
                )
            alpha = np.where(matches, 0, 255).astype(np.uint8)
            pixels = np.dstack([pixels, alpha])
            ch += 1
        return {
            "width": w,
            "height": h,
            "channels": ch,
            "maxval": 255,
            "pixels": pixels,
            "pixel_sum": int(pixels.astype(np.int64).sum()),
            "n_pixel_bytes": int(pixels.size),
        }

    def _filter_raw(flat, ch: int, filter_type: int) -> bytearray:
        """Apply one fixed filter (0..4) to every scanline of an
        (h, stride) int64 plane — the shared write-side of the truecolor
        and palette encoders (for palette streams bpp=ch=1)."""
        h, stride = flat.shape
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            cur = flat[y]
            raw.append(filter_type)
            if filter_type == 0:
                enc = cur
            elif filter_type == 2:
                enc = (cur - prev) & 0xFF
            else:
                enc = np.zeros(stride, dtype=np.int64)
                for x in range(stride):
                    a = cur[x - ch] if x >= ch else 0
                    b = prev[x]
                    if filter_type == 1:
                        enc[x] = (cur[x] - a) & 0xFF
                    elif filter_type == 3:
                        enc[x] = (cur[x] - (a + b) // 2) & 0xFF
                    else:
                        c = prev[x - ch] if x >= ch else 0
                        enc[x] = (cur[x] - _paeth(int(a), int(b), int(c))) & 0xFF
            raw.extend(enc.astype(np.uint8).tobytes())
            prev = cur
        return raw

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def _filter_image(pixels, ch: int, filter_type: int, interlace: bool):
        """Filtered scanline stream for an (h, w, ch) plane — straight
        raster order, or the seven Adam7 sub-images (each filtered
        independently, matching the decoder's per-pass unfilter)."""
        h, w = pixels.shape[:2]
        if not interlace:
            return _filter_raw(
                pixels.reshape(h, w * ch).astype(np.int64), ch, filter_type
            )
        raw = bytearray()
        for x0, y0, dx, dy, wp, hp in _pass_dims(w, h):
            if wp == 0 or hp == 0:
                continue
            sub = pixels[y0::dy, x0::dx]
            raw.extend(
                _filter_raw(
                    sub.reshape(hp, wp * ch).astype(np.int64), ch, filter_type
                )
            )
        return raw

    def encode_png(
        pixels,
        filter_type: int = 0,
        level: int = 6,
        interlace: bool = False,
        trns_color=None,
    ) -> bytes:
        """Encode an HxW / HxWx{1,2,3,4} uint8 array. ``filter_type``
        applies one fixed filter to every scanline (0..4) — the
        round-trip tests use each to prove the decoder's unfilters.
        ``interlace`` writes Adam7; ``trns_color`` (an int for gray, an
        RGB triple for 3-channel) writes a color-key tRNS chunk."""
        pixels = np.asarray(pixels, dtype=np.uint8)
        if pixels.ndim == 2:
            pixels = pixels[:, :, None]
        h, w, ch = pixels.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
        if color is None:
            raise ValueError(f"{ch}-channel images unsupported")
        if filter_type not in (0, 1, 2, 3, 4):
            raise ValueError(f"filter type {filter_type}")
        trns_chunk = b""
        if trns_color is not None:
            if ch == 1:
                trns_chunk = _chunk(b"tRNS", struct.pack(">H", int(trns_color)))
            elif ch == 3:
                trns_chunk = _chunk(b"tRNS", struct.pack(">HHH", *map(int, trns_color)))
            else:
                raise ValueError(
                    f"color-key tRNS is invalid for {ch}-channel images"
                )
        raw = _filter_image(pixels, ch, filter_type, interlace)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
        return (
            SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + trns_chunk
            + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _chunk(b"IEND", b"")
        )

    def encode_palette_png(
        indices,
        palette,
        filter_type: int = 0,
        level: int = 6,
        interlace: bool = False,
        trns=None,
    ) -> bytes:
        """Encode an HxW uint8 index plane + Nx3 palette as a color-
        type-3 PNG (IHDR + PLTE + IDAT); filtering operates on the
        1-byte indices (bpp=1), exactly what the decoder unfilters.
        ``trns`` (a sequence of per-entry alphas, may be shorter than
        the palette) writes a tRNS alpha table."""
        indices = np.asarray(indices, dtype=np.uint8)
        palette = np.asarray(palette, dtype=np.uint8)
        if indices.ndim != 2:
            raise ValueError("palette indices must be HxW")
        if palette.ndim != 2 or palette.shape[1] != 3 or not (
            1 <= palette.shape[0] <= 256
        ):
            raise ValueError("palette must be Nx3 with 1 <= N <= 256")
        if int(indices.max(initial=0)) >= palette.shape[0]:
            raise ValueError("palette index out of range")
        if filter_type not in (0, 1, 2, 3, 4):
            raise ValueError(f"filter type {filter_type}")
        trns_chunk = b""
        if trns is not None:
            alphas = np.asarray(trns, dtype=np.uint8)
            if alphas.ndim != 1 or len(alphas) > palette.shape[0]:
                raise ValueError("tRNS must be 1-D, at most palette-length")
            trns_chunk = _chunk(b"tRNS", alphas.tobytes())
        h, w = indices.shape
        raw = _filter_image(indices[:, :, None], 1, filter_type, interlace)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, int(interlace))
        return (
            SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", palette.tobytes())
            + trns_chunk
            + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _chunk(b"IEND", b"")
        )

    return encode_png, encode_palette_png, decode_png


encode_png, encode_palette_png, decode_png = _make_codec()
