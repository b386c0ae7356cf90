"""Pure-Python PNG codec (RFC 2083 / ISO 15948), stdlib zlib only.

PNG's DEFLATE layer ships in CPython's ``zlib``, so unlike JPEG no
external codec is needed at all — this is a complete, lossless decoder
for the non-interlaced 8-bit-per-sample formats (grayscale, gray+alpha,
RGB, RGBA, and PLTE-indexed palette — the most common real-corpus
variant) with all five scanline filters (None/Sub/Up/Average/Paeth),
plus matching encoders (any of those color types, any fixed filter
type; ``encode_palette_png`` for color type 3) used by the round-trip
tests. Sub-8-bit/16-bit depths, Adam7 interlacing, and tRNS
transparency raise NotImplementedError — the honest envelope rule of
functions/jpeg.py.

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

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def decode_png(payload: bytes) -> dict:
        """Decode a PNG to {"width", "height", "channels", "maxval",
        "pixels" (HxWxC uint8), "pixel_sum", "n_pixel_bytes"} — the
        multimodal stats surface plus the plane."""
        if payload[:8] != SIGNATURE:
            raise ValueError("not a PNG (bad signature)")
        pos = 8
        ihdr = None
        palette = None
        paletted = False
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
                if color == 3:
                    # palette: the filtered stream carries 1-byte indices
                    # (bpp=1 for the unfilter), expanded via PLTE below
                    paletted = True
                elif color not in CHANNELS:
                    raise NotImplementedError(f"color type {color}")
                if interlace:
                    raise NotImplementedError("Adam7 interlacing")
                if comp or filt:
                    raise ValueError("invalid compression/filter method")
                ihdr = (w, h, 1 if color == 3 else CHANNELS[color])
            elif ctype == b"PLTE":
                if length == 0 or length % 3 or length > 768:
                    raise ValueError(f"bad PLTE length {length}")
                palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif ctype == b"tRNS":
                raise NotImplementedError("tRNS transparency")
            elif ctype == b"IDAT":
                idat.extend(data)
            elif ctype == b"IEND":
                break
        if ihdr is None:
            raise ValueError("missing IHDR")
        if paletted and palette is None:
            raise ValueError("palette image without a PLTE chunk")
        w, h, ch = ihdr
        raw = zlib.decompress(bytes(idat))
        stride = w * ch
        if len(raw) != h * (stride + 1):
            raise ValueError(
                f"scanline data is {len(raw)} bytes, expected {h * (stride + 1)}"
            )
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(h):
            ftype = raw[y * (stride + 1)]
            line = np.frombuffer(
                raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)],
                dtype=np.uint8,
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
        pixels = out.reshape(h, w, ch)
        if paletted:
            if int(pixels.max(initial=0)) >= palette.shape[0]:
                raise ValueError(
                    f"palette index {int(pixels.max())} out of range "
                    f"({palette.shape[0]} entries)"
                )
            pixels = palette[pixels[:, :, 0]]  # (h, w) indices -> (h, w, 3)
            ch = 3
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

    def encode_png(pixels, filter_type: int = 0, level: int = 6) -> bytes:
        """Encode an HxW / HxWx{1,2,3,4} uint8 array. ``filter_type``
        applies one fixed filter to every scanline (0..4) — the
        round-trip tests use each to prove the decoder's unfilters."""
        pixels = np.asarray(pixels, dtype=np.uint8)
        if pixels.ndim == 2:
            pixels = pixels[:, :, None]
        h, w, ch = pixels.shape
        color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
        if color is None:
            raise ValueError(f"{ch}-channel images unsupported")
        if filter_type not in (0, 1, 2, 3, 4):
            raise ValueError(f"filter type {filter_type}")
        flat = pixels.reshape(h, w * ch).astype(np.int64)
        raw = _filter_raw(flat, ch, filter_type)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _chunk(b"IEND", b"")
        )

    def encode_palette_png(
        indices, palette, filter_type: int = 0, level: int = 6
    ) -> bytes:
        """Encode an HxW uint8 index plane + Nx3 palette as a color-
        type-3 PNG (IHDR + PLTE + IDAT); filtering operates on the
        1-byte indices (bpp=1), exactly what the decoder unfilters."""
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
        h, w = indices.shape
        raw = _filter_raw(indices.astype(np.int64), 1, filter_type)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
        return (
            SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", palette.tobytes())
            + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
            + _chunk(b"IEND", b"")
        )

    return encode_png, encode_palette_png, decode_png


encode_png, encode_palette_png, decode_png = _make_codec()
