"""Pure-Python WAV (RIFF) codec — the audio half of the multimodal
surface, decoded for real.

WAV needs no codec library for its classic formats: RIFF chunk walk,
'fmt ' parse, then the sample plane. Supported: PCM (format 1, 8-bit
unsigned / 16-bit signed), G.711 A-law (format 6) and mu-law (format 7)
— pure 256-entry table expansions to 16-bit linear — and IMA ADPCM
(format 0x11, block-structured 4-bit differential with the standard
step/index tables), any channel count / sample rate. Perceptual
formats that genuinely need codec machinery (MP3/AAC/Vorbis) raise
NotImplementedError — the honest-envelope rule of functions/jpeg.py.

Decode is exact for PCM and table-exact for G.711 (one lookup per
byte), so the multimodal registry entry can verify both against
closed-form SQL oracles over deterministic ramp signals — the G.711
oracle joins the inline 256-row expansion table.
"""

from __future__ import annotations


def _make_codec():
    """Nested defs -> cloudpickle ships these BY VALUE; executor Python
    workers never import this package (operators/multimodal.py rule)."""
    import struct

    import numpy as np

    def _build_ulaw_table() -> np.ndarray:
        """G.711 mu-law code -> 16-bit linear (the canonical ulaw2linear
        expansion: complement, then biased-mantissa shift)."""
        t = np.zeros(256, dtype=np.int64)
        for u in range(256):
            x = ~u & 0xFF
            exp = (x >> 4) & 7
            mant = x & 0x0F
            mag = (((mant << 3) + 0x84) << exp) - 0x84
            t[u] = -mag if x & 0x80 else mag
        return t

    def _build_alaw_table() -> np.ndarray:
        """G.711 A-law code -> 16-bit linear (XOR 0x55, then segment
        expansion; sign bit SET means positive in A-law)."""
        t = np.zeros(256, dtype=np.int64)
        for a in range(256):
            x = a ^ 0x55
            seg = (x >> 4) & 7
            mant = (x & 0x0F) << 4
            mag = mant + 8 if seg == 0 else (mant + 0x108) << (seg - 1)
            t[a] = mag if x & 0x80 else -mag
        return t

    ULAW_TABLE = _build_ulaw_table()
    ALAW_TABLE = _build_alaw_table()

    def linear_to_ulaw(x: np.ndarray) -> np.ndarray:
        """16-bit linear -> G.711 mu-law codes (vectorized canonical
        linear2ulaw: bias, segment search, complement). Satisfies
        linear_to_ulaw(ULAW_TABLE[c]) == c for all codes except the
        negative-zero code 127 (the standard G.711 +/-0 degeneracy:
        127 decodes to 0, which re-encodes to the positive-zero 255)."""
        x = np.asarray(x, dtype=np.int64)
        sign = np.where(x < 0, 0x80, 0)
        mag = np.minimum(np.abs(x), 32635) + 0x84
        # exponent = position of the highest set bit above bit 7
        exp = np.zeros_like(mag)
        for e in range(7, 0, -1):
            exp = np.where((mag >> (e + 7)) & 1, np.maximum(exp, e), exp)
        mant = (mag >> (exp + 3)) & 0x0F
        return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)

    def linear_to_alaw(x: np.ndarray) -> np.ndarray:
        """16-bit linear -> G.711 A-law codes (vectorized); satisfies
        linear_to_alaw(ALAW_TABLE[c]) == c for all 256 codes."""
        x = np.asarray(x, dtype=np.int64)
        positive = x >= 0
        mag = np.minimum(np.where(positive, x, -x), 32767)
        exp = np.zeros_like(mag)
        for e in range(7, 0, -1):
            exp = np.where((mag >> (e + 7)) & 1, np.maximum(exp, e), exp)
        mant = np.where(
            exp == 0, (mag >> 4) & 0x0F, (mag >> (exp + 3)) & 0x0F
        )
        code = (np.where(positive, 0x80, 0) | (exp << 4) | mant) ^ 0x55
        return code.astype(np.uint8)

    # IMA ADPCM standard tables (IMA Digital Audio Pack, 1992)
    IMA_STEPS = np.array([
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ], dtype=np.int64)
    IMA_INDEX = np.array(
        [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
        dtype=np.int64,
    )

    def _ima_decode_nibbles(nibbles, predictor: int, index: int):
        """Sequential IMA ADPCM nibble expansion for one channel run."""
        out = []
        for n in nibbles:
            step = int(IMA_STEPS[index])
            diff = step >> 3
            if n & 1:
                diff += step >> 2
            if n & 2:
                diff += step >> 1
            if n & 4:
                diff += step
            predictor = (
                max(predictor - diff, -32768)
                if n & 8
                else min(predictor + diff, 32767)
            )
            index = min(max(index + int(IMA_INDEX[n]), 0), 88)
            out.append(predictor)
        return out, predictor, index

    def _decode_ima_adpcm(data: bytes, n_ch: int, block: int) -> np.ndarray:
        """(frames, n_ch) int64 from IMA ADPCM block stream: each block
        carries a 4-byte (predictor, index) header per channel, then
        4-byte nibble groups interleaved by channel."""
        frames_out = [[] for _ in range(n_ch)]
        for b0 in range(0, len(data) - (len(data) % block), block):
            blk = data[b0 : b0 + block]
            chans = []
            for c in range(n_ch):
                pred, idx = struct.unpack_from("<hBx", blk, c * 4)
                if idx > 88:
                    raise ValueError(f"IMA step index {idx} out of range")
                chans.append((pred, idx))
                frames_out[c].append(pred)  # header predictor IS sample 0
            pos = 4 * n_ch
            # body: per channel, 4 bytes (8 nibbles) at a time, low first
            while pos + 4 * n_ch <= len(blk):
                for c in range(n_ch):
                    grp = blk[pos + c * 4 : pos + c * 4 + 4]
                    nibs = []
                    for byte in grp:
                        nibs.append(byte & 0x0F)
                        nibs.append(byte >> 4)
                    pred, idx = chans[c]
                    vals, pred, idx = _ima_decode_nibbles(nibs, pred, idx)
                    chans[c] = (pred, idx)
                    frames_out[c].extend(vals)
                pos += 4 * n_ch
        n_frames = min(len(f) for f in frames_out) if n_ch else 0
        return np.array(
            [f[:n_frames] for f in frames_out], dtype=np.int64
        ).T.copy()

    def decode_wav(payload: bytes) -> dict:
        """Decode a WAV to {"n_channels", "sample_rate",
        "bits_per_sample", "n_samples" (frames), "samples" (frames x
        channels int64 ndarray), "sample_sum", "duration_ms", "codec"}.
        G.711 and IMA ADPCM samples are expanded to 16-bit linear;
        bits_per_sample reports the WIRE format (8 for G.711, 4 for
        ADPCM)."""
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos = 12
        fmt = None
        data = None
        fact = None
        while pos + 8 <= len(payload):
            ctype = payload[pos : pos + 4]
            (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + length]
            pos += 8 + length + (length & 1)  # chunks are word-aligned
            if ctype == b"fact" and length >= 4:
                (fact,) = struct.unpack("<I", body[:4])
            elif ctype == b"fmt ":
                # Validate before trusting: a malformed fmt chunk must
                # raise this codec's ValueError contract, not leak a
                # struct.error (short body) or ZeroDivisionError
                # (block-align 0) from the sample-plane math below.
                if len(body) < 16:
                    raise ValueError(
                        f"fmt chunk too short ({len(body)} bytes, need 16)"
                    )
                audio_fmt, n_ch, rate, _byte_rate, block, bits = struct.unpack(
                    "<HHIIHH", body[:16]
                )
                if audio_fmt not in (1, 6, 7, 0x11):
                    raise NotImplementedError(
                        f"compressed WAV (format {audio_fmt}); PCM, G.711 "
                        "A-law/mu-law, and IMA ADPCM only"
                    )
                if audio_fmt == 1 and bits not in (8, 16):
                    raise NotImplementedError(f"{bits}-bit samples")
                if audio_fmt in (6, 7) and bits != 8:
                    raise ValueError(f"G.711 must be 8-bit, got {bits}")
                if audio_fmt == 0x11:
                    if bits != 4:
                        raise ValueError(f"IMA ADPCM must be 4-bit, got {bits}")
                    # block must hold the per-channel headers + whole
                    # 4-byte nibble groups
                    if block < 4 * n_ch or (block - 4 * n_ch) % (4 * n_ch):
                        raise ValueError(
                            f"invalid ADPCM block align {block} "
                            f"(channels={n_ch})"
                        )
                elif block <= 0 or block != n_ch * max(bits, 8) // 8:
                    raise ValueError(
                        f"invalid block align {block} "
                        f"(channels={n_ch}, bits={bits})"
                    )
                fmt = (audio_fmt, n_ch, rate, bits, block)
            elif ctype == b"data":
                data = body
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_fmt, n_ch, rate, bits, block = fmt
        if audio_fmt == 1:
            dtype = np.uint8 if bits == 8 else np.dtype("<i2")
            plane = np.frombuffer(
                data[: len(data) - (len(data) % block)], dtype=dtype
            ).astype(np.int64)
            frames = plane.reshape(-1, n_ch)
            codec = "pcm"
        elif audio_fmt in (6, 7):
            table = ALAW_TABLE if audio_fmt == 6 else ULAW_TABLE
            codes = np.frombuffer(
                data[: len(data) - (len(data) % block)], dtype=np.uint8
            )
            frames = table[codes.astype(np.int64)].reshape(-1, n_ch)
            codec = "alaw" if audio_fmt == 6 else "ulaw"
        else:
            frames = _decode_ima_adpcm(data, n_ch, block)
            codec = "ima_adpcm"
        # compressed formats pad the tail block; the fact chunk records
        # the true frame count, so honor it (trim only — never extend)
        if fact is not None and fact < frames.shape[0]:
            frames = frames[:fact]
        return {
            "n_channels": n_ch,
            "sample_rate": rate,
            "bits_per_sample": bits,
            "n_samples": int(frames.shape[0]),
            "samples": frames,
            "sample_sum": int(frames.sum()),
            "duration_ms": int(frames.shape[0] * 1000 // rate) if rate else 0,
            "codec": codec,
        }

    def _riff(
        fmt_body: bytes, plane: bytes, fact_frames: int | None = None
    ) -> bytes:
        fact = (
            b"fact" + struct.pack("<II", 4, fact_frames)
            if fact_frames is not None
            else b""
        )
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt_body))
            + fmt_body
            + fact
            + b"data"
            + struct.pack("<I", len(plane))
            + plane
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def encode_g711_wav(
        codes, sample_rate: int, law: str = "ulaw"
    ) -> bytes:
        """Wrap raw G.711 codes (frames or frames x channels uint8) as a
        format-6 (A-law) / format-7 (mu-law) WAV. Takes CODES, not
        linear samples — use :func:`linear_to_ulaw` / `linear_to_alaw`
        to compress first; taking codes keeps deterministic-fixture
        construction (e.g. the multimodal oracle's byte ramp) exact."""
        codes = np.asarray(codes, dtype=np.uint8)
        if codes.ndim == 1:
            codes = codes[:, None]
        n_frames, n_ch = codes.shape
        audio_fmt = {"alaw": 6, "ulaw": 7}.get(law)
        if audio_fmt is None:
            raise ValueError(f"unknown G.711 law {law!r}")
        fmt = struct.pack(
            "<HHIIHH", audio_fmt, n_ch, sample_rate,
            sample_rate * n_ch, n_ch, 8,
        )
        return _riff(fmt, codes.tobytes())

    def encode_ima_adpcm_wav(
        samples, sample_rate: int, samples_per_block: int = 505
    ) -> bytes:
        """Encode int16 linear samples (frames or frames x channels) as
        IMA ADPCM WAV (format 0x11). Each block stores the running
        (predictor, step index) per channel in its header — the first
        sample of the block — then 4-bit differences; the encoder
        updates its state through the DECODER's reconstruction
        arithmetic, so drift never accumulates beyond one step. The
        tail block is padded by repeating the last frame, and a 'fact'
        chunk records the TRUE frame count so decode_wav trims the
        padding — the round trip is frame-exact for any length."""
        samples = np.asarray(samples, dtype=np.int64)
        if samples.ndim == 1:
            samples = samples[:, None]
        n_frames, n_ch = samples.shape
        if (samples_per_block - 1) % 8:
            raise ValueError("samples_per_block must be 8k+1")
        block = 4 * n_ch + ((samples_per_block - 1) // 2) * n_ch
        out = bytearray()
        idx = [0] * n_ch
        for f0 in range(0, n_frames, samples_per_block):
            chunk = samples[f0 : f0 + samples_per_block]
            # pad the tail block by repeating the last frame
            if chunk.shape[0] < samples_per_block:
                pad = np.repeat(
                    chunk[-1:], samples_per_block - chunk.shape[0], axis=0
                )
                chunk = np.vstack([chunk, pad])
            preds = [int(chunk[0, c]) for c in range(n_ch)]
            for c in range(n_ch):
                out += struct.pack("<hBx", preds[c], idx[c])
            nibbles = [[] for _ in range(n_ch)]
            for c in range(n_ch):
                pred, index = preds[c], idx[c]
                for s in chunk[1:, c]:
                    step = int(IMA_STEPS[index])
                    diff = int(s) - pred
                    nib = 8 if diff < 0 else 0
                    diff = abs(diff)
                    if diff >= step:
                        nib |= 4
                        diff -= step
                    if diff >= step >> 1:
                        nib |= 2
                        diff -= step >> 1
                    if diff >= step >> 2:
                        nib |= 1
                    # state advances through the decoder's arithmetic
                    _, pred, index = _ima_decode_nibbles([nib], pred, index)
                    nibbles[c].append(nib)
                preds[c], idx[c] = pred, index
            # body: interleave 4-byte (8-nibble) groups per channel
            per_ch = len(nibbles[0])
            for g0 in range(0, per_ch, 8):
                for c in range(n_ch):
                    grp = nibbles[c][g0 : g0 + 8]
                    for i in range(0, 8, 2):
                        out.append(grp[i] | (grp[i + 1] << 4))
        fmt = struct.pack(
            "<HHIIHH", 0x11, n_ch, sample_rate,
            (sample_rate * block) // samples_per_block, block, 4,
        )
        return _riff(fmt, bytes(out), fact_frames=n_frames)

    def encode_wav(samples, sample_rate: int, bits: int = 8) -> bytes:
        """Encode a frames or frames x channels int array as PCM WAV
        (8-bit unsigned or 16-bit signed little-endian)."""
        samples = np.asarray(samples)
        if samples.ndim == 1:
            samples = samples[:, None]
        n_frames, n_ch = samples.shape
        if bits == 8:
            plane = samples.astype(np.uint8).tobytes()
        elif bits == 16:
            plane = samples.astype("<i2").tobytes()
        else:
            raise ValueError(f"{bits}-bit encoding unsupported")
        block = n_ch * bits // 8
        fmt = struct.pack(
            "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, bits
        )
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(plane))
            + plane
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    return (
        encode_wav,
        encode_g711_wav,
        encode_ima_adpcm_wav,
        decode_wav,
        linear_to_ulaw,
        linear_to_alaw,
        ULAW_TABLE,
        ALAW_TABLE,
    )


(
    encode_wav,
    encode_g711_wav,
    encode_ima_adpcm_wav,
    decode_wav,
    linear_to_ulaw,
    linear_to_alaw,
    ULAW_TABLE,
    ALAW_TABLE,
) = _make_codec()
