"""Pure-Python WAV (RIFF PCM) codec — the audio half of the multimodal
surface, decoded for real.

Uncompressed PCM WAV needs no codec library at all: RIFF chunk walk,
'fmt ' parse, raw sample plane. Supported: PCM (format 1), 8-bit
unsigned and 16-bit signed samples, any channel count / sample rate.
Compressed formats (MP3/AAC/anything with format != 1) raise
NotImplementedError — the honest-envelope rule of functions/jpeg.py.

Decode is exact (PCM is just the samples), so the multimodal registry
entry can verify it against a closed-form SQL oracle over a
deterministic ramp signal.
"""

from __future__ import annotations


def _make_codec():
    """Nested defs -> cloudpickle ships these BY VALUE; executor Python
    workers never import this package (operators/multimodal.py rule)."""
    import struct

    import numpy as np

    def decode_wav(payload: bytes) -> dict:
        """Decode a PCM WAV to {"n_channels", "sample_rate",
        "bits_per_sample", "n_samples" (frames), "samples" (frames x
        channels int64 ndarray), "sample_sum", "duration_ms"}."""
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos = 12
        fmt = None
        data = None
        while pos + 8 <= len(payload):
            ctype = payload[pos : pos + 4]
            (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + length]
            pos += 8 + length + (length & 1)  # chunks are word-aligned
            if ctype == b"fmt ":
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
                if audio_fmt != 1:
                    raise NotImplementedError(
                        f"compressed WAV (format {audio_fmt}); PCM only"
                    )
                if bits not in (8, 16):
                    raise NotImplementedError(f"{bits}-bit samples")
                if block <= 0 or block != n_ch * bits // 8:
                    raise ValueError(
                        f"invalid block align {block} "
                        f"(channels={n_ch}, bits={bits})"
                    )
                fmt = (n_ch, rate, bits, block)
            elif ctype == b"data":
                data = body
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        n_ch, rate, bits, block = fmt
        dtype = np.uint8 if bits == 8 else np.dtype("<i2")
        plane = np.frombuffer(
            data[: len(data) - (len(data) % block)], dtype=dtype
        ).astype(np.int64)
        frames = plane.reshape(-1, n_ch)
        return {
            "n_channels": n_ch,
            "sample_rate": rate,
            "bits_per_sample": bits,
            "n_samples": int(frames.shape[0]),
            "samples": frames,
            "sample_sum": int(plane.sum()),
            "duration_ms": int(frames.shape[0] * 1000 // rate) if rate else 0,
        }

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

    return encode_wav, decode_wav


encode_wav, decode_wav = _make_codec()
