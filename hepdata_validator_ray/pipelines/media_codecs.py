"""Pure-numpy media codecs: real decode/encode for formats that need no
external codec library.

The container ships no PIL/ffmpeg, so JPEG/MP4 stay stubbed
(multimodal.DecodeStage strict mode) — but two REAL formats are fully
decodable with numpy alone, upgrading the multimodal family from
"deterministic fake" to an actual decode → feature → resize path:

- **PPM (P6)**: the netpbm binary pixmap — ASCII header
  ``P6\\n<w> <h>\\n<maxval>\\n`` + raw RGB24 bytes.  Decode = header parse +
  ``np.frombuffer().reshape(h, w, 3)``; resize = nearest-neighbor index
  gather; features = per-channel means + luminance histogram.
- **WAV (RIFF PCM16)**: canonical 44-byte header + little-endian int16
  samples.  Decode = header validation + ``np.frombuffer(int16)``;
  features = RMS, peak, zero-crossing rate; resample = decimation.

Malformed payloads raise ``MediaDecodeError`` with a reference-grammar
message ("There was a problem parsing the file." —
hepdata_validator/__init__.py error style); the decode stages surface these
as violation-style rows rather than crashing the task.
"""

from __future__ import annotations

import numpy as np

PARSE_ERROR = "There was a problem parsing the file.\n"


class MediaDecodeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """RGB24 ``(h, w, 3)`` uint8 array → binary PPM (P6) bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects an (h, w, 3) uint8 array")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → ``(h, w, 3)`` uint8 array (zero-copy view of
    the payload buffer after the header)."""
    if not blob.startswith(b"P6"):
        raise MediaDecodeError(PARSE_ERROR)
    # header: magic, width, height, maxval — whitespace-separated tokens
    # (comments are rare in machine-written PPMs; reject for strictness)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tok = blob[start:pos]
        if not tok.isdigit():
            raise MediaDecodeError(PARSE_ERROR)
        fields.append(int(tok))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255 or w <= 0 or h <= 0:
        raise MediaDecodeError(PARSE_ERROR)
    need = w * h * 3
    if len(blob) - pos < need:
        raise MediaDecodeError(PARSE_ERROR)
    return np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos).reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize via index gather — the real resize kernel
    (pixel-center sampling, matching PIL's NEAREST up to rounding)."""
    h, w = pixels.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return pixels[rows[:, None], cols[None, :]]


def ppm_features(pixels: np.ndarray, n_bins: int = 16) -> dict:
    """Real image features: per-channel means + luminance histogram (BT.601)."""
    f = pixels.astype(np.float64)
    luma = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    hist = np.bincount(
        (np.minimum(luma, 255.0).astype(np.int64) // (256 // n_bins)).ravel(), minlength=n_bins
    )
    return {
        "height": int(pixels.shape[0]),
        "width": int(pixels.shape[1]),
        "mean_r": float(f[..., 0].mean()),
        "mean_g": float(f[..., 1].mean()),
        "mean_b": float(f[..., 2].mean()),
        "luma_hist": hist.astype(np.int64),
    }


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16 mono)
# ---------------------------------------------------------------------------

def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → canonical 44-byte-header RIFF/WAVE bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_pcm16 expects a 1-D int16 array")
    data = samples.tobytes()
    n = len(data)

    def u32(x: int) -> bytes:
        return int(x).to_bytes(4, "little")

    def u16(x: int) -> bytes:
        return int(x).to_bytes(2, "little")

    return (
        b"RIFF" + u32(36 + n) + b"WAVE"
        + b"fmt " + u32(16) + u16(1) + u16(1) + u32(sample_rate)
        + u32(sample_rate * 2) + u16(2) + u16(16)
        + b"data" + u32(n) + data
    )


def decode_wav_pcm16(blob: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes → (samples int16, sample_rate)."""
    if len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise MediaDecodeError(PARSE_ERROR)
    if blob[12:16] != b"fmt " or blob[36:40] != b"data":
        raise MediaDecodeError(PARSE_ERROR)
    audio_format = int.from_bytes(blob[20:22], "little")
    channels = int.from_bytes(blob[22:24], "little")
    bits = int.from_bytes(blob[34:36], "little")
    if audio_format != 1 or channels != 1 or bits != 16:
        raise MediaDecodeError(PARSE_ERROR)
    sample_rate = int.from_bytes(blob[24:28], "little")
    n = int.from_bytes(blob[40:44], "little")
    if len(blob) - 44 < n or n % 2:
        raise MediaDecodeError(PARSE_ERROR)
    return np.frombuffer(blob, dtype="<i2", count=n // 2, offset=44), sample_rate


def wav_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Real audio features: duration, RMS, peak, zero-crossing rate."""
    f = samples.astype(np.float64) / 32768.0
    zc = int(np.count_nonzero(np.signbit(f[1:]) != np.signbit(f[:-1]))) if len(f) > 1 else 0
    return {
        "n_samples": int(len(samples)),
        "sample_rate": int(sample_rate),
        "duration_s": float(len(samples) / sample_rate) if sample_rate else 0.0,
        "rms": float(np.sqrt(np.mean(f * f))) if len(f) else 0.0,
        "peak": float(np.max(np.abs(f))) if len(f) else 0.0,
        "zero_crossings": zc,
    }


def resample_decimate(samples: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor decimation (the resample shape without a FIR lib)."""
    if factor <= 0:
        raise ValueError("factor must be positive")
    return samples[::factor]


# ---------------------------------------------------------------------------
# Deterministic synthetic payload generators (content-seeded, so tests and
# benchmarks are reproducible without external media files)
# ---------------------------------------------------------------------------

def synth_pixels(seed: int, h: int, w: int) -> np.ndarray:
    """Deterministic RGB pixels from a 64-bit seed (splitmix64 stream)."""
    from hepdata_validator_ray.ops import splitmix64

    idx = np.arange(h * w * 3, dtype=np.uint64) + (np.uint64(seed) << np.uint64(20))
    return (splitmix64(idx) & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)


def synth_samples(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 mono samples from a 64-bit seed."""
    from hepdata_validator_ray.ops import splitmix64

    idx = np.arange(n, dtype=np.uint64) + (np.uint64(seed) << np.uint64(24))
    return (splitmix64(idx) & np.uint64(0xFFFF)).astype(np.uint16).view(np.int16).copy()
