"""Pure-python media codecs on the standard library (no PIL/ffmpeg in the
container): PNG (zlib) and WAV-PCM (struct), plus a trivial length-prefixed
frame container for video-shaped tests.

These make the multimodal decode path REAL instead of stubbed: a PNG or WAV
payload decodes to pixels/samples with only stdlib.  JPEG/H.264 and friends
still need real codec libraries — :mod:`multimodal` falls back to them via
import-try and raises a clear error otherwise.

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced, all five scanline filters.  Enough for thumbnails,
test fixtures and most web PNGs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (int(line[x]) + int(line[x - ch])) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - ch]) if x >= ch else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 -> PNG bytes (filter 0, one IDAT)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(arr[y].tobytes())
    comp = zlib.compress(bytes(raw), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")


def resize_nearest(arr: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """Nearest-neighbour resize to (height, width) — fully vectorized."""
    th, tw = size
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(th) + 0.5) * h / th, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(tw) + 0.5) * w / tw, w - 1).astype(np.int64)
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float32 samples in [-1, 1] shaped (N, channels), rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            samples = body
    if fmt is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _bps, _align, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only 16-bit PCM WAV supported")
    arr = np.frombuffer(samples, dtype="<i2").astype(np.float32) / 32768.0
    if n_ch > 1:
        arr = arr[: len(arr) - len(arr) % n_ch].reshape(-1, n_ch)
    else:
        arr = arr.reshape(-1, 1)
    return arr, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(N,) or (N, C) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    pcm = np.clip(arr * 32767.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


# ---------------------------------------------------------------------------
# frame container (video-shaped tests): "NSF1" + n x (len:u32 | PNG bytes)
# ---------------------------------------------------------------------------

_NSF_MAGIC = b"NSF1"


def encode_frames(frames: list[np.ndarray]) -> bytes:
    out = bytearray(_NSF_MAGIC)
    out.extend(struct.pack("<I", len(frames)))
    for f in frames:
        png = encode_png(f)
        out.extend(struct.pack("<I", len(png)))
        out.extend(png)
    return bytes(out)


def iter_frames(data: bytes):
    """Yield (index, PNG bytes) WITHOUT decoding — frame sampling can skip
    payloads it doesn't need."""
    if data[:4] != _NSF_MAGIC:
        raise ValueError("not an NSF1 frame container")
    (n,) = struct.unpack("<I", data[4:8])
    pos = 8
    for i in range(n):
        (length,) = struct.unpack("<I", data[pos:pos + 4])
        yield i, data[pos + 4:pos + 4 + length]
        pos += 4 + length
