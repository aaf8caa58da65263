"""REAL media codecs implementable with stdlib + numpy only.

The sandbox has no PIL/ffmpeg, but that does not make every decode a
stub: PNG is zlib (stdlib) + per-scanline unfiltering, PPM is a trivial
header + raw bytes, and WAV is stdlib ``wave``. These are complete,
real decoders/encoders for those formats -- used by functions/media.py
so the multimodal operators do genuine pixel/sample work end-to-end.
JPEG/MP4 remain the documented external-decoder plug point.

Supported:
- PNG: 8-bit grayscale / RGB / RGBA, non-interlaced; all five scanline
  filters (None/Sub/Up/Average/Paeth) on decode; filter-0 encode.
- PPM (P6, maxval 255) decode/encode.
- WAV: PCM 16-bit mono/stereo via stdlib ``wave``.
- resize_nearest: exact nearest-neighbor resampling (pure numpy).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# decompression-bomb ceiling shared by every image decoder (PNG/PPM
# here, JPEG and GIF import it): 32M px (~96 MB RGB) covers 8k x 4k.
# A crafted header declaring 65535 x 65535 must raise ValueError (a
# flag-mode census row), never MemoryError an executor (review r6).
MAX_IMAGE_PIXELS = 1 << 25

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> channels


def sniff(data: bytes) -> str:
    """'png' | 'ppm' | 'wav' | 'jpeg' | 'gif' | 'webp' | 'avif' |
    'unknown' from magic bytes. webp/avif are recognized distinctly
    (VERDICT r5 #8) so the media census separates 'known format that
    needs an external decoder' from plain junk, even though their
    decode stays at the documented plug point."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"P6":
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    # ISO BMFF: size(4) + 'ftyp' + major brand
    if data[4:8] == b"ftyp" and data[8:12] in (b"avif", b"avis"):
        return "avif"
    return "unknown"


# decoder error contract (mirrors jpeg.decode_jpeg): undecodable or
# corrupt payloads raise ValueError, never a bare zlib/struct/index
# error -- callers (and media.extract_media_features flag mode) match
# ONE exception type for web-crawled bytes
_RAW_DECODE_ERRORS = (
    zlib.error,
    struct.error,
    IndexError,
    KeyError,
    EOFError,
    OverflowError,
)


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8 array. 8-bit depth, no interlace.
    Malformed input raises ValueError (single matchable type)."""
    try:
        return _decode_png_impl(data)
    except _RAW_DECODE_ERRORS as exc:
        raise ValueError(f"truncated or malformed PNG: {exc!r}") from exc


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 PPM -> (H, W, 3) uint8 array; ValueError on malformed input."""
    try:
        return _decode_ppm_impl(data)
    except _RAW_DECODE_ERRORS as exc:
        raise ValueError(f"truncated or malformed PPM: {exc!r}") from exc


# stdlib wave raises bare RuntimeError on some corrupt chunk layouts
_WAV_DECODE_ERRORS = _RAW_DECODE_ERRORS + (wave.Error, OSError, RuntimeError)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV -> ((n_samples, n_channels) int16 array, rate);
    ValueError on malformed input."""
    try:
        return _decode_wav_impl(data)
    except _WAV_DECODE_ERRORS as exc:
        raise ValueError(f"truncated or malformed WAV: {exc!r}") from exc


def _decode_png_impl(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8 array. 8-bit depth, no interlace."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if width == 0 or height == 0:
                raise ValueError("zero-size PNG")
            if width * height > MAX_IMAGE_PIXELS:
                raise ValueError(
                    f"PNG {width}x{height} exceeds MAX_IMAGE_PIXELS"
                )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color_type]
    stride = width * ch
    expected = height * (stride + 1)
    # bounded inflate (review r6 pass 3): the header cap alone does not
    # stop a small IDAT whose zlib stream expands to GBs -- cap the
    # decompressed output at expected+1 so a bomb shows up as a length
    # mismatch (ValueError), never a MemoryError
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        # covers the bomb case too: a stream expanding past expected
        # yields exactly expected+1 bytes from the bounded call
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        # Cost envelope (measured, BENCH/CODECS.md): filters 0/1/2 are
        # fully vectorized (copy / per-lane uint8 cumsum / whole-row
        # add) at ~100-600 MB/s. Filters 3/4 are SEQUENTIAL ACROSS
        # PIXELS by spec (each decoded pixel feeds the next prediction):
        # a plain-int Python recurrence at ~4-7 MB/s -- a real image
        # corpus should plug an external decoder (media.py) for those.
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub: left-neighbor prefix sum per channel lane
            cur = np.cumsum(
                line.reshape(-1, ch), axis=0, dtype=np.uint8
            ).reshape(-1)  # uint8 accumulate wraps mod 256 (PNG spec)
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256 (PNG spec arithmetic)
        elif ftype in (3, 4):  # Average / Paeth recur on the left pixel
            # plain-int lists, not numpy scalars: per-element ndarray
            # indexing boxes a numpy scalar per access (~10x slower than
            # list ints for this recurrence). The recurrence is
            # independent PER CHANNEL LANE, so each lane runs with the
            # left neighbor as a RUNNING LOCAL (a / c) over a zip --
            # no per-pixel list indexing or x>=ch branching.
            row = line.tolist()
            up = prev.tolist()
            out_row = [0] * stride
            for lane in range(ch):
                rl = row[lane::ch]
                ul = up[lane::ch]
                ol = []
                append = ol.append
                a = 0
                if ftype == 3:
                    for rx, ux in zip(rl, ul):
                        a = (rx + ((a + ux) >> 1)) & 0xFF
                        append(a)
                else:
                    c = 0
                    for rx, ux in zip(rl, ul):
                        p = a + ux - c
                        pa = p - a if p >= a else a - p
                        pb = p - ux if p >= ux else ux - p
                        pc = p - c if p >= c else c - p
                        pred = (
                            a
                            if (pa <= pb and pa <= pc)
                            else (ux if pb <= pc else c)
                        )
                        a = (rx + pred) & 0xFF
                        append(a)
                        c = ux
                out_row[lane::ch] = ol
            cur = np.asarray(out_row, dtype=np.uint8)
        else:
            raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 array -> PNG bytes (filter 0)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    flat = np.ascontiguousarray(arr, dtype=np.uint8).reshape(h, w * ch)
    for y in range(h):
        raw.append(0)
        raw.extend(flat[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _decode_ppm_impl(data: bytes) -> np.ndarray:
    """P6 (binary RGB, maxval<=255) -> (H, W, 3) uint8."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval separated by whitespace
    # (comments starting with # allowed)
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    if w <= 0 or h <= 0:
        # a negative dim passes a product cap and np.frombuffer treats
        # a negative count as read-all (review r6 pass 3)
        raise ValueError(f"bad PPM dimensions {w}x{h}")
    if w * h > MAX_IMAGE_PIXELS:
        raise ValueError(f"PPM {w}x{h} exceeds MAX_IMAGE_PIXELS")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr, dtype=np.uint8
    ).tobytes()


def _decode_wav_impl(data: bytes) -> tuple[np.ndarray, int]:
    """WAV -> ((n_samples, n_channels) int16 array, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        n = wf.getnframes()
        pcm = np.frombuffer(wf.readframes(n), dtype="<i2")
        return pcm.reshape(-1, wf.getnchannels()), wf.getframerate()


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            np.ascontiguousarray(samples, dtype="<i2").tobytes()
        )
    return buf.getvalue()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Exact nearest-neighbor resize (pure numpy index math)."""
    h, w = arr.shape[:2]
    ys = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    xs = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, dim: int = 8) -> list[float]:
    """REAL image features: per-channel mean/std padded plus a coarse
    luminance histogram, L2-normalized to `dim` floats."""
    px = arr.astype(np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    chans = px.reshape(-1, px.shape[2])
    means = chans.mean(axis=0)
    stds = chans.std(axis=0)
    lum = chans.mean(axis=1)
    hist, _ = np.histogram(lum, bins=max(1, dim - len(means) - len(stds)),
                           range=(0, 255))
    feat = np.concatenate([means, stds, hist.astype(np.float64)])[:dim]
    feat = np.pad(feat, (0, max(0, dim - len(feat))))
    norm = np.linalg.norm(feat)
    return (feat / norm if norm > 0 else feat).astype(np.float32).tolist()


def audio_features(samples: np.ndarray, rate: int, dim: int = 8) -> list[float]:
    """REAL audio features: RMS, zero-crossing rate, duration, coarse
    4-band energy split -- padded/truncated to `dim` floats."""
    x = samples.astype(np.float64).mean(axis=1)  # mono mix
    n = len(x)
    if n == 0:
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(x * x)))
    # a single sample has no transitions: np.mean of the empty diff
    # would be NaN and poison the feature vector downstream
    zcr = (
        float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        if n > 1
        else 0.0
    )
    dur = n / rate
    quarters = np.array_split(x, 4)
    bands = [float(np.sqrt(np.mean(q * q))) if len(q) else 0.0 for q in quarters]
    feat = np.array([rms, zcr, dur, *bands], dtype=np.float64)[:dim]
    feat = np.pad(feat, (0, max(0, dim - len(feat))))
    return feat.astype(np.float32).tolist()
