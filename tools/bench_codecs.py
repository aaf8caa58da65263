"""PNG + JPEG codec throughput (no Spark; numpy-only).

PNG: decode MB/s of raw pixel output for synthetic RGB images whose
every scanline uses one fixed filter type, by round-tripping through a
reference filter-encoder and parse_html_spark.functions.codecs.decode_png.
JPEG: encode/decode MB/s of the pure-Python baseline codec
(functions/jpeg.py) for gray, RGB 4:4:4 and RGB 4:2:0 variants.
Rewrites BENCH/CODECS.md.

Usage: python tools/bench_codecs.py [side_px] [reps]
"""

from __future__ import annotations

import os
import struct
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parse_html_spark.functions.codecs import PNG_SIG, decode_png  # noqa: E402


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def encode_with_filter(img: np.ndarray, ftype: int) -> bytes:
    """Reference encoder: apply PNG filter `ftype` to every scanline
    (slow scalar code -- correctness reference only, not measured)."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = flat[y]
        out = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (line[x] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def main() -> None:
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    rng = np.random.RandomState(42)
    # smooth gradient + noise: compressible like a real photo, and every
    # filter's arithmetic is exercised with realistic residuals
    yy, xx = np.mgrid[0:side, 0:side]
    base = ((yy + xx) % 256).astype(np.uint8)
    img = np.stack(
        [base, base[::-1], rng.randint(0, 256, (side, side), dtype=np.uint8)],
        axis=2,
    )
    mb = img.nbytes / 1e6
    names = {0: "None", 1: "Sub", 2: "Up", 3: "Average", 4: "Paeth"}
    lines = [
        "# PNG decode throughput (tools/bench_codecs.py)",
        "",
        f"RGB {side}x{side} ({mb:.2f} MB raw pixels), every scanline the "
        f"same filter; best of {reps} decode reps, single thread.",
        "",
        "| filter | decode MB/s (pixel output) |",
        "|---|---|",
    ]
    for ftype in range(5):
        data = encode_with_filter(img, ftype)
        back = decode_png(data)
        assert np.array_equal(back, img), f"filter {ftype} round-trip"
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            decode_png(data)
            best = min(best, time.perf_counter() - t0)
        rate = mb / best
        lines.append(f"| {ftype} ({names[ftype]}) | {rate:.1f} |")
        print(f"filter {ftype} ({names[ftype]}): {rate:.1f} MB/s", file=sys.stderr)
    lines += [
        "",
        "Filters 0/1/2 are fully vectorized (copy / per-lane uint8 cumsum /",
        "whole-row add). Filters 3/4 (Average/Paeth) are sequential across",
        "pixels BY SPEC (each decoded pixel feeds the next prediction) and",
        "run per-channel-lane plain-int recurrences with running locals;",
        "their MB/s above is the honest cost envelope per decoded megapixel.",
        "",
    ]

    # -- JPEG (pure-Python baseline codec) --------------------------------
    from parse_html_spark.functions.jpeg import decode_jpeg, encode_jpeg

    lines += [
        "# JPEG codec throughput (functions/jpeg.py)",
        "",
        f"Same {side}x{side} synthetic image, quality 85; best of {reps} "
        "reps, single thread. MB/s measured on raw pixel bytes.",
        "",
        "| variant | encode MB/s | decode MB/s |",
        "|---|---|---|",
    ]
    from parse_html_spark.functions.jpeg import encode_jpeg_progressive

    variants = [
        ("gray", img[:, :, 0], encode_jpeg, {}),
        ("RGB 4:4:4", img, encode_jpeg, {}),
        ("RGB 4:2:0", img, encode_jpeg, {"subsample": True}),
        ("RGB 4:2:0 + DRI", img, encode_jpeg,
         {"subsample": True, "restart_interval": 8}),
        ("progressive gray", img[:, :, 0], encode_jpeg_progressive, {}),
        ("progressive RGB 4:4:4", img, encode_jpeg_progressive, {}),
        ("progressive RGB 4:2:0", img, encode_jpeg_progressive,
         {"subsample": True}),
    ]
    for name, src, enc, kw in variants:
        mbv = src.nbytes / 1e6
        data = enc(src, quality=85, **kw)
        out_img = decode_jpeg(data)
        assert out_img.shape == src.shape, (name, out_img.shape)
        enc_best = dec_best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            enc(src, quality=85, **kw)
            enc_best = min(enc_best, time.perf_counter() - t0)
            t0 = time.perf_counter()
            decode_jpeg(data)
            dec_best = min(dec_best, time.perf_counter() - t0)
        lines.append(f"| {name} | {mbv / enc_best:.1f} | {mbv / dec_best:.1f} |")
        print(
            f"jpeg {name}: enc {mbv / enc_best:.1f} MB/s, "
            f"dec {mbv / dec_best:.1f} MB/s",
            file=sys.stderr,
        )
    lines += [
        "",
        "Encode is numpy-batched (whole-plane FDCT) except the per-block",
        "Huffman bit-writer. Decode entropy is inherently serial but runs",
        "a 16-bit LUT Huffman reader (one peek + one list index per",
        "symbol, reader state inlined as local ints) over pre-unstuffed",
        "restart segments; dequant/IDCT/plane assembly are one batched",
        "numpy pass per component (round 4: ~3x the bit-by-bit reader).",
        "Progressive (SOF2) decode -- spectral-selection + successive-",
        "approximation scans with DC/AC refinement and EOBn runs (round",
        "5) -- revisits every band per scan, so its MB/s trails baseline",
        "by the scan count; parity with baseline pixels is pinned in",
        "test_jpeg. Single-digit MB/s remains the honest 'no external",
        "deps' envelope -- bulk image corpora should use the documented",
        "external-decoder plug point (media.py), same as video.",
        "",
    ]
    # -- GIF (pure-Python LZW codec, round 6) -----------------------------
    from parse_html_spark.functions.gif import decode_gif, encode_gif

    lines += [
        "# GIF codec throughput (functions/gif.py)",
        "",
        f"{side}x{side} palette images; best of {reps} reps, single "
        "thread. MB/s measured on raw pixel bytes (3 bytes/px).",
        "",
        "| variant | encode MB/s | decode MB/s |",
        "|---|---|---|",
    ]
    pal16 = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    pal256 = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    smooth = pal16[((yy + xx) // 32) % 16]
    noisy = pal256[rng.randint(0, 256, (side, side))]
    gif_variants = [
        ("16-color smooth", smooth, {}),
        ("16-color smooth interlaced", smooth, {"interlace": True}),
        ("256-color noise", noisy, {}),
    ]
    for name, src, kw in gif_variants:
        mbv = src.nbytes / 1e6
        data = encode_gif(src, **kw)
        assert np.array_equal(decode_gif(data), src), name
        enc_best = dec_best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            encode_gif(src, **kw)
            enc_best = min(enc_best, time.perf_counter() - t0)
            t0 = time.perf_counter()
            decode_gif(data)
            dec_best = min(dec_best, time.perf_counter() - t0)
        lines.append(f"| {name} | {mbv / enc_best:.1f} | {mbv / dec_best:.1f} |")
        print(
            f"gif {name}: enc {mbv / enc_best:.1f} MB/s, "
            f"dec {mbv / dec_best:.1f} MB/s",
            file=sys.stderr,
        )
    lines += [
        "",
        "LZW decode (round 7) unpacks whole fixed-width code runs in",
        "one numpy gather (the width schedule between clears is",
        "deterministic) and emits via (start, len) slice copies into",
        "the output buffer -- the only per-code Python left is integer",
        "table bookkeeping (~2.5-3x round 6, measured against the",
        "unchanged encoder as the throttle control). Palette lookup,",
        "deinterlace, and frame composition are single numpy passes.",
        "Same envelope note as JPEG: real for features-at-ingest,",
        "external plug for bulk.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "CODECS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
