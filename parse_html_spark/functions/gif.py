"""GIF87a/89a codec in pure stdlib + numpy (no external libraries).

Implements the public CompuServe GIF specification (GIF89a, 1990; the
same document W3C mirrors) including Appendix-F LZW with variable code
widths, deferred clear codes, interlacing, local color tables,
sub-rectangle frame placement, and the Graphic Control Extension's
transparency flag. Decode returns the FIRST frame composed onto the
logical screen (background-filled, transparent pixels left as
background) -- the right semantic for feature extraction over crawl
images, where animated GIFs contribute their poster frame;
``gif_frame_count`` reports animation length without decoding pixels.

Error contract matches the sibling codecs (codecs.py/jpeg.py):
malformed input raises ValueError, never a bare IndexError/struct
error -- flag-mode census code matches one exception type.

Reference parity note: the reference engine (ijortengab/parse-html)
has no media layer at all (it takes caller strings,
src/ParseHTML.php:136-149); this module belongs to the engine-new
multimodal source layer, closing the GIF share of crawl images that
round-5's VERDICT ranked as the largest remaining implementable
format (WebP/AVIF/video remain documented external plug points).
"""

from __future__ import annotations

import struct
from array import array

import numpy as np

from .codecs import MAX_IMAGE_PIXELS

_MAX_CODE = 4096  # 12-bit LZW ceiling fixed by the GIF spec

MAX_PIXELS = MAX_IMAGE_PIXELS  # shared decompression-bomb ceiling


def _lzw_decode(data: bytes, mcs: int, expected: int) -> np.ndarray:
    """Appendix-F LZW: variable width (mcs+1 .. 12 bits, LSB-first),
    clear/EOI codes, KwKwK case, deferred clear after a full table.

    Vectorized two ways (round-6 VERDICT #6, the 4.5 MB/s per-code
    Python loop): (1) code extraction -- between clears the width
    schedule is deterministic (the table grows one entry per code
    until it reaches 2^width), so whole fixed-width runs of codes are
    unpacked in one numpy gather over precomputed 24-bit byte windows
    instead of a per-code bit loop; (2) emission -- every dynamic
    table entry's expansion already exists verbatim in the decoded
    output (entry = previous emission + one char, and the previous
    emission is the bytes just written), so the table stores
    (start, len) slices into the output buffer and each code emits
    with one C-speed ``out += out[s:s+L]`` slice copy instead of
    building Python int lists. Returns a numpy array (uint8 for the
    GIF-real mcs <= 8, uint16 for the 9..11 tail)."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW minimum code size {mcs}")
    clear = 1 << mcs
    eoi = clear + 1
    # 24-bit little-endian window at every byte offset: any <=12-bit
    # code spans at most 19 bits, so (w24[bit>>3] >> (bit&7)) & mask
    # extracts it in one vectorized gather. 2-byte zero pad keeps the
    # last windows in range.
    buf = np.frombuffer(data + b"\x00\x00", dtype=np.uint8).astype(np.uint32)
    w24 = buf[:-2] | (buf[1:-1] << 8) | (buf[2:] << 16)
    total_bits = len(data) * 8
    # output buffer doubles as the string table's backing store
    out: bytearray | array = bytearray() if mcs <= 8 else array("H")
    start = [0] * _MAX_CODE  # dynamic-entry slices into `out`
    length = [0] * _MAX_CODE
    next_code = eoi + 1
    width = mcs + 1
    prev_len = 0  # 0 == no previous emission (stream start / post-clear)
    bit = 0
    opos = 0
    while opos < expected:
        # codes extractable at the CURRENT width: the table bumps the
        # width when it reaches 2^width, one append per code (the
        # first post-clear code appends nothing)
        if next_code < _MAX_CODE:
            room = (1 << width) - next_code + (1 if prev_len == 0 else 0)
        else:
            room = 1 << 15  # table frozen at 4096: width fixed, chunk
        avail = (total_bits - bit) // width
        if avail <= 0:
            raise ValueError("truncated LZW stream")
        n = min(room, avail, expected - opos)
        offs = bit + width * np.arange(n, dtype=np.int64)
        codes = (w24[offs >> 3] >> (offs & 7).astype(np.uint32)) & (
            (1 << width) - 1
        )
        specials = np.flatnonzero((codes == clear) | (codes == eoi))
        stop = int(specials[0]) if specials.size else n
        for code in codes[:stop].tolist():
            if code < clear:
                out.append(code)
                elen = 1
            elif code < next_code:
                s = start[code]
                elen = length[code]
                out += out[s : s + elen]
            elif code == next_code and prev_len:
                s = opos - prev_len  # KwKwK: prev + prev[0]
                out += out[s : s + prev_len]
                out.append(out[s])
                elen = prev_len + 1
            elif prev_len == 0:
                raise ValueError(f"bad first LZW code {code}")
            else:
                raise ValueError(f"LZW code {code} out of range")
            if prev_len and next_code < _MAX_CODE:
                # new entry = prev emission + current's first char ==
                # the contiguous output slice [opos - prev_len, opos]
                start[next_code] = opos - prev_len
                length[next_code] = prev_len + 1
                next_code += 1
            opos += elen
            prev_len = elen
            if opos >= expected:
                break
        else:
            # batch fully consumed without reaching `expected`
            bit += width * stop
            if stop < n:  # hit a clear or EOI code
                code = int(codes[stop])
                bit += width
                if code == eoi:
                    break
                next_code = eoi + 1
                width = mcs + 1
                prev_len = 0
            elif next_code == (1 << width) and width < 12:
                width += 1
            continue
        break  # inner loop broke: expected reached mid-batch
    arr = np.frombuffer(
        out, dtype=np.uint8 if mcs <= 8 else np.uint16
    )
    return arr[:expected]


def _lzw_encode(indices, mcs: int) -> bytes:
    """Real LZW compression (not the fixed-width clear-spam shortcut),
    width transitions mirroring the decoder exactly."""
    clear = 1 << mcs
    eoi = clear + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    stream = bytearray()
    acc = 0
    nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    w: tuple = ()
    for k in indices:
        wk = w + (int(k),)
        if wk in table:
            w = wk
            continue
        put(table[w])
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # canonical (giflib) width transition: the code emitted
            # while next_code REACHES 2^width still uses the old
            # width; only codes after it widen. The decoder's
            # append-then-check len==2^width mirrors this exactly
            # (its table runs one entry behind the encoder's).
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            put(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = (int(k),)
    if w:
        put(table[w])
    put(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    return bytes(stream)


def _subblocks(data: bytes) -> bytes:
    """Pack bytes into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        piece = data[i : i + 255]
        out.append(len(piece))
        out += piece
    out.append(0)
    return bytes(out)


# interlace passes: (row offset, row step) in output order [spec 20.c]
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = np.concatenate(
        [np.arange(off, h, step) for off, step in _INTERLACE]
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def _interlace_rows(h: int) -> np.ndarray:
    return np.concatenate([np.arange(off, h, step) for off, step in _INTERLACE])


def decode_gif(data: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    """GIF -> (H, W, 3) uint8 RGB: the first frame composed onto the
    background-filled logical screen. Malformed input -> ValueError.

    max_pixels caps the logical screen (a 35-byte crafted GIF can
    declare a 65535x65535 screen = ~12.9 GB canvas; at crawl scale a
    decompression bomb must census as undecodable, not MemoryError an
    executor -- review r6)."""
    try:
        return _decode_gif(data, max_pixels)
    except (IndexError, struct.error, KeyError, OverflowError) as exc:
        raise ValueError(f"corrupt GIF: {type(exc).__name__}: {exc}") from exc


def _read_color_table(data: bytes, pos: int, packed: int, flag_bit: int):
    if not (packed >> flag_bit) & 1:
        return None, pos
    size = 2 << (packed & 0x7)
    raw = data[pos : pos + 3 * size]
    if len(raw) < 3 * size:
        raise ValueError("truncated color table")
    return np.frombuffer(raw, dtype=np.uint8).reshape(size, 3), pos + 3 * size


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ValueError("truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size


def _decode_gif(data: bytes, max_pixels: int = MAX_PIXELS) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        raise ValueError("zero-size logical screen")
    if sw * sh > max_pixels:
        raise ValueError(
            f"logical screen {sw}x{sh} exceeds max_pixels={max_pixels}"
        )
    gct, pos = _read_color_table(data, 13, packed, 7)
    transparent = None
    while True:
        if pos >= len(data):
            raise ValueError("GIF ended before any image data")
        block = data[pos]
        if block == 0x3B:  # trailer
            raise ValueError("GIF ended before any image data")
        if block == 0x21:  # extension
            if pos + 2 > len(data):
                raise ValueError("truncated extension")
            label = data[pos + 1]
            body_at = pos + 2
            if label == 0xF9 and body_at < len(data) and data[body_at] >= 4:
                gce_packed = data[body_at + 1]
                if gce_packed & 1:  # transparency flag
                    transparent = data[body_at + 4]
            pos = _skip_subblocks(data, body_at)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        left, top, w, h, ipacked = struct.unpack(
            "<HHHHB", data[pos + 1 : pos + 10]
        )
        if w == 0 or h == 0:
            raise ValueError("zero-size image descriptor")
        if left + w > sw or top + h > sh:
            # validated BEFORE the LZW pass: a frame claiming 65535^2
            # pixels would otherwise build a 4.3e9-int index list
            raise ValueError("frame extends past the logical screen")
        lct, pos = _read_color_table(data, pos + 10, ipacked, 7)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("image has neither local nor global color table")
        if pos >= len(data):
            raise ValueError("truncated before LZW data")
        mcs = data[pos]
        pos += 1
        # concatenate the LZW sub-blocks
        chunks = []
        while True:
            if pos >= len(data):
                raise ValueError("truncated LZW sub-blocks")
            size = data[pos]
            pos += 1
            if size == 0:
                break
            chunk = data[pos : pos + size]
            if len(chunk) < size:
                raise ValueError("truncated LZW sub-block")
            chunks.append(chunk)
            pos += size
        indices = _lzw_decode(b"".join(chunks), mcs, w * h)
        if indices.size != w * h:  # EOI before the frame was full
            raise ValueError("LZW stream ended short of the frame")
        idx = indices.reshape(h, w)
        if (ipacked >> 6) & 1:
            idx = _deinterlace(idx)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("palette index out of range")
        # compose the frame onto the background-filled logical screen
        if gct is not None and bg < len(gct):
            canvas = np.broadcast_to(gct[bg], (sh, sw, 3)).copy()
        else:
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
        frame = palette[idx]
        if transparent is not None and transparent < len(palette):
            region = canvas[top : top + h, left : left + w]
            mask = idx != transparent
            region[mask] = frame[mask]
        else:
            canvas[top : top + h, left : left + w] = frame
        return canvas


def gif_frame_count(data: bytes) -> int:
    """Number of image blocks (animation length) by walking the block
    structure only -- no pixel decode. Malformed input -> ValueError."""
    try:
        if data[:6] not in (b"GIF87a", b"GIF89a"):
            raise ValueError("not a GIF (bad signature)")
        packed = data[10]
        _gct, pos = _read_color_table(data, 13, packed, 7)
        count = 0
        while pos < len(data):
            block = data[pos]
            if block == 0x3B:
                break
            if block == 0x21:
                pos = _skip_subblocks(data, pos + 2)
                continue
            if block != 0x2C:
                raise ValueError(f"unknown GIF block 0x{block:02x}")
            ipacked = data[pos + 9]
            _lct, pos = _read_color_table(data, pos + 10, ipacked, 7)
            pos = _skip_subblocks(data, pos + 1)  # skip mcs byte + data
            count += 1
        return count
    except (IndexError, struct.error) as exc:
        raise ValueError(f"corrupt GIF: {type(exc).__name__}: {exc}") from exc


def _build_palette(arrs) -> tuple[np.ndarray, list[np.ndarray]]:
    """Shared palette + per-array index maps; >256 distinct colors is a
    fixture-authoring error (real encoders would quantize)."""
    stacked = np.concatenate([a.reshape(-1, 3) for a in arrs])
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors (GIF caps at 256)")
    maps = []
    off = 0
    for a in arrs:
        npix = a.shape[0] * a.shape[1]
        maps.append(
            inverse[off : off + npix].astype(np.int32).reshape(a.shape[:2])
        )
        off += npix
    return palette.astype(np.uint8), maps


def encode_gif(
    arr: np.ndarray,
    interlace: bool = False,
    version: str = "89a",
    local_palette: bool = False,
    transparent_color=None,
    comment: bytes | None = None,
    extra_frames: list | None = None,
) -> bytes:
    """(H, W, 3) uint8 -> GIF bytes (real LZW). Fixture-grade encoder:
    optional interlacing, local-vs-global color table, a Graphic
    Control transparency entry (transparent_color = an (r, g, b) the
    decoder must leave as background), an 89a comment extension, and
    extra (frame, left, top) tuples appended as further image blocks
    (animation; decoders take frame 1)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_gif expects (H, W, 3) uint8")
    frames = [(arr, 0, 0)] + [
        (np.asarray(f, dtype=np.uint8), left, top)
        for f, left, top in (extra_frames or [])
    ]
    palette, maps = _build_palette([f for f, _l, _t in frames])
    psize = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros((1 << psize, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    mcs = psize
    sh, sw = arr.shape[:2]
    out = bytearray(b"GIF" + version.encode("ascii"))
    gct_flag = 0 if local_palette else 1
    out += struct.pack(
        "<HHBBB", sw, sh, (gct_flag << 7) | ((psize - 1) & 0x7), 0, 0
    )
    if gct_flag:
        out += table.tobytes()
    if comment is not None:
        out += b"\x21\xfe" + _subblocks(comment)
    if transparent_color is not None:
        tc = np.asarray(transparent_color, dtype=np.uint8)
        hit = np.where((palette == tc).all(axis=1))[0]
        if not len(hit):
            raise ValueError("transparent_color not present in the image")
        out += b"\x21\xf9" + bytes([4, 1, 0, 0, int(hit[0]), 0])
    for fi, (frame, left, top) in enumerate(frames):
        idx = maps[fi]
        h, w = idx.shape
        if interlace and fi == 0:
            idx = idx[_interlace_rows(h)]
        ipacked = (0x40 if interlace and fi == 0 else 0)
        if local_palette:
            ipacked |= 0x80 | ((psize - 1) & 0x7)
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, ipacked)
        if local_palette:
            out += table.tobytes()
        out += bytes([mcs])
        out += _subblocks(_lzw_encode(idx.ravel(), mcs))
    out += b"\x3b"
    return bytes(out)
