"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning) is
real and tested; the actual codec step is STUBBED because image/audio
libraries are not available in this environment. Set fake=True for a
deterministic stand-in (crc32-derived features) so pipelines and tests
run end-to-end; fake=False raises NotImplementedError inside the UDF,
marking exactly where a real decoder (PIL/ffmpeg) plugs in.
"""

from __future__ import annotations

import zlib

MEDIA_META_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "duration_ms int"
)

FEATURE_SCHEMA = (
    "media_ref string, media_type string, n_bytes long, checksum long, "
    "feature array<float>"
)


def attach_payload(df, ref_col: str = "media_ref"):
    """Deterministic fake payload bytes for a media_ref (stand-in for an
    object-store fetch; at scale this is a mapInPandas ranged GET)."""
    from pyspark.sql import functions as F

    return df.withColumn(
        "payload", F.encode(F.concat(F.lit("payload:"), F.col(ref_col)), "utf-8")
    )


RESIZE_SCHEMA = "media_ref string, width int, height int, payload binary"
FRAME_SCHEMA = "media_ref string, frame_idx int, ts_ms int, payload binary"


def resize_images(df, width: int, height: int, fake: bool = True):
    """mapInPandas resize over (media_ref, payload). Decode/encode is
    STUBBED (no PIL here): fake=True emits a deterministic payload
    derived from the input bytes + target size; fake=False raises at
    the decoder plug point. Batch shape and schema are the real ones."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            refs, ws, hs, outs = [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "image resize requires PIL; not available here"
                    )
                data = bytes(payload) if payload is not None else b""
                crc = zlib.crc32(data) & 0xFFFFFFFF
                refs.append(ref)
                ws.append(width)
                hs.append(height)
                outs.append(
                    f"resized:{width}x{height}:{crc:08x}".encode("ascii")
                )
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "payload": outs,
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(df, every_ms: int = 1000, duration_ms: int = 5000, fake: bool = True):
    """Frame sampling for video payloads: one output row per sampled
    frame (fan-out inside mapInPandas). Decode is stubbed; the frame
    schedule and row explosion are real."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            refs, idxs, tss, outs = [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg; not available here"
                    )
                data = bytes(payload) if payload is not None else b""
                crc = zlib.crc32(data) & 0xFFFFFFFF
                for k, ts in enumerate(range(0, duration_ms, every_ms)):
                    refs.append(ref)
                    idxs.append(k)
                    tss.append(ts)
                    outs.append(f"frame:{k}:{crc:08x}".encode("ascii"))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "ts_ms": pd.array(tss, dtype="int32"),
                    "payload": outs,
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_media_features(df, fake: bool = True, dim: int = 8):
    """mapInPandas over (media_ref, payload:binary) -> FEATURE_SCHEMA.

    Real decode is stubbed: fake=True emits deterministic crc32-seeded
    features; fake=False raises NotImplementedError (decoder plug point).
    """
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            refs, types, nbytes, sums, feats = [], [], [], [], []
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg; "
                        "not available in this environment"
                    )
                data = bytes(payload) if payload is not None else b""
                crc = zlib.crc32(data) & 0xFFFFFFFF
                rng = np.random.RandomState(crc % (2**31))
                refs.append(ref)
                types.append(
                    "image" if "img" in (ref or "") else "embed"
                )
                nbytes.append(len(data))
                sums.append(crc)
                feats.append(rng.rand(dim).astype("float32").tolist())
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "media_type": types,
                    "n_bytes": pd.array(nbytes, dtype="int64"),
                    "checksum": pd.array(sums, dtype="int64"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
