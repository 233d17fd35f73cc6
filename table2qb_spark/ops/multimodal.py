"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real and tested — schema, batch shape,
partition-friendly mapInPandas UDFs operating on Arrow record batches. The
actual media decode is STUBBED (no image/audio libs in this container):
``decode_image_batch`` raises NotImplementedError unless ``fake=True``, in
which case a deterministic fake decoder derives typed metadata from the
bytes, so the full pipeline (binary -> decode -> features) is exercised
end-to-end without the codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, byte_len int, sha256 string"
)

DECODED_SCHEMA = (
    "media_id long, kind string, byte_len int, sha256 string, "
    "width int, height int, n_frames int, sample_rate int"
)


def to_media_df(df: DataFrame, id_col: str, payload_col: str, kind: str) -> DataFrame:
    """Wrap an arbitrary binary-bearing DataFrame into the media shape with
    typed metadata computed JVM-side (no decode needed for these)."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        p.alias("payload"),
        F.length(p).cast("int").alias("byte_len"),
        F.sha2(p, 256).alias("sha256"),
    )


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic fake decoder: metadata derived from the payload hash."""
    h = hashlib.sha256(payload).digest()
    if kind == "image":
        return {
            "width": 64 + h[0] % 192,
            "height": 64 + h[1] % 192,
            "n_frames": 1,
            "sample_rate": None,
        }
    if kind == "audio":
        return {"width": None, "height": None, "n_frames": None, "sample_rate": 8000 * (1 + h[2] % 6)}
    if kind == "video":
        return {"width": 320, "height": 240, "n_frames": 1 + h[3] % 300, "sample_rate": None}
    return {"width": None, "height": None, "n_frames": None, "sample_rate": None}


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in/out, vectorized metadata.

    Real decoders (PIL / soundfile / pyav) slot into ``decode_batch`` —
    STUBBED here (NotImplementedError) unless ``fake=True``."""

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "run with fake=True for the deterministic stub decoder"
                )
            meta = [
                _fake_decode(bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pdf[["media_id", "kind", "byte_len", "sha256"]].copy()
            for key in ("width", "height", "n_frames", "sample_rate"):
                out[key] = pd.array([m[key] for m in meta], dtype="Int64")
            yield out

    return df.mapInPandas(decode_batch, schema=DECODED_SCHEMA)
