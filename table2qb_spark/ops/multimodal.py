"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real and tested — schema, batch shape,
partition-friendly mapInPandas UDFs operating on Arrow record batches.
Decode modes (``decode_media``):

* ``"headers"`` (default real path): pure-Python container-header parse for
  PNG / JPEG / GIF — real width/height from real bytes, zero codec
  dependencies. Pixel data is NOT decoded (dimension metadata only).
* ``"pil"``: full decode via Pillow when importable (the dependency seam —
  not baked into this container; raises ImportError otherwise).
* ``"auto"``: PIL if importable, else headers.
* ``fake=True``: deterministic hash-derived metadata — the oracle-friendly
  stub that exercises the full pipeline without real media bytes.
"""

from __future__ import annotations

import hashlib
import struct
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def image_dims(payload: bytes) -> tuple[int | None, int | None]:
    """(width, height) from real container headers — PNG IHDR, JPEG SOFn
    scan, GIF logical screen descriptor. Returns (None, None) for anything
    unrecognized/truncated (never raises: one corrupt blob must not kill a
    100TB decode job — filter on null dims downstream)."""
    b = payload
    try:
        if b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
            return (
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
            )
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return w, h
        if b[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOFn marker
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return w, h
                i += 2 + seg_len
    except Exception:
        pass
    return None, None


def wav_meta(payload: bytes) -> dict:
    """Audio metadata from a real RIFF/WAVE header: sample_rate from the
    fmt chunk, n_frames = data-chunk bytes / block align. Same never-raise
    contract as ``image_dims`` (corrupt blobs -> all-null metadata); chunk
    walk honors word alignment, so appended/unknown chunks are skipped."""
    b = payload
    out = {"width": None, "height": None, "n_frames": None, "sample_rate": None}
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return out
        i, sample_rate, block_align, data_size = 12, None, None, None
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            sz = int.from_bytes(b[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 22 <= len(b):
                sample_rate = int.from_bytes(b[i + 12 : i + 16], "little")
                block_align = int.from_bytes(b[i + 20 : i + 22], "little")
            elif cid == b"data":
                data_size = sz
            i += 8 + sz + (sz & 1)  # RIFF chunks are word-aligned
        out["sample_rate"] = sample_rate
        if data_size is not None and block_align:
            out["n_frames"] = data_size // block_align
    except Exception:
        pass
    return out


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, box_end) for each ISO-BMFF box in
    [start, end); stops on malformed sizes instead of raising."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i : i + 4], "big")
        if size < 8 or i + size > end:
            return
        yield b[i + 4 : i + 8], i + 8, i + size
        i += size


def mp4_meta(payload: bytes) -> dict:
    """Video metadata from real ISO-BMFF (MP4) boxes: track width/height
    from the first tkhd (16.16 fixed point), n_frames from the first stsz
    sample count (moov/trak/mdia/minf/stbl walk). Never raises."""
    b = payload
    out = {"width": None, "height": None, "n_frames": None, "sample_rate": None}
    try:
        containers = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}
        stack = [(0, len(b))]
        while stack:
            lo, hi = stack.pop()
            for typ, ps, pe in _mp4_boxes(b, lo, hi):
                if typ in containers:
                    stack.append((ps, pe))
                elif typ == b"tkhd" and out["width"] is None and pe - ps >= 84:
                    # v0 payload: ver/flags 4, times 8, id 4, res 4, dur 4,
                    # res 8, layer/alt/vol/res 8, matrix 36, then w/h 16.16
                    out["width"] = int.from_bytes(b[pe - 8 : pe - 4], "big") >> 16
                    out["height"] = int.from_bytes(b[pe - 4 : pe], "big") >> 16
                elif typ == b"stsz" and out["n_frames"] is None and pe - ps >= 12:
                    out["n_frames"] = int.from_bytes(b[ps + 8 : ps + 12], "big")
    except Exception:
        pass
    return out


def _pil_decode(payload: bytes) -> dict:
    """Full decode via Pillow — the optional-dependency seam (PIL is not in
    this container; any environment with Pillow gets pixel-verified dims and
    frame counts)."""
    import io

    from PIL import Image  # noqa: F401 — optional dependency

    with Image.open(io.BytesIO(payload)) as im:
        return {
            "width": im.width,
            "height": im.height,
            "n_frames": getattr(im, "n_frames", 1),
            "sample_rate": None,
        }


def decode_media(df: DataFrame, fake: bool = False, mode: str = "headers") -> DataFrame:
    """mapInPandas decode stage: Arrow batches in/out, vectorized metadata.

    ``fake=True`` overrides ``mode`` with the deterministic stub decoder
    (oracle runs). ``mode``: "headers" (pure-Python container headers, the
    dependency-free real path), "pil" (full Pillow decode, ImportError when
    absent), or "auto" (pil if importable else headers). Audio parses
    RIFF/WAVE headers and video ISO-BMFF (MP4) boxes in every real mode
    (PIL handles neither); unknown kinds yield null metadata."""
    if mode == "auto":
        try:
            import PIL  # noqa: F401

            mode = "pil"
        except ImportError:
            mode = "headers"
    if mode not in ("headers", "pil"):
        raise ValueError(f"unknown decode mode {mode!r}")

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                b = bytes(p)
                if fake:
                    meta.append(_fake_decode(b, k))
                elif k == "image":
                    if mode == "pil":
                        m = _pil_decode(b)
                    else:
                        w, h = image_dims(b)
                        m = {
                            "width": w,
                            "height": h,
                            "n_frames": 1 if w is not None else None,
                            "sample_rate": None,
                        }
                    meta.append(m)
                elif k == "audio":
                    meta.append(wav_meta(b))  # RIFF/WAVE header parse
                elif k == "video":
                    meta.append(mp4_meta(b))  # ISO-BMFF box walk
                else:
                    meta.append(
                        {"width": None, "height": None, "n_frames": None,
                         "sample_rate": None}
                    )
            out = pdf[["media_id", "kind", "byte_len", "sha256"]].copy()
            for key in ("width", "height", "n_frames", "sample_rate"):
                out[key] = pd.array([m[key] for m in meta], dtype="Int64")
            yield out

    return df.mapInPandas(decode_batch, schema=DECODED_SCHEMA)
