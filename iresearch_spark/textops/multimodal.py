"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
typed metadata struct — the Spark-side schema, partitioning, Arrow batch
shape and UDF signatures here are real and tested; only the codec step is
stubbed (no image/audio libraries exist in this container). Decode kernels
are `mapInPandas` over Arrow batches — the same vectorized shape a real
libjpeg/libsndfile-backed kernel would use, so swapping in a real decoder
changes one function body and nothing else.

MEDIA_SCHEMA rows: (media_id, modality, payload binary, url).
Feature rows:      (media_id, modality, n_bytes, sha256, magic,
                    width, height, n_frames).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "media_id bigint, modality string, payload binary, url string"
FEATURE_SCHEMA = (
    "media_id bigint, modality string, n_bytes int, sha256 string, "
    "magic string, width int, height int, n_frames int"
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"RIFF": "riff",
    b"\x1aE\xdf\xa3": "mkv",
}


def _sniff_magic(b: bytes) -> str:
    for sig, name in _MAGIC.items():
        if b[: len(sig)] == sig:
            return name
    return "unknown"


def decode_payload(payload: bytes, modality: str) -> dict:
    """THE codec stub. A real deployment decodes here (PIL/ffmpeg/soundfile);
    this sandbox has none of those, so raise unless the deterministic fake
    is requested via decode_features(fake=True)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_features(df, fake=True) for the deterministic stand-in"
    )


def _fake_decode(payload: bytes, modality: str) -> tuple[int, int, int]:
    """Deterministic stand-in for (width, height, n_frames): derived from
    payload length so tests are stable and schema/typing stay real."""
    n = len(payload)
    if modality == "image":
        return (n % 640) + 1, (n % 480) + 1, 1
    if modality == "video":
        return (n % 640) + 1, (n % 480) + 1, (n % 30) + 1
    return 0, 0, (n % 1000) + 1  # audio: frames = samples


def decode_features(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Vectorized feature extraction over media batches.

    Real parts: Arrow batching, per-batch pandas ops, sha256/magic/byte
    stats. Stubbed part: pixel/sample decode (see decode_payload)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            dims = []
            for p, m in zip(payloads, pdf["modality"]):
                b = bytes(p) if p is not None else b""
                if fake:
                    dims.append(_fake_decode(b, m))
                else:
                    dims.append(decode_payload(b, m))  # raises: stub
            w, h, fr = (list(x) for x in zip(*dims)) if dims else ([], [], [])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in payloads],
                    "sha256": [
                        hashlib.sha256(bytes(p) if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "magic": [
                        _sniff_magic(bytes(p) if p is not None else b"") for p in payloads
                    ],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "n_frames": pd.array(fr, dtype="int32"),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, *, fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per kept
    frame index (real Spark-side fan-out; frame bytes stubbed as empty)."""
    feats = decode_features(media.filter(F.col("modality") == "video"), fake=fake)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def binary_meta(docs: DataFrame, top: int = 100) -> DataFrame:
    """Driver-checkable binary-column round trip: encode text as UTF-8
    payload, report byte length + sha256 (oracle: octet_length/sha256)."""
    payload = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    return (
        docs.select(
            "doc_id",
            F.length(payload).cast("int").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        )
        .orderBy("doc_id")
        .limit(top)
    )


def binary_meta_sql(top: int = 100) -> str:
    return f"""
SELECT doc_id, octet_length(encode(coalesce(text, '')))::INT AS n_bytes,
       sha256(coalesce(text, '')) AS sha256
FROM documents ORDER BY doc_id LIMIT {top}"""
