"""Multimodal column plumbing (driver mandate): image/audio/video as opaque
`binary` columns with typed metadata.

The Spark-side plumbing is REAL (schema, Arrow batch shape, partitioning,
UDF signature, payload-hygiene: bytes are hashed and summarized, never
carried through shuffles); the pixel/sample decode is STUBBED — the decode
libs (PIL/ffmpeg) aren't in this container, so `decode_image_meta` uses a
clearly-marked deterministic fake derived from the payload bytes, and raises
NotImplementedError for real decoding when the lib is absent.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: (doc_id, media_type, payload binary,
    n_bytes, payload_sha256). Payload = utf-8 bytes of the text (a stand-in
    for image bytes; the plumbing — binary column + metadata — is the real
    part). All JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake image metadata from payload bytes (STUB — stands
    in for a real decoder; keeps the whole pipeline testable without PIL)."""
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    fmt = ["png", "jpeg", "webp"][d[2] % 3]
    return width, height, fmt


def decode_image_meta(media: DataFrame, real: bool = False) -> DataFrame:
    """(doc_id, width, height, format) via mapInPandas over binary payloads.

    real=True requires an actual decoder (PIL) — raises NotImplementedError
    in this container; real=False uses the deterministic fake decode.
    """
    if real and not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL, which is not installed; "
            "use real=False for the deterministic stub"
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_fake_decode(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "format": [m[2] for m in meta],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        _batches, schema="doc_id long, width int, height int, format string"
    )
