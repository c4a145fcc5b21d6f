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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# SOF markers carrying frame dimensions: C0-CF except C4 (DHT), C8 (JPG
# extension), CC (DAC) — ITU T.81 table B.1.
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """Real width/height from PNG (IHDR), JPEG (SOF segment scan), or GIF
    (logical screen descriptor) header bytes — pure stdlib, no codec
    (VERDICT r3 item 5: un-stubs metadata decode for the formats that
    matter; pixel decode still needs PIL). None = not a recognized header
    (caller falls back to the labeled fake)."""
    if payload.startswith(_PNG_SIG) and len(payload) >= 24 and payload[12:16] == b"IHDR":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return w, h, "png"
    if payload.startswith(b"\xff\xd8"):
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None  # corrupt marker stream
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers, no length field
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF:
                if i + 9 > n:
                    return None
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return w, h, "jpeg"
            if marker == 0xDA:  # start of scan: entropy data, no SOF found
                return None
            i += 2 + seg_len
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return w, h, "gif"
    return None


def _decode_meta(payload: bytes) -> tuple[int, int, str]:
    return _parse_image_header(payload) or _fake_decode(payload)


def _parse_audio_header(p: bytes) -> tuple[int, int, int, int, str] | None:
    """Real (sample_rate, channels, bits_per_sample, n_samples, fmt) from
    WAV (RIFF chunk walk to `fmt ` + `data`) or FLAC (STREAMINFO bit-unpack)
    header bytes — pure stdlib, no codec, same design as
    `_parse_image_header`. Header-only: the data chunk's DECLARED size is
    trusted (a 100-TB scan sniffs the first KB of each object, it does not
    read audio payloads to count samples). None = unrecognized (caller
    falls back to the labeled fake)."""
    if p[:4] == b"RIFF" and len(p) >= 12 and p[8:12] == b"WAVE":
        i, n = 12, len(p)
        sr = ch = bits = data_sz = None
        while i + 8 <= n:
            cid = p[i : i + 4]
            sz = int.from_bytes(p[i + 4 : i + 8], "little")
            if cid == b"fmt " and sz >= 16 and i + 8 + 16 <= n:
                ch = int.from_bytes(p[i + 10 : i + 12], "little")
                sr = int.from_bytes(p[i + 12 : i + 16], "little")
                bits = int.from_bytes(p[i + 22 : i + 24], "little")
            elif cid == b"data":
                data_sz = sz
            if sr is not None and data_sz is not None:
                break
            i += 8 + sz + (sz & 1)  # chunks are word-aligned (RIFF spec)
        if sr and ch and bits and data_sz is not None:
            block_align = ch * bits // 8
            n_samples = data_sz // block_align if block_align else 0
            return sr, ch, bits, n_samples, "wav"
        return None
    if p[:4] == b"fLaC" and len(p) >= 8 + 34:
        # first metadata block must be STREAMINFO (type 0, 34 bytes)
        if p[4] & 0x7F != 0 or int.from_bytes(p[5:8], "big") < 34:
            return None
        info = p[8 : 8 + 34]
        # bytes 10..17: sample_rate(20) | channels-1(3) | bits-1(5) | total(36)
        packed = int.from_bytes(info[10:18], "big")
        sr = packed >> 44
        ch = ((packed >> 41) & 0x7) + 1
        bits = ((packed >> 36) & 0x1F) + 1
        n_samples = packed & ((1 << 36) - 1)
        if sr == 0:
            return None
        return sr, ch, bits, n_samples, "flac"
    return None


def _fake_audio_meta(p: bytes) -> tuple[int, int, int, int, str]:
    """Deterministic fake audio metadata (STUB fallback for payloads with
    no recognized header — mirrors `_fake_decode`)."""
    d = hashlib.sha256(p).digest()
    sr = [8000, 16000, 22050, 44100, 48000][d[0] % 5]
    ch = 1 + d[1] % 2
    bits = 8 * (1 + d[2] % 3)
    n_samples = 1 + int.from_bytes(d[3:6], "big") % 480_000
    return sr, ch, bits, n_samples, "fake"


def decode_audio_meta(media: DataFrame) -> DataFrame:
    """(doc_id, sample_rate, channels, bits_per_sample, n_samples,
    duration_ms, format) via mapInPandas over binary payloads.

    WAV/FLAC payloads get REAL header-parsed metadata (stdlib byte parsing —
    no codec needed); other payloads use the deterministic fake.
    duration_ms is integer floor(n_samples*1000/sample_rate) so the value is
    oracle-exact across engines."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [
                _parse_audio_header(p if p is not None else b"")
                or _fake_audio_meta(p if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [m[0] for m in meta],
                    "channels": [m[1] for m in meta],
                    "bits_per_sample": [m[2] for m in meta],
                    "n_samples": [m[3] for m in meta],
                    "duration_ms": [
                        m[3] * 1000 // m[0] if m[0] else 0 for m in meta
                    ],
                    "format": [m[4] for m in meta],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        _batches,
        schema=(
            "doc_id long, sample_rate int, channels int, bits_per_sample int, "
            "n_samples long, duration_ms long, format string"
        ),
    )


def decode_image_meta(media: DataFrame, real: bool = False) -> DataFrame:
    """(doc_id, width, height, format) via mapInPandas over binary payloads.

    PNG/JPEG/GIF payloads get REAL header-parsed dimensions (stdlib byte
    parsing — no codec needed for metadata); other payloads use the
    deterministic fake. real=True additionally requires an actual pixel
    decoder (PIL) — raises NotImplementedError in this container.
    """
    if real and not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL, which is not installed; "
            "use real=False for the deterministic stub"
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_decode_meta(p if p is not None else b"") for p in pdf["payload"]]
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


def resize_image(
    media: DataFrame, target_w: int = 224, target_h: int = 224, real: bool = False
) -> DataFrame:
    """(doc_id, payload, width, height) — binary-in/binary-out resize.

    The plumbing is the real part: binary payloads cross INTO the Arrow
    batch and resized binaries cross back OUT (the shape a GPU-preproc
    feeder needs), one row per input. real=True requires PIL (absent here —
    NotImplementedError); the stub emits a deterministic payload whose size
    scales with target_w*target_h so sink sizing behaves like real output.
    """
    if real and not _HAS_PIL:
        raise NotImplementedError(
            "real image resize requires PIL, which is not installed; "
            "use real=False for the deterministic stub"
        )

    n_out = max(16, (target_w * target_h) // 256)  # fake "compressed" size

    def _stub_resize(payload: bytes) -> bytes:
        seed = hashlib.sha256(payload + f"{target_w}x{target_h}".encode()).digest()
        reps = n_out // len(seed) + 1
        return (seed * reps)[:n_out]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _stub_resize(p if p is not None else b"")
                        for p in pdf["payload"]
                    ],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        _batches, schema="doc_id long, payload binary, width int, height int"
    )


def sample_video_frames(
    media: DataFrame, n_frames: int = 4, real: bool = False
) -> DataFrame:
    """(doc_id, frame_idx, ts_seconds, frame, frame_sha256) — one row per
    sampled frame: the 1->N fan-out batch shape frame sampling needs (a
    mapInPandas batch may emit MORE rows than it receives — this is the
    part worth pinning, not the codec).

    real=True requires a video decoder (ffmpeg/PyAV, absent here). The stub
    derives a deterministic 'duration' from the payload hash, samples
    `n_frames` uniform timestamps, and emits 64-CHARACTER windows of the
    UTF-8-decoded payload as fake frames (character windows rather than raw
    byte slices so the frame bytes stay valid UTF-8 — which is what lets
    the DuckDB oracle state the exact per-frame sha256; a real decoder
    swaps in actual pixel buffers at the same seam) — every downstream
    contract (schema, per-frame hash, row multiplicity) matches what a real
    decoder would feed."""
    if real:
        raise NotImplementedError(
            "real frame sampling requires a video decoder (ffmpeg/PyAV), "
            "which is not installed; use real=False for the deterministic stub"
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "ts_seconds": [], "frame": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                p = p if p is not None else b""
                hx = hashlib.sha256(p).hexdigest()
                s = p.decode("utf-8", "ignore")
                duration = 1.0 + int(hx[6:8], 16) * 2.0  # digest[3], fake s
                for i in range(n_frames):
                    lo = (i * max(1, len(s))) // n_frames
                    frame = s[lo : lo + 64].encode() or hx.encode()
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["ts_seconds"].append(duration * i / n_frames)
                    rows["frame"].append(frame)
            out = pd.DataFrame(rows)
            out["frame_sha256"] = [
                hashlib.sha256(f).hexdigest() for f in out["frame"]
            ]
            yield out

    return media.select("doc_id", "payload").mapInPandas(
        _batches,
        schema=(
            "doc_id long, frame_idx int, ts_seconds double, "
            "frame binary, frame_sha256 string"
        ),
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """(doc_id, embedding array<float>) — deterministic fake feature vector
    from the payload hash; the plumbing that feeds the ANN operators
    (similarity.py) from a multimodal table. A real model swaps into the
    same batch iterator (ideally with Arrow batches sized to GPU memory)."""
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = []
            for p in pdf["payload"]:
                d = hashlib.sha256(p if p is not None else b"").digest()
                need = dim * 2
                reps = need // len(d) + 1
                raw = (d * reps)[:need]
                embs.append(
                    [((raw[2 * i] << 8 | raw[2 * i + 1]) / 65535.0) for i in range(dim)]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": embs})

    return media.select("doc_id", "payload").mapInPandas(
        _batches, schema="doc_id long, embedding array<float>"
    )
