"""Multimodal (image/audio/video) column plumbing.

Design (SURVEY M8 / BASELINE north-star): media is an opaque ``binary``
column plus typed metadata columns; decode / feature-extract / frame-sample
run as Arrow-batched ``mapInPandas`` stages so each task handles a batch of
payloads without ever collecting them to the driver.

This container ships no image/audio wheels, so the actual codec call is
gated: when PIL/soundfile exist they decode for real; otherwise the decoder
is a DETERMINISTIC FAKE — metadata derived from the payload's md5 so tests
and oracles can pin every value. The Spark-side plumbing (schemas, batch
iteration, partitioning) is identical in both modes; swapping in the real
decoder changes one inner function.

Scale notes: payload bytes move exactly once (scan → decode task); metadata
extraction is map-only (no shuffle); frame sampling explodes map-side.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder, absent in this container
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover
    _PIL_Image = None

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, channels int, mean_intensity double"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, byte_offset long"

_HEX = "0123456789abcdef"


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Opaque binary payload + byte-length metadata (the storage contract:
    media is bytes + typed metadata, never parsed strings)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.length(payload).cast("long").alias("nbytes"),
    )


def _fake_image_meta(doc_id: int, payload: bytes) -> tuple:
    """Deterministic fake decode: md5-derived dims/stats. Every value is
    reproducible in SQL (hex-digit arithmetic), which is what lets the
    declared queries pin this path with a DuckDB oracle."""
    h = hashlib.md5(payload).hexdigest()
    hv = [_HEX.index(c) for c in h[:8]]
    width = 64 + (16 * hv[0] + hv[1])
    height = 64 + (16 * hv[2] + hv[3])
    channels = 1 + (hv[4] % 3)
    mean_intensity = round((16 * hv[5] + hv[6]) / 255.0, 4)
    return doc_id, width, height, channels, mean_intensity


def decode_image_meta(df: DataFrame) -> DataFrame:
    """Decode stage: (doc_id, payload) → typed image metadata, Arrow-batched.

    With PIL installed the real codec runs; without it the deterministic
    fake produces md5-derived metadata (clearly marked — NOT real pixels).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if _PIL_Image is not None:  # pragma: no cover — not in container
                    try:
                        import io

                        img = _PIL_Image.open(io.BytesIO(data))
                        px = img.convert("L")
                        hist = px.histogram()
                        total = sum(i * c for i, c in enumerate(hist))
                        cnt = max(1, sum(hist))
                        rows.append((int(doc_id), img.width, img.height,
                                     len(img.getbands()), round(total / cnt / 255.0, 4)))
                        continue
                    except Exception:
                        pass  # not a decodable image — fall through to fake
                rows.append(_fake_image_meta(int(doc_id), data))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "channels", "mean_intensity"])

    return df.select("doc_id", "payload").mapInPandas(decode, schema=IMAGE_META_SCHEMA)


RESIZED_SCHEMA = "doc_id long, out_w int, out_h int, out_nbytes long, content_hash string"


def resize_image(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize stage: (doc_id, payload) → resized-payload metadata at a fixed
    target geometry, Arrow-batched mapInPandas (map-only, payload moves once).

    With PIL the real resample runs and the output bytes are hashed; without
    it the DETERMINISTIC FAKE scales the byte count by the area ratio against
    the fake-decoded source dims and tags the content hash with the target
    geometry — every value SQL-reproducible for the oracle."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if _PIL_Image is not None:  # pragma: no cover — not in container
                    try:
                        import io

                        img = _PIL_Image.open(io.BytesIO(data))
                        out = img.resize((out_w, out_h))
                        buf = io.BytesIO()
                        out.save(buf, format=img.format or "PNG")
                        raw = buf.getvalue()
                        rows.append((int(doc_id), out_w, out_h, len(raw),
                                     hashlib.md5(raw).hexdigest()))
                        continue
                    except Exception:
                        pass  # not a decodable image — fall through to fake
                _, w, h, _, _ = _fake_image_meta(int(doc_id), data)
                out_nbytes = (len(data) * out_w * out_h) // (w * h)
                tag = f":{out_w}x{out_h}".encode()
                rows.append((int(doc_id), out_w, out_h, out_nbytes,
                             hashlib.md5(data + tag).hexdigest()))
            yield pd.DataFrame(
                rows, columns=["doc_id", "out_w", "out_h", "out_nbytes", "content_hash"]
            )

    return df.select("doc_id", "payload").mapInPandas(resize, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, frame_stride: int = 1000) -> DataFrame:
    """Frame-sampling stage for video-like payloads: each payload yields
    ``n_frames`` (payload-derived) evenly-strided byte offsets. Map-side
    explode — no shuffle; the row count is bounded by n_frames ≤ 4."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, offs = [], [], []
            for doc_id, payload, nbytes in zip(pdf["doc_id"], pdf["payload"], pdf["nbytes"]):
                h = hashlib.md5(bytes(payload)).hexdigest()
                n_frames = 2 + (_HEX.index(h[0]) % 3)
                for i in range(n_frames):
                    ids.append(int(doc_id))
                    fidx.append(i)
                    offs.append(i * frame_stride + int(nbytes) % frame_stride)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": fidx, "byte_offset": offs})

    return df.select("doc_id", "payload", "nbytes").mapInPandas(sample, schema=FRAME_SCHEMA)


EMBED_SCHEMA = "doc_id long, embedding array<double>"


def embed_payloads(df: DataFrame, dim: int = 8) -> DataFrame:
    """Batched model-inference stage: (doc_id, payload) → embedding vector,
    Arrow-batched ``mapInPandas`` — the exact plumbing a real encoder model
    uses (batch in, batch out, model loaded once per task, GPU-friendly
    batch shape). No model wheel ships in this container, so the "model" is
    a DETERMINISTIC FAKE: dim j is the j-th 4-hex-digit slice of the
    payload md5, scaled to [0, 1] — reproducible in SQL so the declared
    query pins the full pipeline with a DuckDB oracle. Swapping in a real
    encoder replaces only ``_infer`` below; schema, batching, and
    partitioning are production-shaped."""

    def _infer(payloads: "pd.Series") -> list[list[float]]:
        out = []
        for p in payloads:
            h = hashlib.md5(bytes(p)).hexdigest()
            out.append([round(int(h[4 * j : 4 * j + 4], 16) / 65535.0, 6) for j in range(dim)])
        return out

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "embedding": _infer(pdf["payload"])}
            )

    return df.select("doc_id", "payload").mapInPandas(embed, schema=EMBED_SCHEMA)
