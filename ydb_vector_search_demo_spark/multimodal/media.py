"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample plumbing.

North-star extension (BASELINE.json): treat image/audio/video as
``BINARY`` columns in ordinary rows. The Spark-side plumbing — schema,
Arrow batch shape, ``mapInPandas`` signatures, partition sizing — is
real and tested; the actual codec calls are STUBBED (the image/audio
libraries are not in this container): ``decode_media_meta`` derives
deterministic fake dimensions from the payload bytes, and the seams are
marked where a real decoder (PIL / ffmpeg / torchaudio) plugs in.

Scale notes: binary payloads dominate row size, so operators here
(a) never shuffle the binary column — metadata extraction projects it
away as early as possible; (b) use ``mapInPandas`` (Arrow-batched) so
payloads move driver-free from the JVM to Python in columnar batches;
(c) size batches via ``spark.sql.execution.arrow.maxRecordsPerBatch``
when payloads are large (a 10 MB-per-image table wants small batches).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
    ]
)

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MODALITIES = ("image", "audio", "video")


def synthesize_media_table(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    payload = UTF-8 bytes of the text (an opaque blob as far as the
    pipeline is concerned), modality cycled by doc_id."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.pmod(F.col("doc_id"), F.lit(len(MODALITIES))) + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("application/x-"), modality).alias("mime_type"),
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real header parse: two pseudo-dims
    from the payload's md5. A real implementation opens the codec here."""
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 640, 16 + h[1] % 480


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Decode stage: binary payload → typed metadata via Arrow-batched
    ``mapInPandas``. STUB: dimensions are hash-derived fakes; swap
    ``_fake_dims`` for PIL/ffprobe in production — the schema, batching
    and nullability contract stay identical."""

    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(lambda p: _fake_dims(bytes(p)))
            is_img = pdf["modality"] == "image"
            is_vid = pdf["modality"] == "video"
            is_aud = pdf["modality"] == "audio"
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": [d[0] if v else None for d, v in zip(dims, is_img | is_vid)],
                    "height": [d[1] if v else None for d, v in zip(dims, is_img | is_vid)],
                    "n_frames": [
                        1 if i else (d[0] * 4 if v else None)
                        for d, i, v in zip(dims, is_img, is_vid)
                    ],
                    "sample_rate": [16000 if a else None for a in is_aud],
                }
            )
            yield out

    return media.mapInPandas(decode, META_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode a deterministic
    frame index list (real impl: decoder seek + jpeg encode per index).
    The payload column is projected away *before* the explode so the
    blob is not replicated per frame."""
    meta = decode_media_meta(media)
    frames = (
        meta.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
    return frames


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize stage for image rows: payload → smaller payload with the
    aspect ratio preserved against the (stub-)decoded dimensions. STUB:
    the 'resized' payload is a deterministic truncation of the original
    bytes proportional to the pixel-count reduction — a real
    implementation decodes, resamples and re-encodes in this exact
    ``mapInPandas`` seam. Binary stays columnar Arrow end to end."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, ws, hs, nb = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                w, h = _fake_dims(raw)
                scale = min(max_side / max(w, h), 1.0)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                keep = max(int(len(raw) * (nw * nh) / (w * h)), 1)
                out = raw[:keep]
                ids.append(mid)
                payloads.append(out)
                ws.append(nw)
                hs.append(nh)
                nb.append(len(out))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "width": pd.array(ws, dtype="int32"),
                    "height": pd.array(hs, dtype="int32"),
                    "n_bytes": pd.array(nb, dtype="int64"),
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        resize, RESIZE_SCHEMA
    )


def media_embedding_stub(media: DataFrame, dim: int = 64) -> DataFrame:
    """Feature-extraction stage: payload → embedding (real impl: a vision
    /audio encoder in the same mapInPandas seam). STUB: seeded projection
    of the payload hash, unit-normalized — deterministic for tests."""
    import math
    import random

    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(p: bytes) -> list[float]:
                seed = int.from_bytes(hashlib.md5(bytes(p)).digest()[:8], "big")
                rng = random.Random(seed)
                v = [rng.uniform(-1.0, 1.0) for _ in range(dim)]
                n = math.sqrt(sum(x * x for x in v)) or 1.0
                return [x / n for x in v]

            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "embedding": pdf["payload"].map(one)}
            )

    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return media.mapInPandas(embed, schema)
