"""Multimodal columns: opaque binary payloads + typed metadata, with
REAL decode / feature-extract / resize / frame-sample stages.

North-star extension (BASELINE.json): treat image/audio/video as
``BINARY`` columns in ordinary rows. Heavy third-party codecs (PIL /
ffmpeg / torchaudio) are not in this container, so the payloads use
three REAL, self-describing public formats that parse with
stdlib+numpy alone — the decode, resize and feature stages below are
genuine codecs, not hash stubs:

* image  → binary PGM (netpbm "P5": ASCII header + raw 8-bit gray)
* audio  → RIFF/WAVE, PCM16 mono (44-byte canonical header)
* video  → YUV4MPEG2 (Y4M: ASCII stream header + FRAME-delimited
  4:2:0 planar frames)

A production pipeline swaps the per-format parsers for PIL/ffprobe in
the SAME mapInPandas seams; schema, Arrow batching and nullability
contracts are identical.

Scale notes: binary payloads dominate row size, so operators here
(a) never shuffle the binary column — metadata extraction projects it
away as early as possible; (b) use ``mapInPandas`` (Arrow-batched) so
payloads move driver-free from the JVM to Python in columnar batches;
(c) size batches via ``spark.sql.execution.arrow.maxRecordsPerBatch``
when payloads are large (a 10 MB-per-image table wants small batches).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
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
MIME_TYPES = {
    "image": "image/x-portable-graymap",
    "audio": "audio/wav",
    "video": "video/x-yuv4mpeg",
}


# --------------------------------------------------------------- encoders
# Deterministic synthesis: real bytes in real formats, derived from the
# media id alone so both a re-run and a golden test reproduce them.


def encode_pgm(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Binary PGM (P5), 8-bit grayscale."""
    header = f"P5\n{width} {height}\n255\n".encode("ascii")
    return header + pixels.astype(np.uint8).tobytes()


def synth_image(media_id: int) -> bytes:
    w = 16 + media_id % 48
    h = 12 + media_id % 36
    yy, xx = np.mgrid[0:h, 0:w]
    pixels = (xx * 7 + yy * 31 + media_id) % 256
    return encode_pgm(w, h, pixels)


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + PCM16 mono data."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_audio(media_id: int) -> bytes:
    n = 800 + media_id % 800
    i = np.arange(n)
    samples = ((i * (media_id % 32 + 1)) % 512 - 256) * 64
    return encode_wav(samples, 16000)


def encode_y4m(width: int, height: int, frames: list[np.ndarray]) -> bytes:
    """YUV4MPEG2 stream: ASCII header, then FRAME-delimited planar
    4:2:0 frames (Y plane w*h + U,V planes (w/2)*(h/2) each)."""
    out = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode("ascii")]
    for fr in frames:
        out.append(b"FRAME\n")
        out.append(fr.astype(np.uint8).tobytes())
    return b"".join(out)


def synth_video(media_id: int) -> bytes:
    w = 16 + 2 * (media_id % 8)
    h = 8 + 2 * (media_id % 6)
    n_frames = 3 + media_id % 5
    frame_len = w * h + 2 * (w // 2) * (h // 2)
    frames = [
        (np.arange(frame_len) * (k + 1) + media_id) % 256
        for k in range(n_frames)
    ]
    return encode_y4m(w, h, frames)


def synthesize_media_table(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    REAL PGM/WAV/Y4M payloads generated from the id, modality cycled by
    doc_id. Runs as mapInPandas (payload bytes are built in numpy)."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    synth = {"image": synth_image, "audio": synth_audio, "video": synth_video}

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids = pdf["doc_id"].astype("int64")
            modality = [MODALITIES[m % len(MODALITIES)] for m in mids]
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "modality": modality,
                    "payload": [synth[mo](int(m)) for m, mo in zip(mids, modality)],
                    "mime_type": [MIME_TYPES[mo] for mo in modality],
                }
            )

    # NOT fan_out (r14 A/B): the synthesis is cheap relative to the
    # repartition + per-partition Python-worker coordination it would
    # add (interleaved: 0.48-0.54 s plain vs 0.60-0.67 s fanned; the
    # bands path 0.92-1.29 vs 1.35-1.41) — unlike the pair-scoring
    # operators, where fan_out is a 2-4x win.
    return documents.select("doc_id").mapInPandas(gen, MEDIA_SCHEMA)


def media_modalities(documents: DataFrame) -> DataFrame:
    """The media table's (media_id, modality) METADATA grain as a pure
    Column expression — byte-identical to
    :func:`synthesize_media_table`'s id/modality columns (media_id =
    doc_id, modality = MODALITIES[doc_id % 3]) without building a
    single payload. Alignment/packing operators join on this grain:
    at 100 TB you never ship payload bytes through a metadata join
    (the module-docstring rule \"project the binary column away as
    early as possible\" applied at the source)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.col("doc_id") % len(MODALITIES) + 1).cast("int"),
        ).alias("modality"),
    )


# --------------------------------------------------------------- decoders


def decode_pgm(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Parse binary PGM (P5): returns (width, height, pixel matrix)."""
    if not raw.startswith(b"P5"):
        raise ValueError("not a P5 PGM payload")
    # header: magic, width, height, maxval — whitespace separated
    parts, pos, token = [], 2, b""
    while len(parts) < 3:
        if pos >= len(raw):
            raise ValueError("truncated PGM header")
        c = raw[pos : pos + 1]
        pos += 1
        if c.isspace():
            if token:
                parts.append(int(token))
                token = b""
        else:
            token += c
    w, h, _maxval = parts
    pixels = np.frombuffer(raw, dtype=np.uint8, count=w * h, offset=pos)
    return w, h, pixels.reshape(h, w)


def decode_wav(raw: bytes) -> tuple[int, int]:
    """Parse a canonical RIFF/WAVE header: (sample_rate, n_samples)."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    sample_rate = struct.unpack_from("<I", raw, 24)[0]
    bits = struct.unpack_from("<H", raw, 34)[0]
    data_len = struct.unpack_from("<I", raw, 40)[0]
    return sample_rate, data_len // (bits // 8)


def wav_samples(raw: bytes) -> np.ndarray:
    _, n = decode_wav(raw)
    return np.frombuffer(raw, dtype="<i2", count=n, offset=44)


def decode_y4m(raw: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Parse a YUV4MPEG2 stream: (width, height, frames) where each
    frame is the raw planar 4:2:0 byte vector."""
    nl = raw.index(b"\n")
    header = raw[:nl].decode("ascii").split(" ")
    if header[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = next(int(t[1:]) for t in header if t.startswith("W"))
    h = next(int(t[1:]) for t in header if t.startswith("H"))
    frame_len = w * h + 2 * (w // 2) * (h // 2)
    frames, pos = [], nl + 1
    while pos < len(raw):
        fnl = raw.index(b"\n", pos)
        if raw[pos:fnl].split(b" ")[0] != b"FRAME":
            raise ValueError("corrupt FRAME marker")
        start = fnl + 1
        frames.append(np.frombuffer(raw, dtype=np.uint8, count=frame_len, offset=start))
        pos = start + frame_len
    return w, h, frames


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Decode stage: binary payload → typed metadata via Arrow-batched
    ``mapInPandas``, using the real per-format header parsers above
    (PIL/ffprobe would replace them in production — same seam, same
    schema and nullability contract)."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            width, height, n_frames, rate = [], [], [], []
            for mo, p in zip(pdf["modality"], pdf["payload"]):
                raw = bytes(p)
                if mo == "image":
                    w, h, _ = decode_pgm(raw)
                    width.append(w); height.append(h)
                    n_frames.append(1); rate.append(None)
                elif mo == "audio":
                    sr, _n = decode_wav(raw)
                    width.append(None); height.append(None)
                    n_frames.append(None); rate.append(sr)
                else:
                    w, h, frames = decode_y4m(raw)
                    width.append(w); height.append(h)
                    n_frames.append(len(frames)); rate.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.array(width, dtype="Int32"),
                    "height": pd.array(height, dtype="Int32"),
                    "n_frames": pd.array(n_frames, dtype="Int32"),
                    "sample_rate": pd.array(rate, dtype="Int32"),
                }
            )

    return media.mapInPandas(decode, META_SCHEMA)


CONTENT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_sum", LongType()),
    ]
)


def media_content_stats(media: DataFrame) -> DataFrame:
    """Content-level stats through the REAL decoders: per media row,
    the payload byte size and the integer sum of every decoded content
    value — pixel bytes (image), PCM16 sample values (audio), planar
    frame bytes (video). This is the multimodal family's oracle
    surface: the synthesized payloads are closed-form functions of the
    media id, so a SQL engine can recompute each sum analytically
    (generate_series over the same formulas) WITHOUT parsing bytes,
    while Spark computes it by actually decoding the binary column —
    any header misparse, offset error, or truncation on either the
    encode or decode side shifts the sum. Payload is projected away at
    the decode seam; only (id, modality, 2 ints) ever shuffles."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums = []
            for mo, p in zip(pdf["modality"], pdf["payload"]):
                raw = bytes(p)
                if mo == "image":
                    _, _, pixels = decode_pgm(raw)
                    sums.append(int(pixels.astype(np.int64).sum()))
                elif mo == "audio":
                    sums.append(int(wav_samples(raw).astype(np.int64).sum()))
                else:
                    _, _, frames = decode_y4m(raw)
                    sums.append(
                        int(sum(fr.astype(np.int64).sum() for fr in frames))
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_sum": pd.array(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(stats, CONTENT_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling for video rows: decode the real frame count, then
    explode every-n frame indices. The payload column is projected away
    *before* the explode so the blob is not replicated per frame; a
    variant that EXTRACTS the sampled frames would re-join the sampled
    indices to the payload and slice inside the same decode seam."""
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
    """Resize stage for image rows: REAL nearest-neighbor resample —
    decode the PGM pixel matrix, index-stride it down so the longest
    side is ``max_side`` (aspect ratio preserved, never upscaled),
    re-encode PGM. Binary stays columnar Arrow end to end; a production
    impl swaps the resampler for PIL in this exact seam."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, ws, hs, nb = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, pixels = decode_pgm(bytes(p))
                scale = min(max_side / max(w, h), 1.0)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                # nearest-neighbor: sample source rows/cols at the
                # center of each destination cell
                rows = ((np.arange(nh) + 0.5) * h / nh).astype(int)
                cols = ((np.arange(nw) + 0.5) * w / nw).astype(int)
                out = encode_pgm(nw, nh, pixels[np.ix_(rows, cols)])
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


RESAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_samples", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def resample_audio(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Audio DECIMATION through the real codec — completes the
    per-modality transform matrix next to :func:`resize_images`
    (image) and :func:`frame_sample` (video): decode the WAV, keep
    every ``every_n``-th PCM16 sample (index-stride decimation — the
    nearest-neighbor resample at ratio 1/every_n), re-encode a
    canonical WAV at the decimated sample rate, report the re-encoded
    size. The decode→slice→re-encode roundtrip pins the RIFF header
    arithmetic byte-for-byte, exactly like resize_images' PGM
    roundtrip; a production impl swaps the slicer for a windowed
    low-pass resampler in this exact seam."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, ns, nb = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                rate, _ = decode_wav(raw)
                kept = wav_samples(raw)[::every_n]
                out = encode_wav(kept, max(rate // every_n, 1))
                ids.append(mid)
                payloads.append(out)
                ns.append(len(kept))
                nb.append(len(out))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "n_samples": pd.array(ns, dtype="int32"),
                    "n_bytes": pd.array(nb, dtype="int64"),
                }
            )

    return media.filter(F.col("modality") == "audio").mapInPandas(
        resample, RESAMPLE_SCHEMA
    )


def media_embedding_stub(
    media: DataFrame, dim: int = 64, as_double: bool = False
) -> DataFrame:
    """Feature-extraction stage: payload → unit-normalized ``dim``-bin
    intensity histogram over the REAL decoded samples (image pixels,
    audio PCM amplitudes, video first-frame bytes) — a genuine, if
    simple, content feature: near-duplicate media get near-identical
    histograms. A learned vision/audio encoder replaces the histogram
    in this same mapInPandas seam (name kept for API stability).
    ``as_double=True`` skips the float32 cast — the histogram bins are
    integer counts and cosine is scale-invariant, so the double form
    is exactly SQL-replayable (the multimodal_union_fixed oracle);
    float32 stays the default for parity with real encoder output."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for mo, p in zip(pdf["modality"], pdf["payload"]):
                raw = bytes(p)
                if mo == "image":
                    _, _, pixels = decode_pgm(raw)
                    values = pixels.ravel().astype(np.float64)
                    lo, hi = 0.0, 255.0
                elif mo == "audio":
                    values = wav_samples(raw).astype(np.float64)
                    lo, hi = -32768.0, 32767.0
                else:
                    _, _, frames = decode_y4m(raw)
                    values = frames[0].astype(np.float64)
                    lo, hi = 0.0, 255.0
                hist, _ = np.histogram(values, bins=dim, range=(lo, hi))
                v = hist.astype(np.float64)
                n = np.linalg.norm(v)
                unit = v / n if n else v
                vecs.append(
                    unit.tolist() if as_double
                    else unit.astype(np.float32).tolist()
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "embedding": vecs})

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField(
                "embedding",
                ArrayType(DoubleType() if as_double else FloatType()),
            ),
        ]
    )
    return media.mapInPandas(embed, schema)


def scene_cuts(media: DataFrame, threshold: int = 85) -> DataFrame:
    """Video SCENE-CUT detection over decoded frames — the temporal
    sibling of frame_sample: for every adjacent frame pair the exact
    integer sum of per-byte absolute differences, and a cut wherever
    the pair's total exceeds ``threshold`` mean units per byte
    (compared as the exact integer s > threshold·frame_len — no
    float boundary). Pure-integer readout per video: frame count,
    pair count, cut count, total absolute difference, frame length.
    One Arrow-batched mapInPandas pass; the payload dies at the
    decode seam and only five ints per video leave the worker."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "n_frames": [], "n_pairs": [],
                "n_cuts": [], "total_absdiff": [], "frame_len": [],
            }
            for mid, mod, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if mod != "video":
                    continue
                _w, _h, frames = decode_y4m(bytes(payload))
                fl = int(frames[0].shape[0])
                total = 0
                n_cuts = 0
                for a, b in zip(frames, frames[1:]):
                    s = int(
                        np.abs(
                            b.astype(np.int64) - a.astype(np.int64)
                        ).sum()
                    )
                    total += s
                    if s > int(threshold) * fl:
                        n_cuts += 1
                out["media_id"].append(int(mid))
                out["n_frames"].append(len(frames))
                out["n_pairs"].append(len(frames) - 1)
                out["n_cuts"].append(n_cuts)
                out["total_absdiff"].append(total)
                out["frame_len"].append(fl)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        cuts,
        "media_id long, n_frames int, n_pairs long, n_cuts long, "
        "total_absdiff long, frame_len int",
    )


RMS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_silent", IntegerType()),
        StructField("peak_abs", IntegerType()),
        StructField("total_sq", LongType()),
    ]
)


def audio_rms_frames(
    media: DataFrame,
    frame_len: int = 160,
    silence_mean_sq: int | None = None,
    **deprecated,
) -> DataFrame:
    """Frame-level loudness / SILENCE detection through the real codec
    — the temporal-audio analysis next to scene_cuts' temporal-video
    row: decode the WAV, window the PCM16 stream into ``frame_len``-
    sample frames (10 ms at 16 kHz; the trailing partial frame counts
    with its own length), and per frame compare the MEAN SQUARE
    against ``silence_mean_sq`` — a squared-amplitude threshold (a
    frame is silent when mean(s²) < silence_mean_sq, i.e. RMS < 1000
    at the default), NOT a duration — entirely in exact integer
    arithmetic (sum_sq < silence_mean_sq * flen, no division).
    Speech/music pipelines
    run exactly this to trim silence before feature extraction; the
    production VAD swaps into this same Arrow seam. Returns per
    media_id: n_samples, n_frames, n_silent, peak_abs and the exact
    total sum of squares (bigint) — RMS is one driver-side sqrt of
    ints downstream. Overflow: 160 samples × 16384² < 2^36 per frame;
    the per-media total is < n·2^28 — a 10-hour PCM16 stream stays
    inside 2^63.

    The r12 rename ``silence_ms`` → ``silence_mean_sq`` (the old name
    wrongly suggested a duration) keeps a deprecation shim: keyword
    callers of the old name still work with a DeprecationWarning."""
    if "silence_ms" in deprecated:  # pre-r12 keyword (r12 ADVICE shim)
        import warnings

        if silence_mean_sq is not None:
            # both names passed explicitly: a half-migrated call site —
            # never let the stale name silently win. None-sentinel
            # default (r13 ADVICE): an explicit silence_mean_sq equal
            # to the default must ALSO collide, not slip through.
            raise TypeError(
                "audio_rms_frames() got both silence_mean_sq and the "
                "deprecated silence_ms; pass only silence_mean_sq"
            )
        warnings.warn(
            "audio_rms_frames(silence_ms=...) was renamed to "
            "silence_mean_sq= (it is a squared-amplitude threshold, "
            "not a duration); the old keyword will be removed",
            DeprecationWarning,
            stacklevel=2,
        )
        silence_mean_sq = deprecated.pop("silence_ms")
    if silence_mean_sq is None:
        silence_mean_sq = 1_000_000
    if deprecated:
        raise TypeError(
            f"audio_rms_frames() got unexpected keyword arguments: "
            f"{sorted(deprecated)}"
        )
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, nf, sil, peak, tot = [], [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                s = wav_samples(bytes(p)).astype(np.int64)
                n = len(s)
                n_frames = (n + frame_len - 1) // frame_len
                n_silent = 0
                for f in range(n_frames):
                    fr = s[f * frame_len : (f + 1) * frame_len]
                    if int((fr * fr).sum()) < silence_mean_sq * len(fr):
                        n_silent += 1
                ids.append(mid)
                ns.append(n)
                nf.append(n_frames)
                sil.append(n_silent)
                peak.append(int(np.abs(s).max()) if n else 0)
                tot.append(int((s * s).sum()))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_samples": pd.array(ns, dtype="int32"),
                    "n_frames": pd.array(nf, dtype="int32"),
                    "n_silent": pd.array(sil, dtype="int32"),
                    "peak_abs": pd.array(peak, dtype="int32"),
                    "total_sq": pd.array(tot, dtype="int64"),
                }
            )

    return media.filter(F.col("modality") == "audio").mapInPandas(
        stats, RMS_SCHEMA
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("band", IntegerType()),
        StructField("bv", IntegerType()),
    ]
)


def image_ahash_bands(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual AVERAGE-HASH over decoded images, emitted as the
    8×8-bit BAND grain the LSH join consumes — the multimodal member
    of the dedup family (near-duplicate IMAGES, where exact byte
    equality misses re-encodes and brightness shifts): the image is
    average-pooled onto a ``grid``×``grid`` block lattice with pure
    integer floor arithmetic (block j spans x with x·grid//w == j),
    and bit_j = 1 iff block_sum·(w·h) > total_sum·block_npix — the
    mean compare WITHOUT division, exact in int64 (the
    scene-cuts/audio-silence convention). The 64 bits pack into 8
    byte-valued bands; identical bands are the LSH candidate key (by
    pigeonhole, hamming ≤ 7 guarantees ≥ 1 exact band). The hash is
    invariant to global brightness shifts (mean-threshold) and to
    resolution changes that preserve block means — exactly the
    near-dup classes byte-hashing misses. Returns (media_id, band,
    bv) — grid rows per image, all exact integers.

    Scale shape: one Arrow decode pass per image; only 8 small rows
    per image ever shuffle."""
    from ydb_vector_search_demo_spark.shipping import ensure_package_on_workers

    ensure_package_on_workers()
    g = int(grid)

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bands, bvs = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, pix = decode_pgm(bytes(p))
                pix = pix.astype(np.int64)
                bx = (np.arange(w) * g) // w
                by = (np.arange(h) * g) // h
                blk = (by[:, None] * g + bx[None, :]).ravel()
                acc = np.zeros(g * g, dtype=np.int64)
                np.add.at(acc, blk, pix.ravel())
                npx = np.bincount(blk, minlength=g * g).astype(np.int64)
                tot = int(acc.sum())
                bits = (acc * (w * h)) > (tot * npx)
                for band in range(g):
                    bv = 0
                    for pos in range(g):
                        if bits[band * g + pos]:
                            bv |= 1 << pos
                    ids.append(mid)
                    bands.append(band)
                    bvs.append(bv)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "band": pd.array(bands, dtype="int32"),
                    "bv": pd.array(bvs, dtype="int32"),
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        hash_batches, AHASH_SCHEMA
    )


def image_ahash_pairs(
    bands: DataFrame,
    max_hamming: int = 7,
    max_band_group: int | None = None,
    grid: int = 8,
) -> DataFrame:
    """Near-duplicate IMAGE pairs over the :func:`image_ahash_bands`
    grain: band-LSH candidates (pigeonhole — hamming <= grid-1 over
    grid bands implies at least one exactly-equal band) verified by
    the exact bit_count(xor) Hamming distance summed over band pairs.
    The candidate join is an explicit TWO-KEY equi-join on
    ``(band, bv)`` — the LSH bucket IS the join key, so the plan
    never depends on Catalyst rewriting a post-join ``bva = bvb``
    filter into the key (``band`` alone has only ``grid`` distinct
    values; joining on it alone would be a near-cross-product).

    Heavy-group valve (``max_band_group``) — the hash-GROUP cap the
    dedup paths use (`max_bucket` ann.py, `max_shingle_doc_freq`
    dedup.py), sized for dup-heavy corpora where identical-hash
    groups are the expected case, not the tail: the (band, bv)
    census is bounded by grid·2^grid rows (2048 at the default 8×8)
    so it always BROADCASTS; groups at or under the cap expand to
    their full candidate clique (bit-identical to valve-off); groups
    over the cap switch to STAR expansion — every member pairs with
    the group's minimum media_id — so their candidate volume is
    linear in group size instead of quadratic. Exact duplicates of
    the canonical member still verify at hamming 0 and the star's
    transitive closure recovers the full duplicate clique downstream;
    what degrades is only within-oversized-group NON-identical
    near-dup recall (two images that share nothing but one heavy
    band) — the standard LSH heavy-bucket trade, taken deliberately
    because an over-cap group's clique output is itself the scale
    problem.

    Scale shape: census broadcast (<= 2048 rows), one keyed candidate
    join, verify join touches candidates × grid. Returns
    (a, b, hamming) with a < b, hamming <= max_hamming."""
    bands = bands.localCheckpoint(eager=True)
    if max_band_group is not None:
        census = bands.groupBy("band", "bv").agg(
            F.count(F.lit(1)).alias("_gn"),
            F.min("media_id").alias("_canon"),
        )
        tag = bands.join(F.broadcast(census), ["band", "bv"])
        under = tag.filter(F.col("_gn") <= int(max_band_group))
        ua = under.select(F.col("media_id").alias("a"), "band", "bv")
        ub = under.select(F.col("media_id").alias("b"), "band", "bv")
        clique = (
            ua.join(ub, ["band", "bv"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
        )
        star = (
            tag.filter(
                (F.col("_gn") > int(max_band_group))
                & (F.col("media_id") != F.col("_canon"))
            )
            .select(
                F.col("_canon").alias("a"), F.col("media_id").alias("b")
            )
        )
        cand = clique.unionByName(star).distinct()
    else:
        a = bands.select(F.col("media_id").alias("a"), "band", "bv")
        b = bands.select(F.col("media_id").alias("b"), "band", "bv")
        cand = (
            a.join(b, ["band", "bv"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
    x = bands.select(
        F.col("media_id").alias("a"), "band", F.col("bv").alias("bva")
    )
    y = bands.select(
        F.col("media_id").alias("b"), "band", F.col("bv").alias("bvb")
    )
    ham = (
        cand.join(x, "a")
        .join(y, ["b", "band"])
        .groupBy("a", "b")
        .agg(
            F.sum(F.bit_count(F.col("bva").bitwiseXOR(F.col("bvb"))))
            .cast("bigint")
            .alias("hamming")
        )
    )
    return ham.filter(F.col("hamming") <= int(max_hamming)).select(
        "a", "b", "hamming"
    )


# ------------------------------------------------- interleaved assembly
# MMC4/Flamingo-style interleaved (text, image) training examples — the
# multimodal x curation cell (r12 verdict task #4): align images to
# positions inside their documents, emit the interleaved element
# stream, and pack documents into training sequences under a token
# budget (composing the graded curation.pack_sequences walk).


def _mm_anchor():
    """The pinned-md5 caption anchor — md5('mmanchor:' || media_id) %
    n_spans, 0 on zero-span docs. ONE definition shared by
    interleaved_mm_elements and interleaved_mm_pack (the element
    stream and the pack checksum must agree by construction); the
    DuckDB oracle and the law tests replay it verbatim."""
    return F.when(
        F.col("_nspans") == 0, F.lit(0).cast("bigint")
    ).otherwise(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("mmanchor:"),
                        F.col("media_id").cast("string"),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint")
        % F.col("_nspans")
    )


def interleaved_mm_elements(
    docs: DataFrame,
    media: DataFrame,
    span_tokens: int = 16,
    image_tokens: int = 64,
) -> DataFrame:
    """The interleaved ELEMENT stream (Alayrac et al. 2022 "Flamingo",
    arXiv:2204.14198; Zhu et al. 2023 "Multimodal C4",
    arXiv:2304.06939): each document's text is cut into consecutive
    ``span_tokens``-token spans, and each image is inserted
    IMMEDIATELY BEFORE its anchor span (the caption-adjacency rule —
    the span that follows an image is treated as its caption, the
    MMC4 assignment convention). Anchors come from the pinned-md5
    seam: production MMC4 assigns images to sentence indices by CLIP
    similarity; here the deterministic stand-in is
    md5('mmanchor:' || media_id) % n_spans (the house pinned-model
    convention — the Spark-side plumbing is real, the similarity
    model is the documented fake). An image costs ``image_tokens``
    vision tokens (the Flamingo/LLaVA fixed per-image budget).

    Output grain: one row per element — (doc_id, pos, kind,
    media_id, span_idx, el_tokens, content) with pos the 1-based
    interleaved position, kind in ('image','text'), media_id NULL for
    text, span_idx the anchor (image) or span ordinal (text), content
    the span text (NULL for images). Docs with no tokens and no image
    emit nothing; an image on a zero-span doc anchors at 0.

    Scale shape: the span explode is map-side (one slice per span);
    the image attach is one keyed join on doc_id; the interleave
    order is a per-doc window over at most n_spans+n_images rows.
    Everything is closed-form — the DuckDB oracle replays spans,
    anchors and positions exactly."""
    S, IT = int(span_tokens), int(image_tokens)
    from ydb_vector_search_demo_spark.functions.textstats import tokens

    base = docs.select(
        "doc_id",
        tokens("text").alias("_toks"),
    ).select(
        "doc_id",
        "_toks",
        F.size("_toks").alias("_nt"),
        F.expr(f"(size(_toks) + {S - 1}) div {S}").alias("_nspans"),
    )
    text_el = base.where(F.col("_nspans") > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("_nspans") - 1)).alias(
            "span_idx"
        ),
        "_toks",
    ).select(
        "doc_id",
        F.lit("text").alias("kind"),
        F.lit(None).cast("bigint").alias("media_id"),
        F.col("span_idx").cast("bigint").alias("span_idx"),
        F.size(
            F.slice(F.col("_toks"), F.col("span_idx") * S + 1, S)
        )
        .cast("bigint")
        .alias("el_tokens"),
        F.array_join(
            F.slice(F.col("_toks"), F.col("span_idx") * S + 1, S), " "
        ).alias("content"),
    )
    img_el = (
        media.where(F.col("modality") == "image")
        .select(F.col("media_id"))
        .join(
            base.select("doc_id", "_nspans"),
            F.col("media_id") == F.col("doc_id"),
        )
        .select(
            "doc_id",
            F.lit("image").alias("kind"),
            F.col("media_id").cast("bigint").alias("media_id"),
            _mm_anchor()
            .alias("span_idx"),
            F.lit(IT).cast("bigint").alias("el_tokens"),
            F.lit(None).cast("string").alias("content"),
        )
    )
    both = text_el.unionByName(img_el)
    # interleave: the image sorts BEFORE the text span it anchors to
    # media_id breaks ties between multiple images anchored to the
    # SAME span (possible for any media relation with >1 image per
    # doc) — without it row_number is shuffle-order-dependent and the
    # determinism contract breaks (r13 review finding)
    w = Window.partitionBy("doc_id").orderBy(
        "span_idx",
        F.when(F.col("kind") == "image", 0).otherwise(1),
        F.col("media_id").asc_nulls_last(),
    )
    return both.select(
        "doc_id",
        F.row_number().over(w).cast("int").alias("pos"),
        "kind",
        "media_id",
        "span_idx",
        "el_tokens",
        "content",
    )


def interleaved_mm_pack(
    docs: DataFrame,
    media: DataFrame,
    span_tokens: int = 16,
    image_tokens: int = 64,
    seq_budget: int = 512,
    n_buckets: int = 8,
) -> DataFrame:
    """Interleaved multimodal TRAINING SEQUENCES under a token budget:
    per document, the interleaved cost = text tokens +
    ``image_tokens`` per attached image; documents are packed into
    sequences by the graded greedy next-fit walk
    (curation.pack_sequences — bucket = pinned md5 % ``n_buckets``,
    walk ordered by doc_id, budget ``seq_budget``), and the readout
    is the PACK grain: (bucket, pack_id, n_docs, n_images, n_spans,
    text_tokens, total_tokens, anchor_checksum) — anchor_checksum =
    Σ media_id·(anchor+1) as an exact bigint, wrong unless every
    image lands on exactly the anchor span the alignment rule
    assigns, so the oracle pins the interleaving through the
    aggregate. Pack sums never exceed the budget except single
    oversized documents (the packer's law, property-tested).

    Scale shape: one map-side cost projection + one keyed image
    join, then the packer's applyInPandas walk per bucket (the
    parallelism unit) and one pack-grain aggregate."""
    from ydb_vector_search_demo_spark.functions.textstats import tokens
    from ydb_vector_search_demo_spark.operators.curation import (
        pack_sequences,
    )

    S, IT = int(span_tokens), int(image_tokens)
    base = docs.select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("_nt"),
    ).select(
        "doc_id",
        "_nt",
        F.expr(f"(_nt + {S - 1}) div {S}").alias("_nspans"),
    )
    img = (
        media.where(F.col("modality") == "image")
        .select(F.col("media_id"))
        .join(
            base.select("doc_id", "_nspans"),
            F.col("media_id") == F.col("doc_id"),
        )
        .select(
            "doc_id",
            F.col("media_id").cast("bigint").alias("media_id"),
            _mm_anchor()
            .alias("anchor"),
        )
    )
    per_img = img.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum(F.col("media_id") * (F.col("anchor") + 1))
        .cast("bigint")
        .alias("anchor_checksum"),
    )
    cost = (
        base.join(per_img, "doc_id", "left")
        .select(
            "doc_id",
            "_nt",
            "_nspans",
            F.coalesce("n_images", F.lit(0)).cast("bigint").alias(
                "n_images"
            ),
            F.coalesce("anchor_checksum", F.lit(0))
            .cast("bigint")
            .alias("anchor_checksum"),
        )
        .select(
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("mmpack:"),
                                F.col("doc_id").cast("string"),
                            )
                        ),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.lit(int(n_buckets))
            )
            .cast("int")
            .alias("bucket"),
            "_nt",
            "_nspans",
            "n_images",
            "anchor_checksum",
            (F.col("_nt") + F.lit(IT) * F.col("n_images"))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )
    packed = pack_sequences(
        cost, budget=int(seq_budget), bucket_col="bucket",
        order_col="doc_id", token_col="n_tokens",
    )
    return (
        packed.groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_images").cast("bigint").alias("n_images"),
            F.sum("_nspans").cast("bigint").alias("n_spans"),
            F.sum("_nt").cast("bigint").alias("text_tokens"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum("anchor_checksum").cast("bigint").alias(
                "anchor_checksum"
            ),
        )
    )
