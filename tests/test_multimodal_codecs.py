"""Golden tests for the real mini-codecs behind the multimodal
operators: PGM (P5) images, RIFF/WAVE audio, YUV4MPEG2 video. These
verify CAPABILITY (byte-exact encode→decode roundtrips, pixel-exact
nearest-neighbor resize, content-derived features), not just Arrow
plumbing — the production swap-in point (PIL/ffprobe) inherits the
same contracts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from ydb_vector_search_demo_spark.multimodal import media
from ydb_vector_search_demo_spark.sources.tables import load_table


def test_pgm_roundtrip_exact():
    pixels = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = media.encode_pgm(4, 3, pixels)
    assert raw.startswith(b"P5\n4 3\n255\n")
    w, h, back = media.decode_pgm(raw)
    assert (w, h) == (4, 3)
    assert np.array_equal(back, pixels)


def test_wav_roundtrip_exact():
    samples = np.array([0, 1000, -1000, 32767, -32768], dtype=np.int16)
    raw = media.encode_wav(samples, 16000)
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WAVE"
    rate, n = media.decode_wav(raw)
    assert rate == 16000 and n == 5
    assert np.array_equal(media.wav_samples(raw), samples)


def test_y4m_roundtrip_exact():
    w, h = 4, 2
    frame_len = w * h + 2 * (w // 2) * (h // 2)
    frames = [np.arange(frame_len) % 256, (np.arange(frame_len) * 3) % 256]
    raw = media.encode_y4m(w, h, frames)
    bw, bh, back = media.decode_y4m(raw)
    assert (bw, bh) == (w, h) and len(back) == 2
    for a, b in zip(frames, back):
        assert np.array_equal(a.astype(np.uint8), b)


def test_bad_payloads_raise():
    with pytest.raises(ValueError):
        media.decode_pgm(b"JFIF....")
    with pytest.raises(ValueError):
        media.decode_pgm(b"P5\n12 34")  # truncated header must not hang
    with pytest.raises(ValueError):
        media.decode_wav(b"OggS" + b"\0" * 60)
    with pytest.raises(ValueError):
        media.decode_y4m(b"MPEG2\n")


def test_nearest_neighbor_resize_pixels():
    # 4x4 with distinct quadrants; downscale to 2x2 must sample the
    # center of each quadrant
    px = np.array(
        [[10, 10, 20, 20],
         [10, 10, 20, 20],
         [30, 30, 40, 40],
         [30, 30, 40, 40]], dtype=np.uint8)
    raw = media.encode_pgm(4, 4, px)
    rows = ((np.arange(2) + 0.5) * 4 / 2).astype(int)
    cols = ((np.arange(2) + 0.5) * 4 / 2).astype(int)
    expected = px[np.ix_(rows, cols)]
    assert expected.tolist() == [[10, 20], [30, 40]]
    w, h, pixels = media.decode_pgm(raw)
    assert np.array_equal(pixels, px)


def test_decode_meta_matches_synthesis(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    meta = media.decode_media_meta(media.synthesize_media_table(docs))
    for r in meta.collect():
        mid = r["media_id"]
        if r["modality"] == "image":
            assert r["width"] == 16 + mid % 48
            assert r["height"] == 12 + mid % 36
            assert r["n_frames"] == 1 and r["sample_rate"] is None
        elif r["modality"] == "audio":
            assert r["sample_rate"] == 16000
            assert r["width"] is None and r["height"] is None
        else:
            assert r["n_frames"] == 3 + mid % 5
            assert r["width"] == 16 + 2 * (mid % 8)


def test_resize_respects_max_side_and_reencodes(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    resized = media.resize_images(media.synthesize_media_table(docs), max_side=16)
    rows = resized.collect()
    assert rows
    for r in rows:
        assert max(r["width"], r["height"]) <= 16
        w, h, pixels = media.decode_pgm(bytes(r["payload"]))
        assert (w, h) == (r["width"], r["height"])
        assert pixels.shape == (h, w)


def test_media_embedding_is_content_histogram(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(30)
    emb = media.media_embedding_stub(media.synthesize_media_table(docs))
    rows = emb.collect()
    assert rows
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        assert len(v) == 64
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        assert (v >= 0).all()  # histograms are non-negative


def test_resize_row_plan_reads_checkpoint_only(spark):
    """Plan guard (the funnel/attribution recompute class): the
    multimodal_resize catalog row feeds the resized relation into TWO
    consumers (dims projection + media_content_stats), so it must be
    localCheckpointed — the RESULT plan must contain zero parquet
    scans (synthesize/decode/resize all ran once, inside the
    checkpoint-building job) and exactly ONE Python map stage (the
    content-stats decode over the checkpointed bytes — without the
    checkpoint the plan carries the full synth→resize chain under
    BOTH consumers)."""
    from ydb_vector_search_demo_spark.plans.catalog import QUERIES

    out = QUERIES["multimodal_resize"](spark, SF_SMOKE)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("Initial Plan")[0]
    assert final.count("Scan parquet") == 0, final[:1500]
    assert final.count("MapInPandas") == 1, final[:1500]


def test_audio_resample_decimates_and_reencodes(spark):
    """resample_audio keeps every 4th PCM16 sample and re-encodes a
    canonical WAV: the payload round-trips through decode_wav /
    wav_samples equal to the numpy stride of the original samples,
    the rate is divided, and the byte size is 44 + 2*n_out."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    src = media.synthesize_media_table(docs).filter("modality = 'audio'")
    orig = {r["media_id"]: bytes(r["payload"]) for r in src.collect()}
    out = media.resample_audio(
        media.synthesize_media_table(docs), every_n=4
    ).collect()
    assert out
    for r in out:
        raw = bytes(r["payload"])
        rate, n = media.decode_wav(raw)
        want = media.wav_samples(orig[r["media_id"]])[::4]
        assert rate == 4000 and n == len(want) == r["n_samples"]
        assert np.array_equal(media.wav_samples(raw), want)
        assert r["n_bytes"] == 44 + 2 * len(want) == len(raw)


def test_audio_rms_frames_laws(spark):
    """r11 wave 11: a zero waveform is all-silent with zero energy; a
    full-scale square wave is all-loud with exactly n*amp^2 energy; a
    trailing partial frame is counted with its own length (mean-square
    threshold, not sum threshold); peak_abs is exact."""
    import numpy as np

    from ydb_vector_search_demo_spark.multimodal import media

    silent = media.encode_wav(np.zeros(320, dtype=np.int64))
    loud = media.encode_wav(np.full(400, 2000, dtype=np.int64))
    # 320 quiet samples then 40 loud ones: the partial frame (40
    # samples at amp 2000) has mean square 4e6 >= 1e6 -> NOT silent
    mixed = media.encode_wav(
        np.concatenate(
            [np.zeros(320, dtype=np.int64), np.full(40, 2000, np.int64)]
        )
    )
    df = spark.createDataFrame(
        [(1, "audio", bytearray(silent)), (2, "audio", bytearray(loud)),
         (3, "audio", bytearray(mixed))],
        "media_id LONG, modality STRING, payload BINARY",
    )
    got = {
        r["media_id"]: r.asDict()
        for r in media.audio_rms_frames(df).collect()
    }
    assert got[1]["n_frames"] == 2 and got[1]["n_silent"] == 2
    assert got[1]["total_sq"] == 0 and got[1]["peak_abs"] == 0
    assert got[2]["n_frames"] == 3 and got[2]["n_silent"] == 0
    assert got[2]["total_sq"] == 400 * 2000 * 2000
    assert got[2]["peak_abs"] == 2000
    assert got[3]["n_frames"] == 3 and got[3]["n_silent"] == 2


def test_audio_rms_frames_silence_ms_deprecation_shim(spark):
    """r12 ADVICE: keyword callers of the pre-r12 name silence_ms=
    still work (DeprecationWarning, value forwarded to
    silence_mean_sq); unknown keywords still raise TypeError."""
    import numpy as np
    import pytest as _pytest

    from ydb_vector_search_demo_spark.multimodal import media

    quiet = media.encode_wav(np.full(160, 500, dtype=np.int64))
    df = spark.createDataFrame(
        [(1, "audio", bytearray(quiet))],
        "media_id LONG, modality STRING, payload BINARY",
    )
    # mean square = 250_000: silent under the default 1e6 threshold,
    # loud under a shimmed silence_ms=1 threshold
    with _pytest.warns(DeprecationWarning, match="silence_mean_sq"):
        got = media.audio_rms_frames(df, silence_ms=1).collect()
    assert got[0]["n_silent"] == 0
    with _pytest.raises(TypeError, match="unexpected keyword"):
        media.audio_rms_frames(df, silence_db=1)
    # r13 ADVICE: both names passed raises even when the explicit
    # silence_mean_sq equals the resolved default (the pre-sentinel
    # shim let the stale keyword silently win in exactly this case)
    with _pytest.raises(TypeError, match="both silence_mean_sq"):
        media.audio_rms_frames(df, silence_mean_sq=1_000_000, silence_ms=1)


def test_interleaved_mm_elements_laws(spark):
    """r13 wave 27 (MMC4/Flamingo assembly): on a hand corpus the
    element stream must (a) reassemble each document's text exactly
    from its text spans in order, (b) place each image IMMEDIATELY
    BEFORE its anchor span (caption adjacency), (c) anchor at the
    hand-replayed pinned md5 % n_spans, (d) cost exactly
    image_tokens per image and span-length per text span, and (e)
    number positions contiguously from 1."""
    import hashlib

    from ydb_vector_search_demo_spark.multimodal import media

    texts = {
        0: "a b c d e f g",          # doc 0: image doc (0 % 3 == 0), 2 spans at S=4
        1: "h i j",                  # no image
        2: "",                       # empty text, no image
        3: "k l m n o p q r s",      # image doc, 3 spans
        6: "t",                      # image doc, 1 span
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id BIGINT, text STRING"
    )
    med = media.media_modalities(docs)
    got = {}
    for r in media.interleaved_mm_elements(
        docs, med, span_tokens=4, image_tokens=7
    ).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for d in got:
        got[d].sort(key=lambda r: r["pos"])

    def anchor(mid, nspans):
        return (
            0
            if nspans == 0
            else int(hashlib.md5(f"mmanchor:{mid}".encode()).hexdigest()[:4], 16)
            % nspans
        )

    for d, text in texts.items():
        toks = text.split() if text.strip() else []
        nspans = (len(toks) + 3) // 4
        els = got.get(d, [])
        # positions contiguous from 1
        assert [r["pos"] for r in els] == list(range(1, len(els) + 1))
        text_els = [r for r in els if r["kind"] == "text"]
        img_els = [r for r in els if r["kind"] == "image"]
        # (a) spans reassemble the text, in order, with correct costs
        assert " ".join(r["content"] for r in text_els) == " ".join(toks)
        assert all(
            r["el_tokens"] == len(r["content"].split()) for r in text_els
        )
        if d % 3 == 0:
            assert len(img_els) == 1 and img_els[0]["media_id"] == d
            a = anchor(d, nspans)
            assert img_els[0]["span_idx"] == a           # (c)
            assert img_els[0]["el_tokens"] == 7          # (d)
            # (b) caption adjacency: the image's successor is the
            # anchor text span (when the doc has any text)
            if nspans:
                ipos = img_els[0]["pos"]
                nxt = els[ipos]  # pos is 1-based; els[ipos] is pos+1... els[ipos-1] is the image
                assert els[ipos - 1]["kind"] == "image"
                assert nxt["kind"] == "text" and nxt["span_idx"] == a
        else:
            assert not img_els


def test_interleaved_mm_pack_laws(spark):
    """Pack-grain laws: every pack total <= budget unless it is a
    single oversized doc (the graded packer's law); totals equal
    text + 64*images; the anchor checksum equals the hand replay;
    every doc lands in exactly one pack of its md5 bucket."""
    import hashlib

    from ydb_vector_search_demo_spark.multimodal import media

    texts = [(i, " ".join(f"w{i}_{j}" for j in range(3 + (i * 7) % 40)))
             for i in range(40)]
    docs = spark.createDataFrame(texts, "doc_id BIGINT, text STRING")
    got = media.interleaved_mm_pack(
        docs, media.media_modalities(docs),
        span_tokens=16, image_tokens=64, seq_budget=128, n_buckets=4,
    ).collect()

    # hand replay
    def h4(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)

    per = {}
    for i, t in texts:
        nt = len(t.split())
        nspans = (nt + 15) // 16
        n_img = 1 if i % 3 == 0 else 0
        chk = (i * ((h4(f"mmanchor:{i}") % nspans if nspans else 0) + 1)) if n_img else 0
        per[i] = (h4(f"mmpack:{i}") % 4, nt, nspans, n_img, chk,
                  nt + 64 * n_img)
    packs = {}
    for b in range(4):
        ds = sorted(i for i in per if per[i][0] == b)
        pid, acc = 0, 0
        for i in ds:
            t = per[i][5]
            if acc > 0 and acc + t > 128:
                pid, acc = pid + 1, 0
            acc += t
            key = (b, pid)
            agg = packs.setdefault(key, [0, 0, 0, 0, 0, 0])
            agg[0] += 1; agg[1] += per[i][3]; agg[2] += per[i][2]
            agg[3] += per[i][1]; agg[4] += t; agg[5] += per[i][4]
    want = {
        k: tuple(v) for k, v in packs.items()
    }
    got_d = {
        (r["bucket"], r["pack_id"]): (
            r["n_docs"], r["n_images"], r["n_spans"], r["text_tokens"],
            r["total_tokens"], r["anchor_checksum"],
        )
        for r in got
    }
    assert got_d == want
    for (b, p), (nd, ni, ns, tt, tot, chk) in got_d.items():
        assert tot == tt + 64 * ni
        assert tot <= 128 or nd == 1  # budget law


def test_media_modalities_matches_synthesized_table(spark):
    """media_modalities is the metadata grain of the synthesized media
    table: identical (media_id, modality) pairs, no payloads built."""
    from ydb_vector_search_demo_spark.multimodal import media

    docs = spark.createDataFrame(
        [(i, f"t {i}") for i in range(12)], "doc_id BIGINT, text STRING"
    )
    lite = {
        (r["media_id"], r["modality"])
        for r in media.media_modalities(docs).collect()
    }
    full = {
        (r["media_id"], r["modality"])
        for r in media.synthesize_media_table(docs)
        .select("media_id", "modality")
        .collect()
    }
    assert lite == full


def test_image_ahash_laws(spark):
    """A global brightness shift WITHOUT wrap leaves every bit (hence
    every band) unchanged — the invariance that motivates perceptual
    hashing; a half-inverted image flips bits (hamming large vs its
    original); and the band grain is 8 rows of byte-ranged ints."""
    import numpy as np

    from ydb_vector_search_demo_spark.multimodal import media

    rng_w, rng_h = 32, 24
    yy, xx = np.mgrid[0:rng_h, 0:rng_w]
    base = (xx * 3 + yy * 2) % 100            # values in [0, 99]
    shifted = base + 100                      # +100, no wrap at 255
    half = base.copy(); half[:, rng_w // 2:] = 255 - half[:, rng_w // 2:]
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(media.encode_pgm(rng_w, rng_h, base))),
            (2, "image", bytearray(media.encode_pgm(rng_w, rng_h, shifted))),
            (3, "image", bytearray(media.encode_pgm(rng_w, rng_h, half))),
        ],
        "media_id LONG, modality STRING, payload BINARY",
    )
    rows = media.image_ahash_bands(df).collect()
    by = {}
    for r in rows:
        by.setdefault(r["media_id"], {})[r["band"]] = r["bv"]
        assert 0 <= r["bv"] <= 255
    assert len(by[1]) == 8
    assert by[1] == by[2]          # brightness invariance
    ham_13 = sum(
        bin(by[1][b] ^ by[3][b]).count("1") for b in range(8)
    )
    assert ham_13 > 7              # half-inversion is NOT a near-dup


def test_image_ahash_pairs_group_cap_valve(spark):
    """The heavy-group valve on a planted dup-heavy corpus: a 6-image
    identical-hash group over cap 4 emits the 5-pair STAR to its
    minimum id instead of the 15-pair clique; an under-cap group is
    bit-identical to valve-off; and the duplicate CLUSTERS (connected
    components over the pairs) are identical with and without the
    valve — the information a downstream dedup action consumes."""
    import numpy as np

    from ydb_vector_search_demo_spark.multimodal import media

    w, h = 32, 24
    yy, xx = np.mgrid[0:h, 0:w]
    img_x = (xx * 3 + yy * 2) % 100
    img_y = ((xx * 7 + yy * 11) % 13) * 19   # a different pattern
    rows = [
        (i, "image", bytearray(media.encode_pgm(w, h, img_x)))
        for i in range(1, 7)
    ] + [
        (i, "image", bytearray(media.encode_pgm(w, h, img_y)))
        for i in (11, 12)
    ]
    df = spark.createDataFrame(
        rows, "media_id LONG, modality STRING, payload BINARY"
    )
    bands = media.image_ahash_bands(df)
    uncapped = {
        (r["a"], r["b"]): r["hamming"]
        for r in media.image_ahash_pairs(bands).collect()
    }
    capped = {
        (r["a"], r["b"]): r["hamming"]
        for r in media.image_ahash_pairs(
            media.image_ahash_bands(df), max_band_group=4
        ).collect()
    }
    # uncapped: full cliques — C(6,2) + C(2,2) pairs, all hamming 0
    assert set(uncapped) == {
        (a, b) for a in range(1, 7) for b in range(a + 1, 7)
    } | {(11, 12)}
    assert all(v == 0 for v in uncapped.values())
    # capped: the over-cap group degrades to the star on its min id;
    # the under-cap group is bit-identical to valve-off
    assert set(capped) == {(1, b) for b in range(2, 7)} | {(11, 12)}
    assert all(v == 0 for v in capped.values())

    def components(pairs, ids):
        parent = {i: i for i in ids}

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a, b in pairs:
            parent[find(a)] = find(b)
        groups = {}
        for i in ids:
            groups.setdefault(find(i), set()).add(i)
        return sorted(
            (frozenset(g) for g in groups.values()), key=min
        )

    ids = list(range(1, 7)) + [11, 12]
    assert components(uncapped, ids) == components(capped, ids)
