"""Engine-grade text functions + multimodal plumbing (training-data
pipeline ops): determinism, dedup behavior, schema/batch contracts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.corpus import corpus_df
from lucene_solr_spark.functions import (
    minhash_signature,
    rolling_fingerprint,
    simhash64,
)
from lucene_solr_spark.functions.multimodal import (
    FEATURE_DIM,
    attach_fake_media,
    decode_image_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        corpus_df(spark, 60, partitions=3)
        .select(F.crc32("path").cast("long").alias("doc_id"),
                F.col("content").alias("text"))
        .cache()
    )


def test_simhash64_deterministic_and_near_dup(spark, docs):
    a = {r["doc_id"]: r["h"] for r in
         docs.select("doc_id", simhash64("text").alias("h")).collect()}
    b = {r["doc_id"]: r["h"] for r in
         docs.select("doc_id", simhash64("text").alias("h")).collect()}
    assert a == b
    # identical text → identical hash; near-identical → small hamming
    row = docs.orderBy("doc_id").first()
    txt = row["text"]
    near = txt + " extratoken"
    far = " ".join(reversed(sorted(set(txt.split()))))[:200] + " zz qq xx yy"
    pdf = spark.createDataFrame(
        [(1, txt), (2, txt), (3, near), (4, far)], "id long, text string"
    ).select("id", simhash64("text").alias("h")).collect()
    h = {r["id"]: r["h"] for r in pdf}
    assert h[1] == h[2]
    ham = lambda x, y: bin((x ^ y) & (2**64 - 1)).count("1")
    assert ham(h[1], h[3]) < ham(h[1], h[4])


def test_minhash_signature_shape_and_jaccard_monotone(spark, docs):
    udf = minhash_signature(n_hashes=16)
    rows = docs.select("doc_id", udf("text").alias("sig")).collect()
    assert all(len(r["sig"]) == 16 for r in rows)
    row = docs.orderBy("doc_id").first()
    txt = row["text"]
    toks = txt.split()
    half = " ".join(toks[: len(toks) // 2])
    other = " ".join(f"u{i}" for i in range(100))
    got = {r["id"]: r["sig"] for r in spark.createDataFrame(
        [(1, txt), (2, half), (3, other)], "id long, text string"
    ).select("id", udf("text").alias("sig")).collect()}
    overlap_near = sum(x == y for x, y in zip(got[1], got[2]))
    overlap_far = sum(x == y for x, y in zip(got[1], got[3]))
    assert overlap_near > overlap_far


def test_rolling_fingerprint_detects_shared_passage(spark):
    shared = "the quick brown fox jumps over the lazy dog " * 3
    a = "PREFIXA " + shared + " SUFFIXA"
    b = "PREFIXB " + shared + " SUFFIXB"
    c = " ".join(f"tok{i}" for i in range(60))
    udf = rolling_fingerprint()
    got = {r["id"]: set(r["fp"]) for r in spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "id long, text string"
    ).select("id", udf("text").alias("fp")).collect()}
    assert len(got[1] & got[2]) > 0          # shared passage found
    assert len(got[1] & got[3]) <= len(got[1] & got[2])


def test_media_schema_and_decode(spark, docs):
    media = attach_fake_media(docs)
    assert set(media.columns) == {"media_id", "kind", "meta", "payload"}
    feats = decode_image_features(media)
    rows = feats.limit(5).collect()
    assert all(len(r["features"]) == FEATURE_DIM for r in rows)
    s = np.array(rows[0]["features"], dtype=np.float64).sum()
    assert abs(s - 1.0) < 1e-3  # L1-normalized histogram
    # deterministic across runs
    a = sorted(map(tuple, decode_image_features(media).collect()))
    b = sorted(map(tuple, decode_image_features(media).collect()))
    assert a == b


def test_real_decoder_is_gated(spark, docs):
    media = attach_fake_media(docs).limit(1)
    with pytest.raises(Exception) as ei:
        decode_image_features(media, use_real=True).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_sample_frames(spark, docs):
    media = attach_fake_media(docs, kind="video")
    frames = sample_frames(media, every=2)
    pdf = frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    metas = {r["media_id"]: r["meta"]["n_frames"] for r in
             media.select("media_id", "meta").collect()}
    for r in pdf:
        expected = (metas[r["media_id"]] + 1) // 2
        assert r["n"] == expected


# ---- real netpbm decode path ----------------------------------------------

def test_decode_ppm_p6_and_p5():
    import numpy as np

    from lucene_solr_spark.functions.multimodal import decode_ppm

    # 2x2 RGB P6 with a comment line in the header
    raster = bytes([255, 0, 0,  0, 255, 0,
                    0, 0, 255,  9, 9, 9])
    img = decode_ppm(b"P6\n# a comment\n2 2\n255\n" + raster)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]
    assert img[1, 1].tolist() == [9, 9, 9]
    # P5 grayscale
    g = decode_ppm(b"P5\n3 1\n255\n" + bytes([1, 2, 3]))
    assert g.shape == (1, 3) and g.tolist() == [[1, 2, 3]]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_resize_nearest():
    import numpy as np

    from lucene_solr_spark.functions.multimodal import resize_nearest

    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_nearest(img, 2, 2)
    assert out.tolist() == [[0, 2], [8, 10]]
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8) and up[0, 0] == 0 and up[7, 7] == 15


def test_real_decode_end_to_end(spark, sf_dir):
    from lucene_solr_spark.functions.multimodal import (
        FEATURE_DIM,
        attach_fake_media,
        decode_image_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = attach_fake_media(docs, fmt="ppm")
    feats = decode_image_features(media, use_real=True).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        s = sum(r["features"])
        assert abs(s - 1.0) < 1e-3  # L1-normalized thumbnail
    # deterministic across runs
    again = decode_image_features(
        attach_fake_media(docs, fmt="ppm"), use_real=True).collect()
    assert sorted((r["media_id"], tuple(r["features"])) for r in feats) == \
        sorted((r["media_id"], tuple(r["features"])) for r in again)


# ---- real baseline JPEG codec (functions/jpeg.py, T.81) --------------------

def test_jpeg_round_trip_444_and_420():
    import numpy as np

    from lucene_solr_spark.functions.jpeg import decode_jpeg, encode_jpeg

    h, w = 37, 53  # non-multiples of 16: padding + crop paths
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(np.stack([
        128 + 80 * np.sin(xx / 9.0) + 20 * np.cos(yy / 7.0),
        128 + 60 * np.cos(xx / 11.0 + yy / 13.0),
        np.clip(xx * 3 + yy * 2, 0, 255)], axis=-1), 0, 255).astype(np.uint8)
    for subsample, tol_max, tol_mean in ((False, 10, 2.0), (True, 40, 5.0)):
        payload = encode_jpeg(img, quality=90, subsample=subsample)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        dec = decode_jpeg(payload)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= tol_max and err.mean() <= tol_mean, (
            subsample, err.max(), err.mean())
    # grayscale single-component stream
    g = np.clip(100 + 50 * np.sin(xx / 5.0) * np.cos(yy / 6.0),
                0, 255).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=92))
    assert dg.shape == g.shape
    assert np.abs(dg.astype(int) - g.astype(int)).max() <= 6


def test_jpeg_rejects_non_baseline():
    import pytest as _pytest

    from lucene_solr_spark.functions.jpeg import decode_jpeg

    with _pytest.raises(ValueError):
        decode_jpeg(b"P6\n1 1\n255\n\x00\x00\x00")
    # progressive (SOF2) must be refused, not mis-decoded
    bad = (b"\xff\xd8" + b"\xff\xc2" + (11).to_bytes(2, "big")
           + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    with _pytest.raises(ValueError):
        decode_jpeg(bad)


def test_jpeg_roundtrip_fuzz_ff_rst_bytes():
    """Regression for the RST-stripping bug: a data byte 0xFF (stuffed
    as FF 00 on the wire) followed by a data byte in 0xD0-0xD7 must
    survive decoding. The old code string-replaced FF D0..D7 on the
    UNSTUFFED stream, deleting such pairs (~15% of random images →
    Huffman desync: exceptions or >100 channel error). Random noise at
    high quality maximizes the pair probability; 20 seeded trials make
    at least one occurrence overwhelmingly likely."""
    import numpy as np

    from lucene_solr_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(20260821)
    saw_pair = 0
    for _ in range(20):
        h = int(rng.integers(8, 48))
        w = int(rng.integers(8, 48))
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        payload = encode_jpeg(img, quality=97)
        # count FF+D0..D7 pairs in the unstuffed entropy stream (the
        # trigger condition): unstuff FF00->FF over the SOS payload
        sos = payload[payload.rindex(b"\xff\xda"):]
        unstuffed = sos.replace(b"\xff\x00", b"\xff")
        if any(unstuffed[i] == 0xFF and 0xD0 <= unstuffed[i + 1] <= 0xD7
               for i in range(len(unstuffed) - 1)):
            saw_pair += 1
        dec = decode_jpeg(payload)  # must not raise
        assert dec.shape == img.shape
        # quality-97 4:4:4 reconstruction of noise stays within
        # quantization error; a Huffman desync blows far past this
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 60 and err.mean() <= 8.0, (err.max(),
                                                       err.mean())
    assert saw_pair >= 1  # the trigger condition actually occurred


def test_jpeg_restart_interval_roundtrip():
    """DRI/RSTn path: encoder emits real restart markers; decoder must
    split them out during the (stuffed) chunk walk, re-align, and
    reset DC predictors — bit-identical reconstruction to the
    no-restart encoding of the same image."""
    import numpy as np

    from lucene_solr_spark.functions.jpeg import decode_jpeg, encode_jpeg

    h, w = 41, 59
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.clip(np.stack([
        128 + 90 * np.sin(xx / 4.0) + 30 * np.cos(yy / 3.0),
        255 * ((xx // 4 + yy // 4) % 2),
        np.clip(xx * 4 + yy * 3, 0, 255)], axis=-1), 0, 255).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 2, 5):
        payload = encode_jpeg(img, quality=90, restart_interval=ri)
        assert b"\xff\xdd" in payload  # DRI present
        assert any(bytes([0xFF, 0xD0 + n]) in payload for n in range(8))
        dec = decode_jpeg(payload)
        assert np.array_equal(dec, base), ri
    # subsampled + restarts together
    p420 = encode_jpeg(img, quality=90, subsample=True, restart_interval=3)
    b420 = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert np.array_equal(decode_jpeg(p420), b420)


def test_media_jpeg_end_to_end(spark, docs):
    """attach_fake_media(fmt='jpeg') emits REAL JPEG payloads and the
    use_real decode path extracts features from decoded pixels —
    the full bytes→pixels→features pipeline with zero imaging libs."""
    import numpy as np

    media = attach_fake_media(docs, fmt="jpeg").limit(8)
    rows = media.collect()
    assert all(bytes(r["payload"])[:2] == b"\xff\xd8" for r in rows)
    feats = decode_image_features(media, use_real=True).collect()
    assert all(len(r["features"]) == FEATURE_DIM for r in feats)
    for r in feats:
        s = np.array(r["features"], dtype=np.float64).sum()
        assert abs(s - 1.0) < 1e-3


# ---- PNG + WAV codecs (functions/png.py, functions/wav.py) -----------------

def test_png_round_trip_and_filters():
    import zlib
    import struct

    import numpy as np

    from lucene_solr_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)
    gray = rng.integers(0, 256, size=(9, 14), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(gray)), gray)
    rgba = rng.integers(0, 256, size=(6, 7, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(rgba)), rgba)

    # hand-filter scanlines with Sub/Up/Average/Paeth and check the
    # decoder inverts each (the encoder only emits filter 0, so this
    # exercises the general unfilter paths)
    h, w, ch = 4, 5, 3
    src = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    lines = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, ft in enumerate([1, 2, 3, 4]):
        cur = src[y].astype(np.int32)
        f = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            pred = {1: a, 2: b, 3: (a + b) >> 1, 4: paeth(a, b, c)}[ft]
            f[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prev = cur
    raw = b"".join(lines)
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    payload = (sig
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), src.reshape(h, w, ch))


def test_wav_round_trip():
    import numpy as np

    from lucene_solr_spark.functions.wav import decode_wav, encode_wav

    t = np.sin(np.linspace(0, 60, 8000)).astype(np.float32) * 0.7
    x, rate = decode_wav(encode_wav(t, 22050))
    assert rate == 22050 and np.abs(x - t).max() < 1e-4
    stereo = np.stack([t, -0.5 * t], axis=1)
    x2, _ = decode_wav(encode_wav(stereo))
    assert x2.shape == (8000, 2) and np.abs(x2 - stereo).max() < 1e-4
    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_wav(b"OggS....")


def test_media_png_and_wav_end_to_end(spark, docs):
    import numpy as np

    for fmt, magic in (("png", b"\x89PNG"), ("wav", b"RIFF")):
        media = attach_fake_media(
            docs, kind="image" if fmt == "png" else "audio",
            fmt=fmt).limit(6)
        rows = media.collect()
        assert all(bytes(r["payload"])[:4] == magic for r in rows), fmt
        feats = decode_image_features(media, use_real=True).collect()
        assert all(len(r["features"]) == FEATURE_DIM for r in feats)
        for r in feats:
            s = np.array(r["features"], dtype=np.float64).sum()
            assert abs(s - 1.0) < 1e-3


# ---- FLAC codec (functions/flac.py, RFC 9639) ------------------------------

def test_flac_roundtrip_fixed_and_lpc():
    """Lossless roundtrip: decode(encode(x)) == x exactly for mono and
    stereo, fixed predictors and quantized Levinson-Durbin LPC, with
    real compression (ratio < 1)."""
    import numpy as np

    from lucene_solr_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(11)
    t = np.arange(6000)
    x = (3000 * np.sin(t / 50)
         + rng.integers(-200, 200, t.size)).astype(np.int64)
    for use_lpc in (False, True):
        payload = encode_flac(x, rate=16000, use_lpc=use_lpc)
        assert payload[:4] == b"fLaC"
        dec, rate = decode_flac(payload)
        assert rate == 16000
        assert np.array_equal(np.round(dec * 32768).astype(np.int64), x)
        assert len(payload) < x.size * 2  # actually compresses
    # stereo, mid/side decorrelation
    st = np.stack([x, (x * 0.8).astype(np.int64)
                   + rng.integers(-50, 50, x.size)], axis=1)
    p2 = encode_flac(st, rate=8000, mid_side=True, use_lpc=True)
    d2, r2 = decode_flac(p2)
    assert r2 == 8000 and d2.shape == st.shape
    assert np.array_equal(np.round(d2 * 32768).astype(np.int64), st)


def test_flac_roundtrip_fuzz_and_block_boundaries():
    """Seeded fuzz across signal shapes and lengths spanning multiple
    frames and non-multiple-of-blocksize tails, incl. constant and
    pure-noise blocks (escape / high Rice params)."""
    import numpy as np

    from lucene_solr_spark.functions.flac import decode_flac, encode_flac

    rng = np.random.default_rng(77)
    shapes = [
        np.zeros(500, dtype=np.int64),                       # constant
        np.full(4096, -12345, dtype=np.int64),               # one frame
        rng.integers(-30000, 30000, 5000),                   # noise
        (20000 * np.sin(np.arange(9000) / 10)).astype(np.int64),
        rng.integers(-5, 5, 4097),                           # tiny range
    ]
    for x in shapes:
        for bs in (1024, 4096):
            payload = encode_flac(x, rate=22050, block_size=bs)
            dec, _ = decode_flac(payload)
            got = np.round(dec * 32768).astype(np.int64)
            assert np.array_equal(got, x), (x.size, bs)


def test_flac_crc_detects_corruption():
    import numpy as np
    import pytest as _pytest

    from lucene_solr_spark.functions.flac import decode_flac, encode_flac

    x = (1000 * np.sin(np.arange(3000) / 20)).astype(np.int64)
    payload = bytearray(encode_flac(x))
    payload[-1] ^= 0xFF  # flip the final frame's CRC-16 low byte
    with _pytest.raises(ValueError):
        decode_flac(bytes(payload))
    # corrupting entropy data is caught too (CRC mismatch or a
    # malformed-stream error before the CRC line is reached)
    payload2 = bytearray(encode_flac(x))
    payload2[-40] ^= 0xFF
    with _pytest.raises((ValueError, IndexError)):
        decode_flac(bytes(payload2))


def test_media_flac_end_to_end(spark, docs):
    """attach_fake_media(fmt='flac') emits REAL FLAC payloads and the
    audio-feature extraction path decodes them natively."""
    import numpy as np

    from lucene_solr_spark.functions.multimodal import (
        attach_fake_media,
        decode_image_features,
    )

    media = attach_fake_media(docs, fmt="flac").limit(6)
    rows = media.collect()
    assert all(bytes(r["payload"])[:4] == b"fLaC" for r in rows)
    feats = decode_image_features(media, use_real=True).collect()
    assert len(feats) == 6
    for r in feats:
        v = np.array(r["features"])
        assert v.shape == (64,)
        assert abs(float(v.sum()) - 1.0) < 1e-3  # L1-normalized RMS
