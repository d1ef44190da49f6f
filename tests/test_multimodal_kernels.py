"""Real multimodal feature kernels (numpy, no imaging libs): bilinear
resize, image stats, frame cadence, audio DSP — plus the mapInPandas
plumbing contract."""

import numpy as np

from bleve_spark.functions.multimodal import (
    _decode_audio,
    _decode_image,
    _sample_frames,
    audio_stats,
    image_stats,
    resize_bilinear,
)


def test_bilinear_resize_constant_image():
    img = np.full((17, 23, 3), 111, dtype=np.uint8)
    out = resize_bilinear(img, 32, 32)
    assert out.shape == (32, 32, 3)
    assert np.allclose(out, 111.0)


def test_bilinear_resize_identity():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, size=(16, 16, 3), dtype=np.uint8)
    out = resize_bilinear(img, 16, 16)
    assert np.allclose(out, img.astype(np.float32), atol=1e-4)


def test_bilinear_gradient_interpolates():
    # vertical ramp 0..30: downsampling must land strictly between
    img = np.repeat(
        np.arange(0, 32, dtype=np.uint8)[:, None], 8, axis=1
    )[..., None].repeat(3, axis=2)
    out = resize_bilinear(img, 4, 4)
    col = out[:, 0, 0]
    assert np.all(np.diff(col) > 0) and 0 < col[0] < col[-1] < 31


def test_image_stats_shape_and_invariants():
    img = np.zeros((10, 10, 3), dtype=np.uint8)
    f = image_stats(img)
    assert f.shape == (16,)
    assert np.allclose(f[:3], 0.0)          # means
    assert np.allclose(f[3:6], 0.0)         # stds
    assert f[7] == 0.0                      # edge density of flat image
    assert np.isclose(f[8:].sum(), 1.0)     # histogram sums to 1


def test_image_stats_edge_density_detects_structure():
    flat = np.full((16, 16, 3), 100, dtype=np.uint8)
    stripes = np.zeros((16, 16, 3), dtype=np.uint8)
    stripes[::2] = 255
    assert image_stats(stripes)[7] > image_stats(flat)[7]


def test_frame_cadence():
    assert len(_sample_frames(b"x", 0)) == 1
    assert len(_sample_frames(b"x", 3000)) == 3
    assert len(_sample_frames(b"x", 60_000)) == 8   # capped


def test_decode_seams_deterministic():
    a = _decode_image(b"payload", 32, 48)
    b = _decode_image(b"payload", 32, 48)
    assert a.shape == (48, 32, 3) and (a == b).all()
    w1, w2 = _decode_audio(b"p", 1000), _decode_audio(b"p", 1000)
    assert (w1 == w2).all() and abs(float(w1.mean())) < 0.1


def test_audio_stats():
    # pure tone: energy concentrates in one FFT band, zcr matches freq
    t = np.arange(4096, dtype=np.float32)
    tone = np.sin(2 * np.pi * t * 128 / 4096).astype(np.float32)
    f = audio_stats(tone)
    assert f.shape == (10,)
    assert np.isclose(f[0], 1 / np.sqrt(2), atol=0.01)     # RMS
    bands = f[2:]
    assert bands.argmax() == 0        # 128/2048 falls in band 0 of 8
    noise = _decode_audio(b"n", 1000)
    fn = audio_stats(noise)
    assert fn[2:].std() < bands.std()  # noise spreads energy


def test_extract_features_end_to_end(spark):
    from bleve_spark.functions.multimodal import (
        extract_features, synthesize_media_df,
    )

    df = spark.range(12).withColumnRenamed("id", "doc_id")
    media = synthesize_media_df(spark, df, "doc_id")
    rows = {r["key"]: r for r in extract_features(media).collect()}
    assert len(rows) == 12
    for k, r in rows.items():
        want = ["image", "audio", "video"][k % 3]
        assert r["media_type"] == want
        assert len(r["feature"]) == (10 if want == "audio" else 16)
        assert all(np.isfinite(v) for v in r["feature"])
