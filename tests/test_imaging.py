"""Imaging codec tests: round-trips, PSNR gate, phash stability."""

from __future__ import annotations

import numpy as np

from linkkchecker_net_spark import imaging


def _img(seed=7, w=33, h=21):
    rng = np.random.default_rng(seed)
    return imaging.make_image(rng, w, h)


def test_png_roundtrip_lossless():
    arr = _img()
    data = imaging.encode_png(arr)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    out = imaging.decode_png(data)
    assert np.array_equal(arr, out)
    assert imaging.psnr(arr, out) == float("inf")


def test_lossy_roundtrip_psnr_above_gate():
    arr = _img()
    out = imaging.decode_image(imaging.encode_lossy(arr), "jpeg")
    p = imaging.psnr(arr, out)
    # the 40 dB gate (BASELINE.json input_hint) with real, nonzero error
    assert 40.0 <= p < 60.0
    assert not np.array_equal(arr, out)


def test_lossless_container_roundtrip():
    arr = _img()
    out = imaging.decode_image(imaging.encode_lossless(arr), "gif")
    assert np.array_equal(arr, out)


def test_encode_decode_dispatch():
    arr = _img()
    for fmt in ("png", "jpeg", "gif"):
        out = imaging.decode_image(imaging.encode_image(arr, fmt), fmt)
        assert out.shape == arr.shape
        assert imaging.psnr(arr, out) >= 40.0


def test_phash_deterministic_and_local():
    arr = _img()
    h1 = imaging.phash64(arr)
    assert h1 == imaging.phash64(arr.copy())
    assert -(1 << 63) <= h1 < (1 << 63)
    # lossy re-encode barely moves the perceptual hash
    lossy = imaging.decode_image(imaging.encode_lossy(arr), "jpeg")
    assert imaging.hamming64(h1, imaging.phash64(lossy)) <= 4
    # a very different image gets a distant hash
    other = _img(seed=12345)[:21, :33][::-1]
    assert imaging.hamming64(h1, imaging.phash64(255 - other)) > 10


def test_laplacian_sharpness_flat_tiny_and_striped(spark):
    """Flat frame → zero energy; <3px image → interior 0 (guarded, not
    a crash); one striped id matches the closed-form 540·(32/s−1)·Δ²."""
    import pandas as pd
    from linkkchecker_net_spark.pipeline.multimodal import (
        laplacian_sharpness,
        synth_striped_corpus,
    )

    flat = imaging.encode_image(
        np.full((8, 8, 3), 77, dtype=np.uint8), "png"
    )
    tiny = imaging.encode_image(
        np.full((2, 2, 3), 10, dtype=np.uint8), "gif"
    )
    corpus = spark.createDataFrame(
        pd.DataFrame(
            {"image_id": ["flat", "tiny"], "bytes": [flat, tiny],
             "fmt": ["png", "gif"]}
        )
    )
    out = {r["image_id"]: r for r in laplacian_sharpness(corpus).collect()}
    assert out["flat"]["lap_sq_sum"] == 0 and not out["flat"]["sharp"]
    assert out["tiny"]["interior_px"] == 0
    assert out["tiny"]["sharpness_x100"] == 0  # div guarded

    ids = spark.createDataFrame([(5,)], "id long")  # s=4, delta=24
    row = laplacian_sharpness(synth_striped_corpus(spark, ids)).collect()[0]
    assert row["lap_sq_sum"] == 540 * (32 // 4 - 1) * 24 * 24
