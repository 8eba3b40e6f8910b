"""Native C++ IO pipeline tests: decode/pad/resize parity with PIL, and
the threaded prefetch pipeline."""

import os

import numpy as np
import pytest

from vcoder_tpu.native import io as nio
from vcoder_tpu.preprocess import BACKGROUND_COLOR, expand2square

PIL = pytest.importorskip("PIL.Image")

pytestmark = pytest.mark.skipif(
    not nio.is_available(), reason="native toolchain/libs unavailable"
)


def _rand_img(seed, h, w):
    rng = np.random.RandomState(seed)
    low = rng.randint(0, 256, (12, 12, 3), np.uint8)
    return np.asarray(PIL.fromarray(low).resize((w, h), PIL.BILINEAR))


def test_pad_resize_matches_pil():
    img = _rand_img(0, 200, 317)
    ours = nio.pad_resize(img, size=336)

    sq = expand2square(img, BACKGROUND_COLOR)
    ref = np.asarray(
        PIL.fromarray(sq).resize((336, 336), PIL.BICUBIC)
    )
    diff = np.abs(ours.astype(int) - ref.astype(int))
    # PIL uses 8-bit fixed-point filter coefficients; the float filter
    # disagrees by at most a couple of LSBs at edges.
    assert diff.mean() < 0.5, diff.mean()
    assert np.quantile(diff, 0.999) <= 3, np.quantile(diff, 0.999)


def test_identity_when_square_and_sized():
    img = _rand_img(1, 336, 336)
    ours = nio.pad_resize(img, size=336)
    np.testing.assert_array_equal(ours, img)


def test_load_file_jpeg_and_png(tmp_path):
    img = _rand_img(2, 100, 60)
    p_png = str(tmp_path / "x.png")
    PIL.fromarray(img).save(p_png)
    out_png = nio.load_preprocessed(p_png, size=64)
    assert out_png.shape == (64, 64, 3)

    p_jpg = str(tmp_path / "x.jpg")
    PIL.fromarray(img).save(p_jpg, quality=95)
    out_jpg = nio.load_preprocessed(p_jpg, size=64)
    assert out_jpg.shape == (64, 64, 3)
    # JPEG is lossy; outputs should still be close to the PNG path.
    assert np.abs(out_png.astype(int) - out_jpg.astype(int)).mean() < 6


def test_prefetch_pipeline(tmp_path):
    paths = []
    for i in range(8):
        img = _rand_img(10 + i, 80 + i, 50 + i)
        p = str(tmp_path / f"img{i}.png")
        PIL.fromarray(img).save(p)
        paths.append(p)

    pipe = nio.PrefetchPipeline(n_threads=3, size=48)
    for i, p in enumerate(paths):
        pipe.submit(i, p)
    got = {}
    for _ in paths:
        jid, px = pipe.next()
        assert px is not None
        got[jid] = px
    pipe.close()
    assert set(got) == set(range(8))
    for i, p in enumerate(paths):
        ref = nio.load_preprocessed(p, size=48)
        np.testing.assert_array_equal(got[i], ref)


def test_pipeline_reports_decode_failure(tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not an image at all")
    pipe = nio.PrefetchPipeline(n_threads=1, size=32)
    pipe.submit(7, bad)
    jid, px = pipe.next()
    pipe.close()
    assert jid == 7 and px is None


def test_load_images_preprocessed_matches_pil_path(tmp_path, monkeypatch):
    """The batched native file loader (eval loaders' hot path) must
    agree with the portable PIL + process_images path within the
    golden-activation envelope, and fall back to it exactly when
    disabled."""
    from vcoder_tpu.preprocess import load_images_preprocessed

    paths = []
    for i in range(5):
        img = _rand_img(20 + i, 90 + 7 * i, 130 - 9 * i)
        p = str(tmp_path / f"b{i}.png")
        PIL.fromarray(img).save(p)
        paths.append(p)

    native = np.asarray(load_images_preprocessed(paths, size=64))

    monkeypatch.setenv("VCODER_TPU_NATIVE_IO", "0")
    portable = np.asarray(load_images_preprocessed(paths, size=64))

    assert native.shape == portable.shape == (5, 64, 64, 3)
    diff = np.abs(native - portable)
    # Both resample ~PIL-bicubic within a couple of LSBs; normalized
    # units (1 LSB ~ 0.0147).
    assert diff.mean() < 0.01, diff.mean()
    assert np.quantile(diff, 0.99) < 0.06, np.quantile(diff, 0.99)


def test_load_images_preprocessed_per_file_fallback(tmp_path):
    """A file the native decoder rejects but PIL reads must ride the
    per-file PIL fallback instead of failing the batch."""
    from vcoder_tpu import preprocess as pp
    from vcoder_tpu.preprocess import load_images_preprocessed

    good = _rand_img(30, 70, 70)
    p_good = str(tmp_path / "good.png")
    PIL.fromarray(good).save(p_good)
    # A BMP: PIL reads it, the native lib (jpeg/png only) cannot.
    p_bmp = str(tmp_path / "odd.bmp")
    PIL.fromarray(good).save(p_bmp)

    out = np.asarray(load_images_preprocessed([p_good, p_bmp], size=48))
    assert out.shape == (2, 48, 48, 3)
    np.testing.assert_allclose(out[0], out[1], atol=0.08)

    # A truly unreadable file raises, as the PIL path would.
    p_bad = str(tmp_path / "bad.png")
    with open(p_bad, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(Exception):
        load_images_preprocessed([p_good, p_bad], size=48)
