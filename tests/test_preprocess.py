"""Golden parity tests: our preprocessing vs PIL + HF CLIPImageProcessor.

The reference pipeline is expand2square (mm_utils.py:14-25) followed by
CLIPImageProcessor(336) — these tests run that exact reference pipeline via
transformers/PIL and compare.
"""

import numpy as np
import pytest

from vcoder_tpu.preprocess import (
    BACKGROUND_COLOR,
    CLIP_IMAGE_MEAN,
    expand2square,
    process_images,
)

PIL = pytest.importorskip("PIL.Image")


def _reference_pipeline(arr: np.ndarray) -> np.ndarray:
    """expand2square + CLIPImageProcessor, exactly as the reference runs it."""
    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor(
        size={"shortest_edge": 336},
        crop_size={"height": 336, "width": 336},
        image_mean=list(CLIP_IMAGE_MEAN),
    )
    img = PIL.fromarray(arr)
    # reference mm_utils.expand2square via PIL
    w, h = img.size
    if w != h:
        side = max(w, h)
        bg = tuple(int(x * 255) for x in proc.image_mean)
        sq = PIL.new("RGB", (side, side), bg)
        sq.paste(img, ((side - w) // 2, (side - h) // 2))
        img = sq
    out = proc.preprocess(img, return_tensors="np")["pixel_values"][0]
    return out.transpose(1, 2, 0)  # CHW -> HWC


def test_background_color_matches_reference():
    assert BACKGROUND_COLOR == (122, 116, 104)


def test_expand2square_geometry():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (100, 40, 3), dtype=np.uint8)
    sq = expand2square(img)
    assert sq.shape == (100, 100, 3)
    np.testing.assert_array_equal(sq[:, 30:70], img)
    assert (sq[:, :30] == np.array(BACKGROUND_COLOR, np.uint8)).all()
    # wide image
    img = rng.randint(0, 256, (31, 99, 3), dtype=np.uint8)
    sq = expand2square(img)
    assert sq.shape == (99, 99, 3)
    np.testing.assert_array_equal(sq[34 : 34 + 31, :], img)


@pytest.mark.parametrize("shape", [(336, 336), (200, 317), (500, 375)])
def test_golden_vs_clip_image_processor(shape):
    rng = np.random.RandomState(42)
    # Smooth-ish image: random low-res upsampled, closer to natural photos
    # than white noise (bicubic implementations differ most on noise).
    low = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    img = np.asarray(
        PIL.fromarray(low).resize((shape[1], shape[0]), PIL.BILINEAR)
    )
    ref = _reference_pipeline(img)
    ours = np.asarray(process_images([img]))[0]
    assert ours.shape == ref.shape
    diff = np.abs(ours - ref)
    # Normalized units; 1 uint8 step ~ 0.015. Allow a couple of steps of
    # bicubic disagreement at edges, tiny mean drift.
    assert diff.mean() < 0.01, diff.mean()
    assert np.quantile(diff, 0.99) < 0.05, np.quantile(diff, 0.99)


def test_no_resize_path_is_exact():
    """A 336x336 input skips resize: parity must be bit-level."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (336, 336, 3), dtype=np.uint8)
    ref = _reference_pipeline(img)
    ours = np.asarray(process_images([img]))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mixed_sizes_batch():
    rng = np.random.RandomState(1)
    imgs = [
        rng.randint(0, 256, (64, 64, 3), dtype=np.uint8),
        rng.randint(0, 256, (100, 40, 3), dtype=np.uint8),
        rng.randint(0, 256, (64, 64, 3), dtype=np.uint8),
    ]
    out = np.asarray(process_images(imgs))
    assert out.shape == (3, 336, 336, 3)
    singles = [np.asarray(process_images([im]))[0] for im in imgs]
    for i in range(3):
        np.testing.assert_allclose(out[i], singles[i], atol=1e-6)
