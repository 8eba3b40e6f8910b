"""Image preprocessing: pad-to-square -> resize-336 -> CLIP normalize.

Replicates the reference pipeline (reference: vcoder_llava/mm_utils.py:14-40:
``expand2square`` with the CLIP-mean background color, then
``CLIPImageProcessor`` resize/rescale/normalize) as a host-side uint8 pad +
a jit-compiled on-device resize+normalize:

* The pad runs on host numpy because input sizes vary per image (dynamic
  shapes would defeat XLA); it is a memcpy-level operation.
* The resize + normalize compiles once per unique square size (COST images
  are size-bucketed in practice) and runs on device in the prefill graph's
  dtype.
* PIL's BICUBIC resize rounds to uint8 before HF rescales to float; we
  reproduce that rounding for parity (validated against CLIPImageProcessor
  in tests/test_preprocess.py).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP normalization constants (transformers CLIPImageProcessor
# defaults; reference checkpoints all use openai/clip-vit-large-patch14-336).
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

# int(mean*255) background, exactly as the reference computes it
# (mm_utils.py:33: tuple(int(x*255) for x in image_processor.image_mean)).
BACKGROUND_COLOR = tuple(int(x * 255) for x in CLIP_IMAGE_MEAN)


def expand2square(
    img: np.ndarray, background_color: Sequence[int] = BACKGROUND_COLOR
) -> np.ndarray:
    """Pad an [H, W, 3] uint8 image to a centered square.

    Matches PIL ``Image.new + paste`` at offsets ((max-min)//2)
    (reference: mm_utils.py:14-25).
    """
    h, w = img.shape[:2]
    if h == w:
        return img
    side = max(h, w)
    out = np.empty((side, side, 3), dtype=img.dtype)
    out[:, :] = np.asarray(background_color, dtype=img.dtype)
    if w > h:
        top = (side - h) // 2
        out[top : top + h, :, :] = img
    else:
        left = (side - w) // 2
        out[:, left : left + w, :] = img
    return out


@partial(jax.jit, static_argnames=("size", "dtype"))
def resize_normalize(
    images: jnp.ndarray,  # [B, S, S, 3] uint8 (square)
    *,
    size: int = 336,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Bicubic-resize to [B, size, size, 3] and CLIP-normalize on device."""
    x = images.astype(jnp.float32)
    b = x.shape[0]
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(
            x, (b, size, size, 3), method="bicubic", antialias=True
        )
    # PIL resize emits uint8: round before rescale for parity.
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    x = x / 255.0
    mean = jnp.asarray(CLIP_IMAGE_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_IMAGE_STD, jnp.float32)
    x = (x - mean) / std
    return x.astype(dtype)


def _native_pad_resize(
    arr: np.ndarray, size: int, background_color
) -> Optional[np.ndarray]:
    """Pad+bicubic-resize via the C++ lib (native/vcoder_io.cpp) when it
    is built and enabled; returns None to select the portable path.

    Numerics: the native resize matches PIL within a couple of LSBs
    (tests/test_native_io.py), the same envelope as the on-device
    jax.image bicubic — both sit inside the golden-activation tolerance
    (tests/test_preprocess.py). Set VCODER_TPU_NATIVE_IO=0 to force the
    portable path when bisecting numerics."""
    import os

    if os.environ.get("VCODER_TPU_NATIVE_IO", "1") == "0":
        return None
    from vcoder_tpu.native import io as nio

    if not nio.is_available():
        return None
    try:
        return nio.pad_resize(
            arr, size=size, pad=True, background_color=background_color
        )
    except Exception:
        return None


def load_images_preprocessed(
    paths: Sequence[str],
    *,
    size: int = 336,
    image_aspect_ratio: str = "pad",
    dtype=jnp.float32,
    n_threads: int = 8,
) -> jnp.ndarray:
    """Decode + pad + resize + CLIP-normalize a batch of image FILES.

    The eval loaders' hot loop (reference runs a batch-1 PIL DataLoader:
    vcoder_llava/eval/model_seg_loader.py:92-96). When the native lib is
    available and aspect is 'pad', files decode+pad+resize across
    ``n_threads`` C++ workers with the GIL released, then ONE device
    call normalizes the whole batch; otherwise falls back to PIL +
    :func:`process_images`. Missing/corrupt files raise IOError in both
    paths.
    """
    import os as _os

    from vcoder_tpu.native import io as nio

    use_native = (
        image_aspect_ratio == "pad"
        and _os.environ.get("VCODER_TPU_NATIVE_IO", "1") != "0"
        and nio.is_available()
    )
    if use_native:
        pipe = nio.PrefetchPipeline(
            min(n_threads, max(1, len(paths))), size=size, pad=True
        )
        try:
            for i, p in enumerate(paths):
                pipe.submit(i, p)
            u8 = np.empty((len(paths), size, size, 3), np.uint8)
            failed = []
            for _ in paths:
                jid, px = pipe.next()
                if px is None:
                    failed.append(jid)
                else:
                    u8[jid] = px
        finally:
            pipe.close()
        # Per-file PIL fallback: a file the native decoder rejects but
        # PIL can read (exotic JPEG variants) stays readable; a truly
        # corrupt file raises from Image.open, matching the PIL path.
        if failed:
            from PIL import Image
        for jid in failed:
            img = Image.open(paths[jid]).convert("RGB")
            sq = expand2square(_to_numpy_rgb(img))
            u8[jid] = np.asarray(
                Image.fromarray(sq).resize((size, size), Image.BICUBIC)
            )
        return resize_normalize(jnp.asarray(u8), size=size, dtype=dtype)

    from PIL import Image

    return process_images(
        [Image.open(p).convert("RGB") for p in paths],
        image_aspect_ratio=image_aspect_ratio,
        size=size,
        dtype=dtype,
    )


def _to_numpy_rgb(image) -> np.ndarray:
    """Accept PIL.Image or numpy [H, W, 3]; return uint8 numpy RGB."""
    if hasattr(image, "convert"):  # PIL
        image = np.asarray(image.convert("RGB"))
    image = np.asarray(image)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    if image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    return image


def process_images(
    images: Union[Sequence, np.ndarray],
    *,
    image_aspect_ratio: str = "pad",
    size: int = 336,
    dtype=jnp.float32,
    background_color: Sequence[int] = BACKGROUND_COLOR,
) -> jnp.ndarray:
    """Batch preprocess mirroring ``mm_utils.process_images`` (reference:
    mm_utils.py:28-40): pad-to-square (when aspect_ratio == 'pad'), resize,
    normalize. Returns [B, size, size, 3] in ``dtype`` (channel-last — the
    tower's patchify consumes this layout directly).
    """
    if isinstance(images, np.ndarray) and images.ndim == 3:
        images = [images]
    arrs: List[np.ndarray] = []
    for im in images:
        arr = _to_numpy_rgb(im)
        if image_aspect_ratio == "pad":
            # Native C++ pad+resize when built (serve/eval preprocessing
            # rides this); portable host-pad + device-resize otherwise.
            narr = _native_pad_resize(arr, size, background_color)
            arr = narr if narr is not None else expand2square(
                arr, background_color
            )
        else:
            # 'square'/default CLIPImageProcessor behavior: resize shortest
            # edge then center crop; for simplicity resize directly (the
            # reference ships 'pad' in every config).
            side = min(arr.shape[:2])
            top = (arr.shape[0] - side) // 2
            left = (arr.shape[1] - side) // 2
            arr = arr[top : top + side, left : left + side]
        arrs.append(arr)

    # Bucket identical sizes into single device calls.
    out: List[Optional[jnp.ndarray]] = [None] * len(arrs)
    by_size = {}
    for i, a in enumerate(arrs):
        by_size.setdefault(a.shape[0], []).append(i)
    for s, idxs in by_size.items():
        batch = jnp.asarray(np.stack([arrs[i] for i in idxs], axis=0))
        res = resize_normalize(batch, size=size, dtype=dtype)
        for k, i in enumerate(idxs):
            out[i] = res[k]
    return jnp.stack(out, axis=0)
