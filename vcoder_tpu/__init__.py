"""vcoder_tpu: TPU-native VCoder framework (JAX/XLA/Pallas).

Public API surface mirroring the reference package (reference:
vcoder_llava/__init__ exposure + SURVEY.md §7.4). Heavy submodules import
lazily — ``import vcoder_tpu`` stays cheap.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("VCODER_TPU_PLATFORM"):
    # Explicit platform override for CLI runs on mixed hosts (some TPU
    # images force-select the TPU platform at interpreter start, which a
    # plain JAX_PLATFORMS env var cannot undo). Set e.g.
    # VCODER_TPU_PLATFORM=cpu to run evals/tools on the host CPU.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VCODER_TPU_PLATFORM"])

_cache_dir = _os.environ.get(
    "VCODER_TPU_COMPILE_CACHE",
    _os.path.expanduser("~/.cache/vcoder_jax"),
)
if (
    _cache_dir
    and _cache_dir != "0"
    and _os.environ.get("VCODER_TPU_PLATFORM") != "cpu"
):
    # Persistent XLA compilation cache: 7B-scale serving/train graphs
    # take 20-40 s each to compile and a cold server otherwise re-pays
    # every one of them per process (measured 214 s -> 2.6 s on a cached
    # large-matmul probe). VCODER_TPU_COMPILE_CACHE=0 disables; set it
    # to a path to relocate. CPU runs skip it — XLA:CPU AOT reload
    # warns about machine-feature mismatches (SIGILL risk) and tiny CPU
    # compiles don't need caching.
    import jax as _jax

    if "cpu" not in str(_jax.config.jax_platforms or ""):
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )

from vcoder_tpu.constants import (  # noqa: F401
    DEFAULT_DEPTH_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    DEFAULT_SEG_TOKEN,
    DEPTH_TOKEN_INDEX,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    SEG_TOKEN_INDEX,
)
from vcoder_tpu.mm_tokens import (  # noqa: F401
    KeywordsStoppingCriteria,
    get_model_name_from_path,
    tokenizer_depth_seg_token,
    tokenizer_image_token,
    tokenizer_seg_token,
)


def load_pretrained_model(*args, **kwargs):
    from vcoder_tpu.builder import load_pretrained_model as _f

    return _f(*args, **kwargs)


def process_images(*args, **kwargs):
    from vcoder_tpu.preprocess import process_images as _f

    return _f(*args, **kwargs)
