"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests exercise `jax.sharding.Mesh` layouts without TPU
hardware (SURVEY.md §4 implication; the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU platform and
# force-updates jax_platforms, overriding the env var — undo that so tests
# run on the virtual 8-device CPU mesh with exact f32 matmuls.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


class FakeTokenizer:
    """Minimal HF-protocol tokenizer for unit tests.

    Word-level vocab built on the fly; prepends BOS like Llama's
    sentencepiece tokenizer does on every encode call.
    """

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def __init__(self, add_bos: bool = True):
        self.add_bos = add_bos
        self.vocab = {"<pad>": 0, "<s>": 1, "</s>": 2}
        self.inv = {0: "<pad>", 1: "<s>", 2: "</s>"}

    def _id(self, word: str) -> int:
        if word not in self.vocab:
            idx = len(self.vocab)
            self.vocab[word] = idx
            self.inv[idx] = word
        return self.vocab[word]

    def __call__(self, text: str):
        # "</s>" tokenizes to the single EOS id, like Llama sentencepiece —
        # the preprocess masking arithmetic depends on this.
        words = text.replace("</s>", " </s> ").split()
        ids = [self._id(w) for w in words]
        if self.add_bos:
            ids = [self.bos_token_id] + ids

        class _Out:
            pass

        out = _Out()
        out.input_ids = ids
        return out

    def decode(self, ids, skip_special_tokens=True):
        words = []
        for i in ids:
            w = self.inv.get(int(i), f"<unk{int(i)}>")
            if skip_special_tokens and w in ("<s>", "</s>", "<pad>"):
                continue
            words.append(w)
        return " ".join(words)


@pytest.fixture
def fake_tokenizer():
    return FakeTokenizer()


# ---- smoke tier -----------------------------------------------------------
# `-m smoke` = units + interpret-mode kernels + splice/tokenizer/scorer
# goldens: the <3-minute pre-commit loop (the full quick tier is ~15-20 min
# and was getting run less and less mid-round — round-3 VERDICT #6). Heavy
# parity matrices (engines, generation, training, beam goldens) stay in the
# quick tier; `slow` marks the end-to-end driver runs.
SMOKE_MODULES = {
    "test_mm_tokens",
    "test_splice",
    "test_preprocess",
    "test_conversation",
    "test_eval_scorers",
    "test_data_gen",
    "test_utils",
    "test_native_io",
    "test_it_mode",
    "test_gradio_app",
    "test_flash_attention",
    "test_vit_attention",
    "test_clip_parity",
    "test_llama_parity",
}


def pytest_collection_modifyitems(config, items):
    run_weekly = os.environ.get("VCODER_TEST_WEEKLY", "") not in ("", "0")
    skip_weekly = pytest.mark.skip(
        reason="weekly-tier redundancy (set VCODER_TEST_WEEKLY=1 to run)"
    )
    for item in items:
        if (
            item.module.__name__.rsplit(".", 1)[-1] in SMOKE_MODULES
            and item.get_closest_marker("slow") is None
        ):
            item.add_marker(pytest.mark.smoke)
        # `weekly`: end-to-end permutations whose coverage duplicates a
        # cheaper in-suite test plus a driver-run artifact (the full-tier
        # wall-time budget is ~25 min — VERDICT r4 #8). Skipped unless
        # VCODER_TEST_WEEKLY=1 or an explicit `-m weekly` selection.
        if (
            not run_weekly
            and item.get_closest_marker("weekly") is not None
            and "weekly" not in config.getoption("-m", "")
        ):
            item.add_marker(skip_weekly)


_module_times: dict = {}


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    """Record cumulative wall time per test module so full-tier creep is
    visible in every run's tail (-q included), not just with --durations."""
    import time as _time

    t0 = _time.perf_counter()
    yield
    mod = item.module.__name__.rsplit(".", 1)[-1]
    _module_times[mod] = _module_times.get(mod, 0.0) + (
        _time.perf_counter() - t0
    )


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    if not _module_times:
        return
    top = sorted(_module_times.items(), key=lambda kv: -kv[1])[:12]
    total = sum(_module_times.values())
    terminalreporter.write_line(
        f"module wall times (total {total/60:.1f} min): "
        + "  ".join(f"{m}={s:.0f}s" for m, s in top)
    )
