"""GPT-4 data-generation driver over the carried-over prompt seeds
(reference: playground/data/prompts/*, upstream LLaVA's few-shot seeds —
prompt data; the driver is additive since the reference ships no
consumer)."""

import json
import os

from vcoder_tpu.data_gen import build_messages, load_seeds

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEEDS = os.path.join(REPO, "playground", "data", "prompts")


def test_seed_data_complete():
    for task, n_shots in (
        ("conversation", 2),
        ("detail_description", 3),
        ("complex_reasoning", 3),
    ):
        system_message, shots = load_seeds(SEEDS, task)
        assert len(system_message) > 100
        assert len(shots) == n_shots
        for caps, conv in shots:
            assert caps.strip() and conv.strip()


def test_build_messages_shape():
    system_message, shots = load_seeds(SEEDS, "conversation")
    msgs = build_messages(system_message, shots, "A cat.\nOn a mat.")
    assert msgs[0] == {"role": "system", "content": system_message}
    assert [m["role"] for m in msgs[1:]] == (
        ["user", "assistant"] * len(shots) + ["user"]
    )
    assert msgs[-1]["content"] == "A cat.\nOn a mat."


def test_cli_payload_mode(tmp_path):
    import subprocess
    import sys

    caps = tmp_path / "caps.jsonl"
    caps.write_text(json.dumps({"id": "a", "caps": "A dog."}) + "\n")
    out = tmp_path / "req.jsonl"
    r = subprocess.run(
        [
            sys.executable, "-m", "vcoder_tpu.data_gen",
            "--type", "detail_description",
            "--caps-file", str(caps), "--out", str(out),
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    rec = json.loads(out.read_text())
    assert rec["payload"]["model"] == "gpt-4"
    assert rec["payload"]["messages"][-1]["content"] == "A dog."
