"""Behavior tests for vcoder_tpu.utils (logger + stream capture).

Locks the observable contract the serve stack relies on (reference:
vcoder_llava/utils.py): build_logger returns a usable named logger whose
records reach a rotating file, stdout/stderr are captured line-wise, and
the moderation hook is a no-op without an API key.
"""

import logging

from vcoder_tpu import utils


class _ListLogger:
    def __init__(self):
        self.records = []

    def log(self, level, msg):
        self.records.append((level, msg))


def test_stream_to_logger_buffers_partial_lines():
    lg = _ListLogger()
    s = utils.StreamToLogger(lg, logging.INFO)
    s.write("hello ")
    assert lg.records == []  # no newline yet
    s.write("world\npart")
    assert lg.records == [(logging.INFO, "hello world")]
    s.flush()
    assert lg.records[-1] == (logging.INFO, "part")
    s.flush()  # idempotent
    assert len(lg.records) == 2


def test_stream_to_logger_multi_line_write():
    lg = _ListLogger()
    s = utils.StreamToLogger(lg, logging.ERROR)
    s.write("a\nb\nc\n")
    assert [m for _, m in lg.records] == ["a", "b", "c"]


def test_stream_to_logger_falls_through_to_terminal():
    lg = _ListLogger()
    s = utils.StreamToLogger(lg)
    # attribute lookup proxies to the real stream
    assert hasattr(s, "writable")


def test_build_logger_writes_file(tmp_path, monkeypatch):
    import sys

    monkeypatch.setattr(utils, "LOGDIR", str(tmp_path))
    monkeypatch.setattr(utils, "_file_handler", None)
    # Don't let the test permanently hijack the real stdout/stderr.
    old_out, old_err = sys.stdout, sys.stderr
    try:
        logger = utils.build_logger("test_logger", "test.log")
        logger.info("hello from test")
        utils._file_handler.flush()
        assert "hello from test" in (tmp_path / "test.log").read_text()
        assert isinstance(sys.stdout, utils.StreamToLogger)
    finally:
        logging.getLogger().removeHandler(utils._file_handler)
        utils._file_handler = None
        sys.stdout, sys.stderr = old_out, old_err


def test_violates_moderation_no_key(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    assert utils.violates_moderation("anything") is False


def test_pretty_print_semaphore():
    import asyncio

    assert utils.pretty_print_semaphore(None) == "None"
    out = utils.pretty_print_semaphore(asyncio.Semaphore(2))
    assert "value=2" in out and "locked=False" in out
