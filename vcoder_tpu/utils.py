"""Logging and serving utilities.

Mirrors the reference's utils (reference: vcoder_llava/utils.py): rotating
file logger with stdout/stderr capture, the server error message constant,
and a moderation hook (no-op without an API key; the reference calls the
OpenAI moderation endpoint, utils.py:102-120).
"""

from __future__ import annotations

import logging
import logging.handlers
import os
import sys

LOGDIR = "."

server_error_msg = (
    "**NETWORK ERROR DUE TO HIGH TRAFFIC. PLEASE REGENERATE OR REFRESH THIS"
    " PAGE.**"
)
moderation_msg = (
    "YOUR INPUT VIOLATES OUR CONTENT MODERATION GUIDELINES. PLEASE TRY"
    " AGAIN."
)

handler = None


def build_logger(logger_name: str, logger_filename: str) -> logging.Logger:
    """Rotating-file logger that also captures stdout/stderr
    (reference: utils.py:17-57)."""
    global handler

    formatter = logging.Formatter(
        fmt="%(asctime)s | %(levelname)s | %(name)s | %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )

    if not logging.getLogger().handlers:
        logging.basicConfig(level=logging.INFO, encoding="utf-8")
    logging.getLogger().handlers[0].setFormatter(formatter)

    stdout_logger = logging.getLogger("stdout")
    stdout_logger.setLevel(logging.INFO)
    sys.stdout = StreamToLogger(stdout_logger, logging.INFO)

    stderr_logger = logging.getLogger("stderr")
    stderr_logger.setLevel(logging.ERROR)
    sys.stderr = StreamToLogger(stderr_logger, logging.ERROR)

    logger = logging.getLogger(logger_name)
    logger.setLevel(logging.INFO)

    if handler is None:
        os.makedirs(LOGDIR, exist_ok=True)
        filename = os.path.join(LOGDIR, logger_filename)
        handler = logging.handlers.TimedRotatingFileHandler(
            filename, when="D", utc=True, encoding="utf-8"
        )
        handler.setFormatter(formatter)
        for name, item in logging.root.manager.loggerDict.items():
            if isinstance(item, logging.Logger):
                item.addHandler(handler)

    return logger


class StreamToLogger:
    """File-like object redirecting writes to a logger
    (reference: utils.py:60-90)."""

    def __init__(self, logger, log_level=logging.INFO):
        self.terminal = sys.stdout
        self.logger = logger
        self.log_level = log_level
        self.linebuf = ""

    def __getattr__(self, attr):
        return getattr(self.terminal, attr)

    def write(self, buf):
        temp_linebuf = self.linebuf + buf
        self.linebuf = ""
        for line in temp_linebuf.splitlines(True):
            if line[-1] == "\n":
                encoded_message = line.encode("utf-8", "ignore").decode(
                    "utf-8"
                )
                self.logger.log(self.log_level, encoded_message.rstrip())
            else:
                self.linebuf += line

    def flush(self):
        if self.linebuf != "":
            encoded_message = self.linebuf.encode("utf-8", "ignore").decode(
                "utf-8"
            )
            self.logger.log(self.log_level, encoded_message.rstrip())
        self.linebuf = ""


def disable_torch_init():
    """Kept for API parity (reference: utils.py:93-99); JAX initializes
    parameters explicitly, so there is nothing to disable."""


def violates_moderation(text: str) -> bool:
    """Content moderation hook (reference: utils.py:102-120 calls the
    OpenAI endpoint). Without an OPENAI_API_KEY this is a no-op."""
    if not os.environ.get("OPENAI_API_KEY"):
        return False
    try:
        import requests

        url = "https://api.openai.com/v1/moderations"
        headers = {
            "Content-Type": "application/json",
            "Authorization": "Bearer "
            + os.environ["OPENAI_API_KEY"],
        }
        text = text.replace("\n", "")
        ret = requests.post(
            url, headers=headers, json={"input": text}, timeout=5
        )
        return ret.json()["results"][0]["flagged"]
    except Exception:
        return False


def pretty_print_semaphore(semaphore):
    if semaphore is None:
        return "None"
    return (
        f"Semaphore(value={semaphore._value},"
        f" locked={semaphore.locked()})"
    )
