"""Logging, run directories, seeding.

First-party analogue of `/root/reference/utils/misc.py` minus torch: loggers
with stream+file handlers, timestamped log dirs with config snapshots, and a
JSONL metrics writer replacing TensorBoard (SURVEY.md section 2.2: lightweight
first-party metrics writer).
"""
from __future__ import annotations

import json
import logging
import os
import random
import time
from typing import Optional

import numpy as np


class BlackHole:
    """Absorbs any call/attribute access (reference utils/misc.py:13)."""

    def __setattr__(self, name, value):
        pass

    def __call__(self, *args, **kwargs):
        return self

    def __getattr__(self, name):
        return self


def force_platform_from_env() -> None:
    """Make ``JAX_PLATFORMS`` from the environment actually stick.

    The container's sitecustomize registers the axon TPU backend in every
    python process and the env var alone is ignored (see tests/conftest.py),
    so a CLI subprocess launched with JAX_PLATFORMS=cpu would still try to
    grab the TPU — and block if another process holds it. Every CLI calls
    this before touching jax."""
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)


def get_logger(name: str, log_dir: Optional[str] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    if logger.handlers:
        return logger
    formatter = logging.Formatter(
        "[%(asctime)s::%(name)s::%(levelname)s] %(message)s"
    )
    sh = logging.StreamHandler()
    sh.setLevel(logging.DEBUG)
    sh.setFormatter(formatter)
    logger.addHandler(sh)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def get_new_log_dir(root: str = "./logs", prefix: str = "", tag: str = "") -> str:
    fn = time.strftime("%Y_%m_%d__%H_%M_%S", time.localtime())
    if prefix:
        fn = prefix + "_" + fn
    if tag:
        fn = fn + "_" + tag
    log_dir = os.path.join(root, fn)
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def seed_all(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


class MetricsWriter:
    """Append-only JSONL scalar writer, with optional TensorBoard tee.

    One line per step: {"step": int, "tag": str, "value": float, "ts": float}.
    JSONL is the primary store (cheap, grep/pandas-able); scalars are also
    teed to a TensorBoard event file like the reference train scripts
    (`/root/reference/scripts/train_drug3d.py:115-119`) via the first-party
    zero-dependency writer (utils/tb_writer.py — no torch.utils.tensorboard
    import, which costs ~1.5 min in this image). Disable with
    ``tensorboard=False`` or env ``MOLDIFF_TB=0``.
    """

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl",
                 tensorboard: "bool | None" = None):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, filename), "a", buffering=1)
        if tensorboard is None:
            tensorboard = os.environ.get("MOLDIFF_TB", "1") != "0"
        self._tb = None
        if tensorboard:
            from .tb_writer import TBEventWriter

            self._tb = TBEventWriter(log_dir)

    def add_scalar(self, tag: str, value, step: int) -> None:
        self._f.write(
            json.dumps(
                {"step": int(step), "tag": tag, "value": float(value), "ts": time.time()}
            )
            + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self) -> None:
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
