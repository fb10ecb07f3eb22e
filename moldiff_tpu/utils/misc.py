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
    """Append-only JSONL scalar writer (TensorBoard replacement).

    One line per step: {"step": int, "tag": str, "value": float, "ts": float}.
    """

    def __init__(self, log_dir: str, filename: str = "metrics.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, filename), "a", buffering=1)

    def add_scalar(self, tag: str, value, step: int) -> None:
        self._f.write(
            json.dumps(
                {"step": int(step), "tag": tag, "value": float(value), "ts": time.time()}
            )
            + "\n"
        )

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()
