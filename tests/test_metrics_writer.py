"""MetricsWriter: JSONL scalars + optional TensorBoard tee (reference logs
scalars to TB, /root/reference/scripts/train_drug3d.py:115-119)."""
import json
import os

import pytest

from moldiff_tpu.utils.misc import MetricsWriter


def test_jsonl_scalars(tmp_path):
    w = MetricsWriter(str(tmp_path), tensorboard=False)
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalar("val/loss", 2.5, 20)
    w.close()
    lines = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert lines[0] == {**lines[0], "step": 10, "tag": "train/loss", "value": 1.5}
    assert lines[1]["value"] == 2.5


@pytest.mark.slow
def test_tensorboard_tee(tmp_path):
    w = MetricsWriter(str(tmp_path), tensorboard=True)
    w.add_scalar("train/loss", 0.5, 1)
    w.close()
    # JSONL always written; TB events file written when importable
    assert (tmp_path / "metrics.jsonl").exists()
    names = os.listdir(tmp_path)
    assert any(n.startswith("events.out.tfevents") for n in names), names
