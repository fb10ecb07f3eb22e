"""quality_soak helpers: checkpoint discovery + on-the-fly sample configs."""
import os
import time

import pytest

from scripts.quality_soak import newest_ckpt, write_sample_config
from moldiff_tpu.utils.config import load_config


def test_newest_ckpt_picks_latest(tmp_path):
    for run, steps in (("full_a", (1000, 2000)), ("full_b", (500,))):
        d = tmp_path / run / "checkpoints"
        d.mkdir(parents=True)
        for s in steps:
            (d / f"{s}.ckpt").write_bytes(b"x")
            time.sleep(0.01)
    got = newest_ckpt(str(tmp_path), "full_")
    assert got.endswith(os.path.join("full_b", "checkpoints", "500.ckpt"))
    with pytest.raises(FileNotFoundError):
        newest_ckpt(str(tmp_path), "nope_")


def test_write_sample_config_roundtrip(tmp_path):
    p = write_sample_config(
        str(tmp_path / "s.yml"), "/ck/d.ckpt", bp_ckpt="/ck/bp.ckpt",
        guidance=("uncertainty", 1e-4), num_mols=10, batch_size=4,
    )
    cfg = load_config(p)
    assert cfg.model.checkpoint == "/ck/d.ckpt"
    assert cfg.bond_predictor == "/ck/bp.ckpt"
    assert cfg.sample.guidance[0] == "uncertainty"
    assert cfg.sample.num_mols == 10

    p2 = write_sample_config(str(tmp_path / "u.yml"), "/ck/d.ckpt")
    cfg2 = load_config(p2)
    assert cfg2.get("bond_predictor") is None
    assert cfg2.sample.get("guidance") is None
