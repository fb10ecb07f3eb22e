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


def test_tensorboard_tee(tmp_path):
    w = MetricsWriter(str(tmp_path), tensorboard=True)
    w.add_scalar("train/loss", 0.5, 1)
    w.close()
    assert (tmp_path / "metrics.jsonl").exists()
    names = os.listdir(tmp_path)
    tb = [n for n in names if n.startswith("events.out.tfevents")]
    assert tb, names
    # the first-party writer's own reader verifies CRCs and decodes values
    from moldiff_tpu.utils.tb_writer import read_events

    events = read_events(str(tmp_path / tb[0]))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["tag"] == "train/loss"
    assert events[1]["value"] == pytest.approx(0.5)
    assert events[1]["step"] == 1


class TestTBWriter:
    def test_crc32c_known_vectors(self):
        from moldiff_tpu.utils.tb_writer import crc32c

        # RFC 3720 / kernel test vectors
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"") == 0
        assert crc32c(b"\x00" * 32) == 0x8A9136AA

    def test_roundtrip_many_scalars(self, tmp_path):
        from moldiff_tpu.utils.tb_writer import TBEventWriter, read_events

        w = TBEventWriter(str(tmp_path))
        for i in range(50):
            w.add_scalar("a/b", i * 0.25, i)
        w.close()
        ev = read_events(w.path)
        assert len(ev) == 51
        for i, e in enumerate(ev[1:]):
            assert e["step"] == i and e["value"] == pytest.approx(i * 0.25)
