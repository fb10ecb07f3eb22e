"""Config system + record store tests."""
import os
import pickle

import numpy as np
import pytest

from moldiff_tpu.data.record_store import RecordReader, RecordWriter, using_native
from moldiff_tpu.utils.config import Config, load_config, loads_config, save_config


class TestConfig:
    def test_attr_access(self):
        c = loads_config("a:\n  b:\n    c: 3\nlst:\n  - x: 1\n")
        assert c.a.b.c == 3
        assert c.lst[0].x == 1

    def test_yaml_roundtrip(self, tmp_path):
        c = Config({"model": {"dim": 256, "flag": True}, "lr": 1e-4})
        p = str(tmp_path / "c.yml")
        save_config(c, p)
        c2 = load_config(p)
        assert c2.model.dim == 256 and c2.lr == pytest.approx(1e-4)

    def test_merged_deep(self):
        base = Config({"a": {"x": 1, "y": 2}, "b": 3})
        out = base.merged({"a": {"y": 20}, "c": 4})
        assert out.a.x == 1 and out.a.y == 20 and out.b == 3 and out.c == 4
        assert base.a.y == 2  # original untouched

    def test_to_dict_plain(self):
        c = Config({"a": {"b": 1}})
        d = c.to_dict()
        assert type(d) is dict and type(d["a"]) is dict

    def test_setattr(self):
        c = Config()
        c.model = {"dim": 8}
        assert isinstance(c.model, Config)
        assert c["model"]["dim"] == 8


class TestRecordStore:
    def test_native_available(self):
        assert using_native(), "C++ record store failed to build"

    def test_empty_records(self, tmp_path):
        p = str(tmp_path / "s")
        with RecordWriter(p) as w:
            w.append_bytes(b"")
            w.append_bytes(b"x")
        with RecordReader(p) as r:
            assert len(r) == 2
            assert r.get_bytes(0) == b""
            assert r.get_bytes(1) == b"x"

    def test_large_record(self, tmp_path):
        p = str(tmp_path / "s")
        big = os.urandom(5 * 1024 * 1024)
        with RecordWriter(p) as w:
            w.append_bytes(big)
        with RecordReader(p) as r:
            assert r.get_bytes(0) == big

    def test_reopen_and_index_bounds(self, tmp_path):
        p = str(tmp_path / "s")
        with RecordWriter(p) as w:
            for i in range(10):
                w.append({"i": i})
        r1 = RecordReader(p)
        r2 = RecordReader(p)  # concurrent readers
        assert r1[3]["i"] == 3 and r2[7]["i"] == 7
        with pytest.raises(IndexError):
            r1.get_bytes(10)
        with pytest.raises(IndexError):
            r1.get_bytes(-1)
        r1.close()
        r2.close()

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            RecordReader(str(tmp_path / "nope"))
