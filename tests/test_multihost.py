"""Multi-host sampling orchestration (parallel/multihost.py).

Unit tests for pool sharding/merging plus a REAL 2-process jax.distributed
run on CPU: each process joins the cluster, samples its disjoint pool shard
with a tiny model, all-gathers pool counts over the collective backend, and
writes shard_<pid>; the parent merges shards into the single-host layout.
(The reference has no distributed path at all — SURVEY.md section 2.3.)
"""
import os
import pickle
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from moldiff_tpu.parallel import multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_shard_range_partitions_pool():
    for num_mols in (1, 7, 16, 100):
        for nproc in (1, 2, 3, 5):
            spans = [multihost.shard_range(num_mols, p, nproc) for p in range(nproc)]
            # disjoint, ordered, covering
            assert spans[0][0] == 0
            assert spans[-1][1] == num_mols
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 == b0
            sizes = [b - a for a, b in spans]
            assert max(sizes) - min(sizes) <= 1


def test_shard_key_streams_differ():
    key = jax.random.key(0)
    draws = [
        np.asarray(jax.random.normal(multihost.shard_key(key, p), (4,)))
        for p in range(3)
    ]
    assert not np.allclose(draws[0], draws[1])
    assert not np.allclose(draws[1], draws[2])
    # deterministic
    again = np.asarray(jax.random.normal(multihost.shard_key(key, 1), (4,)))
    np.testing.assert_array_equal(draws[1], again)


def test_merge_shards(tmp_path):
    # fabricate two shard dirs in the sample-CLI layout
    for pid, smiles in ((0, ["CCO", "CCC"]), (1, ["CNC"])):
        sdir = tmp_path / f"shard_{pid}"
        (sdir / "SDF").mkdir(parents=True)
        (sdir / "SMILES.txt").write_text("\n".join(smiles) + "\n")
        for k in range(len(smiles)):
            (sdir / "SDF" / f"{k}.sdf").write_text(f"fake sdf {pid}/{k}\n")
        with open(sdir / "samples_all.pkl", "wb") as f:
            pickle.dump(
                {"finished": [{"smiles": s} for s in smiles],
                 "failed": [{"reason": "recon_error"}] * pid},
                f,
            )
    merged = multihost.merge_shards(str(tmp_path))
    assert [e["smiles"] for e in merged["finished"]] == ["CCO", "CCC", "CNC"]
    assert len(merged["failed"]) == 1
    assert (tmp_path / "SMILES.txt").read_text().splitlines() == [
        "CCO", "CCC", "CNC"
    ]
    # merged SDFs go to uppercase 'SDF/' — the layout evaluate_all.py globs
    sdfs = sorted(os.listdir(tmp_path / "SDF"))
    assert sdfs == ["0.sdf", "1.sdf", "2.sdf"]
    assert (tmp_path / "meta.json").exists()


def test_merge_shards_numeric_order(tmp_path):
    """>=10 sdf files per shard and >=10 shards: merge must order shard dirs
    and sdf files numerically so SDF/<idx>.sdf lines up with SMILES.txt."""
    nproc, per = 11, 12
    expect = []
    for pid in range(nproc):
        sdir = tmp_path / f"shard_{pid}"
        (sdir / "SDF").mkdir(parents=True)
        smiles = [f"SMI_{pid}_{k}" for k in range(per)]
        expect.extend(smiles)
        (sdir / "SMILES.txt").write_text("\n".join(smiles) + "\n")
        for k in range(per):
            (sdir / "SDF" / f"{k}.sdf").write_text(f"mol {pid}/{k}\n")
        with open(sdir / "samples_all.pkl", "wb") as f:
            pickle.dump({"finished": [{"smiles": s} for s in smiles],
                         "failed": []}, f)
    multihost.merge_shards(str(tmp_path))
    got_smiles = (tmp_path / "SMILES.txt").read_text().splitlines()
    assert got_smiles == expect
    for idx, smi in enumerate(expect):
        pid, k = smi.split("_")[1:]
        content = (tmp_path / "SDF" / f"{idx}.sdf").read_text()
        assert content == f"mol {pid}/{k}\n", (idx, smi, content)


_WORKER = r"""
import os, pickle, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
coord = sys.argv[3]; outdir = sys.argv[4]
jax.distributed.initialize(coordinator_address=coord,
                           num_processes=nproc, process_id=pid)
assert jax.process_index() == pid

from moldiff_tpu.data.featurize import MolFeaturizer
from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.parallel import multihost
from moldiff_tpu.sample.pipeline import MolSampler

feat = MolFeaturizer()
cfg = {
    "node_dim": 16, "edge_dim": 8,
    "denoiser": {"num_blocks": 1, "cutoff": 15, "use_gate": True,
                 "remat": False},
    "diff": {
        "num_timesteps": 6, "time_dim": 4, "categorical_space": "discrete",
        "diff_pos": {"beta_schedule": "sigmoid", "beta_start": 1e-7,
                     "beta_end": 2e-3},
        "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                      "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
        "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                      "scale_start": 0.9999, "scale_end": 0.0001, "width": 3},
    },
}
model = MolDiff(cfg, feat.num_node_types, feat.num_edge_types)
params = model.init_params(jax.random.key(0))

total = 6
start, stop = multihost.shard_range(total, pid, nproc)
key = multihost.shard_key(jax.random.key(7), pid)
import numpy as np
rng = np.random.default_rng((7, pid))
sampler = MolSampler(model, feat, batch_size=4, buckets=(8,),
                     size_mean=5, size_std=1)
# untrained params rarely produce valid molecules; just classify one batch
sizes = sampler.draw_sizes(stop - start, rng)
decoded = sampler.sample_sizes(params, sizes, key)
from moldiff_tpu.sample.pipeline import classify_decoded
pool = {"finished": [], "failed": []}
for d in decoded:
    e = classify_decoded(d)
    pool[e["pool"]].append(e)

counts = multihost.allgather_counts(len(pool["finished"]), len(pool["failed"]))
assert counts.shape == (nproc, 2), counts.shape
assert counts[pid].sum() == stop - start

sdir = multihost.shard_dir(outdir, pid)
os.makedirs(os.path.join(sdir, "SDF"), exist_ok=True)
with open(os.path.join(sdir, "SMILES.txt"), "w") as f:
    for e in pool["finished"]:
        f.write(e["smiles"] + "\n")
with open(os.path.join(sdir, "samples_all.pkl"), "wb") as f:
    pickle.dump({"finished": [{"smiles": e["smiles"]} for e in pool["finished"]],
                 "failed": [{"reason": e["reason"]} for e in pool["failed"]]}, f)
print("WORKER_OK", pid, counts.tolist())
"""


@pytest.mark.slow
def test_two_process_distributed_sampling(tmp_path):
    """Real 2-process jax.distributed run on CPU localhost."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(p), "2", coord, str(tmp_path)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "WORKER_OK" in out, out[-3000:]

    merged = multihost.merge_shards(str(tmp_path))
    total = len(merged["finished"]) + len(merged["failed"])
    assert total == 6
    assert os.path.exists(tmp_path / "samples_all.pkl")
