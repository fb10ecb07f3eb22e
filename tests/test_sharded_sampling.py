"""Data-parallel sampling: mesh-sharded sampler must produce the same
results as single-device for the same key (partitionable threefry)."""
import jax
import numpy as np
import pytest

from moldiff_tpu.data.featurize import MolFeaturizer
from moldiff_tpu.eval.rmsd import kabsch_rmsd
from moldiff_tpu.parallel.mesh import make_mesh
from moldiff_tpu.sample.pipeline import MolSampler
from tests.test_pipeline import tiny_model


class TestShardedSampling:
    @pytest.mark.slow
    def test_sharded_matches_single(self):
        model = tiny_model()
        params = model.init_params(jax.random.key(0))
        feat = MolFeaturizer()
        n_dev = len(jax.devices())
        sizes = np.array([5, 6, 7, 8] * 4, dtype=np.int64)  # 16 mols

        s1 = MolSampler(model, feat, buckets=(8,), batch_size=16)
        s8 = MolSampler(model, feat, buckets=(8,), batch_size=16,
                        mesh=make_mesh(n_dev))
        d1 = s1.sample_sizes(params, sizes, jax.random.key(1))
        d8 = s8.sample_sizes(params, sizes, jax.random.key(1))
        for a, b in zip(d1, d8):
            np.testing.assert_allclose(a["atom_pos"], b["atom_pos"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(a["element"], b["element"])

    @pytest.mark.slow
    def test_sharded_chunked_matches_single(self):
        """The host-chunked chain (guided-sampling path) must also shard
        over the mesh and reproduce the unsharded chunked results."""
        model = tiny_model()
        params = model.init_params(jax.random.key(0))
        feat = MolFeaturizer()
        sizes = np.array([5, 6, 7, 8] * 4, dtype=np.int64)

        T = model.num_timesteps
        chunk = next(c for c in (4, 2, 1) if T % c == 0)
        s1 = MolSampler(model, feat, buckets=(8,), batch_size=16,
                        chunk_steps=chunk)
        s8 = MolSampler(model, feat, buckets=(8,), batch_size=16,
                        chunk_steps=chunk, mesh=make_mesh(len(jax.devices())))
        d1 = s1.sample_sizes(params, sizes, jax.random.key(3))
        d8 = s8.sample_sizes(params, sizes, jax.random.key(3))
        for a, b in zip(d1, d8):
            np.testing.assert_allclose(a["atom_pos"], b["atom_pos"],
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_array_equal(a["element"], b["element"])

    def test_batch_size_must_divide(self):
        model = tiny_model()
        with pytest.raises(ValueError):
            MolSampler(model, MolFeaturizer(), batch_size=10,
                       mesh=make_mesh(len(jax.devices())))


class TestKabsch:
    def test_identical_zero(self, rng):
        p = rng.normal(size=(10, 3))
        assert kabsch_rmsd(p, p) == pytest.approx(0.0, abs=1e-10)

    def test_rotation_invariant(self, rng):
        p = rng.normal(size=(12, 3))
        theta = 0.7
        r = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ])
        q = p @ r.T + np.array([1.0, -2.0, 3.0])
        assert kabsch_rmsd(p, q) == pytest.approx(0.0, abs=1e-9)

    def test_nonzero_for_different(self, rng):
        p = rng.normal(size=(12, 3))
        q = rng.normal(size=(12, 3))
        assert kabsch_rmsd(p, q) > 0.1
