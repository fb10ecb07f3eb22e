"""Timestep respacing (ops/respace.py + MolDiff.sample(num_steps=S)).

The key invariants:
  * composed betas are EXACT — the respaced Gaussian lands on the original
    alpha_bar at every kept step, and the respaced categorical's one-step /
    cumulative matrices equal brute-force products of the original ones;
  * the identity subset (S == T) reproduces the original transitions;
  * the respaced sampler produces finite, correctly-shaped, padding-clean
    outputs, chunked == single-scan, and guidance runs inside it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moldiff_tpu.ops.categorical import CategoricalTransition
from moldiff_tpu.ops.gaussian import GaussianTransition
from moldiff_tpu.ops.respace import respace_timesteps, respaced_betas
from moldiff_tpu.ops.schedules import get_beta_schedule
from tests.test_guidance import tiny_bondpred, tiny_moldiff


def _betas(T=40):
    return get_beta_schedule(
        beta_schedule="advance", num_timesteps=T,
        scale_start=0.9999, scale_end=0.0001, width=3,
    )


class TestRespaceMath:
    def test_subset_properties(self):
        sub = respace_timesteps(1000, 100)
        assert len(sub) == 100
        assert sub[0] == 0 and sub[-1] == 999
        assert (np.diff(sub) > 0).all()
        assert respace_timesteps(1000, 1).tolist() == [0]
        with pytest.raises(ValueError):
            respace_timesteps(1000, 1001)

    @pytest.mark.parametrize("gamma", [0.5, 1.0, 2.0, 3.0])
    def test_warped_subsets_valid(self, gamma):
        for T, S in ((1000, 100), (1000, 25), (200, 50), (20, 10)):
            sub = respace_timesteps(T, S, gamma)
            assert len(sub) == S
            assert sub[0] == 0 and sub[-1] == T - 1
            assert (np.diff(sub) > 0).all(), (T, S, gamma)

    def test_gamma_densifies_late_steps(self):
        uni = respace_timesteps(1000, 50, 1.0)
        late = respace_timesteps(1000, 50, 3.0)
        # more subset mass below t=200 (late denoising) with gamma=3
        assert (late < 200).sum() > (uni < 200).sum()

    def test_identity_subset_recovers_betas(self):
        betas = _betas()
        sub = respace_timesteps(len(betas), len(betas))
        np.testing.assert_allclose(
            respaced_betas(betas, sub), betas, rtol=1e-12
        )

    def test_gaussian_alpha_bar_lands_on_subset(self):
        betas = _betas()
        sub = respace_timesteps(len(betas), 7)
        orig = GaussianTransition(betas)
        resp = GaussianTransition(respaced_betas(betas, sub))
        np.testing.assert_allclose(
            np.asarray(resp.alphas_bar),
            np.asarray(orig.alphas_bar)[sub],
            rtol=1e-5,
        )

    @pytest.mark.parametrize("prior", ["absorb", "tomask", "uniform"])
    def test_categorical_matrices_are_exact_products(self, prior):
        betas = _betas()
        K = 6
        sub = respace_timesteps(len(betas), 9)
        orig = CategoricalTransition(betas, K, init_prob=prior)
        resp = CategoricalTransition(
            respaced_betas(betas, sub), K, init_prob=prior
        )
        # cumulative: q_mats'[i] == q_mats[sub[i]]
        np.testing.assert_allclose(
            np.asarray(resp.q_mats),
            np.asarray(orig.q_mats)[sub],
            atol=1e-6,
        )
        # one-step: Q'[i] == product of original Q over (sub[i-1], sub[i]]
        orig_onestep = np.transpose(
            np.asarray(orig.transpose_q_onestep_mats, dtype=np.float64),
            (0, 2, 1),
        )
        prev = -1
        for i, tau in enumerate(sub):
            prod = np.eye(K)
            for u in range(prev + 1, tau + 1):
                prod = prod @ orig_onestep[u]
            got = np.asarray(resp.transpose_q_onestep_mats[i]).T
            np.testing.assert_allclose(got, prod, atol=1e-6)
            prev = tau


class TestRespacedSampler:
    @pytest.fixture(scope="class")
    def setup(self):
        model = tiny_moldiff()  # T = 6
        params = model.init_params(jax.random.key(0))
        node_mask = np.ones((2, 6), np.float32)
        node_mask[1, 4:] = 0.0
        return model, params, jnp.asarray(node_mask)

    def test_respaced_identity_transitions(self, setup):
        model, _, _ = setup
        (pos_tr, node_tr, edge_tr), t_map = model._respaced(
            model.num_timesteps
        )
        np.testing.assert_array_equal(
            np.asarray(t_map), np.arange(model.num_timesteps)
        )
        np.testing.assert_allclose(
            np.asarray(pos_tr.coef_x0),
            np.asarray(model.pos_transition.coef_x0), rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(node_tr.q_mats),
            np.asarray(model.node_transition.q_mats), atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(edge_tr.q_mats),
            np.asarray(model.edge_transition.q_mats), atol=1e-6,
        )

    def test_sample_fewer_steps_finite_and_masked(self, setup):
        model, params, node_mask = setup
        res = model.sample(params, node_mask, jax.random.key(1), num_steps=3)
        for x in (res.pred_node, res.pred_pos, res.pred_halfedge):
            assert np.isfinite(np.asarray(x)).all()
        assert res.pred_node.shape == (2, 6, 8)
        assert res.pred_pos.shape == (2, 6, 3)

    def test_traj_length_is_respaced(self, setup):
        model, params, node_mask = setup
        res = model.sample(
            params, node_mask, jax.random.key(1), num_steps=3, save_traj=True
        )
        assert res.traj[0].shape[0] == 3 + 1  # S steps + the prior state

    @pytest.mark.slow
    def test_chunked_matches_single_scan(self, setup):
        model, params, node_mask = setup
        r1 = model.sample(params, node_mask, jax.random.key(2), num_steps=4)
        r2 = model.sample_chunked(
            params, node_mask, jax.random.key(2), chunk_size=2, num_steps=4
        )
        np.testing.assert_array_equal(
            np.asarray(r1.pred_pos), np.asarray(r2.pred_pos)
        )
        np.testing.assert_array_equal(
            np.asarray(r1.pred_halfedge), np.asarray(r2.pred_halfedge)
        )

    @pytest.mark.slow
    def test_guided_respaced_runs(self, setup):
        model, params, node_mask = setup
        bp = tiny_bondpred()
        bp_params = bp.init_params(jax.random.key(3))
        res = model.sample(
            params, node_mask, jax.random.key(4),
            guidance=("uncertainty", 1e-2), bond_predictor=(bp, bp_params),
            num_steps=3,
        )
        assert np.isfinite(np.asarray(res.pred_pos)).all()

    def test_respaced_cache_survives_retrace(self, setup):
        """The respaced transitions are cached on the model and the sampler
        is jitted by MolSampler — a SECOND trace (new bucket size) must not
        see leaked tracers from the first trace's cache fill (regression:
        UnexpectedTracerError int32[S] in the --num_steps quality soak)."""
        model, params, _ = setup

        @jax.jit
        def run(params, node_mask, key):
            return model.sample(params, node_mask, key, num_steps=4).pred_pos

        out1 = run(params, jnp.ones((2, 6), jnp.float32), jax.random.key(0))
        out2 = run(params, jnp.ones((2, 8), jnp.float32), jax.random.key(0))
        assert np.isfinite(np.asarray(out1)).all()
        assert np.isfinite(np.asarray(out2)).all()

    @pytest.mark.slow
    def test_full_steps_arg_is_noop_path(self, setup):
        """num_steps >= T falls through to the reference-exact chain."""
        model, params, node_mask = setup
        r_none = model.sample(params, node_mask, jax.random.key(5))
        r_full = model.sample(
            params, node_mask, jax.random.key(5),
            num_steps=model.num_timesteps,
        )
        np.testing.assert_array_equal(
            np.asarray(r_none.pred_pos), np.asarray(r_full.pred_pos)
        )


class TestContinuousRespace:
    def test_continuous_mode_respaced_sample(self):
        """The continuous categorical space respaces too — all three chains
        are Gaussian, so the composed-beta construction applies directly."""
        from moldiff_tpu.models.moldiff import MolDiff
        from moldiff_tpu.utils.config import Config

        cfg = Config({
            "node_dim": 16, "edge_dim": 8,
            "denoiser": {"num_blocks": 1, "cutoff": 10, "use_gate": True},
            "diff": {
                "num_timesteps": 8, "time_dim": 4,
                "categorical_space": "continuous",
                "scaling": [1.0, 4.0, 8.0],
                "diff_pos": {"beta_schedule": "advance",
                             "scale_start": 0.9999, "scale_end": 0.0001,
                             "width": 3},
                "diff_atom": {"init_prob": "tomask",
                              "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001,
                              "width": 3},
                "diff_bond": {"init_prob": "absorb",
                              "beta_schedule": "advance",
                              "scale_start": 0.9999, "scale_end": 0.0001,
                              "width": 3},
            },
        })
        model = MolDiff(cfg, 8, 6)
        params = model.init_params(jax.random.key(0))
        node_mask = jnp.ones((2, 5), jnp.float32)
        res = model.sample(params, node_mask, jax.random.key(1), num_steps=3)
        for x in (res.pred_node, res.pred_pos, res.pred_halfedge):
            assert np.isfinite(np.asarray(x)).all()
        # respaced transitions carry the continuous-mode scaling
        (_, node_tr, edge_tr), t_map = model._respaced(3)
        assert node_tr.num_classes == 8 and node_tr.scaling == 4.0
        assert edge_tr.num_classes == 6 and edge_tr.scaling == 8.0
        assert t_map.shape == (3,)


class TestSamplerPipeline:
    def test_molsampler_num_steps(self):
        from moldiff_tpu.data.featurize import MolFeaturizer
        from moldiff_tpu.sample.pipeline import MolSampler

        model = tiny_moldiff()
        params = model.init_params(jax.random.key(0))
        featurizer = MolFeaturizer(
            atomic_numbers=(6, 7, 8, 9, 15, 16, 17),
            mol_bond_types=(1, 2, 3, 4),
            use_mask_node=True, use_mask_edge=True,
        )
        sampler = MolSampler(
            model, featurizer, buckets=(8,), batch_size=4, num_steps=3
        )
        decoded = sampler.sample_sizes(
            params, np.array([5, 6, 4, 6]), jax.random.key(1)
        )
        assert len(decoded) == 4
        for d in decoded:
            assert np.isfinite(d["atom_pos"]).all()


def test_respaced_alphas_bar_matches_strided_original():
    """The commit gate (models/moldiff.py) reads transition.alphas_bar; on a
    respaced chain the composed-beta cumprod must equal the ORIGINAL chain's
    alpha_bar at the kept timesteps (the semigroup property in the identity
    coefficient)."""
    import numpy as np

    from moldiff_tpu.ops.categorical import CategoricalTransition
    from moldiff_tpu.ops.respace import respace_timesteps, respaced_betas
    from moldiff_tpu.ops.schedules import get_beta_schedule

    betas = get_beta_schedule(
        "advance", 1000, scale_start=0.9999, scale_end=0.0001, width=3)
    full = CategoricalTransition(np.asarray(betas), 8, init_prob="tomask")
    subset = respace_timesteps(1000, 100, 1.0)
    sub = CategoricalTransition(
        np.asarray(respaced_betas(np.asarray(betas), subset)), 8,
        init_prob="tomask")
    np.testing.assert_allclose(
        np.asarray(sub.alphas_bar),
        np.asarray(full.alphas_bar)[np.asarray(subset)],
        rtol=1e-5,
    )
