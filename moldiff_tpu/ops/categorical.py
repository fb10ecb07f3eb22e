"""Categorical (D3PM-style) diffusion transition with arbitrary prior.

Pure-functional analogue of the reference ``GeneralCategoricalTransition``
(`/root/reference/models/transition.py:178-339`) on padded dense batches.

State layout: per-element log-probabilities / one-hots are ``[B, M, K]``
(M = padded atoms or half-edges per graph, K = num classes) with per-graph
timesteps ``t [B]``. The reference's per-element ``extract(coef, t, batch)``
gathers become a single ``coef[t]`` + broadcast.

The transition matrices are built on host in float64 (matching the
reference's numpy precompute) and stored as float32 constants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-30
LOG_MIN = -32.0


# ---------------------------------------------------------------------------
# log-probability helpers (reference models/diffusion.py:53-92)
# ---------------------------------------------------------------------------

def index_to_log_onehot(x: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """int [..] -> log one-hot [.., K] with log(0) clamped to log(1e-30)."""
    onehot = jax.nn.one_hot(x, num_classes, dtype=jnp.float32)
    return jnp.log(jnp.clip(onehot, EPS, None))


def log_sample_categorical(logits: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Gumbel-max sample of class indices from (possibly unnormalized)
    log-probs along the last axis (reference models/diffusion.py:79-85)."""
    uniform = jax.random.uniform(key, logits.shape, dtype=logits.dtype)
    gumbel = -jnp.log(-jnp.log(uniform + EPS) + EPS)
    return jnp.argmax(gumbel + logits, axis=-1)


def categorical_kl(log_prob1: jnp.ndarray, log_prob2: jnp.ndarray) -> jnp.ndarray:
    """KL(p1 || p2) with both args in log space; reduces the last axis."""
    return jnp.sum(jnp.exp(log_prob1) * (log_prob1 - log_prob2), axis=-1)


def log_categorical(log_x_start: jnp.ndarray, log_prob: jnp.ndarray) -> jnp.ndarray:
    """E_{x~x_start}[log_prob(x)]; reduces the last axis."""
    return jnp.sum(jnp.exp(log_x_start) * log_prob, axis=-1)


def _clamped_log(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.log(x + EPS), LOG_MIN, None)


# ---------------------------------------------------------------------------
# transition
# ---------------------------------------------------------------------------

class CategoricalTransition:
    """q(v_t | v_{t-1}) = Cat(v_t ; beta_t * prior + (1 - beta_t) * onehot(v_{t-1})).

    ``init_prob`` semantics match the reference exactly
    (models/transition.py:183-196):
      - 'absorb':  prior concentrated on class 0 (used for bonds: "no bond"),
      - 'tomask':  prior concentrated on the last class (atom mask type),
      - 'uniform' / None: uniform prior,
      - array: custom prior (normalized).
    """

    def __init__(self, betas: np.ndarray, num_classes: int, init_prob=None):
        betas = np.asarray(betas, dtype=np.float64)
        self.num_classes = num_classes
        self.num_timesteps = len(betas)

        if init_prob is None or (isinstance(init_prob, str) and init_prob == "uniform"):
            prior = np.ones(num_classes) / num_classes
        elif isinstance(init_prob, str) and init_prob == "absorb":
            prior = 0.01 * np.ones(num_classes)
            prior[0] = 1.0
            prior = prior / prior.sum()
        elif isinstance(init_prob, str) and init_prob == "tomask":
            prior = 0.001 * np.ones(num_classes)
            prior[-1] = 1.0
            prior = prior / prior.sum()
        elif isinstance(init_prob, str):
            raise ValueError(f"unknown init_prob: {init_prob}")
        else:
            prior = np.asarray(init_prob, dtype=np.float64)
            prior = prior / prior.sum()
        self.init_prob = prior

        # Q_t = beta_t * 1 prior^T + (1 - beta_t) I   (reference :218-243)
        eye = np.eye(num_classes)
        ones_prior = np.repeat(prior[None, :], num_classes, axis=0)
        q_one_step = (
            betas[:, None, None] * ones_prior[None] + (1.0 - betas)[:, None, None] * eye[None]
        )  # [T, K, K]

        # cumulative products: q_mats[t] = Q_1 @ ... @ Q_{t+1}  (reference :204-210)
        q_mats = np.empty_like(q_one_step)
        acc = q_one_step[0]
        q_mats[0] = acc
        for t in range(1, self.num_timesteps):
            acc = acc @ q_one_step[t]
            q_mats[t] = acc

        self.betas = jnp.asarray(betas, dtype=jnp.float32)
        # identity-coefficient of q_mats[t] (the family beta*1 prior^T +
        # (1-beta) I is closed under products with alpha_bar = prod(1-beta)):
        # the fraction of q(v_t|v_0) mass still carrying v_0's identity.
        # Used by the sampler's commit gate (models/moldiff.py).
        self.alphas_bar = jnp.asarray(
            np.cumprod(1.0 - betas), dtype=jnp.float32
        )
        self.q_mats = jnp.asarray(q_mats, dtype=jnp.float32)  # [T, K, K]
        self.transpose_q_onestep_mats = jnp.asarray(
            np.transpose(q_one_step, (0, 2, 1)), dtype=jnp.float32
        )

    # -- forward process ----------------------------------------------------

    def q_vt_pred(self, log_v0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """log q(v_t | v_0). log_v0: [B, M, K], t: [B] -> [B, M, K].

        Reference models/transition.py:265-271."""
        qt = self.q_mats[t]  # [B, K, K]
        # HIGHEST precision: these are tiny K x K contractions in log-space
        # probability math — default (bf16-accumulated) matmul precision
        # visibly corrupts log-probs of rare classes.
        q_vt = jnp.einsum(
            "bmk,bkj->bmj", jnp.exp(log_v0), qt, precision=jax.lax.Precision.HIGHEST
        )
        return _clamped_log(q_vt)

    def q_vt_sample(self, log_v0: jnp.ndarray, t: jnp.ndarray, key: jax.Array):
        """Sample v_t ~ q(v_t | v_0) -> (class indices [B,M], log one-hot)."""
        log_q_vt_v0 = self.q_vt_pred(log_v0, t)
        sample = log_sample_categorical(log_q_vt_v0, key)
        return sample, index_to_log_onehot(sample, self.num_classes)

    def add_noise(self, v: jnp.ndarray, t: jnp.ndarray, key: jax.Array):
        """Perturb clean classes v [B, M] int -> (one-hot v_t [B,M,K],
        log one-hot v_t, log one-hot v_0). Reference models/transition.py:245."""
        log_v0 = index_to_log_onehot(v, self.num_classes)
        v_t, log_vt = self.q_vt_sample(log_v0, t, key)
        v_t_onehot = jax.nn.one_hot(v_t, self.num_classes, dtype=jnp.float32)
        return v_t_onehot, log_vt, log_v0

    def onehot_encode(self, v: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.one_hot(v, self.num_classes, dtype=jnp.float32)

    # -- reverse process ----------------------------------------------------

    def q_v_posterior(
        self,
        log_v0: jnp.ndarray,
        log_vt: jnp.ndarray,
        t: jnp.ndarray,
        v0_prob: bool = True,
    ) -> jnp.ndarray:
        """log q(v_{t-1} | v_t, v_0) ∝ q(v_t | v_{t-1}) q(v_{t-1} | v_0).

        ``v0_prob=True`` treats exp(log_v0) as soft class probabilities (the
        live path in both training and sampling); False uses argmax(v0).
        At t == 0 returns log_v0 unchanged. Reference models/transition.py:285-315.
        """
        t_minus_1 = jnp.maximum(t - 1, 0)

        fact1 = jnp.einsum(
            "bmj,bjk->bmk",
            jnp.exp(log_vt),
            self.transpose_q_onestep_mats[t],
            precision=jax.lax.Precision.HIGHEST,
        )
        qtm1 = self.q_mats[t_minus_1]  # [B, K, K]
        if v0_prob:
            fact2 = jnp.einsum(
                "bmj,bjk->bmk", jnp.exp(log_v0), qtm1,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            v0_idx = jnp.argmax(log_v0, axis=-1)  # [B, M]
            fact2 = jnp.take_along_axis(
                qtm1[:, None], v0_idx[..., None, None], axis=2
            ).squeeze(2)

        out = _clamped_log(fact1) + _clamped_log(fact2)
        out = out - jax.scipy.special.logsumexp(out, axis=-1, keepdims=True)
        t_is_zero = (t == 0).reshape(t.shape + (1,) * (log_v0.ndim - 1))
        return jnp.where(t_is_zero, log_v0, out)

    def compute_v_Lt(
        self,
        log_v_post_true: jnp.ndarray,
        log_v_post_pred: jnp.ndarray,
        log_v0: jnp.ndarray,
        t: jnp.ndarray,
    ) -> jnp.ndarray:
        """Per-element variational loss: KL(q||p) for t>0, decoder NLL at t=0.

        Returns [B, M]. Reference models/transition.py:317-329."""
        kl_v = categorical_kl(log_v_post_true, log_v_post_pred)
        nll_v = -log_categorical(log_v0, log_v_post_pred)
        t_is_zero = (t == 0).reshape(t.shape + (1,) * (kl_v.ndim - 1))
        return jnp.where(t_is_zero, nll_v, kl_v)

    # -- prior sampling ------------------------------------------------------

    def sample_init(self, shape_prefix, key: jax.Array):
        """Draw v_T from the prior. Returns (classes, one-hot, log one-hot)
        with leading dims ``shape_prefix``. Reference models/transition.py:331."""
        log_prior = jnp.clip(
            jnp.log(jnp.asarray(self.init_prob, dtype=jnp.float32) + EPS), LOG_MIN, None
        )
        logits = jnp.broadcast_to(log_prior, tuple(shape_prefix) + (self.num_classes,))
        init_types = log_sample_categorical(logits, key)
        init_onehot = self.onehot_encode(init_types)
        log_vt = index_to_log_onehot(init_types, self.num_classes)
        return init_types, init_onehot, log_vt
