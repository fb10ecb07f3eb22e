"""Continuous (Gaussian / DDPM) diffusion transition.

Pure-functional analogue of the reference ``ContigousTransition``
(`/root/reference/models/transition.py:9-69`), redesigned for padded dense
batches: all ops take per-graph timesteps ``t [B]`` and broadcast over the
element axes, instead of gathering per-element ``coef[t][batch]``.

All schedule constants are precomputed on host in float64 and stored as
float32 jnp arrays closed over by jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class GaussianTransition:
    """q(x_t | x_0) = N(sqrt(a_bar_t) x_0, (1 - a_bar_t) I) and its posterior.

    Args:
      betas: float64 numpy array [T] from ``schedules.get_beta_schedule``.
      num_classes / scaling: when set, ``add_noise`` accepts integer class
        arrays, one-hot encodes and divides by ``scaling`` before perturbing,
        returning (x_t, x0_scaled) — the reference's *continuous categorical*
        mode (models/transition.py:28-41).
    """

    def __init__(self, betas: np.ndarray, num_classes: "int | None" = None,
                 scaling: float = 1.0):
        self.num_classes = num_classes
        self.scaling = float(scaling)
        betas = np.asarray(betas, dtype=np.float64)
        alphas = 1.0 - betas
        alphas_bar = np.cumprod(alphas, axis=0)
        alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])

        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        self.num_timesteps = len(betas)
        self.betas = f32(betas)
        self.alphas = f32(alphas)
        self.alphas_bar = f32(alphas_bar)
        self.alphas_bar_prev = f32(alphas_bar_prev)
        # posterior q(x_{t-1} | x_0, x_t) coefficients
        # (reference models/transition.py:24-26)
        self.coef_x0 = f32(np.sqrt(alphas_bar_prev) * betas / (1 - alphas_bar))
        self.coef_xt = f32(np.sqrt(alphas) * (1 - alphas_bar_prev) / (1 - alphas_bar))
        self.std = f32(np.sqrt((1 - alphas_bar_prev) * betas / (1 - alphas_bar)))

    @staticmethod
    def _bcast(coef_t: jnp.ndarray, ndim: int) -> jnp.ndarray:
        """[B] -> [B, 1, ..., 1] with `ndim` total dims."""
        return coef_t.reshape(coef_t.shape + (1,) * (ndim - 1))

    def add_noise(self, x: jnp.ndarray, t: jnp.ndarray, key: jax.Array):
        """Sample x_t ~ q(x_t | x_0).  x: [B, ...], t: [B] int32.

        Continuous values: returns (x_t, noise). With ``num_classes`` set
        (continuous-categorical mode), x holds int class indices; returns
        (x_t, x0_onehot_scaled). Reference models/transition.py:28-41.
        """
        if self.num_classes is not None:
            x0 = jax.nn.one_hot(x, self.num_classes, dtype=jnp.float32) / self.scaling
            a_bar = self._bcast(self.alphas_bar[t], x0.ndim)
            noise = jax.random.normal(key, x0.shape, dtype=x0.dtype)
            pert = jnp.sqrt(a_bar) * x0 + jnp.sqrt(1.0 - a_bar) * noise
            return pert, x0
        a_bar = self._bcast(self.alphas_bar[t], x.ndim)
        noise = jax.random.normal(key, x.shape, dtype=x.dtype)
        pert = jnp.sqrt(a_bar) * x + jnp.sqrt(1.0 - a_bar) * noise
        return pert, noise

    def get_prev_from_recon(
        self, x_t: jnp.ndarray, x_recon: jnp.ndarray, t: jnp.ndarray, key: jax.Array
    ) -> jnp.ndarray:
        """Sample x_{t-1} ~ q(x_{t-1} | x_t, x0=x_recon); returns the
        posterior mean at t == 0. Reference models/transition.py:44-63."""
        mu = (
            self._bcast(self.coef_x0[t], x_t.ndim) * x_recon
            + self._bcast(self.coef_xt[t], x_t.ndim) * x_t
        )
        sigma = self._bcast(self.std[t], x_t.ndim)
        x_prev = mu + sigma * jax.random.normal(key, mu.shape, dtype=mu.dtype)
        time_zero = self._bcast(t == 0, x_t.ndim)
        return jnp.where(time_zero, mu, x_prev)

    def ddim_prev(
        self, x_t: jnp.ndarray, x_recon: jnp.ndarray, t: jnp.ndarray,
        key: jax.Array, eta: float = 0.0,
    ) -> jnp.ndarray:
        """DDIM reverse step (Song et al., 2021) from the x0 prediction.

        ``eta`` interpolates the noise level: 0 = deterministic DDIM,
        1 = exactly the DDPM ancestral posterior (same mean AND std —
        tested). Framework extension (the reference is ancestral-only,
        models/transition.py:44-63); pairs with timestep respacing
        (ops/respace.py) for low-step sampling.

        At t == 0, alphas_bar_prev[0] == 1 makes both the noise scale and
        the eps coefficient vanish, so the step returns x_recon — the same
        no-noise final step as the DDPM path.
        """
        a_t = self._bcast(self.alphas_bar[t], x_t.ndim)
        a_prev = self._bcast(self.alphas_bar_prev[t], x_t.ndim)
        eps = (x_t - jnp.sqrt(a_t) * x_recon) / jnp.sqrt(1.0 - a_t)
        sigma = eta * jnp.sqrt(
            jnp.clip((1.0 - a_prev) / (1.0 - a_t), 0.0, None)
            * jnp.clip(1.0 - a_t / a_prev, 0.0, None)
        )
        mean = (
            jnp.sqrt(a_prev) * x_recon
            + jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0, None)) * eps
        )
        return mean + sigma * jax.random.normal(key, mean.shape, mean.dtype)

    def sample_init(self, shape, key: jax.Array) -> jnp.ndarray:
        """x_T ~ N(0, I). Reference models/transition.py:65-69."""
        return jax.random.normal(key, shape, dtype=jnp.float32)
