"""MolDiff: joint 3D position / atom-type / bond-type diffusion model.

TPU-native re-design of the reference orchestrator
(`/root/reference/models/model.py`). Everything on device is a pure function
over fixed-shape padded dense batches:

  * positions    [B, N, 3]      Gaussian diffusion (ops/gaussian.py)
  * atom types   [B, N, Kn]     categorical diffusion, 'tomask' prior
  * bond types   [B, E, Ke]     categorical diffusion, 'absorb' prior with
                                the decoupled 'segment' schedule
  (E = N(N-1)/2 half-edges; N static per bucket)

The reverse sampler is a single ``lax.scan`` over the T timesteps with the
recursive categorical log-posterior threaded through the carry (the
reference threads `log_node_type` / `log_halfedge_type` across steps,
model.py:292-298). Bond guidance is ``jax.grad`` of a bond-predictor score
w.r.t. positions inside the scan body, replacing the reference's
``torch.enable_grad()`` island (model.py:309-362).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import graph_ops
from ..ops.categorical import (
    CategoricalTransition,
    index_to_log_onehot,
    log_sample_categorical,
)
from ..ops.gaussian import GaussianTransition
from ..ops.schedules import get_beta_schedule
from .denoiser import denoiser_static_config, init_node_edge_net, node_edge_net
from .nn import GaussianSmearing, init_linear, init_mlp, linear, mlp, safe_distance


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over elements where mask == 1 (mask broadcastable to x)."""
    mask = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sample_time_antithetic(key: jax.Array, num_graphs: int, num_timesteps: int) -> jnp.ndarray:
    """Antithetic timestep sampling (reference model.py:97-104)."""
    half = jax.random.randint(key, (num_graphs // 2 + 1,), 0, num_timesteps)
    t = jnp.concatenate([half, num_timesteps - half - 1])[:num_graphs]
    return t.astype(jnp.int32)


class MolDiffPreds(NamedTuple):
    pred_node: jnp.ndarray      # [B, N, Kn] logits of v0
    pred_pos: jnp.ndarray       # [B, N, 3]  x0 prediction
    pred_halfedge: jnp.ndarray  # [B, E, Ke] logits of e0


class SampleResult(NamedTuple):
    pred_node: jnp.ndarray
    pred_pos: jnp.ndarray
    pred_halfedge: jnp.ndarray
    traj: Optional[Any] = None  # (node, pos, halfedge) stacked over time if requested


class MolDiff:
    """Holds schedule constants + static architecture config; all compute
    methods are pure in (params, inputs, rng)."""

    def __init__(self, config: dict, num_node_types: int, num_edge_types: int):
        self.config = config
        self.num_node_types = num_node_types
        self.num_edge_types = num_edge_types
        self.bond_len_loss = bool(config.get("bond_len_loss", False))
        # extension knob (not in the reference, which fixes 100x for both
        # categorical KLs — model.py:174-185): extra multiplier on the edge
        # KL for fine-tunes targeting the edge head. 1.0 = reference loss.
        self.edge_loss_scale = float(config.get("edge_loss_scale", 1.0))
        # extension knob (not in the reference): auxiliary cross-entropy of
        # the v0 heads against the CLEAN classes over ALL real elements.
        # The D3PM posterior KL gives ~zero gradient through elements whose
        # v_t is already revealed (the posterior is a delta at the revealed
        # class regardless of the prediction), so the v0 heads never learn
        # the identity copy — the round-5 root cause of the element-marginal
        # collapse (results/diag_calibration_v2.json: revealed-heteroatom
        # accuracy 0.0-0.43 at any t). This CE supervises exactly that
        # conditional. 0.0 = reference loss.
        self.v0_ce_scale = float(config.get("v0_ce_scale", 0.0))
        # edge-head CE defaults to the node scale; measured round-5: the
        # EDGE copy is a NEGATIVE (the model copies its own noisy edge
        # draws instead of inferring bonds from geometry — disconnects up,
        # success 0.745 -> 0.573 with commit=nodes), so node-only
        # fine-tunes set v0_ce_edge_scale: 0
        self.v0_ce_edge_scale = float(
            config.get("v0_ce_edge_scale", self.v0_ce_scale))

        diff = config["diff"]
        self.num_timesteps = diff["num_timesteps"]
        self.time_dim = diff["time_dim"]
        self.categorical_space = diff.get("categorical_space", "discrete")
        if self.categorical_space not in ("discrete", "continuous"):
            raise ValueError(self.categorical_space)
        # one-hot scaling for the continuous-categorical mode
        # (reference model.py:50-57; scaling[0] is pos and must stay 1)
        scaling = list(diff.get("scaling", [1.0, 1.0, 1.0]))
        assert scaling[0] == 1, "scaling for pos must be 1"

        # transitions (reference model.py:49-95)
        pos_betas = get_beta_schedule(num_timesteps=self.num_timesteps, **diff["diff_pos"])
        self.pos_transition = GaussianTransition(pos_betas)
        node_betas = get_beta_schedule(
            num_timesteps=self.num_timesteps,
            **{k: v for k, v in diff["diff_atom"].items()
               if k not in ("init_prob",)},
        )
        edge_betas = get_beta_schedule(
            num_timesteps=self.num_timesteps,
            **{k: v for k, v in diff["diff_bond"].items()
               if k not in ("init_prob",)},
        )
        # raw float64 schedules, kept for sample-time respacing (ops/respace.py)
        self._raw_betas = {"pos": pos_betas, "node": node_betas, "edge": edge_betas}
        self._respace_cache = {}
        if self.categorical_space == "discrete":
            self.node_transition = CategoricalTransition(
                node_betas, num_node_types, init_prob=diff["diff_atom"]["init_prob"]
            )
            self.edge_transition = CategoricalTransition(
                edge_betas, num_edge_types, init_prob=diff["diff_bond"]["init_prob"]
            )
        else:  # continuous: Gaussian diffusion on scaled one-hots
            self.node_transition = GaussianTransition(
                node_betas, num_classes=num_node_types, scaling=scaling[1]
            )
            self.edge_transition = GaussianTransition(
                edge_betas, num_classes=num_edge_types, scaling=scaling[2]
            )

        self.node_dim = config["node_dim"]
        self.edge_dim = config["edge_dim"]
        denoiser_cfg = dict(config["denoiser"])
        denoiser_cfg.pop("backbone", None)
        self._denoiser_cfg = denoiser_cfg
        self.denoiser_static = denoiser_static_config(**denoiser_cfg)
        # time embedding: linear RBF over [0, T] (reference model.py:34-36)
        self.time_emb = GaussianSmearing(
            stop=self.num_timesteps, num_gaussians=self.time_dim, type_="linear"
        )
        # optional NamedSharding hint for the dense pair tensors (set by the
        # trainer when running on a ('data', 'graph') mesh)
        self.pair_sharding = None
        # optional (mesh, num_microbatches) set by the trainer on a
        # ('data', 'pipe') mesh: the denoiser then runs as a GPipe pipeline
        # over its stacked blocks (parallel/pipeline.py)
        self.pipeline_cfg = None

    # -- params --------------------------------------------------------------

    def init_params(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 5)
        denoiser_params, _ = init_node_edge_net(
            ks[0], self.node_dim, self.edge_dim, **self._denoiser_cfg
        )
        return {
            "node_embedder": init_linear(
                ks[1], self.num_node_types, self.node_dim - self.time_dim, bias=False
            ),
            "edge_embedder": init_linear(
                ks[2], self.num_edge_types, self.edge_dim - self.time_dim, bias=False
            ),
            "denoiser": denoiser_params,
            "node_decoder": init_mlp(ks[3], self.node_dim, self.num_node_types, self.node_dim),
            "edge_decoder": init_mlp(ks[4], self.edge_dim, self.num_edge_types, self.edge_dim),
        }

    # -- denoiser forward ------------------------------------------------------

    def forward(
        self,
        params: dict,
        h_node_pert: jnp.ndarray,      # [B, N, Kn] one-hot / soft
        pos_pert: jnp.ndarray,         # [B, N, 3]
        h_halfedge_pert: jnp.ndarray,  # [B, E, Ke]
        t: jnp.ndarray,                # [B] int32
        node_mask: jnp.ndarray,        # [B, N] float
        return_moe_aux: bool = False,
    ) -> MolDiffPreds:
        """Predict clean (t=0) quantities. Reference model.py:204-234.

        ``return_moe_aux``: also return the MoE load-balance scalar (None
        for dense configs) — used by get_loss; sampling ignores it."""
        b, n = h_node_pert.shape[:2]
        pair_mask = graph_ops.pair_mask_from_node_mask(node_mask)

        t_float = t.astype(jnp.float32)
        time_feat = self.time_emb(t_float)  # [B, time_dim]
        h_node = jnp.concatenate(
            [
                linear(params["node_embedder"], h_node_pert),
                jnp.broadcast_to(time_feat[:, None, :], (b, n, self.time_dim)),
            ],
            axis=-1,
        )
        h_edge_dense = graph_ops.halfedge_to_dense(h_halfedge_pert, n)
        h_edge = jnp.concatenate(
            [
                linear(params["edge_embedder"], h_edge_dense),
                jnp.broadcast_to(time_feat[:, None, None, :], (b, n, n, self.time_dim)),
            ],
            axis=-1,
        )
        t_norm = (t_float / self.num_timesteps)[:, None, None]  # [B,1,1]

        moe_aux = None
        if self.pipeline_cfg is not None:
            from ..parallel.pipeline import pipeline_denoiser

            pipe_mesh, n_micro = self.pipeline_cfg
            h_node, pos_out, h_edge = pipeline_denoiser(
                params["denoiser"], self.denoiser_static,
                h_node, pos_pert, h_edge,
                node_time=t_norm, edge_time=t_norm, pair_mask=pair_mask,
                mesh=pipe_mesh, num_microbatches=n_micro,
            )
        else:
            out = node_edge_net(
                params["denoiser"],
                self.denoiser_static,
                h_node,
                pos_pert,
                h_edge,
                node_time=t_norm,
                edge_time=t_norm,
                pair_mask=pair_mask,
                pair_sharding=self.pair_sharding,
                node_mask=node_mask,
            )
            if self.denoiser_static.get("moe") is not None:
                h_node, pos_out, h_edge, moe_aux = out
            else:
                h_node, pos_out, h_edge = out

        pred_node = mlp(params["node_decoder"], h_node)
        h_half_sym = graph_ops.dense_to_halfedge(graph_ops.symmetrize_dense(h_edge))
        pred_halfedge = mlp(params["edge_decoder"], h_half_sym)
        preds = MolDiffPreds(pred_node, pos_out, pred_halfedge)
        if return_moe_aux:
            return preds, moe_aux
        return preds

    # -- training loss ---------------------------------------------------------

    def get_loss(
        self,
        params: dict,
        node_type: jnp.ndarray,      # [B, N] int32
        node_pos: jnp.ndarray,       # [B, N, 3]
        halfedge_type: jnp.ndarray,  # [B, E] int32
        node_mask: jnp.ndarray,      # [B, N] float
        key: jax.Array,
    ):
        """Diffusion training loss (reference model.py:128-201): masked-mean
        pos MSE + 100 * KL(node) + 100 * KL(edge) [+ bond-length MSE]."""
        b, n = node_type.shape
        halfedge_mask = graph_ops.halfedge_mask_from_node_mask(node_mask)

        k_t, k_pos, k_node, k_edge = jax.random.split(key, 4)
        t = sample_time_antithetic(k_t, b, self.num_timesteps)

        pos_pert, _ = self.pos_transition.add_noise(node_pos, t, k_pos)
        if self.categorical_space == "discrete":
            h_node_pert, log_node_t, log_node_0 = self.node_transition.add_noise(
                node_type, t, k_node
            )
            h_halfedge_pert, log_halfedge_t, log_halfedge_0 = (
                self.edge_transition.add_noise(halfedge_type, t, k_edge)
            )
        else:
            h_node_pert, h_node_0 = self.node_transition.add_noise(
                node_type, t, k_node
            )
            h_halfedge_pert, h_halfedge_0 = self.edge_transition.add_noise(
                halfedge_type, t, k_edge
            )

        preds, moe_aux = self.forward(
            params, h_node_pert, pos_pert, h_halfedge_pert, t, node_mask,
            return_moe_aux=True,
        )

        # positions: mean over real atoms (reference uses F.mse_loss over the
        # ragged concatenation, i.e. a flat mean over real elements)
        loss_pos = masked_mean(
            (preds.pred_pos - node_pos) ** 2, node_mask[..., None]
        )

        losses = {}
        if self.bond_len_loss:
            iu, ju = graph_ops.triu_indices(n)
            bond_mask = halfedge_mask * (halfedge_type > 0)
            true_len = safe_distance(node_pos[:, iu] - node_pos[:, ju])
            pred_len = safe_distance(preds.pred_pos[:, iu] - preds.pred_pos[:, ju])
            losses["loss_len"] = masked_mean((pred_len - true_len) ** 2, bond_mask)

        if self.categorical_space == "discrete":
            # node / edge categorical KL (x100), reference model.py:174-185
            log_node_recon = jax.nn.log_softmax(preds.pred_node, axis=-1)
            log_node_post_true = self.node_transition.q_v_posterior(
                log_node_0, log_node_t, t, v0_prob=True
            )
            log_node_post_pred = self.node_transition.q_v_posterior(
                log_node_recon, log_node_t, t, v0_prob=True
            )
            kl_node = self.node_transition.compute_v_Lt(
                log_node_post_true, log_node_post_pred, log_node_0, t
            )
            loss_node = masked_mean(kl_node, node_mask) * 100.0

            log_edge_recon = jax.nn.log_softmax(preds.pred_halfedge, axis=-1)
            log_edge_post_true = self.edge_transition.q_v_posterior(
                log_halfedge_0, log_halfedge_t, t, v0_prob=True
            )
            log_edge_post_pred = self.edge_transition.q_v_posterior(
                log_edge_recon, log_halfedge_t, t, v0_prob=True
            )
            kl_edge = self.edge_transition.compute_v_Lt(
                log_edge_post_true, log_edge_post_pred, log_halfedge_0, t
            )
            loss_edge = masked_mean(kl_edge, halfedge_mask) * 100.0 * self.edge_loss_scale

            if self.v0_ce_scale > 0 or self.v0_ce_edge_scale > 0:
                loss_v0ce = 0.0
                if self.v0_ce_scale > 0:
                    ce_node = -jnp.take_along_axis(
                        log_node_recon, node_type[..., None], axis=-1
                    )[..., 0]
                    loss_v0ce = loss_v0ce + self.v0_ce_scale * masked_mean(
                        ce_node, node_mask)
                if self.v0_ce_edge_scale > 0:
                    ce_edge = -jnp.take_along_axis(
                        log_edge_recon, halfedge_type[..., None], axis=-1
                    )[..., 0]
                    loss_v0ce = loss_v0ce + (
                        self.v0_ce_edge_scale
                        * masked_mean(ce_edge, halfedge_mask))
                losses["loss_v0ce"] = loss_v0ce
        else:
            # continuous: MSE to the scaled one-hots x30
            # (reference model.py:186-189)
            loss_node = masked_mean(
                (preds.pred_node - h_node_0) ** 2, node_mask[..., None]
            ) * 30.0
            loss_edge = masked_mean(
                (preds.pred_halfedge - h_halfedge_0) ** 2,
                halfedge_mask[..., None],
            ) * 30.0

        if moe_aux is not None:
            # Switch-style load-balance loss (models/moe.py), weighted by
            # denoiser.moe.aux_weight
            losses["loss_moe"] = (
                self.denoiser_static["moe"]["aux_weight"] * moe_aux
            )
        loss_total = (loss_pos + loss_node + loss_edge
                      + losses.get("loss_len", 0.0)
                      + losses.get("loss_v0ce", 0.0)
                      + losses.get("loss_moe", 0.0))
        losses.update(
            loss=loss_total, loss_pos=loss_pos, loss_node=loss_node, loss_edge=loss_edge
        )
        return loss_total, losses

    # -- sampling ----------------------------------------------------------------

    def _respaced(self, num_steps: int, gamma: float = 1.0):
        """(transitions, t_map) for an ``num_steps``-step reverse chain.

        Both transition families compose exactly under striding
        (ops/respace.py), so the respaced objects are ordinary transitions
        built from composed betas; ``t_map[i]`` is the ORIGINAL timestep fed
        to the denoiser (the time embedding the network was trained with).
        Cached per num_steps (host float64 precompute + constant upload).
        """
        cache_key = (num_steps, float(gamma))
        if cache_key not in self._respace_cache:
            from moldiff_tpu.ops.respace import respace_timesteps, respaced_betas

            subset = respace_timesteps(self.num_timesteps, num_steps, gamma)
            rb = {k: respaced_betas(v, subset) for k, v in self._raw_betas.items()}
            diff = self.config["diff"]
            scaling = list(diff.get("scaling", [1.0, 1.0, 1.0]))
            # the sampler is usually jitted (MolSampler wraps sample() in
            # jax.jit), so this cache-fill can run DURING tracing; without
            # ensure_compile_time_eval the jnp constants inside the
            # transitions / t_map would be tracers of that first trace and
            # leak into later traces (second bucket size) ->
            # UnexpectedTracerError. This forces them concrete.
            with jax.ensure_compile_time_eval():
                if self.categorical_space == "discrete":
                    transitions = (
                        GaussianTransition(rb["pos"]),
                        CategoricalTransition(
                            rb["node"], self.num_node_types,
                            init_prob=diff["diff_atom"]["init_prob"],
                        ),
                        CategoricalTransition(
                            rb["edge"], self.num_edge_types,
                            init_prob=diff["diff_bond"]["init_prob"],
                        ),
                    )
                else:  # continuous mode: all three chains are Gaussian
                    transitions = (
                        GaussianTransition(rb["pos"]),
                        GaussianTransition(rb["node"],
                                           num_classes=self.num_node_types,
                                           scaling=scaling[1]),
                        GaussianTransition(rb["edge"],
                                           num_classes=self.num_edge_types,
                                           scaling=scaling[2]),
                    )
                t_map = jnp.asarray(subset, dtype=jnp.int32)
            self._respace_cache[cache_key] = (transitions, t_map)
        return self._respace_cache[cache_key]

    def sample(
        self,
        params: dict,
        node_mask: jnp.ndarray,  # [B, N] float — defines per-graph sizes
        key: jax.Array,
        guidance: Optional[Tuple[str, float]] = None,
        bond_predictor=None,          # (BondPredictor, bp_params) when guided
        save_traj: bool = False,
        guidance_interval: int = 1,
        num_steps: Optional[int] = None,
        pos_sampler: str = "ddpm",
        eta: float = 0.0,
        respace_gamma: float = 1.0,
        commit: str = "none",
        edge_guidance: float = 0.0,
        edge_guidance_tmax: Optional[int] = None,
    ) -> SampleResult:
        """Full T-step ancestral reverse sampler as one lax.scan.

        Reference model.py:236-378. Carry threads the recursive categorical
        log-posteriors in addition to the sampled one-hots.

        ``guidance_interval``: apply the bond-predictor gradient only on
        steps where ``step % interval == 0`` (always including the final
        step 0). 1 (default) is the reference-exact every-step behavior;
        larger values trade guidance strength for sampling speed (the
        guidance gradient costs ~5x a denoiser step). Framework extension —
        not in the reference.

        ``num_steps``: respaced reverse chain on S << T evenly-spaced
        timesteps (ops/respace.py) — throughput scales ~T/S. Framework
        extension — not in the reference.

        ``commit``: carry-over unmasking for the categorical chains
        ('none' | 'nodes' | 'edges' | 'both'). The reference's recursive
        posterior never locks a drawn class in: the carried log-posterior is
        a product of the model's per-step v0 predictions, so when those are
        near-marginal (uninformative per atom) the product collapses every
        atom onto the MODAL class (measured round-5: generated pools 98.9%
        carbon vs 74.6% corpus; results/diag_calibration_v2.json). With
        commit, the first non-sentinel draw of an atom (mask class,
        'tomask') or half-edge ('none' class 0, 'absorb') clamps that
        element's v0 input to the posterior recursion for the rest of the
        chain — the discrete analogue of masked-diffusion carry-over
        unmasking (SUBS zero-masking). Reveals then follow the model's
        CALIBRATED p(v0 | context) at reveal time and stay fixed, and later
        steps condition on stable identities. Framework extension — not in
        the reference ('none' is reference-exact).

        ``edge_guidance``: CLASS-space bond guidance (framework extension;
        the reference's 8 modes all steer POSITIONS). Weight w > 0 mixes
        the bond predictor's per-half-edge log-probs into the denoiser's
        edge v0 prediction before the posterior:
        ``log_softmax(log_edge_recon + w * bp_logp)``. Motivation
        (round-5 10k autopsy): the edge head's per-edge draws close rings
        at sizes/types the corpus never contains, while GEOMETRY-driven
        bond decisions are far more ring-consistent (the connect-the-dots
        regime gates 0.83 vs 0.75); the bond predictor is the learned
        geometric bond classifier, so its logits carry exactly that
        consistency. Mask classes (absent from the predictor's 5-way
        output) are padded at the uniform level -log(5): neither boosted
        nor killed. Requires ``bond_predictor``.

        ``edge_guidance_tmax``: apply edge guidance only at ORIGINAL
        timesteps t < tmax (the late, near-clean-geometry end of the
        chain). At high noise the predictor can only output the bond
        marginal (~93% 'none' at GEOM sizes), and the recursive posterior
        COMPOUNDS a per-step bias across steps — early mixing therefore
        over-sparsifies the graph; late in the chain the positions pin the
        bond geometry and the predictor's logits carry the ring-consistent
        signal (connect-the-dots regime evidence, results/
        gate_r5_connect.json). None = every step.
        """
        b, n = node_mask.shape
        e = graph_ops.num_halfedges(n)
        T = self.num_timesteps

        if self.categorical_space == "continuous":
            return self._sample_continuous(
                params, node_mask, key, guidance, bond_predictor, save_traj,
                num_steps=num_steps, respace_gamma=respace_gamma,
            )

        transitions, t_map = None, None
        if num_steps is not None and num_steps < T:
            transitions, t_map = self._respaced(num_steps, respace_gamma)
            T = num_steps
        pos_tr = transitions[0] if transitions else self.pos_transition
        node_tr = transitions[1] if transitions else self.node_transition
        edge_tr = transitions[2] if transitions else self.edge_transition

        k_node, k_pos, k_edge, k_scan = jax.random.split(key, 4)
        _, h_node, log_node = node_tr.sample_init((b, n), k_node)
        pos = pos_tr.sample_init((b, n, 3), k_pos)
        _, h_halfedge, log_halfedge = edge_tr.sample_init((b, e), k_edge)

        zero_preds = MolDiffPreds(
            jnp.zeros((b, n, self.num_node_types)),
            jnp.zeros((b, n, 3)),
            jnp.zeros((b, e, self.num_edge_types)),
        )

        body = self._make_scan_body(
            params, node_mask, guidance, bond_predictor, save_traj,
            guidance_interval=guidance_interval,
            transitions=transitions, t_map=t_map,
            pos_sampler=pos_sampler, eta=eta, commit=commit,
            edge_guidance=edge_guidance,
            edge_guidance_tmax=edge_guidance_tmax,
        )
        committed = self._commit_init(b, n, e)
        init = (pos, h_node, h_halfedge, log_node, log_halfedge, committed,
                zero_preds, k_scan)
        steps = jnp.arange(T - 1, -1, -1)
        carry, ys = jax.lax.scan(body, init, steps)
        preds = carry[6]
        traj = None
        if save_traj:
            # prepend the prior state, matching reference traj[0] = init
            traj = tuple(
                jnp.concatenate([x0[None], y], axis=0)
                for x0, y in zip((h_node, pos, h_halfedge), ys)
            )
        return SampleResult(preds.pred_node, preds.pred_pos, preds.pred_halfedge, traj)

    def _commit_init(self, b: int, n: int, e: int):
        """Initial commit state: -1 = not yet revealed (models/moldiff.py
        sample ``commit``). Always threaded through the carry so the scan
        structure is identical with commit off (XLA DCEs the unused lanes)."""
        return (
            jnp.full((b, n), -1, dtype=jnp.int32),
            jnp.full((b, e), -1, dtype=jnp.int32),
        )

    def _make_scan_body(self, params, node_mask, guidance, bond_predictor,
                        save_traj: bool, guidance_interval: int = 1,
                        transitions=None, t_map=None,
                        pos_sampler: str = "ddpm", eta: float = 0.0,
                        commit: str = "none", edge_guidance: float = 0.0,
                        edge_guidance_tmax: Optional[int] = None):
        """One reverse step of the discrete sampler (shared by the single
        lax.scan and the chunked variant). Reference model.py:271-367.

        ``transitions``/``t_map``: respaced-chain support — posterior math
        runs on the respaced transitions indexed by the scan step, while the
        denoiser (and guidance bond predictor) see the ORIGINAL timestep
        ``t_map[step]`` they were trained on.

        ``pos_sampler``: 'ddpm' (reference-exact ancestral posterior) or
        'ddim' with noise level ``eta`` (ops/gaussian.py:ddim_prev) for the
        position chain; the categorical heads stay ancestral either way."""
        b = node_mask.shape[0]
        pos_tr, node_tr, edge_tr = transitions or (
            self.pos_transition, self.node_transition, self.edge_transition
        )
        if pos_sampler not in ("ddpm", "ddim"):
            raise ValueError(f"unknown pos_sampler: {pos_sampler}")
        if commit not in ("none", "nodes", "edges", "both"):
            raise ValueError(f"unknown commit mode: {commit}")
        commit_nodes = commit in ("nodes", "both")
        commit_edges = commit in ("edges", "both")
        node_sentinel = self.num_node_types - 1  # 'tomask': mask is last
        edge_sentinel = 0                        # 'absorb': class 0 = no bond
        _node_pi = jnp.asarray(node_tr.init_prob, dtype=jnp.float32)
        _edge_pi = jnp.asarray(edge_tr.init_prob, dtype=jnp.float32)
        edge_guidance = float(edge_guidance)
        if edge_guidance > 0 and bond_predictor is None:
            raise ValueError("edge_guidance requires a bond_predictor")

        def body(carry, step):
            (pos, h_node, h_halfedge, log_node, log_halfedge,
             (com_node, com_edge), _, key) = carry
            key, k_pos, k_node, k_edge = jax.random.split(key, 4)
            t = jnp.full((b,), step, dtype=jnp.int32)
            t_model = t if t_map is None else jnp.full((b,), t_map[step], jnp.int32)

            preds = self.forward(params, h_node, pos, h_halfedge, t_model, node_mask)

            if pos_sampler == "ddim":
                pos_prev = pos_tr.ddim_prev(
                    x_t=pos, x_recon=preds.pred_pos, t=t, key=k_pos, eta=eta
                )
            else:
                pos_prev = pos_tr.get_prev_from_recon(
                    x_t=pos, x_recon=preds.pred_pos, t=t, key=k_pos
                )

            log_node_recon = jax.nn.log_softmax(preds.pred_node, axis=-1)
            if commit_nodes:
                # carry-over unmasking: a revealed atom's v0 input to the
                # posterior recursion is its committed class, not the
                # model's (possibly uninformative) fresh prediction
                log_node_recon = jnp.where(
                    (com_node >= 0)[..., None],
                    index_to_log_onehot(
                        jnp.maximum(com_node, 0), self.num_node_types),
                    log_node_recon,
                )
            log_node_new = node_tr.q_v_posterior(
                log_node_recon, log_node, t, v0_prob=True
            )
            node_type_prev = log_sample_categorical(log_node_new, k_node)
            if commit_nodes:
                # gate on the reveal jump being MODEL-driven: the jump lands
                # on class x with prob ∝ abar_{t-1} p(v0=x) + (1-abar) π_x.
                # Freeze the draw only when the model term dominates the
                # uniform prior-leak term FOR THE DRAWN CLASS (per-draw
                # Bayes factor); leak draws keep flickering like the
                # reference chain. Committing model-driven draws is the
                # masked-diffusion carry-over-unmasking semantics.
                abar_n = node_tr.alphas_bar[jnp.maximum(step - 1, 0)]
                p_drawn = jnp.take_along_axis(
                    jnp.exp(log_node_recon), node_type_prev[..., None], axis=-1
                )[..., 0]
                pi_drawn = _node_pi[node_type_prev]
                com_node = jnp.where(
                    (com_node < 0) & (node_type_prev != node_sentinel)
                    & (abar_n * p_drawn > (1.0 - abar_n) * pi_drawn),
                    node_type_prev, com_node,
                )
                # committed atoms never flip back in the sampled stream
                node_type_prev = jnp.where(com_node >= 0, com_node, node_type_prev)
            h_node_prev = node_tr.onehot_encode(node_type_prev)

            log_edge_recon = jax.nn.log_softmax(preds.pred_halfedge, axis=-1)
            if edge_guidance > 0:
                # class-space bond guidance: mix the (geometry-driven) bond
                # predictor's log-probs into the edge v0 prediction
                bp, bp_params = bond_predictor
                bp_logits = bp.forward(bp_params, h_node, pos, t_model,
                                       node_mask)          # [B, E, Kbp]
                bp_logp = jax.nn.log_softmax(bp_logits, axis=-1)
                pad = self.num_edge_types - bp_logp.shape[-1]
                if pad > 0:
                    # mask classes: uniform level — neither boosted nor killed
                    bp_logp = jnp.pad(
                        bp_logp, ((0, 0), (0, 0), (0, pad)),
                        constant_values=-float(np.log(bp_logits.shape[-1])),
                    )
                mix = edge_guidance * bp_logp
                if edge_guidance_tmax is not None:
                    # late-chain gating: the predictor is only informative
                    # once positions are near-clean; early mixing compounds
                    # its high-noise 'none' marginal through the recursion
                    mix = jnp.where(
                        (t_model < int(edge_guidance_tmax))[:, None, None],
                        mix, 0.0)
                log_edge_recon = jax.nn.log_softmax(
                    log_edge_recon + mix, axis=-1)
                preds = MolDiffPreds(
                    preds.pred_node, preds.pred_pos, log_edge_recon)
            if commit_edges:
                log_edge_recon = jnp.where(
                    (com_edge >= 0)[..., None],
                    index_to_log_onehot(
                        jnp.maximum(com_edge, 0), self.num_edge_types),
                    log_edge_recon,
                )
            log_halfedge_new = edge_tr.q_v_posterior(
                log_edge_recon, log_halfedge, t, v0_prob=True
            )
            halfedge_type_prev = log_sample_categorical(log_halfedge_new, k_edge)
            if commit_edges:
                abar_e = edge_tr.alphas_bar[jnp.maximum(step - 1, 0)]
                p_drawn_e = jnp.take_along_axis(
                    jnp.exp(log_edge_recon), halfedge_type_prev[..., None],
                    axis=-1,
                )[..., 0]
                pi_drawn_e = _edge_pi[halfedge_type_prev]
                com_edge = jnp.where(
                    (com_edge < 0) & (halfedge_type_prev != edge_sentinel)
                    & (abar_e * p_drawn_e > (1.0 - abar_e) * pi_drawn_e),
                    halfedge_type_prev, com_edge,
                )
                halfedge_type_prev = jnp.where(
                    com_edge >= 0, com_edge, halfedge_type_prev)
            h_halfedge_prev = edge_tr.onehot_encode(halfedge_type_prev)
            if commit_nodes or commit_edges:
                # decode reads the final preds: expose the clamped v0 views
                # so argmax decode agrees with the committed identities
                preds = MolDiffPreds(
                    log_node_recon, preds.pred_pos, log_edge_recon)

            if guidance is not None:
                gui_type, gui_scale = guidance
                # a python-float scale <= 0 disables guidance statically; a
                # traced scale (scale sweeps reuse ONE compile) always takes
                # the guided path — the delta is just multiplied by it
                static_off = (
                    isinstance(gui_scale, (int, float)) and gui_scale <= 0
                )
                if not static_off:
                    def apply_guidance(pos_prev_in):
                        delta = _bond_guidance_delta(
                            bond_predictor,
                            gui_type,
                            gui_scale,
                            h_node_pert=h_node,
                            pos_pert=pos,
                            t=t_model,  # bond predictor's own schedule is
                                        # indexed by ORIGINAL timesteps
                            node_mask=node_mask,
                            halfedge_type_prev=halfedge_type_prev,
                            log_halfedge_type=log_halfedge_new,
                        )
                        return pos_prev_in + delta

                    if guidance_interval <= 1:
                        pos_prev = apply_guidance(pos_prev)
                    else:
                        # apply every k-th step (incl. final step 0); the
                        # untaken lax.cond branch is skipped at runtime, so
                        # skipped steps cost no bond-predictor grad
                        pos_prev = jax.lax.cond(
                            step % guidance_interval == 0,
                            apply_guidance,
                            lambda p: p,
                            pos_prev,
                        )

            carry = (
                pos_prev, h_node_prev, h_halfedge_prev,
                log_node_new, log_halfedge_new, (com_node, com_edge),
                preds, key,
            )
            ys = (h_node_prev, pos_prev, h_halfedge_prev) if save_traj else None
            return carry, ys

        return body

    def sample_chunked(
        self,
        params,
        node_mask: jnp.ndarray,
        key: jax.Array,
        chunk_size: int,
        guidance: Optional[Tuple[str, float]] = None,
        bond_predictor=None,
        data_sharding=None,   # NamedSharding for batch-major carry leaves
                              # (multi-chip: shard the chain over 'data')
        guidance_interval: int = 1,
        save_traj: bool = False,
        num_steps: Optional[int] = None,
        pos_sampler: str = "ddpm",
        eta: float = 0.0,
        respace_gamma: float = 1.0,
        commit: str = "none",
        edge_guidance: float = 0.0,
        edge_guidance_tmax: Optional[int] = None,
    ) -> SampleResult:
        """The T-step reverse chain as T/chunk_size sequential jitted scans
        with the carry threaded on host.

        Needed when one device execution of the full chain exceeds runtime
        deadlines (e.g. guided sampling: denoiser + bond-predictor grad per
        step ~40-60s total on one chip trips the axon RPC watchdog). Each
        chunk has identical shapes, so there is exactly ONE compile; results
        are bitwise-identical to the single-scan path (scan is sequential).
        Discrete categorical space only.

        ``save_traj``: per-chunk stacked states are pulled to host and
        concatenated, so trajectory saving works for chains too long for a
        single device execution (the reference saves trajectories under
        guidance by default: configs/sample/sample_MolDiff.yml
        save_traj_prob 0.02).
        """
        assert self.categorical_space == "discrete"
        b, n = node_mask.shape
        e = graph_ops.num_halfedges(n)
        T = self.num_timesteps
        transitions, t_map = None, None
        if num_steps is not None and num_steps < T:
            transitions, t_map = self._respaced(num_steps, respace_gamma)
            T = num_steps
        pos_tr = transitions[0] if transitions else self.pos_transition
        node_tr = transitions[1] if transitions else self.node_transition
        edge_tr = transitions[2] if transitions else self.edge_transition
        assert T % chunk_size == 0, (T, chunk_size)

        k_node, k_pos, k_edge, k_scan = jax.random.split(key, 4)
        _, h_node, log_node = node_tr.sample_init((b, n), k_node)
        pos = pos_tr.sample_init((b, n, 3), k_pos)
        _, h_halfedge, log_halfedge = edge_tr.sample_init((b, e), k_edge)
        zero_preds = MolDiffPreds(
            jnp.zeros((b, n, self.num_node_types)),
            jnp.zeros((b, n, 3)),
            jnp.zeros((b, e, self.num_edge_types)),
        )

        # the guidance SCALE is a runtime argument of the compiled chunk (not
        # a closure constant), so scale sweeps hit one compile per type
        gui_type = guidance[0] if guidance is not None else None
        gui_scale = float(guidance[1]) if guidance is not None else 0.0
        cache_key = (b, n, chunk_size, gui_type, bond_predictor is not None,
                     guidance_interval, save_traj, num_steps,
                     pos_sampler, float(eta), float(respace_gamma), commit,
                     float(edge_guidance), edge_guidance_tmax)
        if not hasattr(self, "_chunk_fns"):
            self._chunk_fns = {}
        if cache_key not in self._chunk_fns:
            def chunk_fn(params, node_mask, carry, steps, scale):
                body = self._make_scan_body(
                    params, node_mask,
                    (gui_type, scale) if gui_type is not None else None,
                    bond_predictor,
                    save_traj=save_traj,
                    guidance_interval=guidance_interval,
                    transitions=transitions, t_map=t_map,
                    pos_sampler=pos_sampler, eta=eta, commit=commit,
                    edge_guidance=edge_guidance,
                    edge_guidance_tmax=edge_guidance_tmax,
                )
                return jax.lax.scan(body, carry, steps)

            self._chunk_fns[cache_key] = jax.jit(chunk_fn)
        fn = self._chunk_fns[cache_key]

        committed = self._commit_init(b, n, e)
        carry = (pos, h_node, h_halfedge, log_node, log_halfedge, committed,
                 zero_preds, k_scan)
        if data_sharding is not None:
            # place batch-major leaves on the mesh; jit follows input
            # placement, so every chunk runs sharded over 'data'
            shard = lambda x: jax.device_put(x, data_sharding)
            carry = (
                shard(pos), shard(h_node), shard(h_halfedge),
                shard(log_node), shard(log_halfedge),
                tuple(shard(x) for x in committed),
                MolDiffPreds(*(shard(x) for x in zero_preds)), k_scan,
            )
            node_mask = shard(node_mask)
        # initial prior state for traj[0] (matches the single-scan path)
        init_state = (h_node, pos, h_halfedge)
        all_steps = np.arange(T - 1, -1, -1)
        traj_chunks = []
        scale_arr = jnp.float32(gui_scale)
        for c in range(T // chunk_size):
            steps = jnp.asarray(all_steps[c * chunk_size:(c + 1) * chunk_size])
            carry, ys = fn(params, node_mask, carry, steps, scale_arr)
            if save_traj:
                # pull each chunk's stacked states to host so device memory
                # stays bounded by one chunk
                traj_chunks.append(tuple(np.asarray(y) for y in ys))
        preds = carry[6]
        traj = None
        if save_traj:
            traj = tuple(
                np.concatenate([np.asarray(x0)[None]] + [tc[i] for tc in traj_chunks],
                               axis=0)
                for i, x0 in enumerate(init_state)
            )
        return SampleResult(preds.pred_node, preds.pred_pos, preds.pred_halfedge, traj)

    def _sample_continuous(
        self, params, node_mask, key, guidance=None, bond_predictor=None,
        save_traj: bool = False, num_steps=None, respace_gamma: float = 1.0,
    ) -> SampleResult:
        """Reverse sampler for the continuous categorical space: node/edge
        one-hot features follow Gaussian posteriors like positions
        (reference model.py:301-306)."""
        b, n = node_mask.shape
        e = graph_ops.num_halfedges(n)
        T = self.num_timesteps
        t_map = None
        pos_tr = self.pos_transition
        node_tr, edge_tr = self.node_transition, self.edge_transition
        if num_steps is not None and num_steps < T:
            (pos_tr, node_tr, edge_tr), t_map = self._respaced(
                num_steps, respace_gamma)
            T = num_steps

        k_node, k_pos, k_edge, k_scan = jax.random.split(key, 4)
        h_node = node_tr.sample_init((b, n, self.num_node_types), k_node)
        pos = pos_tr.sample_init((b, n, 3), k_pos)
        h_halfedge = edge_tr.sample_init((b, e, self.num_edge_types), k_edge)
        zero_preds = MolDiffPreds(
            jnp.zeros((b, n, self.num_node_types)),
            jnp.zeros((b, n, 3)),
            jnp.zeros((b, e, self.num_edge_types)),
        )

        def body(carry, step):
            pos, h_node, h_halfedge, _, key = carry
            key, k_pos, k_node, k_edge = jax.random.split(key, 4)
            t = jnp.full((b,), step, dtype=jnp.int32)
            t_model = t if t_map is None else jnp.full((b,), t_map[step],
                                                       jnp.int32)

            preds = self.forward(params, h_node, pos, h_halfedge, t_model,
                                 node_mask)
            pos_prev = pos_tr.get_prev_from_recon(
                x_t=pos, x_recon=preds.pred_pos, t=t, key=k_pos
            )
            h_node_prev = node_tr.get_prev_from_recon(
                x_t=h_node, x_recon=preds.pred_node, t=t, key=k_node
            )
            h_halfedge_prev = edge_tr.get_prev_from_recon(
                x_t=h_halfedge, x_recon=preds.pred_halfedge, t=t, key=k_edge
            )

            if guidance is not None:
                gui_type, gui_scale = guidance
                if not (isinstance(gui_scale, (int, float)) and gui_scale <= 0):
                    halfedge_type_prev = jnp.argmax(h_halfedge_prev, axis=-1)
                    delta = _bond_guidance_delta(
                        bond_predictor, gui_type, gui_scale,
                        h_node_pert=h_node, pos_pert=pos, t=t_model,
                        node_mask=node_mask,
                        halfedge_type_prev=halfedge_type_prev,
                        log_halfedge_type=jax.nn.log_softmax(
                            h_halfedge_prev, axis=-1
                        ),
                    )
                    pos_prev = pos_prev + delta

            carry = (pos_prev, h_node_prev, h_halfedge_prev, preds, key)
            ys = (h_node_prev, pos_prev, h_halfedge_prev) if save_traj else None
            return carry, ys

        init = (pos, h_node, h_halfedge, zero_preds, k_scan)
        steps = jnp.arange(T - 1, -1, -1)
        carry, ys = jax.lax.scan(body, init, steps)
        preds = carry[3]
        traj = None
        if save_traj:
            traj = tuple(
                jnp.concatenate([x0[None], y], axis=0)
                for x0, y in zip((h_node, pos, h_halfedge), ys)
            )
        return SampleResult(preds.pred_node, preds.pred_pos, preds.pred_halfedge, traj)


# ---------------------------------------------------------------------------
# bond guidance (reference model.py:309-362)
# ---------------------------------------------------------------------------

# drift direction per guidance mode (reference model.py:309-362: minimize
# entropy/uncertainty/crossent scores, maximize logit scores)
_GUIDANCE_SIGN = {
    "entropy": -1.0, "uncertainty": -1.0, "uncertainty_bond": -1.0,
    "entropy_bond": -1.0, "logit_bond": +1.0, "logit": +1.0,
    "crossent": -1.0, "crossent_bond": -1.0,
}


def _bond_guidance_delta(
    bond_predictor,
    gui_type: str,
    gui_scale: float,
    h_node_pert: jnp.ndarray,
    pos_pert: jnp.ndarray,
    t: jnp.ndarray,
    node_mask: jnp.ndarray,
    halfedge_type_prev: jnp.ndarray,
    log_halfedge_type: jnp.ndarray,
) -> jnp.ndarray:
    """delta(pos) = ±grad_pos(score) * scale for all 8 reference modes.

    All per-halfedge scores are masked so padded edges contribute nothing
    (the reference's ragged sums only ever see real edges).
    """
    bp, bp_params = bond_predictor
    if gui_type not in _GUIDANCE_SIGN:
        raise NotImplementedError(f"guidance type {gui_type}")
    halfedge_mask = graph_ops.halfedge_mask_from_node_mask(node_mask)
    eps = 1e-12

    def score(pos_in):
        pred = bp.forward(bp_params, h_node_pert, pos_in, t, node_mask)  # [B,E,Kbp]
        if gui_type == "entropy":
            prob = jax.nn.softmax(pred, axis=-1)
            ent = -jnp.sum(prob * jnp.log(prob + eps), axis=-1)
            return jnp.sum(jnp.log(ent) * halfedge_mask)
        elif gui_type == "uncertainty":
            unc = jax.nn.sigmoid(-jax.scipy.special.logsumexp(pred, axis=-1))
            return jnp.sum(jnp.log(unc) * halfedge_mask)
        elif gui_type == "uncertainty_bond":
            prob = jax.nn.softmax(pred, axis=-1)
            unc = jax.nn.sigmoid(-jax.scipy.special.logsumexp(pred, axis=-1))
            w = jax.lax.stop_gradient(jnp.sum(prob[..., 1:], axis=-1))
            return jnp.sum(jnp.log(unc) * w * halfedge_mask)
        elif gui_type == "entropy_bond":
            prob = jax.nn.softmax(pred, axis=-1)
            ent = -jnp.sum(prob * jnp.log(prob + eps), axis=-1)
            w = jax.lax.stop_gradient(jnp.sum(prob[..., 1:], axis=-1))
            return jnp.sum(jnp.log(ent) * w * halfedge_mask)
        elif gui_type == "logit_bond":
            is_real = (
                (halfedge_type_prev >= 1) & (halfedge_type_prev <= 4)
            ).astype(pred.dtype)
            sel = jnp.take_along_axis(
                pred, jnp.clip(halfedge_type_prev, 0, pred.shape[-1] - 1)[..., None], axis=-1
            ).squeeze(-1)
            return jnp.sum(sel * is_real * halfedge_mask)
        elif gui_type == "logit":
            not_mask = (halfedge_type_prev <= 4).astype(pred.dtype)
            sel = jnp.take_along_axis(
                pred, jnp.clip(halfedge_type_prev, 0, pred.shape[-1] - 1)[..., None], axis=-1
            ).squeeze(-1)
            return jnp.sum(sel * not_mask * halfedge_mask)
        elif gui_type == "crossent":
            # soft-target CE against posterior probs (all classes but the mask)
            target = jax.lax.stop_gradient(
                jnp.exp(log_halfedge_type)[..., :-1]
            )
            ce = -jnp.sum(target * jax.nn.log_softmax(pred, axis=-1), axis=-1)
            return jnp.sum(jnp.log(ce + eps) * halfedge_mask)
        elif gui_type == "crossent_bond":
            target = jax.lax.stop_gradient(
                jnp.exp(log_halfedge_type)[..., 1:-1]
            )
            ce = -jnp.sum(
                target * jax.nn.log_softmax(pred[..., 1:], axis=-1), axis=-1
            )
            return jnp.sum(jnp.log(ce + eps) * halfedge_mask)
        else:
            raise NotImplementedError(f"guidance type {gui_type}")

    grad = jax.grad(score)(pos_pert)
    return _GUIDANCE_SIGN[gui_type] * grad * gui_scale
