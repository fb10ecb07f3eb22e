"""Bond predictor: auxiliary classifier p(bond_type | noisy atoms + positions).

TPU-native analogue of `/root/reference/models/bond_predictor.py`. Trained on
the same perturbation process as MolDiff but only positions and atom types
are noised (bond labels stay clean CE targets); at sample time its gradients
w.r.t. positions provide bond guidance inside the sampler scan.

Uses ``num_edge_types`` *without* the mask class (5: none/single/double/
triple/aromatic) — see reference scripts/sample_drug3d.py:88.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import graph_ops
from ..ops.categorical import CategoricalTransition
from ..ops.gaussian import GaussianTransition
from ..ops.schedules import get_beta_schedule
from .denoiser import denoiser_static_config, init_node_edge_net, node_edge_net
from .moldiff import masked_mean, sample_time_antithetic
from .nn import GaussianSmearing, init_linear, init_mlp, linear, linear_parts, mlp


class BondPredictor:
    def __init__(self, config: dict, num_node_types: int, num_edge_types: int):
        self.config = config
        self.num_node_types = num_node_types
        self.num_edge_types = num_edge_types

        diff = config["diff"]
        self.num_timesteps = diff["num_timesteps"]
        if self.num_timesteps > 0:
            self.time_dim = diff["time_dim"]
            pos_betas = get_beta_schedule(
                num_timesteps=self.num_timesteps, **diff["diff_pos"]
            )
            self.pos_transition = GaussianTransition(pos_betas)
            node_betas = get_beta_schedule(
                num_timesteps=self.num_timesteps,
                **{k: v for k, v in diff["diff_atom"].items() if k != "init_prob"},
            )
            self.node_transition = CategoricalTransition(
                node_betas, num_node_types, init_prob=diff["diff_atom"]["init_prob"]
            )
            self.time_emb = GaussianSmearing(
                stop=self.num_timesteps, num_gaussians=self.time_dim, type_="linear"
            )
        else:
            self.time_dim = 0

        self.node_dim = config["node_dim"]
        self.edge_dim = config["edge_dim"]
        encoder_cfg = dict(config["encoder"])
        encoder_cfg.pop("backbone", None)
        self._encoder_cfg = encoder_cfg
        self.encoder_static = denoiser_static_config(**encoder_cfg)

        # CE class weights down-weighting "no bond" (reference :36-37)
        self.edge_weight = jnp.asarray(
            [0.1] + [1.0] * (num_edge_types - 1), dtype=jnp.float32
        )
        self.pair_sharding = None  # see MolDiff.pair_sharding

    def init_params(self, key: jax.Array) -> dict:
        ks = jax.random.split(key, 4)
        encoder_params, _ = init_node_edge_net(
            ks[0], self.node_dim, self.edge_dim, **self._encoder_cfg
        )
        return {
            "node_embedder": init_linear(
                ks[1], self.num_node_types, self.node_dim - self.time_dim, bias=False
            ),
            "edge_embedder": init_linear(
                ks[2], self.num_node_types * 2, self.edge_dim - self.time_dim, bias=False
            ),
            "encoder": encoder_params,
            "edge_decoder": init_mlp(
                ks[3],
                self.edge_dim + self.node_dim,
                self.num_edge_types,
                self.edge_dim,
                num_layer=3,
            ),
        }

    def forward(
        self,
        params: dict,
        h_node: jnp.ndarray,     # [B, N, Kn] one-hot / soft atom types
        pos_node: jnp.ndarray,   # [B, N, 3]
        t: Optional[jnp.ndarray],  # [B] int32 (None if num_timesteps == 0)
        node_mask: jnp.ndarray,  # [B, N]
        return_moe_aux: bool = False,
    ) -> jnp.ndarray:
        """Predict bond-type logits per half-edge -> [B, E, Ke].

        Reference bond_predictor.py:128-162: initial edge features are the
        concatenated endpoint node types; encoder runs with update_pos=False;
        decode from [h_edge_sym ‖ h_node_i + h_node_j].
        """
        b, n = h_node.shape[:2]
        pair_mask = graph_ops.pair_mask_from_node_mask(node_mask)

        # edge features = embed(concat[left node types ‖ right node types]);
        # decomposed as two O(N) matmuls + broadcast add instead of an O(N^2)
        # matmul over the materialized [B,N,N,2*Kn] concat (same math).
        kn = h_node.shape[-1]

        def embed_edge_raw(p):
            return linear_parts(
                p, (h_node[:, :, None, :], h_node[:, None, :, :]), (kn, kn)
            )

        if self.num_timesteps > 0:
            time_feat = self.time_emb(t.astype(jnp.float32))  # [B, time_dim]
            h_node_emb = jnp.concatenate(
                [
                    linear(params["node_embedder"], h_node),
                    jnp.broadcast_to(time_feat[:, None, :], (b, n, self.time_dim)),
                ],
                axis=-1,
            )
            h_edge_emb = jnp.concatenate(
                [
                    embed_edge_raw(params["edge_embedder"]),
                    jnp.broadcast_to(
                        time_feat[:, None, None, :], (b, n, n, self.time_dim)
                    ),
                ],
                axis=-1,
            )
            t_norm = (t.astype(jnp.float32) / max(self.num_timesteps, 1))[:, None, None]
        else:
            h_node_emb = linear(params["node_embedder"], h_node)
            h_edge_emb = embed_edge_raw(params["edge_embedder"])
            t_norm = jnp.zeros((b, 1, 1), dtype=jnp.float32)

        out = node_edge_net(
            params["encoder"],
            self.encoder_static,
            h_node_emb,
            pos_node,
            h_edge_emb,
            node_time=t_norm,
            edge_time=t_norm,
            pair_mask=pair_mask,
            pair_sharding=self.pair_sharding,
            node_mask=node_mask,
        )
        moe_aux = None
        if self.encoder_static.get("moe") is not None:
            h_node_out, _, h_edge_out, moe_aux = out
        else:
            h_node_out, _, h_edge_out = out

        iu, ju = graph_ops.triu_indices(n)
        h_half_sym = graph_ops.dense_to_halfedge(
            graph_ops.symmetrize_dense(h_edge_out)
        )
        h_node_pair = h_node_out[:, iu] + h_node_out[:, ju]
        pred = mlp(
            params["edge_decoder"],
            jnp.concatenate([h_half_sym, h_node_pair], axis=-1),
        )
        if return_moe_aux:
            return pred, moe_aux
        return pred

    def get_loss(
        self,
        params: dict,
        node_type: jnp.ndarray,      # [B, N] int32
        node_pos: jnp.ndarray,       # [B, N, 3]
        halfedge_type: jnp.ndarray,  # [B, E] int32 clean labels
        node_mask: jnp.ndarray,      # [B, N]
        key: jax.Array,
    ):
        """Weighted cross-entropy on half-edge logits (reference :84-124).

        Matches torch's CrossEntropyLoss(weight=w) semantics: the mean is
        normalized by the summed weights of the (real) targets.
        """
        b, n = node_type.shape
        halfedge_mask = graph_ops.halfedge_mask_from_node_mask(node_mask)

        if self.num_timesteps > 0:
            k_t, k_pos, k_node = jax.random.split(key, 3)
            t = sample_time_antithetic(k_t, b, self.num_timesteps)
            pos_pert, _ = self.pos_transition.add_noise(node_pos, t, k_pos)
            h_node, _, _ = self.node_transition.add_noise(node_type, t, k_node)
        else:
            t = None
            pos_pert = node_pos
            h_node = jax.nn.one_hot(node_type, self.num_node_types, dtype=jnp.float32)

        pred, moe_aux = self.forward(
            params, h_node, pos_pert, t, node_mask, return_moe_aux=True
        )  # [B,E,Ke]

        log_prob = jax.nn.log_softmax(pred, axis=-1)
        nll = -jnp.take_along_axis(log_prob, halfedge_type[..., None], axis=-1).squeeze(-1)
        w = self.edge_weight[halfedge_type] * halfedge_mask
        loss_edge = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-8)

        acc_real = masked_mean(
            (jnp.argmax(pred, -1) == halfedge_type).astype(jnp.float32),
            halfedge_mask * (halfedge_type > 0),
        )
        aux = {"loss": loss_edge, "loss_edge": loss_edge, "acc_bond": acc_real}
        loss = loss_edge
        if moe_aux is not None:
            aux["loss_moe"] = (
                self.encoder_static["moe"]["aux_weight"] * moe_aux
            )
            loss = loss + aux["loss_moe"]
            aux["loss"] = loss
        return loss, aux
