"""Golden forward parity of the FULL network vs the reference torch code.

Loads the actual reference `NodeEdgeNet` / `MolDiff` from /root/reference
(with a pure-torch `scatter_sum` shim for the absent torch_scatter), pushes
IDENTICAL weights through `utils/convert.py`, and asserts the dense padded
JAX forward numerically matches the ragged torch forward on random graphs —
node / pos / edge heads, both `update_pos` settings (VERDICT r1 missing #2).

Reference: /root/reference/models/graph.py:298-396, models/model.py:204-234.
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from moldiff_tpu.models.denoiser import denoiser_static_config, node_edge_net
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.utils.convert import (
    convert_moldiff_state_dict,
    denoiser_from_torch,
)

REFERENCE_ROOT = "/root/reference"


def _scatter_sum(src, index, dim=0, dim_size=None):
    """Pure-torch torch_scatter.scatter_sum (index 1-D along ``dim``)."""
    if dim < 0:
        dim += src.dim()
    n = int(dim_size) if dim_size is not None else int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = n
    idx = index
    if idx.dim() < src.dim():
        view = [1] * src.dim()
        view[dim] = idx.numel()
        idx = idx.view(view).expand_as(src)
    return torch.zeros(shape, dtype=src.dtype).scatter_add_(dim, idx, src)


def _dead(*a, **k):  # pragma: no cover - dead-code import surface only
    raise NotImplementedError


def _install_shims():
    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")
        ts.scatter_sum = _scatter_sum
        ts.scatter_add = _scatter_sum
        ts.scatter_softmax = _dead
        ts.scatter_mean = _dead
        ts.scatter_max = _dead
        sys.modules["torch_scatter"] = ts
    # install each torch_geometric submodule independently: other tests
    # (data/convert_lmdb.py unpickle stubs) may have registered the parent
    # already, without the .nn subtree the reference imports
    tg = sys.modules.setdefault(
        "torch_geometric", types.ModuleType("torch_geometric")
    )
    if "torch_geometric.nn" not in sys.modules:
        tg_nn = types.ModuleType("torch_geometric.nn")
        tg_pool = types.ModuleType("torch_geometric.nn.pool")
        tg_nn.radius_graph = tg_nn.knn_graph = tg_nn.knn = _dead
        tg_pool.knn_graph = _dead
        tg_nn.pool = tg_pool
        tg.nn = tg_nn
        sys.modules["torch_geometric.nn"] = tg_nn
        sys.modules["torch_geometric.nn.pool"] = tg_pool


@pytest.fixture(scope="module")
def ref_graph():
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    _install_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module("models.graph")


@pytest.fixture(scope="module")
def ref_model(ref_graph):
    import importlib

    return importlib.import_module("models.model")


SIZES = [4, 6, 5]  # ragged molecule sizes; padded to N = 6
NPAD = 6


def _ragged_batch(rng, node_dim, edge_dim):
    """Random ragged graph batch + its dense padded mirror.

    Returns (torch inputs, jax inputs). Directed edge (l, r) lives at
    dense[b, l, r] (left = row = receiver; models/denoiser.py:186).
    Reference edge order: halfedges (i<j, triu row-major) then flipped
    (models/model.py:142-143).
    """
    offsets = np.cumsum([0] + SIZES[:-1])
    h_node_r, pos_r, edges, h_edge_r, batch_node = [], [], [], [], []
    h_node_d = np.zeros((len(SIZES), NPAD, node_dim), np.float32)
    pos_d = np.zeros((len(SIZES), NPAD, 3), np.float32)
    h_edge_d = np.zeros((len(SIZES), NPAD, NPAD, edge_dim), np.float32)
    mask = np.zeros((len(SIZES), NPAD), np.float32)
    for b, (s, off) in enumerate(zip(SIZES, offsets)):
        hn = rng.normal(size=(s, node_dim)).astype(np.float32)
        ps = rng.normal(size=(s, 3)).astype(np.float32)
        h_node_r.append(hn)
        pos_r.append(ps)
        h_node_d[b, :s] = hn
        pos_d[b, :s] = ps
        mask[b, :s] = 1.0
        batch_node += [b] * s
        iu, ju = np.triu_indices(s, k=1)
        fwd = np.stack([iu, ju], 0)
        ei = np.concatenate([fwd, fwd[::-1]], axis=1)  # directed: fwd then flip
        feats = rng.normal(size=(ei.shape[1], edge_dim)).astype(np.float32)
        for k in range(ei.shape[1]):
            l, r = ei[0, k], ei[1, k]
            h_edge_d[b, l, r] = feats[k]
        edges.append(ei + off)
        h_edge_r.append(feats)
    t_inputs = {
        "h_node": torch.from_numpy(np.concatenate(h_node_r)),
        "pos": torch.from_numpy(np.concatenate(pos_r)),
        "edge_index": torch.from_numpy(
            np.concatenate(edges, axis=1).astype(np.int64)
        ),
        "h_edge": torch.from_numpy(np.concatenate(h_edge_r)),
        "batch_node": np.array(batch_node),
    }
    j_inputs = {
        "h_node": jnp.asarray(h_node_d),
        "pos": jnp.asarray(pos_d),
        "h_edge": jnp.asarray(h_edge_d),
        "node_mask": jnp.asarray(mask),
    }
    return t_inputs, j_inputs


def _gather_dense_nodes(arr):
    """[B,N,...] dense -> ragged [sum(sizes), ...] in batch order."""
    return np.concatenate(
        [np.asarray(arr[b, :s]) for b, s in enumerate(SIZES)], axis=0
    )


def _gather_dense_edges(arr):
    """[B,N,N,...] dense -> ragged directed-edge order (fwd triu, then flip)."""
    out = []
    for b, s in enumerate(SIZES):
        iu, ju = np.triu_indices(s, k=1)
        out.append(np.asarray(arr[b, iu, ju]))
        out.append(np.asarray(arr[b, ju, iu]))
    return np.concatenate(out, axis=0)


@pytest.mark.parametrize("update_pos", [True, False])
def test_node_edge_net_parity(ref_graph, update_pos):
    node_dim, edge_dim, num_blocks, cutoff = 16, 8, 3, 10.0
    torch.manual_seed(0)
    ref = ref_graph.NodeEdgeNet(
        node_dim, edge_dim, num_blocks=num_blocks, cutoff=cutoff,
        use_gate=True, update_edge=True, update_pos=update_pos,
    ).eval()
    sd = {f"denoiser.{k}": v for k, v in ref.state_dict().items()}
    params = {"blocks": jax.tree.map(
        jnp.asarray,
        denoiser_from_torch(sd, "denoiser", num_blocks, use_gate=True,
                            update_edge=True, update_pos=update_pos)["blocks"],
    )}
    static = denoiser_static_config(
        num_blocks=num_blocks, cutoff=cutoff, use_gate=True,
        update_edge=True, update_pos=update_pos, remat=False,
    )

    rng = np.random.default_rng(42)
    ti, ji = _ragged_batch(rng, node_dim, edge_dim)
    t_per_graph = np.array([0.25, 0.8, 0.5], np.float32)
    node_time_r = torch.from_numpy(
        t_per_graph[ti["batch_node"]][:, None]
    )
    batch_edge = ti["batch_node"][ti["edge_index"][0].numpy()]
    edge_time_r = torch.from_numpy(t_per_graph[batch_edge][:, None])

    with torch.no_grad():
        hn_ref, pos_ref, he_ref = ref(
            ti["h_node"], ti["pos"], ti["h_edge"], ti["edge_index"],
            node_time_r, edge_time_r,
        )

    pair_mask = graph_ops.pair_mask_from_node_mask(ji["node_mask"])
    t_j = jnp.asarray(t_per_graph)[:, None, None]
    hn, pos, he = node_edge_net(
        params, static, ji["h_node"], ji["pos"], ji["h_edge"],
        node_time=t_j, edge_time=t_j, pair_mask=pair_mask, remat=False,
    )

    np.testing.assert_allclose(
        _gather_dense_nodes(hn), hn_ref.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        _gather_dense_nodes(pos), pos_ref.numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        _gather_dense_edges(he), he_ref.numpy(), rtol=2e-4, atol=2e-5
    )


def test_full_moldiff_forward_parity(ref_model):
    """End-to-end MolDiff.forward: embedders + time embed + denoiser +
    decoders + directed-edge symmetrization, converted weights."""
    from moldiff_tpu.models.moldiff import MolDiff
    from moldiff_tpu.utils.config import Config

    kn, ke = 8, 6
    cfg = Config({
        "name": "diffusion", "node_dim": 16, "edge_dim": 8,
        "denoiser": {"backbone": "NodeEdgeNet", "num_blocks": 2,
                     "cutoff": 10, "use_gate": True},
        "diff": {
            "num_timesteps": 20, "time_dim": 4,
            "categorical_space": "discrete",
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001,
                          "width": 3},
            "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001,
                          "width": 3},
        },
    })
    torch.manual_seed(1)
    ref = ref_model.MolDiff(cfg, kn, ke).eval()
    params = convert_moldiff_state_dict(
        {k: v for k, v in ref.state_dict().items()}, cfg
    )
    ours = MolDiff(cfg, kn, ke)

    rng = np.random.default_rng(7)
    # one-hot node / halfedge types; dense mirror built from the same draws
    b, n = len(SIZES), NPAD
    node_type = rng.integers(0, kn, (b, n))
    pos_d = rng.normal(size=(b, n, 3)).astype(np.float32)
    e = graph_ops.num_halfedges(n)
    he_type = rng.integers(0, ke, (b, e))
    t_steps = np.array([3, 17, 9], np.int64)
    mask = np.zeros((b, n), np.float32)
    for i, s in enumerate(SIZES):
        mask[i, :s] = 1.0

    # ragged torch inputs (reference get_loss layout, model.py:128-163)
    hn_r, pos_r, bn, he_r, ei, be = [], [], [], [], [], []
    off = 0
    iu_n, ju_n = graph_ops.triu_indices(n)
    for i, s in enumerate(SIZES):
        hn_r.append(np.eye(kn, dtype=np.float32)[node_type[i, :s]])
        pos_r.append(pos_d[i, :s])
        bn += [i] * s
        iu, ju = np.triu_indices(s, k=1)
        # half-edge features for real pairs, in the bucket's triu order
        # restricted to this molecule's size
        hid = graph_ops.halfedge_id_map(n)[iu, ju]
        he_r.append(np.eye(ke, dtype=np.float32)[he_type[i, hid]])
        fwd = np.stack([iu, ju], 0) + off
        ei.append(np.concatenate([fwd, fwd[::-1]], axis=1))
        be += [i] * (2 * len(iu))
        off += s
    h_node_t = torch.from_numpy(np.concatenate(hn_r))
    pos_t = torch.from_numpy(np.concatenate(pos_r))
    h_half = np.concatenate(he_r)
    h_edge_t = torch.from_numpy(np.concatenate([h_half, h_half]))
    # reference duplicates halfedges first-all-then-flipped GLOBALLY
    fwd_all = np.concatenate([x[:, : x.shape[1] // 2] for x in ei], axis=1)
    rev_all = np.concatenate([x[:, x.shape[1] // 2:] for x in ei], axis=1)
    edge_index_t = torch.from_numpy(
        np.concatenate([fwd_all, rev_all], axis=1).astype(np.int64)
    )
    batch_node_t = torch.from_numpy(np.array(bn, np.int64))
    nhalf = fwd_all.shape[1]
    batch_edge_t = torch.from_numpy(
        np.array([i for x, i in zip(he_r, range(b)) for _ in range(len(x))]
                 * 2, np.int64)
    )
    t_t = torch.from_numpy(t_steps)

    with torch.no_grad():
        out_ref = ref(
            h_node_t, pos_t, batch_node_t, h_edge_t, edge_index_t,
            batch_edge_t, t_t,
        )

    preds = ours.forward(
        params,
        jnp.asarray(np.eye(kn, dtype=np.float32)[node_type] * mask[..., None]),
        jnp.asarray(pos_d * mask[..., None]),
        jnp.asarray(np.eye(ke, dtype=np.float32)[he_type]),
        jnp.asarray(t_steps.astype(np.int32)),
        jnp.asarray(mask),
    )

    np.testing.assert_allclose(
        _gather_dense_nodes(preds.pred_node), out_ref["pred_node"].numpy(),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        _gather_dense_nodes(preds.pred_pos), out_ref["pred_pos"].numpy(),
        rtol=2e-4, atol=2e-5,
    )
    # our pred_halfedge is [B, E_bucket, ke]; gather real halfedges per mol
    ours_half = []
    for i, s in enumerate(SIZES):
        iu, ju = np.triu_indices(s, k=1)
        hid = graph_ops.halfedge_id_map(n)[iu, ju]
        ours_half.append(np.asarray(preds.pred_halfedge[i, hid]))
    np.testing.assert_allclose(
        np.concatenate(ours_half), out_ref["pred_halfedge"].numpy(),
        rtol=2e-4, atol=2e-5,
    )


@pytest.fixture(scope="module")
def ref_bondpred(ref_graph):
    import importlib

    return importlib.import_module("models.bond_predictor")


def test_bond_predictor_forward_parity(ref_bondpred):
    """BondPredictor.forward parity: endpoint-type edge embedding, encoder
    with update_pos=False, decode from [h_edge_sym ‖ h_node_i + h_node_j]
    (reference bond_predictor.py:128-162). Guidance gradients flow through
    this network, so its parity underwrites the guided sampler."""
    from moldiff_tpu.models.bond_predictor import BondPredictor
    from moldiff_tpu.utils.config import Config
    from moldiff_tpu.utils.convert import convert_bond_predictor_state_dict

    kn, ke = 8, 5  # no mask edge class at sample time (sample_drug3d.py:88)
    cfg = Config({
        "name": "bond_predictor", "node_dim": 16, "edge_dim": 8,
        "encoder": {"backbone": "NodeEdgeNet", "num_blocks": 2, "cutoff": 10,
                    "use_gate": True, "update_pos": False},
        "diff": {
            "num_timesteps": 20, "time_dim": 4,
            "categorical_space": "discrete",
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001,
                          "width": 3},
        },
    })
    torch.manual_seed(2)
    ref = ref_bondpred.BondPredictor(cfg, kn, ke).eval()
    params = convert_bond_predictor_state_dict(
        {k: v for k, v in ref.state_dict().items()}, cfg
    )
    ours = BondPredictor(cfg, kn, ke)

    rng = np.random.default_rng(11)
    b, n = len(SIZES), NPAD
    # soft node-type features (sampling feeds h_node_pert, not one-hots)
    h_node_d = rng.normal(size=(b, n, kn)).astype(np.float32)
    pos_d = rng.normal(size=(b, n, 3)).astype(np.float32)
    t_steps = np.array([2, 15, 9], np.int64)
    mask = np.zeros((b, n), np.float32)
    for i, s in enumerate(SIZES):
        mask[i, :s] = 1.0
        h_node_d[i, s:] = 0.0
        pos_d[i, s:] = 0.0

    hn_r, pos_r, bn, ei = [], [], [], []
    off = 0
    for i, s in enumerate(SIZES):
        hn_r.append(h_node_d[i, :s])
        pos_r.append(pos_d[i, :s])
        bn += [i] * s
        iu, ju = np.triu_indices(s, k=1)
        fwd = np.stack([iu, ju], 0) + off
        ei.append(fwd)
        off += s
    fwd_all = np.concatenate(ei, axis=1)
    edge_index_t = torch.from_numpy(
        np.concatenate([fwd_all, fwd_all[::-1]], axis=1).astype(np.int64)
    )
    nhalf_per = [len(x[0]) for x in ei]
    batch_edge = np.concatenate(
        [np.full(c, i, np.int64) for i, c in enumerate(nhalf_per)]
    )
    batch_edge_t = torch.from_numpy(np.concatenate([batch_edge, batch_edge]))

    with torch.no_grad():
        pred_ref = ref(
            torch.from_numpy(np.concatenate(hn_r)),
            torch.from_numpy(np.concatenate(pos_r)),
            torch.from_numpy(np.array(bn, np.int64)),
            edge_index_t, batch_edge_t, torch.from_numpy(t_steps),
        )

    pred = ours.forward(
        params, jnp.asarray(h_node_d), jnp.asarray(pos_d),
        jnp.asarray(t_steps.astype(np.int32)), jnp.asarray(mask),
    )
    ours_half = []
    for i, s in enumerate(SIZES):
        iu, ju = np.triu_indices(s, k=1)
        hid = graph_ops.halfedge_id_map(n)[iu, ju]
        ours_half.append(np.asarray(pred[i, hid]))
    np.testing.assert_allclose(
        np.concatenate(ours_half), pred_ref.numpy(), rtol=2e-4, atol=2e-5
    )


def _moldiff_cfg(space: str):
    from moldiff_tpu.utils.config import Config

    d = {
        "name": "diffusion", "node_dim": 16, "edge_dim": 8,
        "bond_len_loss": True,
        "denoiser": {"backbone": "NodeEdgeNet", "num_blocks": 2,
                     "cutoff": 10, "use_gate": True},
        "diff": {
            "num_timesteps": 20, "time_dim": 4,
            "categorical_space": space,
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001,
                          "width": 3},
            "diff_bond": {"init_prob": "absorb", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001,
                          "width": 3},
        },
    }
    if space == "continuous":
        d["diff"]["scaling"] = [1.0, 4.0, 8.0]
    return Config(d)


@pytest.mark.parametrize("space", ["discrete", "continuous"])
def test_get_loss_parity(ref_model, monkeypatch, space):
    """GOLDEN get_loss parity vs the reference torch MolDiff.get_loss
    (model.py:128-201): identical converted weights AND identical injected
    perturbations (both sides' sample_time/add_noise are monkeypatched to
    the same precomputed draws), so every loss component — masked-mean pos
    MSE, bond-length MSE, 100x categorical KLs (discrete) / 30x scaled-
    one-hot MSEs (continuous) — must match the ragged torch computation.
    Includes a t=0 graph to exercise the decoder-NLL branch of
    compute_v_Lt (transition.py:317-329)."""
    import moldiff_tpu.models.moldiff as moldiff_mod
    from moldiff_tpu.models.moldiff import MolDiff

    kn, ke = 8, 6
    cfg = _moldiff_cfg(space)
    torch.manual_seed(3)
    ref = ref_model.MolDiff(cfg, kn, ke).eval()
    params = convert_moldiff_state_dict(
        {k: v for k, v in ref.state_dict().items()}, cfg
    )
    ours = MolDiff(cfg, kn, ke)

    rng = np.random.default_rng(23)
    b, n = len(SIZES), NPAD
    e = graph_ops.num_halfedges(n)
    node_type = rng.integers(0, kn, (b, n))
    pos_d = (rng.normal(size=(b, n, 3)) * 1.5).astype(np.float32)
    he_type = rng.integers(0, ke, (b, e))
    mask = np.zeros((b, n), np.float32)
    for i, s in enumerate(SIZES):
        mask[i, :s] = 1.0
        pos_d[i, s:] = 0.0
    t_steps = np.array([0, 17, 9], np.int64)  # t=0 hits the NLL branch
    t_j = jnp.asarray(t_steps.astype(np.int32))

    # ---- precompute ONE set of perturbations (our transitions, fixed key)
    key = jax.random.key(5)
    k_pos, k_node, k_edge = jax.random.split(key, 3)
    pos_pert = ours.pos_transition.add_noise(jnp.asarray(pos_d), t_j, k_pos)[0]
    node_pert = ours.node_transition.add_noise(
        jnp.asarray(node_type), t_j, k_node
    )
    edge_pert = ours.edge_transition.add_noise(
        jnp.asarray(he_type), t_j, k_edge
    )

    # ---- inject into OUR get_loss
    monkeypatch.setattr(
        moldiff_mod, "sample_time_antithetic", lambda k, nb, T: t_j
    )
    monkeypatch.setattr(
        ours.pos_transition, "add_noise", lambda x, t, key: (pos_pert, None)
    )
    monkeypatch.setattr(
        ours.node_transition, "add_noise", lambda v, t, key: node_pert
    )
    monkeypatch.setattr(
        ours.edge_transition, "add_noise", lambda v, t, key: edge_pert
    )

    # ---- ragged mirrors for the reference
    hid_map = graph_ops.halfedge_id_map(n)
    pos_r, nt_r, het_r, bn, bh, hei = [], [], [], [], [], []
    pp_r = []
    node_tuple_r = [[] for _ in node_pert]
    edge_tuple_r = [[] for _ in edge_pert]
    off = 0
    for i, s in enumerate(SIZES):
        pos_r.append(pos_d[i, :s])
        pp_r.append(np.asarray(pos_pert[i, :s]))
        nt_r.append(node_type[i, :s])
        bn += [i] * s
        for k_, arr in enumerate(node_pert):
            node_tuple_r[k_].append(np.asarray(arr[i, :s]))
        iu, ju = np.triu_indices(s, k=1)
        hid = hid_map[iu, ju]
        het_r.append(he_type[i, hid])
        for k_, arr in enumerate(edge_pert):
            edge_tuple_r[k_].append(np.asarray(arr[i, hid]))
        bh += [i] * len(iu)
        hei.append(np.stack([iu, ju], 0) + off)
        off += s

    tt = lambda lst: torch.from_numpy(np.concatenate(lst))
    t_t = torch.from_numpy(t_steps)
    monkeypatch.setattr(
        ref, "sample_time",
        lambda nb, device, **kw: (t_t, torch.ones(nb) / 20.0),
    )
    pos_pert_t = tt(pp_r)
    monkeypatch.setattr(
        ref.pos_transition, "add_noise", lambda x, ts, batch: pos_pert_t
    )
    node_pert_t = tuple(tt(x) for x in node_tuple_r)
    edge_pert_t = tuple(tt(x) for x in edge_tuple_r)
    monkeypatch.setattr(
        ref.node_transition, "add_noise", lambda v, ts, batch: node_pert_t
    )
    monkeypatch.setattr(
        ref.edge_transition, "add_noise", lambda v, ts, batch: edge_pert_t
    )

    with torch.no_grad():
        ref_losses = ref.get_loss(
            tt([np.eye(kn, dtype=np.float32)[x] for x in nt_r]),
            tt(pos_r),
            torch.from_numpy(np.array(bn, np.int64)),
            torch.from_numpy(np.concatenate(het_r).astype(np.int64)),
            torch.from_numpy(
                np.concatenate(hei, axis=1).astype(np.int64)
            ),
            torch.from_numpy(np.array(bh, np.int64)),
            num_mol=b,
        )

    _, losses = ours.get_loss(
        params,
        jnp.asarray(node_type.astype(np.int32)),
        jnp.asarray(pos_d),
        jnp.asarray(he_type.astype(np.int32)),
        jnp.asarray(mask),
        jax.random.key(0),  # unused: all draws injected above
    )

    for name in ("loss", "loss_pos", "loss_node", "loss_edge", "loss_len"):
        np.testing.assert_allclose(
            np.asarray(losses[name]), ref_losses[name].item(),
            rtol=3e-4, atol=3e-5, err_msg=name,
        )


def test_export_roundtrip_moldiff(ref_model):
    """Reverse converter: torch -> jax -> torch round-trips EVERY trainable
    parameter bit-exactly, and the exported key set equals the reference
    model's named_parameters (so nothing trainable is silently dropped).
    Inverse of convert_moldiff_state_dict (utils/convert.py)."""
    from moldiff_tpu.utils.convert import export_moldiff_state_dict

    cfg = _moldiff_cfg("discrete")
    torch.manual_seed(4)
    ref = ref_model.MolDiff(cfg, 8, 6).eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    params = convert_moldiff_state_dict(sd, cfg)
    exported = export_moldiff_state_dict(params)

    # schedule constants live as requires_grad=False Parameters on the
    # transition modules (to_torch_const, diffusion.py:41) and are rebuilt
    # from the config — everything else must round-trip
    _derived = ("pos_transition.", "node_transition.", "edge_transition.")
    want_keys = {k for k, _ in ref.named_parameters()
                 if not k.startswith(_derived)}
    assert set(exported) == want_keys
    for k in sorted(want_keys):
        np.testing.assert_array_equal(
            exported[k], sd[k].numpy(), err_msg=k
        )
    # a fresh differently-initialized reference model accepts the export
    torch.manual_seed(99)
    ref2 = ref_model.MolDiff(cfg, 8, 6).eval()
    missing, unexpected = ref2.load_state_dict(
        {k: torch.from_numpy(v) for k, v in exported.items()}, strict=False
    )
    assert not unexpected
    # missing = derived constants only: transition schedules, Gaussian
    # smearing offsets (time_emb.*, denoiser.distance_expansion.*)
    assert all(
        m.startswith(_derived) or "time_emb" in m
        or "distance_expansion" in m
        for m in missing
    )
    for k in want_keys:
        assert torch.equal(dict(ref2.named_parameters())[k],
                           dict(ref.named_parameters())[k]), k


def test_export_roundtrip_bond_predictor(ref_bondpred):
    from moldiff_tpu.utils.convert import (
        convert_bond_predictor_state_dict,
        export_bond_predictor_state_dict,
    )
    from moldiff_tpu.utils.config import Config

    cfg = Config({
        "name": "bond_predictor", "node_dim": 16, "edge_dim": 8,
        "encoder": {"backbone": "NodeEdgeNet", "num_blocks": 2, "cutoff": 10,
                    "use_gate": True, "update_pos": False},
        "diff": {
            "num_timesteps": 20, "time_dim": 4,
            "categorical_space": "discrete",
            "diff_pos": {"beta_schedule": "advance", "scale_start": 0.9999,
                         "scale_end": 0.0001, "width": 3},
            "diff_atom": {"init_prob": "tomask", "beta_schedule": "advance",
                          "scale_start": 0.9999, "scale_end": 0.0001,
                          "width": 3},
        },
    })
    torch.manual_seed(5)
    ref = ref_bondpred.BondPredictor(cfg, 8, 5).eval()
    sd = {k: v for k, v in ref.state_dict().items()}
    params = convert_bond_predictor_state_dict(sd, cfg)
    exported = export_bond_predictor_state_dict(params)
    _derived = ("pos_transition.", "node_transition.", "edge_transition.")
    want_keys = {k for k, _ in ref.named_parameters()
                 if not k.startswith(_derived)}
    assert set(exported) == want_keys
    for k in sorted(want_keys):
        np.testing.assert_array_equal(exported[k], sd[k].numpy(), err_msg=k)
