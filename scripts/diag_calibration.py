"""Diagnose the atom-type head's v0 calibration on training-style inputs.

Round-5 investigation of the element-marginal collapse: generated pools are
~99% carbon while the corpus is 74.6% C / 12.3% N / 9.0% O (round-4 5k soak
autopsy). This probe perturbs REAL corpus molecules with the forward
process at a ladder of timesteps (exactly what training sees) and records
the model's predicted v0 class distribution on real atoms, split by
currently-masked vs currently-revealed atoms.

If the model is calibrated here (mean predicted marginal ~= corpus
marginal) the collapse happens only on the reverse chain's own samples
(off-manifold drift / premature locking); if it already predicts ~99% C on
masked atoms here, training itself produced the bias.

Usage (CPU is fine, small batch):
    JAX_PLATFORMS=cpu python scripts/diag_calibration.py \
        --ckpt ckpts/flagship_v2.ckpt --root data/synthetic_xl2 [--json out]
"""
import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from moldiff_tpu.data.batching import pad_mols
from moldiff_tpu.data.featurize import featurizer_from_config
from moldiff_tpu.data.loader import featurize_record
from moldiff_tpu.data.record_store import RecordReader
from moldiff_tpu.models.moldiff import MolDiff
from moldiff_tpu.ops import graph_ops
from moldiff_tpu.train.trainer import load_checkpoint
from moldiff_tpu.utils.config import Config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/flagship_v2.ckpt")
    ap.add_argument("--root", default="data/synthetic_xl2")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n_max", type=int, default=32)
    ap.add_argument("--json", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ckpt = load_checkpoint(args.ckpt)
    cfg = Config(ckpt["config"])
    cfg.model.denoiser["remat"] = False
    feat = featurizer_from_config(cfg)
    model = MolDiff(
        cfg.model,
        num_node_types=feat.num_node_types,
        num_edge_types=feat.num_edge_types,
    )
    params = ckpt["params"]

    rr = RecordReader(os.path.join(args.root, "processed"))
    rng = np.random.default_rng(args.seed)
    mols = []
    i = 0
    while len(mols) < args.batch and i < len(rr):
        rec = pickle.loads(rr[i]) if isinstance(rr[i], bytes) else rr[i]
        if len(rec["element"]) <= args.n_max:
            mols.append(featurize_record(rec, feat, rng))
        i += 1
    batch = pad_mols(mols, n_max=args.n_max)
    node_type = jnp.asarray(batch.node_type)
    pos = jnp.asarray(batch.pos)
    halfedge_type = jnp.asarray(batch.halfedge_type)
    node_mask = jnp.asarray(batch.node_mask)
    he_mask = graph_ops.halfedge_mask_from_node_mask(node_mask)

    b = node_type.shape[0]
    key = jax.random.PRNGKey(args.seed)
    mask_cls = feat.num_node_types - 1  # tomask => mask is last class
    Kn = feat.num_node_types

    report = {"ckpt": args.ckpt, "t_ladder": [], "corpus_marginal": None}
    nm = np.asarray(node_mask).astype(bool)
    true_np = np.asarray(node_type)
    counts = np.bincount(true_np[nm], minlength=Kn)
    corpus_marg = counts / counts.sum()
    report["corpus_marginal"] = corpus_marg.round(4).tolist()
    print("corpus marginal (real atoms):", corpus_marg.round(3))

    fwd = jax.jit(
        lambda p, hn, ps, he, t, m: model.forward(p, hn, ps, he, t, m)
    )

    for t_val in [999, 900, 700, 500, 300, 100, 20]:
        key, k_pos, k_node, k_edge = jax.random.split(key, 4)
        t = jnp.full((b,), t_val, dtype=jnp.int32)
        pos_pert, _ = model.pos_transition.add_noise(pos, t, k_pos)
        h_node_pert, _, _ = model.node_transition.add_noise(node_type, t, k_node)
        h_he_pert, _, _ = model.edge_transition.add_noise(halfedge_type, t, k_edge)
        preds = fwd(params, h_node_pert, pos_pert, h_he_pert, t, node_mask)

        probs = np.asarray(jax.nn.softmax(preds.pred_node, axis=-1))
        pert_cls = np.asarray(jnp.argmax(h_node_pert, axis=-1))
        is_masked = (pert_cls == mask_cls) & nm
        is_reveal = (pert_cls != mask_cls) & nm

        row = {"t": t_val, "frac_masked": float(is_masked.sum() / nm.sum())}
        for name, sel in [("masked", is_masked), ("revealed", is_reveal)]:
            if sel.sum() == 0:
                continue
            p_sel = probs[sel]
            true_sel = true_np[sel]
            mean_marg = p_sel.mean(axis=0)
            acc = float((p_sel.argmax(-1) == true_sel).mean())
            het = (true_sel > 0) & (true_sel < mask_cls)
            het_acc = float((p_sel[het].argmax(-1) == true_sel[het]).mean()) if het.any() else None
            row[name] = {
                "n": int(sel.sum()),
                "mean_pred_marginal": mean_marg.round(4).tolist(),
                "acc": round(acc, 4),
                "hetero_acc": None if het_acc is None else round(het_acc, 4),
                "mean_prob_C": round(float(mean_marg[0]), 4),
            }
        report["t_ladder"].append(row)
        print(f"t={t_val:4d} masked_frac={row['frac_masked']:.3f}")
        for name in ("masked", "revealed"):
            if name in row:
                r = row[name]
                print(
                    f"   {name:9s} n={r['n']:5d} acc={r['acc']:.3f} "
                    f"hetero_acc={r['hetero_acc']} meanP(C)={r['mean_prob_C']:.3f} "
                    f"marg={np.array(r['mean_pred_marginal']).round(3)}"
                )

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
