"""Host-side sampling pipeline: generate-until-N with bucketed jitted chains.

TPU-native analogue of the reference sampling loop
(`/root/reference/scripts/sample_drug3d.py:100-170`):

  draw sizes ~ N(24.9, 5.5) -> group by bucket -> per-bucket jitted
  T-step reverse chain (compiled once per bucket) -> unpad -> decode ->
  first-party sanitize cascade -> pool {finished, failed}

Failed molecules (reconstruction error or disconnected SMILES) are tracked
like the reference's `failed` pool with the 3x abort cap.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..chem.mol import MolError
from ..chem.sanitize import reconstruct_from_generated
from ..chem.smiles import mol_to_smiles
from ..data.batching import DEFAULT_BUCKETS, node_mask_from_counts, unpad_arrays
from ..data.featurize import GEOM_DRUG_SIZE_MEAN, GEOM_DRUG_SIZE_STD, MolFeaturizer
from ..parallel.mesh import batch_sharding, replicated


class MolSampler:
    """Wraps a MolDiff model (+ optional bond predictor guidance) with
    per-bucket compiled sample functions and the decode/reconstruct path."""

    def __init__(
        self,
        model,
        featurizer: MolFeaturizer,
        bond_predictor=None,           # (BondPredictor, params) or None
        guidance: Optional[Tuple[str, float]] = None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        batch_size: int = 128,
        size_mean: float = GEOM_DRUG_SIZE_MEAN,
        size_std: float = GEOM_DRUG_SIZE_STD,
        mesh=None,
        add_edge: Optional[str] = None,
        chunk_steps: Optional[int] = None,
        guidance_interval: int = 1,
        num_steps: Optional[int] = None,
        pos_sampler: str = "ddpm",
        eta: float = 0.0,
        respace_gamma: float = 1.0,
        recon_workers: int = 0,
        sanitize_mode: str = "reference",
        commit: str = "none",
        edge_guidance: float = 0.0,
        edge_guidance_tmax: Optional[int] = None,
    ):
        self.model = model
        self.featurizer = featurizer
        self.bond_predictor = bond_predictor
        self.guidance = guidance
        # the guidance scale is a RUNTIME argument of the compiled chains
        # (models/moldiff.py scan body), so sweeping it never recompiles;
        # mutate via set_guidance_scale between generate() calls
        self._gui_scale = float(guidance[1]) if guidance is not None else 0.0
        self.buckets = tuple(sorted(buckets))
        self.batch_size = batch_size
        self.size_mean = size_mean
        self.size_std = size_std
        # data-parallel sampling: batch sharded over the mesh, params
        # replicated; partitionable threefry keeps results identical to
        # single-device for the same key
        self.mesh = mesh
        self.add_edge = add_edge
        # acceptance semantics of the sanitize cascade: "reference" (the
        # headline metric — reference-exact fix_aromatic search) or "repo"
        # (documented more-general search; chem/sanitize.py)
        self.sanitize_mode = sanitize_mode
        # chunk the reverse chain into shorter device executions (needed for
        # guided sampling: one full-chain execution can exceed runtime RPC
        # deadlines); None = single lax.scan
        self.chunk_steps = chunk_steps
        # apply guidance every k-th step (1 = reference-exact every step)
        self.guidance_interval = guidance_interval
        # respaced reverse chain: run S << T evenly-spaced steps
        # (models/moldiff.py:_respaced); None = full reference-exact chain
        self.num_steps = num_steps
        # position-chain sampler: 'ddpm' ancestral (reference-exact) or
        # 'ddim' with noise level eta (ops/gaussian.py:ddim_prev)
        self.pos_sampler = pos_sampler
        self.eta = float(eta)
        # spacing warp for the respaced chain (ops/respace.py: gamma > 1
        # concentrates steps near t=0, the late-denoising phase)
        self.respace_gamma = float(respace_gamma)
        # carry-over unmasking for the categorical chains
        # (models/moldiff.py sample ``commit``): 'none' | 'nodes' | 'edges'
        # | 'both'. 'none' is reference-exact.
        self.commit = commit
        # class-space bond guidance: mix the bond predictor's log-probs into
        # the edge v0 prediction at every step, scaled by this factor
        # (models/moldiff.py sample ``edge_guidance``). 0 = off
        # (reference-exact); > 0 requires ``bond_predictor``.
        self.edge_guidance = float(edge_guidance)
        # apply edge guidance only at original timesteps t < tmax (late,
        # near-clean-geometry end of the chain); None = every step
        self.edge_guidance_tmax = (
            int(edge_guidance_tmax) if edge_guidance_tmax else None)
        if self.edge_guidance > 0 and bond_predictor is None:
            raise ValueError("edge_guidance requires a bond_predictor")
        # host-side reconstruction workers: 0/1 = serial. The device chain
        # is ~1.25 ms/mol of host sanitize work away from the pool; at
        # respaced (~127 mols/s/chip) or multi-chip throughput the serial
        # classify loop becomes the e2e bottleneck, so generate() fans
        # classify_decoded over a spawn Pool (reference parallelizes its
        # host-side chemistry the same way, utils/evaluation.py:142)
        self.recon_workers = int(recon_workers)
        if mesh is not None and batch_size % mesh.size != 0:
            raise ValueError(
                f"batch_size {batch_size} must divide mesh size {mesh.size}"
            )
        self._compiled: Dict[int, callable] = {}
        # device-side trajectory gather: select k molecules out of the batch
        # BEFORE the host transfer, so saving trajectories for the Bernoulli
        # 2% doesn't pull the full [T+1, B, ...] stack over the wire. jit
        # re-specializes per (bucket, k) shape; k is padded to a power of two
        # to bound the compile count at log2(B) per bucket.
        self._traj_gather = jax.jit(
            lambda traj, idx: jax.tree.map(
                lambda y: jnp.take(y, idx, axis=1), traj
            )
        )

    def set_guidance_scale(self, scale: float) -> None:
        """Change the guidance scale for subsequent calls WITHOUT recompiling
        (the scale is a runtime argument of the compiled chains). The
        guidance type stays fixed per sampler."""
        if self.guidance is None:
            raise ValueError("sampler was built without guidance")
        self._gui_scale = float(scale)
        self.guidance = (self.guidance[0], float(scale))

    def _sample_fn(self, n_bucket: int, save_traj: bool = False):
        cache_key = (n_bucket, save_traj)
        if cache_key not in self._compiled:
            if self.chunk_steps:
                # host-chunked chain; the per-chunk scans are jitted inside.
                # save_traj works here too (per-chunk stacked states are
                # pulled to host), so guided trajectory saving never exceeds
                # one chunk's device execution time.
                data = batch_sharding(self.mesh) if self.mesh is not None else None

                def fn(params, node_mask, key):
                    guidance = (
                        (self.guidance[0], self._gui_scale)
                        if self.guidance is not None else None
                    )
                    res = self.model.sample_chunked(
                        params, node_mask, key, chunk_size=self.chunk_steps,
                        guidance=guidance,
                        bond_predictor=self.bond_predictor,
                        data_sharding=data,
                        guidance_interval=self.guidance_interval,
                        save_traj=save_traj,
                        num_steps=self.num_steps,
                        pos_sampler=self.pos_sampler, eta=self.eta,
                        respace_gamma=self.respace_gamma,
                        commit=self.commit,
                        edge_guidance=self.edge_guidance,
                        edge_guidance_tmax=self.edge_guidance_tmax,
                    )
                    return res.pred_node, res.pred_pos, res.pred_halfedge, res.traj

                self._compiled[cache_key] = fn
                return fn

            if self.mesh is not None:
                rep = replicated(self.mesh)
                data = batch_sharding(self.mesh)
                jit_kw = {"in_shardings": (rep, data, rep, rep)}
            else:
                jit_kw = {}

            if self.guidance is not None:
                gtype = self.guidance[0]

                def fn4(params, node_mask, key, gui_scale):
                    res = self.model.sample(
                        params, node_mask, key,
                        guidance=(gtype, gui_scale),
                        bond_predictor=self.bond_predictor,
                        save_traj=save_traj,
                        guidance_interval=self.guidance_interval,
                        num_steps=self.num_steps,
                        pos_sampler=self.pos_sampler, eta=self.eta,
                        respace_gamma=self.respace_gamma,
                        commit=self.commit,
                        edge_guidance=self.edge_guidance,
                        edge_guidance_tmax=self.edge_guidance_tmax,
                    )
                    return res.pred_node, res.pred_pos, res.pred_halfedge, res.traj

                jfn = jax.jit(fn4, **jit_kw)

                def fn(params, node_mask, key):
                    return jfn(
                        params, node_mask, key, jnp.float32(self._gui_scale)
                    )

                self._compiled[cache_key] = fn
                return fn

            def fn(params, node_mask, key):
                res = self.model.sample(
                    params, node_mask, key,
                    guidance=None,
                    bond_predictor=self.bond_predictor,
                    save_traj=save_traj,
                    guidance_interval=self.guidance_interval,
                    num_steps=self.num_steps,
                    pos_sampler=self.pos_sampler, eta=self.eta,
                    respace_gamma=self.respace_gamma,
                    commit=self.commit,
                    edge_guidance=self.edge_guidance,
                    edge_guidance_tmax=self.edge_guidance_tmax,
                )
                return res.pred_node, res.pred_pos, res.pred_halfedge, res.traj

            if self.mesh is not None:
                rep = replicated(self.mesh)
                data = batch_sharding(self.mesh)
                self._compiled[cache_key] = jax.jit(
                    fn, in_shardings=(rep, data, rep)
                )
            else:
                self._compiled[cache_key] = jax.jit(fn)
        return self._compiled[cache_key]

    def sample_with_traj(self, params, sizes: np.ndarray, key: jax.Array):
        """Like sample_sizes but also returns the full denoising trajectory
        (reference save_traj_prob path, scripts/sample_drug3d.py:166-170).
        All sizes must fit one bucket; one batch only."""
        n_bucket = next(bk for bk in self.buckets if max(sizes) <= bk)
        counts = np.asarray(sizes, dtype=np.int32)
        node_mask = node_mask_from_counts(counts, n_bucket)
        fn = self._sample_fn(n_bucket, save_traj=True)
        pred_node, pred_pos, pred_halfedge, traj = fn(params, node_mask, key)
        per_mol = unpad_arrays(
            {
                "pred_node": np.asarray(pred_node),
                "pred_pos": np.asarray(pred_pos),
                "pred_halfedge": np.asarray(pred_halfedge),
            },
            counts,
        )
        decoded = [
            self.featurizer.decode_output(
                p["pred_node"], p["pred_pos"], p["pred_halfedge"]
            )
            for p in per_mol
        ]
        traj_np = tuple(np.asarray(t) for t in traj)  # (node, pos, halfedge)
        return decoded, traj_np, counts

    def draw_sizes(self, n_graphs: int, rng: np.random.Generator) -> np.ndarray:
        """Sizes ~ N(mean, std) clipped to [3, max bucket] (reference
        utils/transforms.py:125-135)."""
        sizes = rng.normal(self.size_mean, self.size_std, size=n_graphs)
        return np.clip(sizes.astype(np.int64), 3, self.buckets[-1])

    def sample_sizes(
        self, params, sizes: np.ndarray, key: jax.Array,
        save_traj: bool = False,
    ):
        """Run the reverse chain for molecules of the given sizes; returns
        per-molecule decoded dicts (element/pos/bond arrays, pre-sanitize).
        Sizes are grouped by bucket; each group runs in fixed-size batches
        (padded with throwaway graphs) so compile count stays ~len(buckets).

        With ``save_traj`` returns ``(decoded_list, traj_refs)`` where
        ``traj_refs[i]`` is a handle that fetches molecule i's full
        denoising trajectory on demand (``_TrajRef.fetch()``); untouched
        batches never transfer their [T+1, B, ...] stacks to host."""
        out: List[dict] = [None] * len(sizes)
        traj_refs: List[Optional["_TrajRef"]] = [None] * len(sizes)
        order = np.argsort(sizes, kind="stable")
        by_bucket: Dict[int, List[int]] = {}
        for idx in order:
            n = int(sizes[idx])
            b = next(bk for bk in self.buckets if n <= bk)
            by_bucket.setdefault(b, []).append(int(idx))

        for n_bucket, idxs in sorted(by_bucket.items()):
            fn = self._sample_fn(n_bucket, save_traj=save_traj)
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start:start + self.batch_size]
                counts = np.array([sizes[i] for i in chunk], dtype=np.int32)
                # pad to the fixed batch size with throwaway graphs
                pad = self.batch_size - len(chunk)
                if pad:
                    counts = np.concatenate([counts, np.full(pad, 3, np.int32)])
                node_mask = node_mask_from_counts(counts, n_bucket)
                key, k = jax.random.split(key)
                pred_node, pred_pos, pred_halfedge, traj = fn(
                    params, node_mask, k
                )
                per_mol = unpad_arrays(
                    {
                        "pred_node": np.asarray(pred_node),
                        "pred_pos": np.asarray(pred_pos),
                        "pred_halfedge": np.asarray(pred_halfedge),
                    },
                    counts,
                )
                batch_ref = _TrajBatch(self, traj, counts) if save_traj else None
                for local_i, global_i in enumerate(chunk):
                    p = per_mol[local_i]
                    out[global_i] = self.featurizer.decode_output(
                        p["pred_node"], p["pred_pos"], p["pred_halfedge"]
                    )
                    if save_traj:
                        traj_refs[global_i] = _TrajRef(batch_ref, local_i)
        if save_traj:
            return out, traj_refs
        return out

    def generate(
        self,
        params,
        num_mols: int,
        key: jax.Array,
        rng: Optional[np.random.Generator] = None,
        max_failures_factor: int = 3,
        batch_graphs: Optional[int] = None,
        logger=None,
        traj_prob: float = 0.0,
    ) -> Dict[str, list]:
        """Generate until `num_mols` valid molecules (reference
        scripts/sample_drug3d.py:100-170). Returns pool dict with entries
        {mol, smiles, decoded} under 'finished' and {decoded, reason} under
        'failed'.

        ``traj_prob``: each FINISHED molecule independently keeps its full
        denoising trajectory with this probability (reference per-molecule
        Bernoulli(save_traj_prob), scripts/sample_drug3d.py:156-170) — the
        entry gains a 'traj' dict of [T+1, n]/[T+1, e] arrays. A 10k-mol run
        at 0.02 therefore saves ~200 trajectories, not a fixed cap."""
        rng = rng or np.random.default_rng(0)
        batch_graphs = batch_graphs or self.batch_size
        pool = {"finished": [], "failed": []}
        save_traj = traj_prob > 0.0
        workers = _make_classify_pool(self.recon_workers)
        try:
            return self._generate_loop(
                params, num_mols, key, rng, max_failures_factor,
                batch_graphs, logger, traj_prob, save_traj, pool, workers,
            )
        finally:
            if workers is not None:
                workers.terminate()
                workers.join()

    def _generate_loop(
        self, params, num_mols, key, rng, max_failures_factor,
        batch_graphs, logger, traj_prob, save_traj, pool, workers,
    ):
        while len(pool["finished"]) < num_mols:
            if len(pool["failed"]) > max_failures_factor * num_mols:
                if logger:
                    logger.warning("too many failed molecules, aborting")
                break
            sizes = self.draw_sizes(batch_graphs, rng)
            key, k = jax.random.split(key)
            if save_traj:
                decoded_list, traj_refs = self.sample_sizes(
                    params, sizes, k, save_traj=True
                )
            else:
                decoded_list = self.sample_sizes(params, sizes, k)
                traj_refs = [None] * len(decoded_list)
            entries = _classify_batch(
                decoded_list, self.add_edge, workers, self.sanitize_mode
            )
            want_traj: List[Tuple[dict, "_TrajRef"]] = []
            for entry, ref in zip(entries, traj_refs):
                if (
                    entry["pool"] == "finished"
                    and save_traj
                    and rng.random() < traj_prob
                ):
                    want_traj.append((entry, ref))
            # fetch all selected trajectories batch-wise (one device gather
            # + host transfer per touched batch, selected molecules only)
            for batch in {ref.batch for _, ref in want_traj}:
                batch.prefetch([r.local_i for e, r in want_traj
                                if r.batch is batch])
            for entry, ref in want_traj:
                entry["traj"] = ref.fetch()
            for entry in entries:
                pool[entry["pool"]].append(entry)
            if logger:
                logger.info(
                    f"pool: finished {len(pool['finished'])} | "
                    f"failed {len(pool['failed'])}"
                )
        pool["finished"] = pool["finished"][:num_mols]
        return pool


class _TrajBatch:
    """Lazily-fetched trajectories of one sampled batch.

    Holds the stacked (node, pos, halfedge) trajectory of a whole batch —
    device arrays on the single-scan path, host numpy on the chunked path —
    and fetches only the requested molecules. Device-side selection pads the
    index list to the next power of two so the gather jit compiles at most
    log2(B) times per bucket."""

    def __init__(self, sampler: "MolSampler", traj, counts: np.ndarray):
        self.sampler = sampler
        self.traj = traj
        self.counts = counts
        self._fetched: Dict[int, dict] = {}

    def prefetch(self, local_idxs: Sequence[int]) -> None:
        from ..data.batching import split_trajectories

        idxs = sorted(set(local_idxs) - set(self._fetched))
        if not idxs:
            return
        sel = np.asarray(idxs, dtype=np.int32)
        if isinstance(self.traj[0], np.ndarray):
            sub = tuple(t[:, sel] for t in self.traj)
        else:
            k_pad = 1 << max(0, int(len(sel) - 1).bit_length())
            idx_dev = jnp.asarray(
                np.pad(sel, (0, k_pad - len(sel))), dtype=jnp.int32
            )
            sub = jax.device_get(self.sampler._traj_gather(self.traj, idx_dev))
            sub = tuple(t[:, : len(sel)] for t in sub)
        per_mol = split_trajectories(sub, self.counts[sel])
        for i, tr in zip(idxs, per_mol):
            self._fetched[i] = tr

    def fetch(self, local_i: int) -> dict:
        self.prefetch([local_i])
        return self._fetched[local_i]


class _TrajRef:
    """Handle to one molecule's trajectory inside a `_TrajBatch`."""

    def __init__(self, batch: _TrajBatch, local_i: int):
        self.batch = batch
        self.local_i = local_i

    def fetch(self) -> dict:
        return self.batch.fetch(self.local_i)


def _classify_pool_init():
    # spawn workers re-run sitecustomize (which pre-imports jax); pin them
    # to CPU before anything touches a backend so they never contend for
    # the TPU chip the parent holds (see NOTES_r2.md "CLI platform hang")
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from ..utils.misc import force_platform_from_env

    force_platform_from_env()


def _classify_job(args):
    decoded, add_edge, sanitize_mode = args
    return classify_decoded(decoded, add_edge=add_edge,
                            sanitize_mode=sanitize_mode)


def _make_classify_pool(workers: int):
    """Spawn-context Pool for host-side reconstruction, or None for serial.

    'spawn' (not fork): the parent holds a live TPU client whose threads and
    locks must not be inherited mid-state."""
    if workers is None or workers <= 1:
        return None
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    return ctx.Pool(int(workers), initializer=_classify_pool_init)


def _classify_batch(decoded_list, add_edge, workers=None,
                    sanitize_mode: str = "reference") -> list:
    """classify_decoded over a batch; parallel when a Pool is given."""
    if workers is None:
        return [classify_decoded(d, add_edge=add_edge,
                                 sanitize_mode=sanitize_mode)
                for d in decoded_list]
    return workers.map(
        _classify_job,
        [(d, add_edge, sanitize_mode) for d in decoded_list], chunksize=16,
    )


def classify_decoded(decoded: dict, add_edge: Optional[str] = None,
                     sanitize_mode: str = "reference") -> dict:
    """Decode dict -> pool entry: sanitize cascade + disconnect check
    (reference scripts/sample_drug3d.py:142-170).

    ``add_edge``: None uses the model's predicted bonds; 'distance' (the
    reference's 'edm' path, utils/reconstruct.py:204-212) re-perceives bonds
    from interatomic distances instead.

    The pool entry carries ``stage`` (which cascade stage accepted the
    molecule: sanitize / fix_aromatic / fix_valence / fix_aromatic_strict)
    so soak evidence can report the failure-mode taxonomy.
    """
    stats: dict = {}
    try:
        if add_edge in ("distance", "edm"):
            from ..chem.bond_perception import mol_from_positions
            from ..chem.sanitize import sanitize

            # distance-perceived bonds carry no aromatic class, so the fix
            # cascade has nothing to search — but the sanitize acceptance
            # itself must still follow sanitize_mode (reference = RDKit-
            # faithful, no invented [nH]; round-4 advisor finding: the knob
            # was silently inert on this path)
            mol = sanitize(
                mol_from_positions(decoded["element"], decoded["atom_pos"]),
                auto_pyrrole=(sanitize_mode != "reference"),
            )
            stats["stage"] = "sanitize"
        elif add_edge == "connect":
            # connect-the-dots + geometric order perception (the reference's
            # OpenBabel fallback, utils/reconstruct.py:392-451) — aromatic
            # rings perceived from geometry, so the full fix cascade applies
            from ..chem.bond_perception import mol_from_positions_ctd

            perceived = mol_from_positions_ctd(
                decoded["element"], decoded["atom_pos"])
            bi = np.array([[b.i for b in perceived.bonds],
                           [b.j for b in perceived.bonds]], dtype=np.int64)
            bt = np.array([b.order for b in perceived.bonds], dtype=np.int64)
            mol = reconstruct_from_generated(
                decoded["element"], decoded["atom_pos"], bi, bt,
                mode=sanitize_mode, stats=stats,
            )
        else:
            mol = reconstruct_from_generated(
                decoded["element"],
                decoded["atom_pos"],
                decoded.get("bond_index"),
                decoded.get("bond_type"),
                mode=sanitize_mode,
                stats=stats,
            )
    except MolError:
        return {"pool": "failed", "decoded": decoded, "reason": "recon_error"}
    try:
        smiles = mol_to_smiles(mol)
    except Exception:
        return {"pool": "failed", "decoded": decoded, "reason": "smiles_error"}
    if "." in smiles:
        return {
            "pool": "failed", "decoded": decoded, "reason": "disconnect",
            "mol": mol, "smiles": smiles, "stage": stats.get("stage"),
        }
    return {"pool": "finished", "decoded": decoded, "mol": mol,
            "smiles": smiles, "stage": stats.get("stage")}
