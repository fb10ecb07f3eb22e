"""Molecule-generation serving: an HTTP JSON API around the bucketed
compiled sampler.

The reference has no serving story (batch CLIs only,
`/root/reference/scripts/sample_drug3d.py`); this is framework capability
for production deployment: load a checkpoint once, keep the per-bucket
compiled reverse chains warm, and serve generation requests over HTTP.

Design for one TPU process:

  * ONE compiled model held by a ``SamplerService``; a lock serializes
    device work (concurrent HTTP handlers queue on it — the TPU is the
    bottleneck, so serialization IS the scheduling policy);
  * startup warmup compiles every configured bucket before the port opens,
    so first-request latency is steady-state;
  * stdlib ``ThreadingHTTPServer`` — no framework dependencies.

Endpoints:
  GET  /health    -> {status, device, buckets, warm}
  GET  /stats     -> request/molecule counters + latency aggregates
  POST /generate  -> body {"num_mols": int, "seed"?: int,
                           "guidance_scale"?: float, "format"?: "smiles"|"sdf"}
                     reply {"smiles": [...], "sdf"?: [...],
                            "num_failed": int, "elapsed_s": float}
"""
from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import jax
import numpy as np


class _Pending:
    """One coalesce-eligible /generate request waiting for its batch."""

    __slots__ = ("num_mols", "want_sdf", "event", "result", "error")

    def __init__(self, num_mols: int, want_sdf: bool):
        self.num_mols = num_mols
        self.want_sdf = want_sdf
        self.event = threading.Event()
        self.result = None
        self.error = None


class SamplerService:
    """Thread-safe generation service around a ``MolSampler``.

    ``sampler`` is a ready `moldiff_tpu.sample.pipeline.MolSampler`;
    ``params`` the (device-put) model param tree. ``max_mols_per_request``
    bounds one request's device time.
    """

    def __init__(self, sampler, params, max_mols_per_request: int = 1024,
                 batch_window_ms: float = 0.0):
        self.sampler = sampler
        self.params = params
        self.max_mols_per_request = int(max_mols_per_request)
        self._lock = threading.Lock()
        self._seed_counter = 0
        self.stats = {
            "requests": 0,
            "batches": 0,
            "mols_generated": 0,
            "mols_failed": 0,
            "errors": 0,
            "total_generate_s": 0.0,
            "max_generate_s": 0.0,
        }
        # request coalescing: unseeded /generate requests arriving within
        # ``batch_window_ms`` are merged into ONE device batch (the TPU's
        # throughput comes from batch size, so many small concurrent
        # requests would otherwise each pay a full chain). Seeded or
        # scale-overriding requests bypass coalescing (reproducibility /
        # conflicting scales). 0 = off.
        self.batch_window_ms = float(batch_window_ms)
        self._queue = []
        self._cv = threading.Condition()
        self._stop = False
        self._worker = None
        if self.batch_window_ms > 0:
            self._worker = threading.Thread(
                target=self._batch_worker, daemon=True
            )
            self._worker.start()

    # -- lifecycle -----------------------------------------------------------

    def warmup(self, logger=None) -> float:
        """Compile every bucket's chain before serving (one tiny batch per
        bucket). Returns elapsed seconds."""
        t0 = time.time()
        with self._lock:
            for n_bucket in self.sampler.buckets:
                sizes = np.full(self.sampler.batch_size, min(6, n_bucket),
                                dtype=np.int64)
                if logger:
                    logger.info(f"warmup: compiling bucket N={n_bucket}")
                self.sampler.sample_sizes(
                    self.params, sizes, jax.random.key(0)
                )
        dt = time.time() - t0
        if logger:
            logger.info(f"warmup done in {dt:.1f}s "
                        f"(buckets {list(self.sampler.buckets)})")
        return dt

    # -- request handling ------------------------------------------------------

    def generate(
        self,
        num_mols: int,
        seed: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        want_sdf: bool = False,
    ) -> dict:
        """Generate ``num_mols`` valid molecules; returns a JSON-able dict.

        Unseeded requests draw from a service-owned counter so repeated
        requests differ; seeded requests are reproducible.
        """
        num_mols = int(num_mols)
        if num_mols < 1 or num_mols > self.max_mols_per_request:
            raise ValueError(
                f"num_mols must be in [1, {self.max_mols_per_request}]"
            )
        with self._lock:
            if seed is None:
                seed = 100_000 + self._seed_counter
                self._seed_counter += 1
            if guidance_scale is not None:
                self.sampler.set_guidance_scale(float(guidance_scale))
            t0 = time.time()
            pool = self.sampler.generate(
                self.params,
                num_mols,
                jax.random.key(int(seed)),
                rng=np.random.default_rng(int(seed)),
            )
            dt = time.time() - t0
            out = {
                "smiles": [e["smiles"] for e in pool["finished"]],
                "num_failed": len(pool["failed"]),
                "elapsed_s": round(dt, 3),
                "seed": int(seed),
            }
            if want_sdf:
                from ..chem.sdf import mol_to_molblock

                out["sdf"] = [
                    mol_to_molblock(e["mol"], name=f"mol_{i}") + "$$$$\n"
                    for i, e in enumerate(pool["finished"])
                ]
            self.stats["requests"] += 1
            self.stats["mols_generated"] += len(pool["finished"])
            self.stats["mols_failed"] += len(pool["failed"])
            self.stats["total_generate_s"] += dt
            self.stats["max_generate_s"] = max(
                self.stats["max_generate_s"], dt
            )
            return out

    # -- request coalescing ----------------------------------------------------

    def submit(
        self,
        num_mols: int,
        seed: Optional[int] = None,
        guidance_scale: Optional[float] = None,
        want_sdf: bool = False,
    ) -> dict:
        """Entry point used by the HTTP layer. Coalesce-eligible requests
        (unseeded, no scale override, window enabled) are merged with
        concurrent ones into a single device batch; everything else takes
        the direct path."""
        if (
            self.batch_window_ms <= 0
            or seed is not None
            or guidance_scale is not None
        ):
            return self.generate(num_mols, seed=seed,
                                 guidance_scale=guidance_scale,
                                 want_sdf=want_sdf)
        num_mols = int(num_mols)
        if num_mols < 1 or num_mols > self.max_mols_per_request:
            raise ValueError(
                f"num_mols must be in [1, {self.max_mols_per_request}]"
            )
        req = _Pending(num_mols, want_sdf)
        with self._cv:
            self._queue.append(req)
            self._cv.notify()
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    def close(self) -> None:
        """Stop the coalescing worker (tests / clean shutdown)."""
        self._stop = True
        with self._cv:
            self._cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=5)

    def _batch_worker(self) -> None:
        while not self._stop:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait(timeout=0.1)
                if self._stop:
                    # fail any stragglers rather than hanging their threads
                    for r in self._queue:
                        r.error = RuntimeError("service closed")
                        r.event.set()
                    self._queue.clear()
                    return
                batch = [self._queue.pop(0)]
            total = batch[0].num_mols
            deadline = time.time() + self.batch_window_ms / 1000.0
            while total < self.max_mols_per_request:
                remaining = deadline - time.time()
                if remaining <= 0:
                    break
                with self._cv:
                    if (self._queue and total + self._queue[0].num_mols
                            <= self.max_mols_per_request):
                        r = self._queue.pop(0)
                        batch.append(r)
                        total += r.num_mols
                        continue
                time.sleep(min(0.002, max(remaining, 0)))
            try:
                self._run_batch(batch, total)
            except Exception as e:  # noqa: BLE001 — propagate per request
                for r in batch:
                    r.error = e
                    r.event.set()

    def _run_batch(self, batch, total: int) -> None:
        with self._lock:
            seed = 100_000 + self._seed_counter
            self._seed_counter += 1
            t0 = time.time()
            pool = self.sampler.generate(
                self.params, total, jax.random.key(seed),
                rng=np.random.default_rng(seed),
            )
            dt = time.time() - t0
            finished = pool["finished"]
            n_failed = len(pool["failed"])
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            self.stats["mols_generated"] += len(finished)
            self.stats["mols_failed"] += n_failed
            self.stats["total_generate_s"] += dt
            self.stats["max_generate_s"] = max(self.stats["max_generate_s"], dt)
        # partition the pool in request order (outside the device lock)
        offset = 0
        for r in batch:
            entries = finished[offset:offset + r.num_mols]
            offset += r.num_mols
            out = {
                "smiles": [e["smiles"] for e in entries],
                "num_failed": 0 if len(entries) == r.num_mols else
                              r.num_mols - len(entries),
                "elapsed_s": round(dt, 3),
                "seed": int(seed),
                "coalesced": len(batch),
                "batch_num_failed": n_failed,
            }
            if r.want_sdf:
                from ..chem.sdf import mol_to_molblock

                out["sdf"] = [
                    mol_to_molblock(e["mol"], name=f"mol_{i}") + "$$$$\n"
                    for i, e in enumerate(entries)
                ]
            r.result = out
            r.event.set()

    def health(self) -> dict:
        return {
            "status": "ok",
            "device": str(jax.devices()[0].device_kind),
            "buckets": list(self.sampler.buckets),
            "warm": sorted({k[0] for k in self.sampler._compiled}),
            "batch_size": self.sampler.batch_size,
            "guided": self.sampler.guidance is not None,
        }


def build_service_from_checkpoint(
    ckpt_path: str,
    bond_ckpt_path: Optional[str] = None,
    guidance: Optional[tuple] = None,
    use_ema: bool = False,
    batch_size: int = 128,
    buckets=None,
    max_mols_per_request: int = 1024,
    guidance_interval: int = 1,
    num_steps: Optional[int] = None,
    pos_sampler: str = "ddpm",
    eta: float = 0.0,
    batch_window_ms: float = 0.0,
    commit: str = "nodes",
) -> SamplerService:
    """Checkpoint -> warm-able service. Mirrors the sample CLI's model
    construction (scripts/sample_drug3d.py; reference
    scripts/sample_drug3d.py:49-91): architecture comes from the config
    embedded in the checkpoint."""
    from ..data.featurize import featurizer_from_config
    from ..models.bond_predictor import BondPredictor
    from ..models.moldiff import MolDiff
    from ..sample.pipeline import MolSampler
    from ..train.trainer import load_checkpoint
    from ..utils.config import Config

    ckpt = load_checkpoint(ckpt_path)
    if use_ema:
        if ckpt.get("ema_params") is None:
            raise ValueError("checkpoint has no ema_params")
        ckpt["params"] = ckpt["ema_params"]
    train_config = Config(ckpt["config"])
    train_config.model.denoiser["remat"] = False  # forward-only serving
    featurizer = featurizer_from_config(train_config)
    model = MolDiff(
        train_config.model,
        num_node_types=featurizer.num_node_types,
        num_edge_types=featurizer.num_edge_types,
    )
    params = jax.device_put(ckpt["params"])

    bond_predictor = None
    chunk_steps = None
    if bond_ckpt_path:
        bp_ckpt = load_checkpoint(bond_ckpt_path)
        bp_config = Config(bp_ckpt["config"])
        bp_config.model.encoder["remat"] = True
        bp = BondPredictor(
            bp_config.model,
            num_node_types=featurizer.num_node_types,
            num_edge_types=featurizer.num_bond_types + 1,
        )
        bond_predictor = (bp, jax.device_put(bp_ckpt["params"]))
        if guidance is not None and model.categorical_space == "discrete":
            T = num_steps or model.num_timesteps
            chunk_steps = next(
                c for c in (100, 50, 25, 20, 10, 5, 1) if T % c == 0
            )

    kw = {}
    if buckets is not None:
        kw["buckets"] = tuple(buckets)
    sampler = MolSampler(
        model,
        featurizer,
        bond_predictor=bond_predictor,
        guidance=guidance,
        batch_size=batch_size,
        chunk_steps=chunk_steps,
        guidance_interval=guidance_interval,
        num_steps=num_steps,
        pos_sampler=pos_sampler, eta=eta,
        # serving default: the commit sampler (carry-over unmasking) — the
        # round-5 measured winner (success 0.523 -> 0.745,
        # results/gate_r5_commit_nodes.json); pass 'none' for the
        # reference-exact recursive posterior
        commit=commit,
        **kw,
    )
    return SamplerService(sampler, params,
                          max_mols_per_request=max_mols_per_request,
                          batch_window_ms=batch_window_ms)


def make_http_server(
    service: SamplerService, host: str = "127.0.0.1", port: int = 8000,
    logger=None,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; call ``.serve_forever()`` to run,
    ``.shutdown()`` to stop. Port 0 picks a free port (``server_port``)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to our logger, not stderr
            if logger:
                logger.info("http: " + fmt % args)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply(200, service.health())
            elif self.path == "/stats":
                stats = dict(service.stats)
                n = max(stats["requests"], 1)
                stats["avg_generate_s"] = round(
                    stats["total_generate_s"] / n, 3
                )
                self._reply(200, stats)
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                out = service.submit(
                    num_mols=req.get("num_mols", 1),
                    seed=req.get("seed"),
                    guidance_scale=req.get("guidance_scale"),
                    want_sdf=req.get("format") == "sdf",
                )
                self._reply(200, out)
            except ValueError as e:
                service.stats["errors"] += 1
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — serving must not die
                service.stats["errors"] += 1
                if logger:
                    logger.exception("generate failed")
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)
