"""Optimizers and LR schedulers.

TPU-native analogue of `/root/reference/utils/train.py:56-109` and
`/root/reference/utils/warmup.py`. The optimizer is an optax chain (grad
clip -> adam/adamw) with the learning rate *injected as opt-state* so the
host-side reactive schedulers (plateau and friends) can update it between
jitted steps without recompiling — the JAX replacement for torch's
``ReduceLROnPlateau`` mutating optimizer.param_groups.

Schedulers (config `train.scheduler.type`, parity with the reference):
  plateau            ReduceLROnPlateau(factor, patience, min_lr)
  warmup_plateau     linear warmup for `multiplier`/`total_epoch` then plateau
  expmin             lr(t) = max(lr0 * factor^t, min_lr)
  expmin_milestone   expmin starting after `milestone` steps
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import optax


def get_optimizer(config) -> optax.GradientTransformation:
    """Build the optax chain from a `train.optimizer` config node.

    Reference utils/train.py:56-72 (adam/adamw with (beta1, beta2), weight
    decay). Gradient clipping (reference train script `max_grad_norm`) is part
    of the chain so the whole update is one jitted transformation.
    """
    opt_type = config["type"]
    lr = float(config["lr"])
    beta1 = float(config.get("beta1", 0.9))
    beta2 = float(config.get("beta2", 0.999))
    weight_decay = float(config.get("weight_decay", 0.0))
    max_grad_norm = float(config.get("max_grad_norm", 0.0))

    if opt_type not in ("adam", "adamw"):
        raise NotImplementedError(f"optimizer {opt_type}")

    # inject_hyperparams exposes `learning_rate` in opt_state.hyperparams so
    # host-side schedulers can mutate it without recompilation.
    def _make(learning_rate):
        parts = (
            [optax.clip_by_global_norm(max_grad_norm)] if max_grad_norm > 0 else []
        )
        if opt_type == "adamw":
            parts.append(
                optax.adamw(learning_rate, b1=beta1, b2=beta2, weight_decay=weight_decay)
            )
        else:
            parts.append(optax.adam(learning_rate, b1=beta1, b2=beta2))
        return optax.chain(*parts)

    return optax.inject_hyperparams(_make)(learning_rate=lr)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """Return opt_state with a new injected learning rate."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


class PlateauScheduler:
    """ReduceLROnPlateau (reference scheduler type 'plateau').

    Stepped with a validation loss; multiplies lr by `factor` after
    `patience` consecutive non-improving steps, floored at `min_lr`.
    """

    def __init__(self, factor: float = 0.8, patience: int = 10, min_lr: float = 1e-5):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = math.inf
        self.num_bad = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    def state_dict(self) -> dict:
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        self.best = d["best"]
        self.num_bad = d["num_bad"]

    def reset(self) -> None:
        """Forget plateau history (train CLI --reset_optim)."""
        self.best = math.inf
        self.num_bad = 0


class WarmupPlateauScheduler(PlateauScheduler):
    """Gradual warmup then plateau (reference 'warmup_plateau', utils/warmup.py).

    For the first `total_epoch` validation steps lr ramps linearly from
    base_lr/multiplier... (torch GradualWarmupScheduler with multiplier m
    ramps base_lr -> base_lr * m). After warmup, plateau logic applies.
    """

    def __init__(self, base_lr: float, multiplier: float = 1.0, total_epoch: int = 1,
                 factor: float = 0.8, patience: int = 10, min_lr: float = 1e-5):
        super().__init__(factor, patience, min_lr)
        self.base_lr = base_lr
        self.multiplier = multiplier
        self.total_epoch = total_epoch
        self.epoch = 0

    def step(self, metric: float, lr: float) -> float:
        self.epoch += 1
        if self.epoch <= self.total_epoch:
            frac = self.epoch / self.total_epoch
            if self.multiplier == 1.0:
                return self.base_lr * frac
            return self.base_lr * ((self.multiplier - 1.0) * frac + 1.0)
        return super().step(metric, lr)

    def state_dict(self) -> dict:
        d = super().state_dict()
        d["epoch"] = self.epoch
        return d

    def load_state_dict(self, d: dict) -> None:
        super().load_state_dict(d)
        self.epoch = d["epoch"]

    def reset(self) -> None:
        super().reset()
        self.epoch = 0


class ExpMinScheduler:
    """lr <- max(lr * factor, min_lr) each step (reference
    ExponentialLR_with_minLr, utils/train.py:13-31); `milestone` delays the
    decay start ('expmin_milestone')."""

    def __init__(self, factor: float, min_lr: float, milestone: int = 0):
        self.factor = factor
        self.min_lr = min_lr
        self.milestone = milestone
        self.epoch = 0

    def step(self, metric: float, lr: float) -> float:
        self.epoch += 1
        if self.epoch < self.milestone:
            return lr
        return max(lr * self.factor, self.min_lr)

    def state_dict(self) -> dict:
        return {"epoch": self.epoch}

    def load_state_dict(self, d: dict) -> None:
        self.epoch = d["epoch"]

    def reset(self) -> None:
        self.epoch = 0


def get_scheduler(config, base_lr: float):
    """Scheduler dispatch (reference utils/train.py:75-109)."""
    stype = config["type"]
    if stype == "plateau":
        return PlateauScheduler(
            factor=float(config["factor"]),
            patience=int(config["patience"]),
            min_lr=float(config.get("min_lr", 0.0)),
        )
    if stype == "warmup_plateau":
        return WarmupPlateauScheduler(
            base_lr=base_lr,
            multiplier=float(config.get("multiplier", 1.0)),
            total_epoch=int(config["total_epoch"]),
            factor=float(config["factor"]),
            patience=int(config["patience"]),
            min_lr=float(config.get("min_lr", 0.0)),
        )
    if stype == "expmin":
        return ExpMinScheduler(
            factor=float(config["factor"]), min_lr=float(config["min_lr"])
        )
    if stype == "expmin_milestone":
        return ExpMinScheduler(
            factor=float(config["factor"]),
            min_lr=float(config["min_lr"]),
            milestone=int(config["milestone"]),
        )
    raise NotImplementedError(f"scheduler {stype}")
