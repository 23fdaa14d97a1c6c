"""Optimizer/scheduler factories (config-compatible with the reference).

The reference configures ``torch.optim.Adam`` + ``ReduceLROnPlateau`` as
``_partial_`` factories (configs/model/conditional_flow_matching.yaml:4-14).
Here ``Adam`` builds an optax chain wrapped in ``inject_hyperparams`` so the
learning rate lives in the optimizer state and can be rescaled between epochs
by the host-side :class:`ReduceLROnPlateau` controller — the stateful,
epoch-driven piece the jitted step never sees (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import optax

# The flat moment vectors must stay ZeRO-shardable: pad the concatenated
# parameter vector to a multiple of this, so its length is divisible by any
# power-of-two fsdp axis (and by 8×128 VPU tiles). The flagship UNet's total
# param count is odd (conv_out bias = 3), so an unpadded flat vector would be
# silently replicated by parallel/mesh.py:_fsdp_spec — ~280 MB/moment/device.
FLAT_ALIGN = 1024


def flatten_padded(
    inner: optax.GradientTransformation, align: int = FLAT_ALIGN
) -> optax.GradientTransformation:
    """optax.flatten equivalent whose flat vector is zero-padded to a multiple
    of ``align``. One fused vector op for the whole update (vs ~400 per-tensor
    fusions) while keeping the moments shardable over the ``fsdp`` mesh axis.
    The wrapped state IS the inner state (hyperparams stay reachable for the
    ReduceLROnPlateau controller)."""
    import jax
    import jax.numpy as jnp

    def _flat(tree):
        flat = jnp.concatenate([jnp.ravel(x) for x in jax.tree_util.tree_leaves(tree)])
        pad = (-flat.size) % align
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        return flat

    def _unflat(tree, flat):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out, i = [], 0
        for leaf in leaves:
            n = leaf.size
            out.append(flat[i : i + n].reshape(leaf.shape).astype(leaf.dtype))
            i += n
        return jax.tree_util.tree_unflatten(treedef, out)

    def init(params):
        return inner.init(_flat(params))

    def update(updates, state, params=None):
        flat_p = None if params is None else _flat(params)
        flat_u, new_state = inner.update(_flat(updates), state, flat_p)
        return _unflat(updates, flat_u), new_state

    return optax.GradientTransformation(init, update)


def Adam(
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    betas: tuple = (0.9, 0.999),
    eps: float = 1e-8,
    flatten: bool = True,
) -> optax.GradientTransformation:
    """torch.optim.Adam-equivalent (decoupled semantics differ: torch's
    ``weight_decay`` is L2-into-gradient; replicated here with additive decay
    before the Adam moment update).

    ``flatten=True`` runs the update over one concatenated parameter vector
    (:func:`flatten_padded`) instead of ~400 per-tensor fusions — measured 827
    → 787 ms/step on the flagship 256px TPU train step (same math; the
    hyperparams state the LR-plateau controller mutates is unchanged because
    flatten delegates to the inner inject_hyperparams state). The vector is
    zero-padded to ``FLAT_ALIGN`` so the Adam moments remain divisible by —
    and therefore ZeRO-shardable over — the mesh's ``fsdp`` axis.
    """

    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)

    tx = optax.inject_hyperparams(make)(learning_rate=lr)
    return flatten_padded(tx) if flatten else tx


def AdamW(
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    betas: tuple = (0.9, 0.999),
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    def make(learning_rate):
        return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)

    return optax.inject_hyperparams(make)(learning_rate=lr)


def SGD(lr: float = 1e-2, momentum: float = 0.0, weight_decay: float = 0.0) -> optax.GradientTransformation:
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            steps.append(optax.trace(decay=momentum))
        steps.append(optax.scale(-learning_rate))
        return optax.chain(*steps)

    return optax.inject_hyperparams(make)(learning_rate=lr)


def set_learning_rate(opt_state: Any, lr: float) -> Any:
    """Return opt_state with the injected hyperparam learning rate replaced."""
    import jax.numpy as jnp

    if not hasattr(opt_state, "hyperparams"):
        raise TypeError("Optimizer was not built with inject_hyperparams")
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.asarray(hp["learning_rate"]).dtype)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state: Any) -> float:
    return float(opt_state.hyperparams["learning_rate"])


@dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau-equivalent host controller.

    Call :meth:`step(metric)` once per epoch; it returns the (possibly
    reduced) LR multiplier state. Serializable for checkpoint resume.
    """

    mode: str = "min"
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    min_lr: float = 0.0
    cooldown: int = 0

    best: float = field(default=math.inf)
    num_bad_epochs: int = 0
    cooldown_counter: int = 0
    current_factor: float = 1.0

    def __post_init__(self):
        if self.mode == "max" and self.best == math.inf:
            self.best = -math.inf

    def _is_better(self, metric: float) -> bool:
        if self.mode == "min":
            margin = self.best * (1 - self.threshold) if self.threshold_mode == "rel" else self.best - self.threshold
            return metric < margin
        margin = self.best * (1 + self.threshold) if self.threshold_mode == "rel" else self.best + self.threshold
        return metric > margin

    def step(self, metric: float, base_lr: float) -> Optional[float]:
        """Returns a new absolute LR if it should change, else None."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            if self.cooldown_counter > 0:
                self.cooldown_counter -= 1
            else:
                self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.num_bad_epochs = 0
            self.cooldown_counter = self.cooldown
            new_factor = self.current_factor * self.factor
            new_lr = max(base_lr * new_factor, self.min_lr)
            if new_lr < base_lr * self.current_factor - 1e-12:
                self.current_factor = new_factor
                return new_lr
        return None

    def state_dict(self) -> dict:
        return {
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
            "current_factor": self.current_factor,
        }

    def load_state_dict(self, state: dict) -> None:
        for k, v in state.items():
            setattr(self, k, v)


__all__ = [
    "Adam",
    "AdamW",
    "SGD",
    "flatten_padded",
    "ReduceLROnPlateau",
    "set_learning_rate",
    "get_learning_rate",
]
