"""Train state + Orbax checkpoint I/O.

Replaces Lightning's implicit module/optimizer state and .ckpt files
(SURVEY.md §5 checkpoint/resume): one explicit pytree carrying params,
mutable collections (e.g. batch_stats), optax state and the step counter,
checkpointed with Orbax together with host-side harness state (epoch,
scheduler, callback state, RNG) so resume is exact.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    extra_vars: Any  # non-param collections (batch_stats, ...), may be {}
    opt_state: Any

    @property
    def variables(self) -> dict:
        return {"params": self.params, **self.extra_vars}

    @classmethod
    def create(cls, variables: dict, tx) -> "TrainState":
        import jax.numpy as jnp

        variables = dict(variables)
        params = variables.pop("params")
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            extra_vars=variables,
            opt_state=tx.init(params),
        )


class CheckpointIO:
    """Orbax-backed checkpoint directory manager.

    Layout: ``<path>/state`` (Orbax pytree: TrainState) and
    ``<path>/meta.json`` (epoch, global_step, host-side state dicts).
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self._ckptr = ocp.PyTreeCheckpointer()

    def save(self, path: str | Path, state: TrainState, meta: dict) -> None:
        """Write the checkpoint; call on EVERY process in multi-host runs,
        with the SAME ``path`` everywhere (shared storage, the multi-host
        norm — Orbax asserts path agreement across processes).

        Two collectives make a rank-gated call a deadlock, so don't gate:
        fsdp-sharded leaves span hosts and are first gathered to every host
        (`_gather`), and Orbax's own ``save`` barriers internally (it writes
        array data from the primary host only). Only the meta.json side
        write is explicitly process-0."""
        host_state = self._gather(state)
        path = Path(path).absolute()
        path.mkdir(parents=True, exist_ok=True)  # idempotent on shared storage
        self._ckptr.save(path / "state", host_state, force=True)
        if jax.process_index() == 0:
            (path / "meta.json").write_text(json.dumps(_jsonable(meta), indent=2))

    @staticmethod
    def _gather(state: TrainState):
        if jax.process_count() == 1:
            return jax.device_get(state)
        from jax.experimental import multihost_utils

        def fetch(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                # tiled=True: assemble the GLOBAL value (a cross-process array
                # is never fully addressable, even when replicated); the
                # default tiled=False path raises on such arrays.
                return np.asarray(multihost_utils.process_allgather(x, tiled=True))
            return jax.device_get(x)

        return jax.tree_util.tree_map(fetch, state)

    def restore(self, path: str | Path, target: Optional[TrainState] = None) -> tuple[TrainState, dict]:
        path = Path(path).absolute()
        if not (path / "state").exists():
            raise FileNotFoundError(f"No checkpoint at {path}")
        if target is not None:
            # structure/shape template only — materializing zeros avoids both
            # fetching real values and device_get's failure on multi-host
            # (non-fully-addressable) fsdp-sharded leaves
            item = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, x.dtype) if isinstance(x, jax.Array) else x,
                target,
            )
            restored = self._ckptr.restore(path / "state", item=item)
        else:
            restored = self._ckptr.restore(path / "state")
            restored = TrainState(**restored) if isinstance(restored, dict) else restored
        meta_file = path / "meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        return restored, meta


def _jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, jax.Array):
        return np.asarray(obj).tolist()
    return obj


__all__ = ["TrainState", "CheckpointIO"]
