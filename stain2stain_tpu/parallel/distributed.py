"""Multi-host runtime initialization.

The reference's multi-node story is Lightning DDP's process launcher
(configs/trainer/ddp.yaml `num_nodes`); the JAX-native equivalent is
``jax.distributed.initialize`` — each host process joins the global runtime,
``jax.devices()`` becomes the global device list, and per-host input pipelines
feed ``make_array_from_process_local_data`` (parallel/mesh.py shard_batch).

Call :func:`maybe_initialize_distributed` once at entrypoint start. It is a
no-op unless multi-host coordination env vars are present (set by TPU pod
runtimes or explicitly via COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID),
so single-chip runs are untouched.
"""

from __future__ import annotations

import os

from stain2stain_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=False)

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Join the multi-host runtime when configured; returns True if so."""
    global _initialized
    if _initialized:
        return True
    import jax

    explicit = all(
        os.environ.get(k)
        for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID")
    )
    # TPU pod slices set these; their presence means initialize() can
    # auto-discover coordination parameters.
    pod_env = bool(os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not (explicit or pod_env):
        return False
    try:
        if explicit:
            jax.distributed.initialize(
                coordinator_address=os.environ["COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["NUM_PROCESSES"]),
                process_id=int(os.environ["PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()
        _initialized = True
        log.info(
            f"Distributed runtime up: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.device_count()} global devices"
        )
        return True
    except Exception as exc:  # mis-configured env must not kill single-host runs
        log.warning(f"jax.distributed.initialize failed ({exc}); continuing single-process.")
        return False


__all__ = ["maybe_initialize_distributed"]
