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


_barrier_seq: dict[str, int] = {}


def host_barrier(name: str, timeout_s: int = 900) -> None:
    """True host-side barrier via the coordination service.

    ``multihost_utils.sync_global_devices`` is a *device collective* — on the
    CPU backend its Gloo context rendezvous has a hardcoded 30 s KV-store
    timeout, so host-side skew (XLA compiles, rank-0-only data generation)
    routinely kills it, and every extra collective program risks desyncing
    the per-clique context counters between processes. The coordination
    service barrier is what it looks like: all hosts block until all arrive
    (generous timeout), no collective context is created. No-op
    single-process. Replaces Lightning's ``torch.distributed.barrier()``
    (ref: /root/reference/src/models/conditional_flow_matching.py:249).
    """
    import jax

    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist

    client = getattr(_dist.global_state, "client", None)
    if client is None:
        # initialized by some other path — degrade to the device collective
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
        return
    # barrier ids must be unique per use; per-name counters advance in
    # lockstep because every process passes the same barriers in order
    seq = _barrier_seq.get(name, 0)
    _barrier_seq[name] = seq + 1
    client.wait_at_barrier(f"s2s:{name}:{seq}", timeout_in_ms=timeout_s * 1000)


__all__ = ["maybe_initialize_distributed", "host_barrier"]
