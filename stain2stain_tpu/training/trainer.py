"""The Trainer: explicit JAX train/eval loops over a device mesh.

Replaces ``lightning.Trainer`` (config surface:
/root/reference/configs/trainer/default.yaml:1-19 + ddp.yaml) with a small,
explicit harness:

- one jitted ``train_step`` — device-side batch prep/augment + fwd/bwd +
  optax update, donated state, batch sharded over the mesh's ``data`` axis,
  params replicated (or fsdp-sharded); gradient all-reduce is inserted by
  XLA's partitioner and rides ICI — the NCCL-allreduce equivalent,
- one jitted ``eval_step``; metric means are global automatically because the
  batch axis spans the mesh (``sync_dist=True`` parity),
- host-side epoch loop owning validation cadence, callbacks, loggers,
  ReduceLROnPlateau and early stopping — the stateful control flow that must
  not live inside jit,
- Orbax checkpoint save/restore incl. harness state for exact resume.

Accepted-but-reinterpreted parity knobs: ``accelerator``/``devices`` select
JAX devices; ``strategy`` is implied by the mesh (ddp == data-axis sharding);
``precision`` 'bf16-mixed' switches the model compute dtype.
"""

from __future__ import annotations

import math
import time
import warnings
from pathlib import Path
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stain2stain_tpu.parallel import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated_sharding,
    shard_batch,
    shard_chunk,
)
from stain2stain_tpu.utils.pylogger import RankedLogger
from stain2stain_tpu.utils.seed import current_seed

from .callbacks import Callback, EarlyStopping, ImageLogger, ModelCheckpoint
from .loggers import Logger
from .optim import ReduceLROnPlateau, get_learning_rate, set_learning_rate
from .state import CheckpointIO, TrainState

log = RankedLogger(__name__, rank_zero_only=True)


class Trainer:
    def __init__(
        self,
        default_root_dir: Optional[str] = None,
        min_epochs: int = 0,
        max_epochs: int = 10,
        accelerator: str = "auto",
        devices: Any = "auto",
        num_nodes: int = 1,
        strategy: str = "auto",
        precision: Any = None,
        check_val_every_n_epoch: int = 1,
        limit_train_batches: Any = None,
        limit_val_batches: Any = None,
        limit_test_batches: Any = None,
        fast_dev_run: bool = False,
        log_every_n_steps: int = 50,
        gradient_clip_val: Optional[float] = None,
        accumulate_grad_batches: int = 1,
        deterministic: bool = False,
        detect_anomaly: bool = False,
        num_sanity_val_steps: int = 0,
        callbacks: Optional[Sequence[Callback]] = None,
        logger: Any = None,
        profiler: Optional[str] = None,
        fsdp: int = 1,
        fsdp_min_size: int = 1024,  # smallest largest-dim worth sharding
        sync_batchnorm: bool = False,  # BN sync is implied by batch sharding; knob kept for parity
        max_steps: int = -1,
        overfit_batches: Any = 0,
        val_check_interval: Any = None,
        enable_progress_bar: bool = True,
        enable_checkpointing: bool = True,
        enable_model_summary: bool = True,
        inference_mode: bool = True,
        prng_impl: Optional[str] = None,
        steps_per_execution: int = 1,
    ):
        self.default_root_dir = str(default_root_dir or Path.cwd() / "logs")
        self.min_epochs = min_epochs or 0
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.accelerator = accelerator
        self.devices_cfg = devices
        self.strategy = strategy
        self.precision = precision
        self.check_val_every_n_epoch = max(1, check_val_every_n_epoch or 1)
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.limit_test_batches = limit_test_batches
        self.fast_dev_run = fast_dev_run
        self.log_every_n_steps = log_every_n_steps
        self.gradient_clip_val = gradient_clip_val
        self.accumulate_grad_batches = max(1, accumulate_grad_batches)
        self.detect_anomaly = detect_anomaly
        self.val_check_interval = val_check_interval
        self.num_sanity_val_steps = num_sanity_val_steps
        self.deterministic = deterministic
        self.profiler = profiler
        self.fsdp = fsdp
        self.fsdp_min_size = fsdp_min_size
        # Chained dispatch: fuse N train steps into one XLA dispatch via
        # lax.scan over a (N, batch, ...) stack. The per-step host round trip
        # through the device-dispatch path costs ~20-27 ms on the dev TPU
        # tunnel (measured, BASELINE.md round 3) — chaining amortizes it while
        # keeping per-step metrics exact (the scan stacks each step's metrics).
        # Host-side control flow (mid-epoch validation, max_steps, epoch ends)
        # still happens at exact step boundaries: the epoch loop shrinks the
        # final chunk and falls back to single-step dispatch there.
        self.steps_per_execution = max(1, int(steps_per_execution))

        self.callbacks: list[Callback] = list(callbacks or [])
        if logger is None or logger is False:
            self.loggers: list[Logger] = []
        elif isinstance(logger, Logger):
            self.loggers = [logger]
        else:
            self.loggers = [lg for lg in logger if isinstance(lg, Logger)]

        # runtime state
        self.state: Optional[TrainState] = None
        self.task = None
        self.datamodule = None
        self.mesh = None
        self.current_epoch = 0
        self.global_step = 0
        self._chunks_dispatched = 0  # chained-dispatch programs executed
        self._warned_unchainable = False
        self.should_stop = False
        self.sanity_checking = False
        self.callback_metrics: dict[str, float] = {}
        # PRNG generator for every trainer-derived key. On TPU the threefry
        # dropout masks alone cost ~24% of the flagship train step (measured:
        # 797 -> 681 ms/step with the hardware RBG generator, round 3); torch's
        # cuRAND dropout is likewise a hardware generator, so "auto" = rbg on
        # TPU. deterministic=True keeps threefry (stable across backends and
        # partitionings); either impl is run-to-run deterministic.
        if prng_impl is None:
            prng_impl = (
                "rbg"
                if not deterministic and jax.default_backend() == "tpu"
                else "threefry2x32"
            )
        self.prng_impl = prng_impl
        self._rng = jax.random.key(current_seed(), impl=prng_impl)
        self._scheduler: Optional[ReduceLROnPlateau] = None
        self._base_lr: Optional[float] = None
        self._ckpt_io = CheckpointIO()
        self._train_step_fn = None
        self._eval_step_fn = None
        self._peek_train = None
        self._peek_val = None

        if fast_dev_run:
            self.max_epochs = 1
            self.limit_train_batches = 1
            self.limit_val_batches = 1
            self.limit_test_batches = 1
            self.check_val_every_n_epoch = 1
        self._overfit = bool(overfit_batches)
        if overfit_batches:
            # Lightning overfit semantics: train on a fixed handful of batches
            # (the epoch permutation is pinned to epoch 0 below so the same
            # N batches repeat), validating on the same count.
            self.limit_train_batches = overfit_batches
            self.limit_val_batches = overfit_batches

    # ------------------------------------------------------------------ utils
    @property
    def is_global_zero(self) -> bool:
        return jax.process_index() == 0

    @property
    def world_size(self) -> int:
        return jax.process_count()

    @property
    def log_dir(self) -> str:
        return self.default_root_dir

    @property
    def current_lr(self) -> Optional[float]:
        if self.state is None:
            return None
        try:
            return get_learning_rate(self.state.opt_state)
        except (TypeError, AttributeError, KeyError):
            return None

    @property
    def checkpoint_callback(self) -> Optional[ModelCheckpoint]:
        for cb in self.callbacks:
            if isinstance(cb, ModelCheckpoint):
                return cb
        return None

    def print(self, *args: Any) -> None:
        if self.is_global_zero:
            print(*args, flush=True)

    def next_rng(self) -> jax.Array:
        self._rng, out = jax.random.split(self._rng)
        return out

    def log_metrics(self, metrics: dict) -> None:
        self.callback_metrics.update({k: float(v) for k, v in metrics.items()})
        # rank-0-only logger writes (Lightning semantics): metrics are already
        # globally reduced inside the jitted step, and concurrent writers on a
        # shared filesystem would race on the same version_N/metrics files
        if not self.is_global_zero:
            return
        for logger in self.loggers:
            logger.log_metrics(metrics, self.global_step)

    def peek_train_batch(self):
        return self._peek_train

    def peek_val_batch(self):
        return self._peek_val

    def _limit(self, limit: Any, total: int) -> int:
        if limit is None or limit is False:
            return total
        if isinstance(limit, float) and 0 < limit <= 1:
            return max(1, int(total * limit))
        return min(int(limit), total)

    # ------------------------------------------------------------------ setup
    def _build_mesh(self):
        devices = jax.devices()
        if isinstance(self.devices_cfg, int) and self.devices_cfg > 0:
            if self.devices_cfg > len(devices):
                log.warning(
                    f"Requested {self.devices_cfg} devices but only {len(devices)} available; using all."
                )
            devices = devices[: self.devices_cfg]
        n = len(devices)
        usable_fsdp = self.fsdp if n % self.fsdp == 0 else 1
        self.mesh = create_mesh(num_devices=n, fsdp=usable_fsdp, devices=devices)
        log.info(f"Mesh: {dict(zip(self.mesh.axis_names, self.mesh.devices.shape))} on {devices[0].platform}")

    def _maybe_cast_precision(self, task) -> None:
        if self.precision in (None, 32, "32", "32-true"):
            return
        if str(self.precision) in ("bf16", "bf16-mixed", "bf16-true", "16-mixed", "16", "16-true"):
            import dataclasses

            for attr in ("net", "encoder", "flow_decoder", "seg_decoder"):
                mod = getattr(task, attr, None)
                if mod is not None and hasattr(mod, "dtype"):
                    try:
                        setattr(task, attr, dataclasses.replace(mod, dtype=jnp.bfloat16))
                    except Exception:
                        warnings.warn(f"Could not switch {attr} to bf16; set dtype in the model config.")

    def _init_state(self, task, example_batch) -> None:
        tx, scheduler = task.configure_optimizers()
        self._tx = tx
        self._scheduler = scheduler
        device_batch = task.prepare_batch(
            tuple(jnp.asarray(x) for x in task.device_fields(example_batch)),
            jax.random.key(0),
            train=False,
        )
        variables = task.init_variables(self.next_rng(), device_batch)
        self.state = jax.jit(
            lambda v: TrainState.create(v, tx), out_shardings=replicated_sharding(self.mesh)
        )(variables)
        if self.mesh.shape["fsdp"] > 1:
            # ZeRO-style placement: big params (and their Adam moments, which
            # mirror the param tree inside opt_state) shard over 'fsdp'; XLA
            # inserts the all-gather/reduce-scatter pairs in the jitted step.
            self._state_sharding = self._fsdp_state_sharding(self.state)
            self.state = jax.device_put(self.state, self._state_sharding)
        else:
            self._state_sharding = replicated_sharding(self.mesh)
        if self._base_lr is None:
            self._base_lr = self.current_lr

    def _fsdp_state_sharding(self, state: TrainState):
        # param_shardings on a single leaf returns that leaf's NamedSharding,
        # so mapping it over opt_state shards whatever the moments look like:
        # per-tensor trees mirroring the params (flatten=False) or the single
        # FLAT_ALIGN-padded moment vectors (optim.flatten_padded, the default
        # — padding keeps their length divisible by the fsdp axis so they
        # shard instead of silently replicating). Scalars/hyperparams replicate.
        min_size = self.fsdp_min_size
        return state.replace(
            step=replicated_sharding(self.mesh),
            params=param_shardings(self.mesh, state.params, min_size=min_size),
            extra_vars=param_shardings(self.mesh, state.extra_vars, min_size=min_size),
            opt_state=jax.tree_util.tree_map(
                lambda leaf: param_shardings(self.mesh, leaf, min_size=min_size),
                state.opt_state,
            ),
        )

    def _compile_steps(self, task, augment: Optional[dict]) -> None:
        tx = self._tx
        clip = self.gradient_clip_val
        accum = self.accumulate_grad_batches

        def train_step(state: TrainState, batch: tuple, rng: jax.Array):
            prep_rng, loss_rng = jax.random.split(jax.random.fold_in(rng, state.step))
            prepared = task.prepare_batch(batch, prep_rng, train=True, augment=augment)

            def loss_fn_on(params, microbatch, mb_rng):
                variables = {"params": params, **state.extra_vars}
                loss, metrics, updates = task.loss_and_metrics(
                    variables, microbatch, mb_rng, train=True
                )
                return loss, (metrics, updates)

            if accum == 1:
                (loss, (metrics, var_updates)), grads = jax.value_and_grad(
                    loss_fn_on, has_aux=True
                )(state.params, prepared, loss_rng)
            else:
                # Gradient accumulation: split the device batch into `accum`
                # microbatches and lax.scan the fwd/bwd, averaging grads and
                # metrics — one optimizer update per outer step (Lightning
                # accumulate_grad_batches semantics, memory scaled by 1/accum).
                micro = jax.tree_util.tree_map(
                    lambda x: x.reshape(accum, x.shape[0] // accum, *x.shape[1:]),
                    prepared,
                )
                grad_fn = jax.value_and_grad(loss_fn_on, has_aux=True)

                def scan_body(carry, inputs):
                    grads_acc, metrics_acc, updates_prev = carry
                    microbatch, mb_rng = inputs
                    (loss, (metrics, updates)), grads = grad_fn(
                        state.params, microbatch, mb_rng
                    )
                    grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                    metrics_acc = {k: metrics_acc[k] + metrics[k] for k in metrics_acc}
                    return (grads_acc, metrics_acc, updates), None

                zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
                mb0 = jax.tree_util.tree_map(lambda x: x[0], micro)
                # shape-only probe (no FLOPs) to build the scan carry structure
                _, (metrics_sd, updates_sd) = jax.eval_shape(
                    loss_fn_on, state.params, mb0, loss_rng
                )
                zero_metrics = {
                    k: jnp.zeros(v.shape, v.dtype) for k, v in metrics_sd.items()
                }
                updates0 = jax.tree_util.tree_map(
                    lambda v: jnp.zeros(v.shape, v.dtype), updates_sd
                )
                mb_rngs = jax.random.split(loss_rng, accum)
                (grads, metrics_sum, var_updates), _ = jax.lax.scan(
                    scan_body, (zero_grads, zero_metrics, updates0), (micro, mb_rngs)
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                metrics = {k: v / accum for k, v in metrics_sum.items()}
            if clip:
                gnorm = optax_global_norm(grads)
                scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            new_extra = {**state.extra_vars, **var_updates}
            new_state = state.replace(
                step=state.step + 1, params=new_params, extra_vars=new_extra, opt_state=new_opt
            )
            return new_state, metrics

        def eval_step(state: TrainState, batch: tuple, rng: jax.Array):
            prepared = task.prepare_batch(batch, rng, train=False)
            loss, metrics, _ = task.loss_and_metrics(
                state.variables, prepared, rng, train=False
            )
            return metrics

        bsh = batch_sharding(self.mesh)
        self._train_step_fn = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step_fn = jax.jit(eval_step)
        self._batch_sharding = bsh

        self._train_chunk_fn = None
        if self.steps_per_execution > 1 and self.detect_anomaly:
            # Anomaly detection promises to halt one step past the first
            # non-finite loss; a donated 5-step chunk would advance (and
            # corrupt) the surviving state by up to 4 more optimizer updates
            # before the host sees the NaN. Debugging beats the +3%.
            log.warning(
                "detect_anomaly=True disables chained dispatch "
                f"(steps_per_execution={self.steps_per_execution} -> 1)."
            )
        elif self.steps_per_execution > 1:
            # N steps per dispatch: scan train_step over a (N, batch, ...)
            # stack. train_step folds the step counter into the RNG, so each
            # scan iteration draws the same keys it would under single-step
            # dispatch — chunked and unchunked runs are step-for-step
            # identical (asserted by tests/test_train.py).
            def train_chunk(state: TrainState, batches: tuple, rng: jax.Array):
                def body(st, one_batch):
                    return train_step(st, one_batch, rng)

                return jax.lax.scan(body, state, batches)

            self._train_chunk_fn = jax.jit(train_chunk, donate_argnums=(0,))

    def _precompile_multihost(self, task, example, val_loader) -> None:
        """Compile the step programs ahead of time, then align all hosts.

        The first *execution* of a cross-process program creates its Gloo/ICI
        collective contexts, and on the CPU backend that rendezvous has a
        hardcoded 30 s KV-store timeout. XLA compiles are the big host-side
        skew source (a persistent-cache hit on one host vs a cold compile on
        the other is minutes), so compile everything first, then hold at a
        coordination-service barrier — the first real dispatch then starts
        within milliseconds on every host and only pays a trace + warm-cache
        load. On TPU pods the first execution blocks harmlessly, but the same
        pre-compile keeps hosts from idling a slice while one straggler
        compiles."""
        from stain2stain_tpu.parallel.distributed import host_barrier

        device_batch, _ = self._device_batch(task, example)
        self._train_step_fn.lower(self.state, device_batch, self._rng).compile()
        if self._train_chunk_fn is not None:
            fields = tuple(
                a if isinstance(a, jax.Array) else np.asarray(a)
                for a in task.device_fields(example)
            )
            n_local_dev = max(1, self.mesh.devices.size // jax.process_count())
            if fields[0].shape[0] % n_local_dev == 0:
                stacked = tuple(
                    (jnp if isinstance(a, jax.Array) else np).stack(
                        [a] * self.steps_per_execution
                    )
                    for a in fields
                )
                chunk = shard_chunk(self.mesh, stacked)
                self._train_chunk_fn.lower(self.state, chunk, self._rng).compile()
        if val_loader is not None:
            try:
                val_example = next(iter(val_loader))
            except StopIteration:
                val_example = None
            if val_example is not None:
                val_batch, _ = self._device_batch(task, val_example)
                self._eval_step_fn.lower(
                    self.state, val_batch, jax.random.fold_in(self._rng, 0)
                ).compile()
        host_barrier("step_programs_compiled")

    def _device_batch(self, task, batch: tuple):
        """Returns (sharded batch, real example count before padding)."""
        # Device-cached loaders (data/device_cache.py) yield jax Arrays that
        # already live in HBM — np.asarray would round-trip them through host.
        arrays = tuple(
            a if isinstance(a, jax.Array) else np.asarray(a)
            for a in task.device_fields(batch)
        )
        # Ragged final batches (eval without drop_last) can't shard over the
        # mesh; pad by repeating leading examples — the same duplication
        # semantics as torch's DistributedSampler, which the reference relies
        # on (the duplicates slightly overweight those examples *within* the
        # final batch's mean; across batches the real count reweights, see
        # _run_eval).
        # Each host holds only ITS shard of the global batch, so the local
        # array must divide by this host's device count, not the global one
        # (dividing by the global count would pad/duplicate every multi-host
        # batch — 2x compute and skewed means).
        n_local_dev = max(1, self.mesh.devices.size // jax.process_count())
        local = arrays[0].shape[0]
        if local % n_local_dev:
            pad = n_local_dev - (local % n_local_dev)
            idx = np.concatenate([np.arange(local), np.arange(pad) % local])
            arrays = tuple(a[idx] for a in arrays)
        return shard_batch(self.mesh, arrays), local

    # ------------------------------------------------------------------- fit
    def fit(self, model, datamodule, ckpt_path: Optional[str] = None) -> None:
        task = model
        self.task = task
        self.datamodule = datamodule
        self._build_mesh()
        self._maybe_cast_precision(task)

        if self.is_global_zero:
            datamodule.prepare_data()
        if jax.process_count() > 1:
            # Lightning barriers between prepare_data (process-0 side effects:
            # downloads, split files) and setup (every process reads them);
            # without it a non-zero process can read a torn/missing file.
            # Host barrier, NOT a device collective — see host_barrier.
            from stain2stain_tpu.parallel.distributed import host_barrier

            host_barrier("prepare_data")
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader()
        if train_loader is None:
            raise RuntimeError("DataModule returned no train dataloader")
        val_loader = datamodule.val_dataloader()
        augment = getattr(datamodule, "train_augment", None)

        example = next(iter(train_loader))
        self._peek_train = example
        self._init_state(task, example)
        self._compile_steps(task, augment)
        if jax.process_count() > 1:
            self._precompile_multihost(task, example, val_loader)

        start_epoch = 0
        if ckpt_path:
            start_epoch = self._restore(ckpt_path)

        for cb in self.callbacks:
            cb.on_fit_start(self, task)

        if self.num_sanity_val_steps and val_loader is not None:
            self.sanity_checking = True
            self._run_eval(val_loader, prefix="val", max_batches=self.num_sanity_val_steps)
            self.sanity_checking = False

        profile_ctx = None
        if self.profiler in ("jax", "advanced"):
            profile_dir = str(Path(self.default_root_dir) / "profile")
            jax.profiler.start_trace(profile_dir)
            profile_ctx = profile_dir

        try:
            for epoch in range(start_epoch, self.max_epochs):
                self.current_epoch = epoch
                if self.should_stop and epoch >= self.min_epochs:
                    break
                for cb in self.callbacks:
                    cb.on_train_epoch_start(self, task)
                self._run_train_epoch(task, train_loader, augment, val_loader=val_loader)
                for cb in self.callbacks:
                    cb.on_train_epoch_end(self, task)

                self.log_metrics({"epoch": float(epoch)})
                ran_val = (
                    val_loader is not None
                    and (epoch + 1) % self.check_val_every_n_epoch == 0
                )
                if ran_val:
                    self._run_eval(val_loader, prefix="val")
                    self._track_best(task)
                # Validation-dependent control flow (plateau scheduler, early
                # stopping, checkpoint-on-monitor) only fires on epochs where
                # validation actually ran — otherwise stale persisted metrics
                # would trigger premature LR decay / early stop (Lightning
                # semantics under check_val_every_n_epoch > 1). Without a val
                # loader the callbacks run every epoch (save_last etc. must
                # still happen; monitors are absent so nothing acts on them).
                if ran_val or val_loader is None:
                    self._epoch_end_control_flow(task)
                    self._val_ran = ran_val  # callbacks skip val-only work
                    for cb in self.callbacks:
                        cb.on_validation_epoch_end(self, task)
                if self.max_steps > 0 and self.global_step >= self.max_steps:
                    break
        finally:
            if profile_ctx:
                jax.profiler.stop_trace()
                log.info(f"Profiler trace written to {profile_ctx}")
            for cb in self.callbacks:
                cb.on_fit_end(self, task)
            for logger in self.loggers:
                logger.finalize()

    def _run_train_epoch(self, task, loader, augment, val_loader=None) -> None:
        loader.set_epoch(0 if self._overfit else self.current_epoch)
        n_batches = self._limit(self.limit_train_batches, len(loader))
        # Lightning val_check_interval semantics: int = every N train batches,
        # float in (0, 1] = that fraction of the epoch.
        val_every: Optional[int] = None
        if val_loader is not None and self.val_check_interval:
            if isinstance(self.val_check_interval, float) and 0 < self.val_check_interval <= 1:
                val_every = max(1, int(n_batches * self.val_check_interval))
            else:
                val_every = max(1, int(self.val_check_interval))
        epoch_metrics: dict[str, list] = {}
        profiler_times: list[float] = []

        def bookkeep(metrics: dict, elapsed: Optional[float]) -> None:
            """Per-step accounting, shared by single and chained dispatch."""
            if self.detect_anomaly:
                loss_val = float(metrics["loss"])
                if not math.isfinite(loss_val):
                    raise FloatingPointError(f"Non-finite loss at step {self.global_step}: {loss_val}")
            self.global_step += 1
            for k, v in metrics.items():
                epoch_metrics.setdefault(k, []).append(v)
            if self.global_step % self.log_every_n_steps == 0:
                self.log_metrics({f"train/{k}": float(v) for k, v in metrics.items()})
            if elapsed is not None:
                profiler_times.append(elapsed)
            for cb in self.callbacks:
                cb.on_train_batch_end(self, task, metrics)

        it = iter(loader)
        queue: list = []  # host batches pulled but not yet executed

        def pull(n: int) -> int:
            while len(queue) < n:
                try:
                    queue.append(next(it))
                except StopIteration:
                    break
            return len(queue)

        n_local_dev = max(1, self.mesh.devices.size // jax.process_count())
        i = 0  # executed train batches this epoch
        while i < n_batches:
            # Steps until the next host-sync boundary (epoch end, mid-epoch
            # validation, max_steps) bound the dispatch-chain length; chained
            # dispatch therefore never changes *when* host control flow runs.
            k = n_batches - i
            if self._train_chunk_fn is not None:
                k = min(k, self.steps_per_execution)
            else:
                k = 1
            if val_every:
                # Lightning counts the interval within the epoch, not across
                # epochs: batch 10 of EVERY epoch for val_check_interval=10.
                k = max(1, min(k, val_every - (i % val_every)))
            if self.max_steps > 0:
                k = max(1, min(k, self.max_steps - self.global_step))
            avail = pull(k)
            if avail == 0:
                break
            k = min(k, avail)
            use_chunk = k == self.steps_per_execution and k > 1
            fields = None
            if use_chunk:
                # A chunk must stack: all k batches same-size and mesh-divisible
                # (ragged finals take the padded single-step path instead).
                # Shape probe first — only convert fields for eligible chunks.
                leads = [task.device_fields(b)[0].shape[0] for b in queue[:k]]
                if leads[0] % n_local_dev:
                    use_chunk = False
                    if not self._warned_unchainable:
                        self._warned_unchainable = True
                        log.warning(
                            f"steps_per_execution={self.steps_per_execution} cannot "
                            f"engage: local batch size {leads[0]} is not divisible "
                            f"by the host's {n_local_dev} devices; dispatching "
                            "single steps."
                        )
                elif any(lead != leads[0] for lead in leads):
                    use_chunk = False
                else:
                    fields = [
                        tuple(
                            a if isinstance(a, jax.Array) else np.asarray(a)
                            for a in task.device_fields(b)
                        )
                        for b in queue[:k]
                    ]
            if use_chunk:
                self._peek_train = queue[k - 1]
                del queue[:k]
                # Device-resident fields stack on device (jnp); host batches
                # stack on host and ship once per chunk.
                stacked = tuple(
                    (jnp if isinstance(fields[0][j], jax.Array) else np).stack(
                        [f[j] for f in fields]
                    )
                    for j in range(len(fields[0]))
                )
                device_chunk = shard_chunk(self.mesh, stacked)
                t0 = time.perf_counter() if self.profiler == "simple" else 0.0
                self.state, metrics_stack = self._train_chunk_fn(
                    self.state, device_chunk, self._rng
                )
                self._chunks_dispatched += 1
                elapsed = None
                if self.profiler == "simple":
                    jax.block_until_ready(self.state.params)
                    elapsed = (time.perf_counter() - t0) / k
                metrics_host = {mk: np.asarray(v) for mk, v in metrics_stack.items()}
                for j in range(k):
                    bookkeep({mk: v[j] for mk, v in metrics_host.items()}, elapsed)
                i += k
            else:
                batch = queue.pop(0)
                self._peek_train = batch
                device_batch, _ = self._device_batch(task, batch)
                t0 = time.perf_counter() if self.profiler == "simple" else 0.0
                self.state, metrics = self._train_step_fn(self.state, device_batch, self._rng)
                elapsed = None
                if self.profiler == "simple":
                    jax.block_until_ready(self.state.params)
                    elapsed = time.perf_counter() - t0
                bookkeep(metrics, elapsed)
                i += 1
            if val_every and i % val_every == 0 and i < n_batches:
                # mid-epoch validation (val_check_interval), checkpoint/early-
                # stop callbacks fire on it like an epoch-end validation
                self._run_eval(val_loader, prefix="val")
                self._track_best(task)
                self._val_ran = True
                for cb in self.callbacks:
                    cb.on_validation_epoch_end(self, task)
            if self.should_stop:
                # EarlyStopping from a mid-epoch validation (incl. the
                # non-finite check) must halt at the batch boundary, not
                # after the rest of the epoch runs on diverged weights
                break
            if self.max_steps > 0 and self.global_step >= self.max_steps:
                break
        means = {f"train/{k}": float(np.mean([np.asarray(v) for v in vs])) for k, vs in epoch_metrics.items()}
        self.log_metrics(means)
        if self.profiler == "simple" and profiler_times:
            self.print(
                f"[profiler] train_step mean {np.mean(profiler_times)*1e3:.1f}ms "
                f"p50 {np.percentile(profiler_times,50)*1e3:.1f}ms over {len(profiler_times)} steps"
            )

    def _run_eval(self, loader, prefix: str, max_batches: Optional[int] = None) -> dict:
        task = self.task
        n_batches = self._limit(
            self.limit_val_batches if prefix == "val" else self.limit_test_batches, len(loader)
        )
        if max_batches is not None:
            n_batches = min(n_batches, max_batches)
        agg: dict[str, list] = {}
        weights: list[int] = []
        # Deterministic per-batch eval keys: CFM losses sample (t, xt) and the
        # reference's eval is therefore stochastic under torch's global RNG;
        # keying by (seed, batch index) instead makes val/test losses exactly
        # reproducible across trainers/runs (checkpoint-fidelity contract,
        # ref tests/test_eval.py:13-39) and removes epoch-to-epoch val noise.
        eval_rng = jax.random.key(current_seed(), impl=self.prng_impl)
        # Prefer the loader's true pre-pad global counts: the local batch size
        # already includes host-shard pad duplicates in multi-host runs.
        real_of = getattr(loader, "real_batch_size", None)
        for i, batch in enumerate(loader):
            if i >= n_batches:
                break
            if prefix == "val":
                self._peek_val = batch
            device_batch, n_local = self._device_batch(task, batch)
            metrics = self._eval_step_fn(self.state, device_batch, jax.random.fold_in(eval_rng, i))
            weights.append(real_of(i) if callable(real_of) else n_local)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        # Example-weighted mean: a short final batch contributes by its real
        # example count, not equally with the full batches. (Within the final
        # batch, device-pad duplicates still enter its per-batch mean — exact
        # per-example parity would need per-example metrics out of eval_step.)
        w = np.asarray(weights, dtype=np.float64)
        means = {
            f"{prefix}/{k}": float(np.sum(np.asarray([np.asarray(v) for v in vs]) * w) / w.sum())
            for k, vs in agg.items()
        }
        if not self.sanity_checking:
            self.log_metrics(means)
        return means

    def _track_best(self, task) -> None:
        """Running best-metric aggregates (MaxMetric parity: the reference's
        MNIST module tracks val/acc_best for sweepers, mnist_module.py:67-77).
        Tasks declare ``track_best = {"val/acc": ("max", "val/acc_best")}``."""
        for metric, (mode, name) in getattr(task, "track_best", {}).items():
            if metric not in self.callback_metrics:
                continue
            value = self.callback_metrics[metric]
            prev = self.callback_metrics.get(name)
            best = value if prev is None else (max(prev, value) if mode == "max" else min(prev, value))
            self.log_metrics({name: best})

    def _epoch_end_control_flow(self, task) -> None:
        """ReduceLROnPlateau on the monitored metric (host-side, outside jit)."""
        if self._scheduler is None or self._base_lr is None:
            return
        monitor = getattr(task, "monitor", "val/loss")
        if monitor not in self.callback_metrics:
            return
        new_lr = self._scheduler.step(self.callback_metrics[monitor], self._base_lr)
        if new_lr is not None:
            self.state = self.state.replace(
                opt_state=set_learning_rate(self.state.opt_state, new_lr)
            )
            log.info(f"ReduceLROnPlateau: lr → {new_lr:.3e}")

    # ------------------------------------------------------------- validation
    def validate(self, model, datamodule, ckpt_path: Optional[str] = None) -> dict:
        return self._standalone_eval(model, datamodule, ckpt_path, split="val")

    def test(self, model, datamodule, ckpt_path: Optional[str] = None) -> dict:
        return self._standalone_eval(model, datamodule, ckpt_path, split="test")

    def _standalone_eval(self, model, datamodule, ckpt_path: Optional[str], split: str) -> dict:
        task = model
        self.task = task
        if self.mesh is None:
            self._build_mesh()
            self._maybe_cast_precision(task)
        datamodule.setup(split)
        loader = (
            datamodule.test_dataloader() if split == "test" else datamodule.val_dataloader()
        )
        if loader is None:
            log.warning(f"No {split} dataloader; skipping.")
            return {}
        if self.state is None:
            example = next(iter(loader))
            self._init_state(task, example)
        if self._eval_step_fn is None:
            self._compile_steps(task, augment=None)
        if ckpt_path in ("last", "best"):
            # Lightning resolves the literals through the checkpoint callback;
            # evaluating the in-memory weights instead would silently report
            # wrong numbers (ref usage: /root/reference/src/train.py:120-127).
            cb = self.checkpoint_callback
            resolved = ""
            if cb is not None:
                resolved = cb.last_model_path if ckpt_path == "last" else cb.best_model_path
            if not resolved:
                raise ValueError(
                    f'ckpt_path="{ckpt_path}" but no ModelCheckpoint callback has a '
                    f"recorded {ckpt_path} checkpoint path; pass an explicit path"
                )
            ckpt_path = resolved
        if ckpt_path:
            self._restore(ckpt_path, weights_only=True)
        metrics = self._run_eval(loader, prefix=split)
        return metrics

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, path: str) -> None:
        meta = {
            "epoch": self.current_epoch,
            "global_step": self.global_step,
            "callback_metrics": self.callback_metrics,
            "scheduler": self._scheduler.state_dict() if self._scheduler else {},
            "base_lr": self._base_lr,
            "callbacks": {type(cb).__name__: cb.state_dict() for cb in self.callbacks},
            # the trainer RNG advances outside the step counter too (e.g. one
            # next_rng() per image-logging validation) — exact resume needs
            # the key itself, not just the seed
            "rng": {
                "impl": self.prng_impl,
                "data": np.asarray(jax.random.key_data(self._rng)).tolist(),
            },
        }
        self._ckpt_io.save(path, self.state, meta)

    def _restore(self, path: str, weights_only: bool = False) -> int:
        state, meta = self._ckpt_io.restore(path, target=self.state)
        self.state = jax.device_put(state, self._state_sharding)
        if weights_only:
            return 0
        self.current_epoch = int(meta.get("epoch", 0))
        self.global_step = int(meta.get("global_step", 0))
        self.callback_metrics.update(meta.get("callback_metrics", {}))
        self._base_lr = meta.get("base_lr", self._base_lr)
        if self._scheduler is not None and meta.get("scheduler"):
            self._scheduler.load_state_dict(meta["scheduler"])
        rng_meta = meta.get("rng")
        if rng_meta and rng_meta.get("impl") == self.prng_impl:
            self._rng = jax.random.wrap_key_data(
                jnp.asarray(np.array(rng_meta["data"], dtype=np.uint32)),
                impl=self.prng_impl,
            )
        for cb in self.callbacks:
            cb.load_state_dict(meta.get("callbacks", {}).get(type(cb).__name__, {}))
        log.info(f"Restored checkpoint from {path} (epoch {self.current_epoch})")
        return self.current_epoch + 1


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


__all__ = ["Trainer"]
