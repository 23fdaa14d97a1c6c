"""Worker for the 2-process FULL-pipeline fit test.

Unlike mp_train_worker.py (a hand-rolled step proving the collective math),
this worker drives the real ``src.train.train`` pipeline — config composition,
datamodule ``prepare_data``/``setup``, ``Trainer.fit`` with checkpoint/early-
stop callbacks and a CSV logger — under ``jax.process_count() == 2``, so the
Trainer's multi-host branches actually execute end-to-end:

- the process-0-only ``prepare_data`` + ``sync_global_devices`` barrier
  (training/trainer.py:452-460) — both workers share one data_dir, so worker 1
  must block until worker 0 has written the synthetic tiles;
- per-host ``n_local_dev`` batch padding and global-batch assembly
  (trainer.py:436-442);
- rank-0-only logger/checkpoint side effects (each worker gets its OWN
  output_dir; the parent asserts worker 1's stayed empty);
- chained dispatch (steps_per_execution) and example-weighted eval means
  across process-sharded batches.

Reference parity: /root/reference/tests/test_train.py:65-77 runs the full
Lightning fit under ddp_spawn on 2 CPU processes.

Prints ``MPFIT pid=... loss=... val=... checksum=...`` for the parent to
compare across workers — identical checksums prove both processes hold the
same globally-consistent parameters after the fit.
"""

import faulthandler
import os
import sys

# hang diagnosis: dump all-thread tracebacks to stderr every 120s
faulthandler.dump_traceback_later(120, repeat=True, file=sys.stderr)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=1").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO_ROOT)
os.environ.setdefault("PROJECT_ROOT", REPO_ROOT)

from stain2stain_tpu.parallel.distributed import maybe_initialize_distributed  # noqa: E402


def main() -> None:
    data_dir = sys.argv[1]  # shared across workers (prepare_data barrier)
    out_dir = sys.argv[2]  # per-worker (asserts rank-0-only side effects);
    extra_overrides = sys.argv[3:]

    assert maybe_initialize_distributed(), "distributed init did not run"
    assert jax.process_count() == 2, jax.process_count()
    # the parent passes an "outPID" template so both workers share one argv
    out_dir = out_dir.replace("outPID", f"out{jax.process_index()}")
    os.makedirs(out_dir, exist_ok=True)

    from src.train import train
    from stain2stain_tpu.config import compose

    # Checkpoints are COLLECTIVE and need one path visible to all processes
    # (multi-host shared storage; Orbax asserts path agreement) — loggers
    # stay per-process-dir so the parent can assert rank-0-only writes.
    shared_ckpts = os.path.join(os.path.dirname(data_dir), "shared_ckpts")
    cfg = compose(
        os.path.join(REPO_ROOT, "configs"),
        "train.yaml",
        [
            "experiment=smoke_synthetic",
            f"data.data_dir={data_dir}",
            "logger=csv",
            f"callbacks.model_checkpoint.dirpath={shared_ckpts}",
            "trainer.max_epochs=1",
            "test=true",
            # global batch 4 -> 2 per process; n_train=8 -> 2 steps/epoch
            "data.batch_size=4",
            "model.log_images=false",
            *extra_overrides,
        ],
    )
    cfg["runtime"] = {"output_dir": out_dir, "cwd": out_dir}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False

    metrics, objects = train(cfg)
    trainer = objects["trainer"]
    assert trainer.state is not None
    # n_train pairs / global batch / epoch (default 8/4/1 = 2 steps; the
    # chained-dispatch test overrides n_train=20 -> 5 steps = one full
    # steps_per_execution=5 chunk)
    expected_steps = (
        int(cfg["data"].get("n_train", 8))
        // int(cfg["data"]["batch_size"])
        * int(cfg["trainer"]["max_epochs"])
    )
    assert trainer.global_step == expected_steps, (trainer.global_step, expected_steps)

    # Params are replicated over the data axis, so every process can read its
    # local copy; identical checksums across workers == globally consistent
    # update stream (ref contract: DDP keeps replicas bit-identical).
    checksum = float(
        sum(jnp.sum(jnp.abs(leaf)).astype(jnp.float64)
            for leaf in jax.tree_util.tree_leaves(trainer.state.params))
    )
    print(
        f"MPFIT pid={jax.process_index()} nproc={jax.process_count()} "
        f"ndev={jax.device_count()} steps={trainer.global_step} "
        f"loss={metrics.get('train/loss', float('nan')):.8f} "
        f"val={metrics.get('val/loss', float('nan')):.8f} "
        f"test={metrics.get('test/loss', float('nan')):.8f} "
        f"checksum={checksum:.8f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
