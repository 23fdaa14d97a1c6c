"""Shared inference machinery for the config-driven infer CLIs.

The reference ships hard-coded inference scripts
(/root/reference/src/infer_simple_flowmatching.py:20-34 hard-codes cluster
ckpt/data paths — SURVEY.md §2.7 quirk 5); here inference is a proper
config-composed pipeline: restore checkpoint → iterate the test loader →
one compiled ``generate`` per batch shape → save side-by-side panels.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional

import jax
import numpy as np

from stain2stain_tpu.config import Config, instantiate
from stain2stain_tpu.ops.image import denormalize
from stain2stain_tpu.training.state import CheckpointIO, TrainState
from stain2stain_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


def load_state(ckpt_path: str) -> TrainState:
    """Restore a TrainState from a checkpoint directory (Trainer layout)."""
    state, meta = CheckpointIO().restore(ckpt_path)
    if meta:
        log.info(f"Restored checkpoint (epoch {meta.get('epoch')}, step {meta.get('global_step')})")
    return state


def save_panel(
    path: Path,
    panels: dict[str, np.ndarray],
    index: int,
) -> None:
    """Write one row of named image panels (source/generated/target/…)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    names = list(panels)
    fig, axes = plt.subplots(1, len(names), figsize=(4 * len(names), 4))
    if len(names) == 1:
        axes = [axes]
    for ax, name in zip(axes, names):
        img = np.asarray(panels[name][index])
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]
        if img.ndim == 2:
            ax.imshow(img, cmap="viridis")
        else:
            ax.imshow(np.clip(img, 0.0, 1.0))
        ax.set_title(name)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def run_inference(
    cfg: Config,
    generate_fn: Callable,
    extra_panels: Optional[Callable] = None,
) -> Path:
    """Shared loop: data + model from cfg, ckpt restore, batch-wise generate.

    ``generate_fn(task, variables, prepared_batch) -> dict[str, array]`` maps
    a device batch to [0,1] image panels. Saves one PNG per example under
    ``<output_dir>/panels`` and returns that directory.
    """
    log.info(f"Instantiating datamodule <{cfg['data']['_target_']}>")
    datamodule = instantiate(cfg["data"])
    log.info(f"Instantiating model <{cfg['model']['_target_']}>")
    task = instantiate(cfg["model"])
    state = load_state(cfg["ckpt_path"])
    variables = state.variables

    datamodule.prepare_data()
    datamodule.setup("test")
    loader = datamodule.test_dataloader() or datamodule.val_dataloader()
    if loader is None:
        raise RuntimeError("Datamodule provides no test/val loader for inference")

    out_dir = Path(cfg.get("paths", {}).get("output_dir", ".")) / "panels"
    out_dir.mkdir(parents=True, exist_ok=True)

    n_images = cfg.get("n_images")
    rng = jax.random.key(0)
    written = 0
    import jax.numpy as jnp

    for batch in loader:
        device_batch = tuple(jnp.asarray(x) for x in task.device_fields(batch))
        prepared = task.prepare_batch(device_batch, rng, train=False)
        panels = generate_fn(task, variables, prepared)
        panels = {k: np.asarray(v) for k, v in panels.items()}
        batch_n = next(iter(panels.values())).shape[0]
        for i in range(batch_n):
            save_panel(out_dir / f"sample_{written:05d}.png", panels, i)
            written += 1
            if n_images is not None and written >= n_images:
                log.info(f"Wrote {written} panels to {out_dir}")
                return out_dir
    log.info(f"Wrote {written} panels to {out_dir}")
    return out_dir


def basic_panels(task, variables, prepared, num_steps: int) -> dict:
    """source / generated / target panels (simple-FM inference shape,
    ref infer_simple_flowmatching.py:95-118)."""
    src, tgt = prepared[0], prepared[1]
    gen = task.generate(variables, src, num_steps=num_steps)
    if isinstance(gen, tuple):
        gen = gen[0]
    return {
        "source": denormalize(src),
        "generated": denormalize(gen),
        "target": denormalize(tgt),
    }


__all__ = ["load_state", "save_panel", "run_inference", "basic_panels"]
