"""Serving: ahead-of-time export of compiled inference functions.

The reference has no serving story (its deployment path is the hard-coded
infer scripts, SURVEY.md §3.3); production TPU serving wants a *sealed
artifact*: one StableHLO program with the ODE sampler unrolled inside it, no
Python model code required at load time. Built on ``jax.export``:

- :func:`export_generator` — seal ``task.generate`` (params baked in) for a
  fixed (batch, H, W) into a serialized artifact + sidecar metadata
- :func:`load_generator`  — deserialize and return a callable; runs on any
  platform the artifact was lowered for

The artifact's function signature is ``generate(source) -> image``;
conditional variants bake their condition in via ``gen_kwargs``
(e.g. ``target_class=2``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from stain2stain_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


def export_generator(
    task,
    variables,
    out_path: str | Path,
    batch: int,
    image_size: int,
    num_steps: int = 50,
    in_channels: int = 3,
    platforms: Optional[Sequence[str]] = None,
    **gen_kwargs,
) -> Path:
    """Seal ``task.generate`` into a StableHLO artifact with params baked in.

    ``platforms``: lowering targets (default: the current backend). Pass
    ``["tpu", "cpu"]`` to produce one artifact loadable on both.
    """
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)

    def fn(source):
        return task.generate(variables, source, num_steps=num_steps, **gen_kwargs)

    example = jnp.zeros((batch, image_size, image_size, in_channels), jnp.float32)
    exported = jax_export.export(
        jax.jit(fn), platforms=[p for p in (platforms or [jax.default_backend()])]
    )(example)
    out_path.write_bytes(exported.serialize())
    meta = {
        "task": type(task).__name__,
        "batch": batch,
        "image_size": image_size,
        "num_steps": num_steps,
        "in_channels": in_channels,
        "platforms": list(platforms or [jax.default_backend()]),
        "gen_kwargs": {k: str(v) for k, v in gen_kwargs.items()},
    }
    Path(str(out_path) + ".json").write_text(json.dumps(meta, indent=2))
    log.info(f"Exported sealed generator to {out_path} ({out_path.stat().st_size/1e6:.1f} MB)")
    return out_path


def load_generator(path: str | Path) -> Callable:
    """Load a sealed generator artifact; returns ``generate(source) -> image``."""
    exported = jax_export.deserialize(Path(path).read_bytes())

    def call(source):
        return exported.call(jnp.asarray(source, jnp.float32))

    return call


__all__ = ["export_generator", "load_generator"]
