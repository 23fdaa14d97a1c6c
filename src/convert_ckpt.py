"""Convert a reference (torch Lightning) checkpoint into this framework.

    python src/convert_ckpt.py ckpt_path=/path/to/best-199-0.0228.ckpt \
        model=conditional_flow_matching +out=converted_ckpt

Reads the Lightning ``.ckpt`` the reference trainer writes
(/root/reference/configs/callbacks/model_checkpoint.yaml,
/root/reference/src/train.py:116), converts the torch weights to this
framework's flax pytrees (stain2stain_tpu/compat/ — the torchcfm UNet for the
CFM families, SharedEncoder+decoders with BatchNorm stats for the multitask
families), initializes a fresh optimizer state, and writes a standard
checkpoint directory that ``src/eval.py`` / the infer CLIs / ``src/serve.py``
load with ``ckpt_path=<out>``. Conversion is weights-only: torch Adam moments
are not carried over (fine-tuning restarts the optimizer; metrics/eval are
unaffected). Multitask models must be converted AND evaluated with
``+model.{encoder,flow_decoder,seg_decoder}.norm=batch`` (the checkpoints
carry BatchNorm running stats).

Flags (all composable overrides):
  ckpt_path=...          the torch .ckpt file (required)
  +out=DIR               output checkpoint directory (required)
  model=...              model config matching the checkpoint architecture
  +attention_order=new   for nets trained with use_new_attention_order=True
  +unsafe_load=true      allow full unpickling for ckpts whose metadata defeats
                         torch.load(weights_only=True) (trusted files only)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

from stain2stain_tpu.config import Config, config_main, instantiate
from stain2stain_tpu.utils import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)


def _load_torch_ckpt(path: str, unsafe: bool) -> dict:
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as exc:
        if not unsafe:
            raise RuntimeError(
                f"torch.load(weights_only=True) failed ({str(exc)[:200]}). "
                "Lightning checkpoints whose hyper_parameters embed custom "
                "objects need full unpickling — re-run with +unsafe_load=true "
                "if you trust the file."
            ) from exc
        return torch.load(path, map_location="cpu", weights_only=False)


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config) -> str:
    import jax.numpy as jnp

    from stain2stain_tpu.compat import convert_lightning_state_dict
    from stain2stain_tpu.training.state import CheckpointIO, TrainState

    ckpt_path = cfg.get("ckpt_path")
    out = cfg.get("out")
    if not ckpt_path or not out:
        raise ValueError("both ckpt_path=<torch .ckpt> and +out=<dir> are required")

    ckpt = _load_torch_ckpt(str(ckpt_path), bool(cfg.get("unsafe_load", False)))
    state_dict = ckpt.get("state_dict", ckpt)  # plain state dicts work too

    extra_vars: dict = {}
    if "encoder" in cfg["model"]:  # multitask shared-encoder family
        from stain2stain_tpu.compat.torch_multitask import convert_multitask_state_dict

        if cfg["model"]["encoder"].get("norm", "group") != "batch":
            raise ValueError(
                "reference multitask checkpoints carry BatchNorm running stats "
                "— convert AND evaluate with +model.encoder.norm=batch "
                "+model.flow_decoder.norm=batch +model.seg_decoder.norm=batch"
            )
        variables = convert_multitask_state_dict(
            state_dict,
            features=tuple(cfg["model"]["encoder"]["features"]),
            decoder_features=tuple(cfg["model"]["flow_decoder"]["features"]),
        )
        params = variables["params"]
        extra_vars = {"batch_stats": variables["batch_stats"]}
    else:
        net_cfg = dict(cfg["model"]["net"])
        dim = net_cfg.pop("dim", (3, 256, 256))
        params = convert_lightning_state_dict(
            state_dict,
            image_size=int(dim[-1]),
            num_channels=int(net_cfg["num_channels"]),
            num_res_blocks=int(net_cfg["num_res_blocks"]),
            channel_mult=tuple(net_cfg.get("channel_mult", (1, 2, 2, 4))),
            attention_resolutions=net_cfg.get("attention_resolutions", "16"),
            num_heads=int(net_cfg.get("num_heads", 4)),
            num_head_channels=int(net_cfg.get("num_head_channels", -1)),
            class_cond=bool(net_cfg.get("class_cond", False)),
            resblock_updown=bool(net_cfg.get("resblock_updown", False)),
            conv_resample=bool(net_cfg.get("conv_resample", True)),
            attention_order=str(cfg.get("attention_order", "legacy")),
            net_prefix=str(cfg.get("net_prefix", "net.")),
        )

    task = instantiate(cfg["model"])
    tx, _ = task.configure_optimizers()
    state = TrainState(
        step=jnp.asarray(int(ckpt.get("global_step", 0) or 0), jnp.int32),
        params=params,
        extra_vars=extra_vars,
        opt_state=tx.init(params),
    )
    meta = {
        "epoch": int(ckpt.get("epoch", 0) or 0),
        "global_step": int(ckpt.get("global_step", 0) or 0),
        "converted_from": str(ckpt_path),
        "weights_only_conversion": True,
    }
    CheckpointIO().save(out, state, meta)
    log.info(f"Converted {ckpt_path} -> {out} (epoch {meta['epoch']}, step {meta['global_step']})")
    return str(out)


if __name__ == "__main__":
    main()
