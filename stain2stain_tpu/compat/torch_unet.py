"""torch → flax weight conversion for the ADM velocity UNet.

The reference's velocity network is the guided-diffusion-style
``torchcfm.models.unet.UNetModel`` (cfg:
/root/reference/configs/model/conditional_flow_matching.yaml:16-26); trained
checkpoints are Lightning ``.ckpt`` files whose ``state_dict`` keys carry the
``net.`` attribute prefix (/root/reference/src/models/conditional_flow_matching.py:28).
This module maps that state dict onto the parameter pytree of
:class:`stain2stain_tpu.models.UNetModel` — same architecture, re-derived for
TPU in flax/NHWC — so reference-trained models run here unchanged.

Layout rules (torch → flax):

- Conv2d ``(O, I, kh, kw)`` → ``(kh, kw, I, O)``; Conv1d ``(O, I, 1)`` used by
  the attention qkv/proj squeezes to a Dense ``(I, O)``.
- Linear ``(O, I)`` → ``(I, O)``.
- GroupNorm ``weight/bias`` → FusedGroupNorm ``scale/bias``.
- Attention qkv channel order: guided-diffusion's default ``QKVAttentionLegacy``
  reshapes the fused ``(B, 3C, T)`` projection to ``(B·H, 3d, T)`` **before**
  splitting, so torch rows are grouped ``[h0·q, h0·k, h0·v, h1·q, …]``; this
  framework splits q/k/v first (rows ``[q·h0…hH, k·…, v·…]``). The converter
  applies the permutation (``attention_order="legacy"``, the torchcfm
  default; pass ``"new"`` for checkpoints trained with
  ``use_new_attention_order=True``, where the orders already agree).

Structural walk mirrors the ADM block list: ``input_blocks.0`` is the stem
conv; each resolution level contributes ``num_res_blocks`` entries of
ResBlock(+Attention) and, except the last level, one Downsample entry;
``middle_block`` is res/attn/res; ``output_blocks`` walks levels bottom-up
with ``num_res_blocks+1`` entries each, the last entry of every non-top level
carrying the trailing Upsample (which this framework places at the *start* of
the next-higher up level — same computation, different owner).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import numpy as np

__all__ = ["convert_unet_state_dict", "convert_lightning_state_dict"]


class ConversionError(KeyError):
    """A reference checkpoint key expected by the architecture walk is absent."""


def _np(t: Any) -> np.ndarray:
    """Accept torch tensors or arrays without importing torch."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


class _SD:
    """State-dict view that tracks consumption (leftover keys = walk bug)."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = dict(sd)
        self.used: set[str] = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise ConversionError(
                f"reference checkpoint is missing '{key}' — the model config "
                "passed to the converter does not match the checkpoint's "
                "architecture (check num_channels/channel_mult/num_res_blocks/"
                "attention_resolutions)"
            )
        self.used.add(key)
        return _np(self.sd[key])

    def has(self, key: str) -> bool:
        return key in self.sd

    def leftovers(self) -> list[str]:
        return sorted(k for k in self.sd if k not in self.used)


def _conv(sd: _SD, prefix: str) -> dict:
    w = sd.take(f"{prefix}.weight")
    if w.ndim == 3:  # Conv1d (O, I, 1): attention qkv/proj → Dense
        return {"kernel": w[:, :, 0].T.copy(), "bias": sd.take(f"{prefix}.bias")}
    return {
        "kernel": w.transpose(2, 3, 1, 0).copy(),
        "bias": sd.take(f"{prefix}.bias"),
    }


def _linear(sd: _SD, prefix: str) -> dict:
    return {"kernel": sd.take(f"{prefix}.weight").T.copy(), "bias": sd.take(f"{prefix}.bias")}


def _norm(sd: _SD, prefix: str) -> dict:
    return {"scale": sd.take(f"{prefix}.weight"), "bias": sd.take(f"{prefix}.bias")}


def _resblock(sd: _SD, prefix: str) -> dict:
    out = {
        "norm_in": _norm(sd, f"{prefix}.in_layers.0"),
        "conv_in": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _linear(sd, f"{prefix}.emb_layers.1"),
        "norm_out": _norm(sd, f"{prefix}.out_layers.0"),
        "conv_out": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if sd.has(f"{prefix}.skip_connection.weight"):
        out["skip_proj"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _qkv_perm(channels: int, head_dim: int) -> np.ndarray:
    """Column permutation taking legacy ``[h·(q,k,v)]`` rows to ``[q‖k‖v]``."""
    cols = np.arange(3 * channels)
    comp, rem = cols // channels, cols % channels
    head, idx = rem // head_dim, rem % head_dim
    return head * 3 * head_dim + comp * head_dim + idx


def _attention(sd: _SD, prefix: str, channels: int, num_heads: int, order: str) -> dict:
    qkv_w = sd.take(f"{prefix}.qkv.weight")[:, :, 0]  # (3C, C)
    qkv_b = sd.take(f"{prefix}.qkv.bias")
    if order == "legacy":
        perm = _qkv_perm(channels, channels // num_heads)
        qkv_w, qkv_b = qkv_w[perm], qkv_b[perm]
    elif order != "new":
        raise ValueError(f"attention_order must be 'legacy' or 'new', got {order!r}")
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "qkv": {"kernel": qkv_w.T.copy(), "bias": qkv_b},
        "proj": _conv(sd, f"{prefix}.proj_out"),
    }


def _attention_ds(attention_resolutions: Any, image_size: int) -> tuple:
    if isinstance(attention_resolutions, str):
        if not attention_resolutions.strip():
            return ()
        return tuple(image_size // int(r) for r in attention_resolutions.split(","))
    return tuple(int(r) for r in attention_resolutions)


def convert_unet_state_dict(
    state_dict: Mapping[str, Any],
    *,
    image_size: int,
    num_channels: int,
    num_res_blocks: int,
    channel_mult: Sequence[int] = (1, 2, 2, 4),
    attention_resolutions: Any = "16",
    num_heads: int = 4,
    num_head_channels: int = -1,
    class_cond: bool = False,
    resblock_updown: bool = False,
    conv_resample: bool = True,
    attention_order: str = "legacy",
    strict: bool = True,
) -> dict:
    """Convert a torchcfm/guided-diffusion ``UNetModel`` state dict to the
    parameter pytree of :class:`stain2stain_tpu.models.UNetModel`.

    The keyword knobs mirror the reference model config
    (/root/reference/configs/model/conditional_flow_matching.yaml:16-26) and
    must match the checkpoint. With ``strict`` (default) every checkpoint key
    must be consumed by the walk — a leftover means a config mismatch.
    """
    sd = _SD(state_dict)
    mc = num_channels
    attn_ds = _attention_ds(attention_resolutions, image_size)

    def heads_for(ch: int) -> int:
        if num_head_channels != -1:
            return max(ch // num_head_channels, 1)
        return num_heads

    params: dict = {
        "time_dense_0": _linear(sd, "time_embed.0"),
        "time_dense_1": _linear(sd, "time_embed.2"),
        "conv_stem": _conv(sd, "input_blocks.0.0"),
        "norm_final": _norm(sd, "out.0"),
        "conv_out": _conv(sd, "out.2"),
    }
    if class_cond:
        params["label_emb"] = {"embedding": sd.take("label_emb.weight")}

    n_levels = len(channel_mult)
    ds = 1
    idx = 1  # input_blocks.0 is the stem
    level_cfg = []
    for level, mult in enumerate(channel_mult):
        ch = mult * mc
        heads = heads_for(ch) if ds in attn_ds else 0
        level_cfg.append((level, ch, heads))
        down: dict = {}
        for i in range(num_res_blocks):
            block = {"res": _resblock(sd, f"input_blocks.{idx}.0")}
            if heads:
                block["attn"] = _attention(
                    sd, f"input_blocks.{idx}.1", ch, heads, attention_order
                )
            down[f"block_{i}"] = block
            idx += 1
        if level != n_levels - 1:
            if resblock_updown:
                down["down"] = _resblock(sd, f"input_blocks.{idx}.0")
            elif conv_resample:
                down["down"] = {"Conv_0": _conv(sd, f"input_blocks.{idx}.0.op")}
            # pooling downsample has no params (and no checkpoint entry)
            idx += 1
            ds *= 2
        params[f"down_{level}"] = down

    mid_ch = channel_mult[-1] * mc
    params["mid"] = {
        "res_0": _resblock(sd, "middle_block.0"),
        "attn": _attention(sd, "middle_block.1", mid_ch, heads_for(mid_ch), attention_order),
        "res_1": _resblock(sd, "middle_block.2"),
    }

    idx = 0
    for level, ch, heads in reversed(level_cfg):
        up: dict = params.setdefault(f"up_{level}", {})
        for i in range(num_res_blocks + 1):
            block = {"res": _resblock(sd, f"output_blocks.{idx}.0")}
            sub = 1
            if heads:
                block["attn"] = _attention(
                    sd, f"output_blocks.{idx}.{sub}", ch, heads, attention_order
                )
                sub += 1
            if i == num_res_blocks and level != 0:
                # ADM hangs the upsample off this level's last output block;
                # this framework runs it at the START of the next-higher level
                # (models/unet.py _UpLevel) — identical computation.
                target = params.setdefault(f"up_{level - 1}", {})
                if resblock_updown:
                    target["up"] = _resblock(sd, f"output_blocks.{idx}.{sub}")
                elif conv_resample:
                    target["up"] = {"Conv_0": _conv(sd, f"output_blocks.{idx}.{sub}.conv")}
            up[f"block_{i}"] = block
            idx += 1

    if strict:
        leftovers = sd.leftovers()
        if leftovers:
            raise ConversionError(
                f"{len(leftovers)} checkpoint keys were not consumed "
                f"(first: {leftovers[:4]}) — model config does not match the "
                "checkpoint architecture"
            )
    return params


def convert_lightning_state_dict(
    state_dict: Mapping[str, Any], net_prefix: str = "net.", **unet_kwargs
) -> dict:
    """Convert a reference LightningModule ``state_dict`` (ckpt["state_dict"]).

    Keeps only the velocity net's ``net.``-prefixed entries — the reference's
    flow matcher and metric buffers carry no learned parameters
    (/root/reference/src/models/conditional_flow_matching.py:28-42).
    """
    net_sd = {
        k[len(net_prefix):]: v for k, v in state_dict.items() if k.startswith(net_prefix)
    }
    if not net_sd:
        raise ConversionError(
            f"no '{net_prefix}*' keys in the state dict — not a reference "
            "CFM checkpoint, or pass net_prefix= for a different attribute name"
        )
    return convert_unet_state_dict(net_sd, **unet_kwargs)
