"""torch → flax conversion for the multitask shared-encoder checkpoints.

The reference's multitask models are first-party torch modules
(/root/reference/src/models/components/shared_encoder.py:9-104,
/root/reference/src/models/components/task_decoders.py:53-194) composed by the
multitask LightningModules as attributes ``encoder`` / ``flow_decoder`` /
``seg_decoder`` (/root/reference/src/models/conditional_flow_matching_multitask_multiclassloss.py:138-143).
Their Lightning ``.ckpt`` state dicts map onto this framework's
SharedEncoder/FlowMatchingDecoder/SegmentationDecoder pytrees
(stain2stain_tpu/models/shared_encoder.py, task_decoders.py).

The reference uses BatchNorm (running stats in the checkpoint) — converted
variables therefore require ``norm="batch"`` on the flax modules
(``model.encoder.norm=batch`` etc.); running_mean/var land in the
``batch_stats`` collection. The bilinear ``Up`` path (reference default,
align_corners=True) is parameter-free on both sides; ``bilinear=false``
(ConvTranspose2d) checkpoints are not supported — no reference config uses it.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from stain2stain_tpu.compat.torch_unet import ConversionError, _SD, _conv, _linear

__all__ = ["convert_multitask_state_dict"]


def _bn(sd: _SD, prefix: str) -> tuple[dict, dict]:
    """BatchNorm2d → (params{scale,bias}, stats{mean,var})."""
    params = {"scale": sd.take(f"{prefix}.weight"), "bias": sd.take(f"{prefix}.bias")}
    stats = {
        "mean": sd.take(f"{prefix}.running_mean"),
        "var": sd.take(f"{prefix}.running_var"),
    }
    if sd.has(f"{prefix}.num_batches_tracked"):
        sd.take(f"{prefix}.num_batches_tracked")  # torch bookkeeping; no flax analog
    return params, stats


def _double_conv(sd: _SD, prefix: str) -> tuple[dict, dict]:
    """torch ``DoubleConv.double_conv`` Sequential(conv,BN,ReLU,conv,BN,ReLU)
    → flax DoubleConv {conv_i, norm_i/BatchNorm_0}."""
    params: dict = {}
    stats: dict = {}
    for i, (conv_idx, bn_idx) in enumerate(((0, 1), (3, 4))):
        params[f"conv_{i}"] = _conv(sd, f"{prefix}.{conv_idx}")
        bn_p, bn_s = _bn(sd, f"{prefix}.{bn_idx}")
        params[f"norm_{i}"] = {"BatchNorm_0": bn_p}
        stats[f"norm_{i}"] = {"BatchNorm_0": bn_s}
    return params, stats


def _encoder(sd: _SD, n_downs: int) -> tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}
    params["inc"], stats["inc"] = _double_conv(sd, "encoder.inc.double_conv")
    for i in range(n_downs):
        params[f"down_{i}"], stats[f"down_{i}"] = _double_conv(
            sd, f"encoder.downs.{i}.maxpool_conv.1.double_conv"
        )
    return params, stats


def _decoder(sd: _SD, name: str, n_ups: int, time_conditioned: bool) -> tuple[dict, dict]:
    params: dict = {}
    stats: dict = {}
    if time_conditioned:
        params["time_mlp_0"] = _linear(sd, f"{name}.time_mlp.0")
        params["time_mlp_1"] = _linear(sd, f"{name}.time_mlp.2")
        params["time_proj"] = _linear(sd, f"{name}.time_proj")
    for i in range(n_ups):
        conv_p, conv_s = _double_conv(sd, f"{name}.ups.{i}.conv.double_conv")
        params[f"up_{i}"] = {"conv": conv_p}
        stats[f"up_{i}"] = {"conv": conv_s}
    params["outc"] = _conv(sd, f"{name}.outc")
    return params, stats


def convert_multitask_state_dict(
    state_dict: Mapping[str, Any],
    *,
    features: Sequence[int] = (64, 128, 256, 512, 1024),
    decoder_features: Sequence[int] = (512, 256, 128, 64),
    strict: bool = True,
) -> dict:
    """Convert a reference multitask ``.ckpt["state_dict"]`` to flax variables
    ``{"params": ..., "batch_stats": ...}`` for the SharedBackboneTask family
    (module keys ``encoder`` / ``flow_decoder`` / ``seg_decoder``, matching
    ``tasks/multitask.py _merge_module_vars``)."""
    sd = _SD(state_dict)
    n_downs = len(features) - 1
    n_ups = len(decoder_features)

    enc_p, enc_s = _encoder(sd, n_downs)
    flow_p, flow_s = _decoder(sd, "flow_decoder", n_ups, time_conditioned=True)
    seg_p, seg_s = _decoder(sd, "seg_decoder", n_ups, time_conditioned=False)

    if strict:
        # the reference's TimeEmbedding is parameterless; torchmetrics and
        # flow-matcher buffers may linger in Lightning state dicts — only
        # flag leftovers that belong to the three converted modules
        leftovers = [
            k
            for k in sd.leftovers()
            if k.startswith(("encoder.", "flow_decoder.", "seg_decoder."))
        ]
        if leftovers:
            raise ConversionError(
                f"{len(leftovers)} module keys were not consumed "
                f"(first: {leftovers[:4]}) — encoder/decoder feature lists do "
                "not match the checkpoint architecture"
            )
    return {
        "params": {"encoder": enc_p, "flow_decoder": flow_p, "seg_decoder": seg_p},
        "batch_stats": {"encoder": enc_s, "flow_decoder": flow_s, "seg_decoder": seg_s},
    }
