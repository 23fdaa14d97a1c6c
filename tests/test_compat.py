"""Reference-checkpoint conversion: torch ADM UNet → flax parity.

A reference user's trained Lightning checkpoints hold torchcfm ``UNetModel``
weights (/root/reference/configs/model/conditional_flow_matching.yaml:16-26).
These tests randomly initialize a torch oracle with that exact state-dict
layout (tests/helpers/adm_torch.py), convert with
stain2stain_tpu.compat, and assert the flax UNet reproduces the torch
forward numerically — covering the name walk, conv/linear layout transposes,
and the legacy qkv head-interleaving permutation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from stain2stain_tpu.compat import (  # noqa: E402
    convert_lightning_state_dict,
    convert_unet_state_dict,
)
from stain2stain_tpu.compat.torch_unet import ConversionError  # noqa: E402
from stain2stain_tpu.models import UNetModel  # noqa: E402
from tests.helpers.adm_torch import ADMUNet  # noqa: E402


def _parity(torch_kw: dict, flax_kw: dict, *, batch: int = 2, classes=None, tol: float = 3e-4):
    torch.manual_seed(0)
    oracle = ADMUNet(**torch_kw).eval()
    image_size = torch_kw["image_size"]
    in_ch = torch_kw.get("in_channels", 3)
    x = torch.randn(batch, in_ch, image_size, image_size)
    t = torch.tensor([0.25, 0.8][:batch])
    y = torch.tensor(classes) if classes is not None else None
    with torch.no_grad():
        ref = oracle(t, x, y).numpy()

    params = convert_unet_state_dict(
        oracle.state_dict(),
        image_size=image_size,
        num_channels=torch_kw["num_channels"],
        num_res_blocks=torch_kw["num_res_blocks"],
        channel_mult=torch_kw["channel_mult"],
        attention_resolutions=torch_kw["attention_resolutions"],
        num_heads=torch_kw.get("num_heads", 4),
        num_head_channels=torch_kw.get("num_head_channels", -1),
        class_cond=torch_kw.get("class_cond", False),
    )
    net = UNetModel(
        dim=(in_ch, image_size, image_size),
        fused_attention=False,
        dtype=jnp.float32,
        **flax_kw,
    )
    with jax.default_matmul_precision("highest"):
        out = net.apply(
            {"params": params},
            jnp.asarray(t.numpy()),
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(classes) if classes is not None else None,
            train=False,
        )
    got = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=tol, rtol=tol)


def test_plain_unet_parity():
    kw = dict(
        image_size=16,
        num_channels=8,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions="8",
        num_head_channels=4,
    )
    _parity(
        kw,
        dict(
            num_channels=8,
            num_res_blocks=1,
            channel_mult=(1, 2),
            attention_resolutions="8",
            num_head_channels=4,
        ),
    )


def test_class_conditional_parity():
    kw = dict(
        image_size=16,
        num_channels=8,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions="8",
        num_head_channels=4,
        class_cond=True,
        num_classes=3,
    )
    _parity(
        kw,
        dict(
            num_channels=8,
            num_res_blocks=1,
            channel_mult=(1, 2),
            attention_resolutions="8",
            num_head_channels=4,
            class_cond=True,
            num_classes=3,
        ),
        classes=[2, 0],
    )


def test_three_level_mask_conditioned_parity():
    """in_channels=4 / out 3 (the reference's mask-conditioned variant,
    /root/reference/configs/model/conditional_flow_matching_masked_condition.yaml),
    flagship-style depth: 3 levels, 2 res blocks, attention at two ds."""
    kw = dict(
        image_size=16,
        in_channels=4,
        out_channels=3,
        num_channels=8,
        num_res_blocks=2,
        channel_mult=(1, 2, 2),
        attention_resolutions="8,4",
        num_heads=2,
    )
    _parity(
        kw,
        dict(
            num_channels=8,
            num_res_blocks=2,
            channel_mult=(1, 2, 2),
            attention_resolutions="8,4",
            num_heads=2,
            out_channels=3,
        ),
    )


def test_lightning_prefix_and_strict():
    torch.manual_seed(1)
    oracle = ADMUNet(
        image_size=16, num_channels=8, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions="8", num_head_channels=4,
    )
    cfg = dict(
        image_size=16, num_channels=8, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions="8", num_head_channels=4,
    )
    lit_sd = {f"net.{k}": v for k, v in oracle.state_dict().items()}
    lit_sd["flow_matcher.sigma_buf"] = torch.zeros(1)  # non-net entries ignored
    params = convert_lightning_state_dict(lit_sd, **cfg)
    assert "conv_stem" in params and "mid" in params

    with pytest.raises(ConversionError, match="missing"):
        convert_unet_state_dict(oracle.state_dict(), **{**cfg, "num_res_blocks": 2})
    with pytest.raises(ConversionError, match="not consumed"):
        convert_unet_state_dict(
            {**oracle.state_dict(), "middle_block.3.weight": torch.zeros(1)}, **cfg
        )
    with pytest.raises(ConversionError, match="no 'net"):
        convert_lightning_state_dict({"model.w": torch.zeros(1)}, **cfg)


@pytest.mark.slow
def test_convert_cli_end_to_end(tmp_path):
    """Fake reference .ckpt → src/convert_ckpt.py → load_state → numeric
    parity of the restored forward against the torch oracle."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    torch.manual_seed(3)
    oracle = ADMUNet(
        image_size=32, num_channels=8, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions="", num_heads=1,
    ).eval()
    ckpt_file = tmp_path / "best-007-0.0228.ckpt"
    torch.save(
        {
            "state_dict": {f"net.{k}": v for k, v in oracle.state_dict().items()},
            "epoch": 7,
            "global_step": 123,
        },
        ckpt_file,
    )
    out_dir = tmp_path / "converted"
    proc = subprocess.run(
        [
            sys.executable, str(repo / "src" / "convert_ckpt.py"),
            f"ckpt_path={ckpt_file}", f"+out={out_dir}",
            "model=conditional_flow_matching",
            "model.net.dim=[3,32,32]", "model.net.num_channels=8",
            "model.net.num_res_blocks=1", "model.net.channel_mult=[1,2]",
            "model.net.attention_resolutions=''", "model.net.num_heads=1",
            "model.net.dropout=0.0",
            f"paths.log_dir={tmp_path}/logs", "extras.print_config=false",
        ],
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    from stain2stain_tpu.inference import load_state

    state = load_state(str(out_dir))
    assert int(state.step) == 123

    x = torch.randn(2, 3, 32, 32)
    t = torch.tensor([0.3, 0.9])
    with torch.no_grad():
        ref = oracle(t, x).numpy()
    net = UNetModel(
        dim=(3, 32, 32), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1, fused_attention=False,
    )
    with jax.default_matmul_precision("highest"):
        out = net.apply(
            {"params": state.params},
            jnp.asarray(t.numpy()),
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            train=False,
        )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=3e-4, rtol=3e-4
    )


def test_multitask_conversion_parity():
    """SharedEncoder + both decoder heads: torch (BatchNorm, bilinear Up)
    → flax `norm=\"batch\"` parity, including running-stat transfer."""
    import math

    from stain2stain_tpu.compat.torch_multitask import convert_multitask_state_dict
    from stain2stain_tpu.models import (
        FlowMatchingDecoder,
        SegmentationDecoder,
        SharedEncoder,
    )
    from tests.helpers import multitask_torch as mt

    feats, dec_feats, temb_dim = (8, 16, 32), (16, 8), 16
    torch.manual_seed(4)

    class Oracle(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = mt.SharedEncoder(3, feats)
            self.flow_decoder = mt.FlowMatchingDecoder(feats[-1], dec_feats, 3, temb_dim)
            self.seg_decoder = mt.SegmentationDecoder(feats[-1], dec_feats, 2)

    oracle = Oracle()
    mt.randomize_bn_stats(oracle, seed=5)
    oracle.eval()

    x = torch.randn(2, 3, 16, 16)
    t = torch.tensor([0.3, 0.7])
    half = temb_dim // 2
    freqs = torch.exp(torch.arange(half).float() * -(math.log(10000.0) / (half - 1)))
    t_emb = torch.cat([torch.sin(t[:, None] * freqs), torch.cos(t[:, None] * freqs)], dim=-1)
    with torch.no_grad():
        bott, skips = oracle.encoder(x)
        ref_flow = oracle.flow_decoder(bott, skips, t_emb).numpy()
        ref_seg = oracle.seg_decoder(bott, skips).numpy()

    variables = convert_multitask_state_dict(
        oracle.state_dict(), features=feats, decoder_features=dec_feats
    )

    def module_vars(name):
        return {
            "params": variables["params"][name],
            "batch_stats": variables["batch_stats"][name],
        }

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    with jax.default_matmul_precision("highest"):
        bott_j, skips_j = SharedEncoder(3, feats, norm="batch").apply(
            module_vars("encoder"), xj, train=False
        )
        flow_j = FlowMatchingDecoder(
            feats[-1], dec_feats, 3, temb_dim, norm="batch"
        ).apply(module_vars("flow_decoder"), bott_j, skips_j, jnp.asarray(t_emb.numpy()), train=False)
        seg_j = SegmentationDecoder(feats[-1], dec_feats, 2, norm="batch").apply(
            module_vars("seg_decoder"), bott_j, skips_j, train=False
        )
    np.testing.assert_allclose(
        np.asarray(flow_j).transpose(0, 3, 1, 2), ref_flow, atol=5e-4, rtol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(seg_j).transpose(0, 3, 1, 2), ref_seg, atol=5e-4, rtol=5e-4
    )


def test_convert_cli_multitask_inprocess(tmp_path):
    """Multitask branch of the converter CLI: BatchNorm stats land in
    extra_vars and the norm=batch guard fires without the overrides."""
    from tests.helpers import multitask_torch as mt

    feats, dec_feats, temb = (8, 16), (8,), 16
    torch.manual_seed(6)

    class Oracle(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = mt.SharedEncoder(3, feats)
            self.flow_decoder = mt.FlowMatchingDecoder(feats[-1], dec_feats, 3, temb)
            self.seg_decoder = mt.SegmentationDecoder(feats[-1], dec_feats, 1)

    oracle = Oracle()
    mt.randomize_bn_stats(oracle, seed=7)
    ckpt_file = tmp_path / "multitask.ckpt"
    torch.save(
        {"state_dict": oracle.state_dict(), "epoch": 3, "global_step": 42}, ckpt_file
    )

    from src.convert_ckpt import main as convert_main

    overrides = [
        f"ckpt_path={ckpt_file}",
        "model=conditional_flow_matching_multitask",
        "model.encoder.features=[8,16]",
        "model.flow_decoder.features=[8]",
        "model.flow_decoder.bottleneck_channels=16",
        "model.flow_decoder.time_emb_dim=16",
        "model.seg_decoder.features=[8]",
        "model.seg_decoder.bottleneck_channels=16",
        "model.time_emb_dim=16",
        f"paths.log_dir={tmp_path}/logs",
        "extras.print_config=false",
    ]
    norm_overrides = [
        "+model.encoder.norm=batch",
        "+model.flow_decoder.norm=batch",
        "+model.seg_decoder.norm=batch",
    ]

    with pytest.raises(ValueError, match="norm=batch"):
        convert_main([*overrides, f"+out={tmp_path}/bad"])

    out_dir = tmp_path / "converted_mt"
    convert_main([*overrides, *norm_overrides, f"+out={out_dir}"])

    from stain2stain_tpu.inference import load_state

    state = load_state(str(out_dir))
    assert int(state.step) == 42
    assert "batch_stats" in state.extra_vars
    assert "encoder" in state.params and "seg_decoder" in state.params


def test_converted_tree_matches_init_structure():
    """The converted pytree must match net.init exactly (shape + structure) —
    guards against silent leaf drift that apply() would mask via broadcast."""
    torch.manual_seed(2)
    oracle = ADMUNet(
        image_size=16, num_channels=8, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions="8", num_head_channels=4,
    )
    params = convert_unet_state_dict(
        oracle.state_dict(), image_size=16, num_channels=8, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions="8", num_head_channels=4,
    )
    net = UNetModel(
        dim=(3, 16, 16), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="8", num_head_channels=4,
    )
    ref = net.init(jax.random.key(0), jnp.zeros((2,)), jnp.zeros((2, 16, 16, 3)))["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(got_shapes)
    assert ref_shapes == got_shapes
