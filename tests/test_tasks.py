"""Task-module tests: every reference LightningModule equivalent computes a
finite loss and generates with the right shapes on tiny inputs.

Reference parity map (SURVEY.md §2.2): plain / class-conditional / masked /
ROI-Charbonnier / mask-conditioned / mask-toggled / multitask binary /
multitask multiclass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stain2stain_tpu.models import (
    FlowMatchingDecoder,
    SegmentationDecoder,
    SharedEncoder,
    UNetModel,
)
from stain2stain_tpu.ops.solvers import SolverConfig
from stain2stain_tpu.tasks import (
    ClassConditionalFlowMatchingModule,
    ConditionalFlowMatchingModule,
    MaskConditionedFlowMatchingModule,
    MaskedFlowMatchingModule,
    MultitaskFlowMatchingModule,
    MultitaskMulticlassFlowMatchingModule,
    ROICharbonnierFlowMatchingModule,
    ToggleMaskFlowMatchingModule,
)
from stain2stain_tpu.training.optim import Adam

RNG = jax.random.key(0)
B, S = 2, 32


def tiny_unet(in_ch=3, class_cond=False, num_classes=None):
    return UNetModel(
        dim=(in_ch, S, S),
        num_channels=8,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions="",
        num_heads=1,
        class_cond=class_cond,
        num_classes=num_classes,
        out_channels=3,
    )


def img_batch(n_extra=0, extra_kind="mask"):
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    out = [src, tgt]
    for _ in range(n_extra):
        if extra_kind == "mask":
            out.append(jnp.asarray(rng.integers(0, 2, (B, S, S, 1)), jnp.float32))
        elif extra_kind == "class_mask":
            out.append(jnp.asarray(rng.integers(0, 3, (B, S, S)), jnp.int32))
        elif extra_kind == "label":
            out.append(jnp.asarray(rng.integers(0, 3, (B,)), jnp.int32))
    return tuple(out)


def run_task(task, batch, gen_kwargs=None):
    variables = task.init_variables(RNG, batch)
    loss, metrics, _ = jax.jit(
        lambda v, b, r: task.loss_and_metrics(v, b, r, train=True)
    )(variables, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    assert "loss" in metrics
    gen = task.generate(variables, batch[0], num_steps=2, **(gen_kwargs or {}))
    return variables, loss, metrics, gen


def test_plain_cfm_task():
    task = ConditionalFlowMatchingModule(net=tiny_unet(), optimizer=Adam, solver=SolverConfig("euler"))
    _, _, metrics, gen = run_task(task, img_batch())
    assert gen.shape == (B, S, S, 3)


def test_class_conditional_task_and_batched_any2any():
    task = ClassConditionalFlowMatchingModule(
        net=tiny_unet(class_cond=True, num_classes=3), num_classes=3, solver=SolverConfig("euler")
    )
    batch = img_batch(1, "label")
    variables, _, _, gen = run_task(task, batch, gen_kwargs={"target_class": 1})
    assert gen.shape == (B, S, S, 3)
    # one-compiled-call any→all: (num_classes, B, H, W, C)
    all_cls = task.generate_all_classes(variables, batch[0], num_steps=2)
    assert all_cls.shape == (3, B, S, S, 3)
    # class 1 slice must equal the single-class call (same params, same path)
    np.testing.assert_allclose(np.asarray(all_cls[1]), np.asarray(gen), atol=1e-5)
    # render_panels generates each example's OWN target class (review r3: the
    # base default generated class 0 for everything): with per-example labels
    # the generated panel must match per-example single-class generations.
    panels = task.render_panels(variables, batch, jax.random.key(5), num_steps=2)
    assert set(panels) == {"source", "generated", "target"}
    prepared = task.prepare_batch(batch, jax.random.key(5), train=False)
    y = np.asarray(prepared[2])
    from stain2stain_tpu.ops.image import denormalize
    expect = np.stack([
        np.asarray(denormalize(all_cls[int(y[i]), i])) for i in range(min(len(y), panels["generated"].shape[0]))
    ])
    np.testing.assert_allclose(np.asarray(panels["generated"])[: len(expect)], expect, atol=1e-5)


def test_masked_task_upweights_roi():
    task = MaskedFlowMatchingModule(net=tiny_unet(), roi_lambda=10.0, solver=SolverConfig("euler"))
    _, loss, _, gen = run_task(task, img_batch(1, "mask"))
    assert gen.shape == (B, S, S, 3)
    # zero mask ⇒ plain MSE; nonzero mask changes the weighting
    src, tgt, mask = img_batch(1, "mask")
    variables = task.init_variables(RNG, (src, tgt, mask))
    l_zero, _, _ = task.loss_and_metrics(variables, (src, tgt, jnp.zeros_like(mask)), jax.random.key(2), train=False)
    l_mask, _, _ = task.loss_and_metrics(variables, (src, tgt, jnp.ones_like(mask)), jax.random.key(2), train=False)
    # all-ones mask: w uniform ⇒ equals plain MSE again
    np.testing.assert_allclose(float(l_zero), float(l_mask), rtol=1e-5)


def test_roi_charbonnier_task_metrics():
    task = ROICharbonnierFlowMatchingModule(net=tiny_unet(), lambda_roi=1.0, solver=SolverConfig("euler"))
    _, loss, metrics, _ = run_task(task, img_batch(1, "mask"))
    assert {"loss", "flow_loss", "roi_charbonnier"} <= set(metrics)
    assert float(metrics["loss"]) >= float(metrics["flow_loss"]) - 1e-6


def test_mask_conditioned_task_uses_4ch_input():
    task = MaskConditionedFlowMatchingModule(net=tiny_unet(in_ch=4), solver=SolverConfig("euler"))
    batch = img_batch(1, "mask")
    variables, _, _, gen = run_task(task, batch, gen_kwargs={"mask": batch[2]})
    assert gen.shape == (B, S, S, 3)
    # conditioning matters: zero vs ones mask give different velocities. The
    # out conv is zero-init (velocity ≡ 0 at init), so perturb params first.
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    leaves = [
        p + 0.05 * jax.random.normal(k, p.shape, p.dtype) for p, k in zip(leaves, keys)
    ]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    g0 = task.generate(variables, batch[0], num_steps=2, mask=jnp.zeros_like(batch[2]))
    g1 = task.generate(variables, batch[0], num_steps=2, mask=jnp.ones_like(batch[2]))
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    # omitting the mask is an error for the NON-toggled variant (review r3:
    # a silent zero mask is an input distribution this model never trained on)
    with pytest.raises(ValueError, match="requires the conditioning mask"):
        task.generate(variables, batch[0], num_steps=2)


def test_toggle_mask_training_flips_batch_mask():
    task = ToggleMaskFlowMatchingModule(net=tiny_unet(in_ch=4), toggle_prob=1.0, solver=SolverConfig("euler"))
    batch = img_batch(1, "mask")
    variables = task.init_variables(RNG, batch)
    # toggle_prob=1 ⇒ mask always zeroed in train ⇒ loss identical to zero-mask
    l_train, _, _ = task.loss_and_metrics(variables, batch, jax.random.key(3), train=True)
    zero_batch = (batch[0], batch[1], jnp.zeros_like(batch[2]))
    l_zero, _, _ = task.loss_and_metrics(variables, zero_batch, jax.random.key(3), train=True)
    np.testing.assert_allclose(float(l_train), float(l_zero), rtol=1e-5)
    # the toggled variant DOES support unconditioned generation (ref
    # toggle_mask.py:185 zeroes the mask at inference): mask=None is zeros
    g_none = task.generate(variables, batch[0], num_steps=2)
    g_zero = task.generate(variables, batch[0], num_steps=2, mask=jnp.zeros_like(batch[2]))
    np.testing.assert_allclose(np.asarray(g_none), np.asarray(g_zero), atol=1e-6)


def multitask_components(seg_out=1):
    feats = (8, 16)
    return dict(
        encoder=SharedEncoder(in_channels=3, features=feats),
        flow_decoder=FlowMatchingDecoder(
            bottleneck_channels=feats[-1], features=feats[:-1][::-1], out_channels=3, time_emb_dim=16
        ),
        seg_decoder=SegmentationDecoder(
            bottleneck_channels=feats[-1], features=feats[:-1][::-1], out_channels=seg_out
        ),
        solver=SolverConfig("euler"),
        time_emb_dim=16,
    )


def test_multitask_binary():
    task = MultitaskFlowMatchingModule(**multitask_components(seg_out=1))
    batch = img_batch(1, "mask")
    variables = task.init_variables(RNG, batch)
    loss, metrics, _ = task.loss_and_metrics(variables, batch, jax.random.key(1), train=True)
    assert {"loss", "flow_loss", "seg_loss", "seg_dice", "seg_bce"} <= set(metrics)
    _, eval_metrics, _ = task.loss_and_metrics(variables, batch, jax.random.key(1), train=False)
    assert {"dice_coef", "iou"} <= set(eval_metrics)
    img, mask = task.generate(variables, batch[0], num_steps=2)
    assert img.shape == (B, S, S, 3) and mask.shape == (B, S, S, 1)
    assert set(np.unique(np.asarray(mask))) <= {0.0, 1.0}


def test_multitask_fused_heads_match_separate_forward():
    # The 2B-batched encoder call must be numerically identical to two calls.
    task = MultitaskFlowMatchingModule(**multitask_components(seg_out=1))
    batch = img_batch(1, "mask")
    variables = task.init_variables(RNG, batch)
    src, tgt, _ = batch
    t = jnp.array([0.3, 0.7])
    xt = 0.5 * (src + tgt)
    vt_fused, seg_fused, updates = task._fused_heads(variables, t, xt, src, train=False)
    assert updates == {}  # GroupNorm default: no mutable collections
    vt_sep = task.forward_flow(variables, t, xt, train=False)
    seg_sep = task.forward_segmentation(variables, src, train=False)
    np.testing.assert_allclose(np.asarray(vt_fused), np.asarray(vt_sep), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seg_fused), np.asarray(seg_sep), atol=1e-5)


def test_multitask_batchnorm_trains_and_updates_stats():
    """norm='batch' (the reference SharedEncoder's BatchNorm,
    shared_encoder.py:15-19) must actually train: the fused heads apply with
    mutable batch_stats and the updates flow back per module (review r3 — the
    old path raised in flax or silently froze init-time stats)."""
    feats = (8, 16)
    task = MultitaskFlowMatchingModule(
        encoder=SharedEncoder(in_channels=3, features=feats, norm="batch"),
        flow_decoder=FlowMatchingDecoder(
            bottleneck_channels=feats[-1], features=feats[:-1][::-1],
            out_channels=3, time_emb_dim=16, norm="batch",
        ),
        seg_decoder=SegmentationDecoder(
            bottleneck_channels=feats[-1], features=feats[:-1][::-1],
            out_channels=1, norm="batch",
        ),
        solver=SolverConfig("euler"),
        time_emb_dim=16,
    )
    batch = img_batch(1, "mask")
    variables = task.init_variables(RNG, batch)
    assert "batch_stats" in variables
    loss, _, updates = task.loss_and_metrics(variables, batch, jax.random.key(1), train=True)
    assert np.isfinite(float(loss))
    assert set(updates["batch_stats"]) == {"encoder", "flow_decoder", "seg_decoder"}
    # running stats actually moved away from init
    old = jax.tree_util.tree_leaves(variables["batch_stats"]["encoder"])
    new = jax.tree_util.tree_leaves(updates["batch_stats"]["encoder"])
    assert any(not np.allclose(o, n) for o, n in zip(old, new))
    # eval consumes the (merged) stats immutably
    merged = {**variables, **updates}
    _, eval_metrics, eval_updates = task.loss_and_metrics(
        merged, batch, jax.random.key(2), train=False
    )
    assert eval_updates == {} and np.isfinite(float(eval_metrics["loss"]))


def test_multitask_multiclass():
    task = MultitaskMulticlassFlowMatchingModule(
        **multitask_components(seg_out=3), num_classes=3
    )
    batch = img_batch(1, "class_mask")
    variables = task.init_variables(RNG, batch)
    loss, metrics, _ = task.loss_and_metrics(variables, batch, jax.random.key(1), train=True)
    assert {"loss", "flow_loss", "seg_loss", "seg_dice", "seg_ce"} <= set(metrics)
    assert np.isfinite(float(loss))
    img, mask = task.generate(variables, batch[0], num_steps=2)
    assert img.shape == (B, S, S, 3) and mask.shape == (B, S, S)
    assert mask.dtype == jnp.int32


def test_multiclass_ignore_index_excludes_pixels():
    task = MultitaskMulticlassFlowMatchingModule(
        **multitask_components(seg_out=3), num_classes=3, ignore_index=255
    )
    batch = img_batch(1, "class_mask")
    variables = task.init_variables(RNG, batch)
    src, tgt, mask = batch
    all_ignored = jnp.full_like(mask, 255)
    _, m_ign, _ = task.loss_and_metrics(variables, (src, tgt, all_ignored), jax.random.key(1), train=True)
    # CE over zero valid pixels must be 0 (not NaN)
    assert np.isfinite(float(m_ign["seg_ce"]))
    assert float(m_ign["seg_ce"]) == pytest.approx(0.0, abs=1e-6)


def test_aux_fraction_task():
    from stain2stain_tpu.tasks import AuxFractionFlowMatchingModule

    task = AuxFractionFlowMatchingModule(
        net=tiny_unet(), aux_loss_weight=0.5, solver=SolverConfig("euler")
    )
    batch = img_batch(1, "mask")
    variables, loss, metrics, gen = run_task(task, batch)
    assert {"loss", "flow_loss", "aux_loss"} <= set(metrics)
    assert gen.shape == (B, S, S, 3)
    # fraction head regresses toward the mask's area fraction: with an
    # all-ones mask the target is 1.0 and aux loss is (sigmoid(x)-1)^2 < 1
    ones = (batch[0], batch[1], jnp.ones_like(batch[2]))
    _, m, _ = task.loss_and_metrics(variables, ones, jax.random.key(5), train=False)
    assert 0.0 <= float(m["aux_loss"]) < 1.0
