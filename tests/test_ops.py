"""Numerical tests for the CFM core, losses, solvers, and image ops.

These go beyond the reference's smoke-only test strategy (SURVEY.md §4): the
CFM path sampler, loss recipes, and ODE integrators are checked against
closed-form values, including torch-parity checks for the loss reductions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stain2stain_tpu.ops import (
    ConditionalFlowMatcher,
    bce_with_logits,
    denormalize,
    dice_loss,
    integrate,
    mse_loss,
    multiclass_dice_loss,
    normalize_uint8,
    odeint_dopri5,
    odeint_fixed,
    paired_random_crop_flip,
    per_class_dice_iou,
    roi_charbonnier,
    roi_weighted_mse,
    softmax_cross_entropy,
    timestep_embedding_adm,
)


# ------------------------------------------------------------------------ CFM
def test_cfm_straight_line_path():
    fm = ConditionalFlowMatcher(sigma=0.0)
    rng = jax.random.key(0)
    x0 = jnp.zeros((4, 8, 8, 3))
    x1 = jnp.ones((4, 8, 8, 3))
    t, xt, ut = fm.sample_location_and_conditional_flow(rng, x0, x1)
    assert t.shape == (4,)
    assert jnp.all((t >= 0) & (t <= 1))
    # xt must equal t (broadcast) since x0=0, x1=1; ut = x1 - x0 = 1.
    expected = np.broadcast_to(np.asarray(t)[:, None, None, None], xt.shape)
    np.testing.assert_allclose(np.asarray(xt), expected, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ut), 1.0)


def test_cfm_sigma_adds_noise():
    fm = ConditionalFlowMatcher(sigma=0.5)
    rng = jax.random.key(1)
    x0 = jnp.zeros((128, 4, 4, 1))
    x1 = jnp.zeros((128, 4, 4, 1))
    _, xt, _ = fm.sample_location_and_conditional_flow(rng, x0, x1)
    std = float(jnp.std(xt))
    assert 0.4 < std < 0.6  # ≈ sigma


# --------------------------------------------------------------------- losses
def test_mse_loss_value():
    a = jnp.zeros((2, 4, 4, 3))
    b = jnp.full((2, 4, 4, 3), 2.0)
    assert float(mse_loss(a, b)) == pytest.approx(4.0)


def test_roi_weighted_mse_matches_formula():
    rng = np.random.default_rng(0)
    vt = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    ut = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    mask = (rng.random((2, 8, 8, 1)) > 0.5).astype(np.float32)
    lam = 10.0
    w = 1.0 + lam * mask  # broadcast over channels
    w_full = np.broadcast_to(w, vt.shape)
    expected = (w_full * (vt - ut) ** 2).sum() / (w_full.sum() + 1e-8)
    got = float(roi_weighted_mse(jnp.asarray(vt), jnp.asarray(ut), jnp.asarray(mask), lam))
    assert got == pytest.approx(float(expected), rel=1e-5)


def test_roi_charbonnier_matches_formula():
    rng = np.random.default_rng(1)
    xt = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    x1 = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    mask = (rng.random((2, 8, 8, 1)) > 0.3).astype(np.float32)
    eps = 1e-3
    charb = np.sqrt((xt - x1) ** 2 + eps**2)
    expected = (charb * mask).sum() / (mask.sum() * 3 + 1e-8)
    got = float(roi_charbonnier(jnp.asarray(xt), jnp.asarray(x1), jnp.asarray(mask), eps))
    assert got == pytest.approx(float(expected), rel=1e-5)


def test_dice_loss_perfect_and_worst():
    target = jnp.ones((1, 4, 4, 1))
    perfect = dice_loss(jnp.full((1, 4, 4, 1), 100.0), target)  # sigmoid→1
    assert float(perfect) == pytest.approx(0.0, abs=1e-3)
    worst = dice_loss(jnp.full((1, 4, 4, 1), -100.0), target)  # sigmoid→0
    assert float(worst) == pytest.approx(1.0 - 1.0 / 17.0, abs=1e-3)  # smooth=1


def test_bce_with_logits_matches_torch_semantics():
    import torch

    rng = np.random.default_rng(2)
    logits = rng.normal(size=(2, 4, 4, 1)).astype(np.float32)
    target = (rng.random((2, 4, 4, 1)) > 0.5).astype(np.float32)
    expected = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(target)
    ).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(target)))
    assert got == pytest.approx(expected, rel=1e-4)


def test_multiclass_dice_and_ce_with_ignore_index():
    import torch

    rng = np.random.default_rng(3)
    num_classes = 4
    logits = rng.normal(size=(2, 8, 8, num_classes)).astype(np.float32)
    target = rng.integers(0, num_classes, size=(2, 8, 8)).astype(np.int32)
    target[0, :2] = -100  # ignored region

    # CE parity with torch (ignore_index, mean over valid)
    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)
    expected_ce = torch.nn.functional.cross_entropy(
        t_logits, torch.from_numpy(target).long(), ignore_index=-100
    ).item()
    got_ce = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(target), ignore_index=-100))
    assert got_ce == pytest.approx(expected_ce, rel=1e-5)

    # Dice: check perfect prediction gives ~0 loss on valid region
    perfect = np.full_like(logits, -100.0)
    safe_target = np.where(target < 0, 0, target)
    np.put_along_axis(perfect, safe_target[..., None], 100.0, axis=-1)
    loss = float(
        multiclass_dice_loss(jnp.asarray(perfect), jnp.asarray(target), num_classes, ignore_index=-100)
    )
    assert loss < 0.02


def test_per_class_dice_iou_perfect():
    target = jnp.array([[[0, 1], [2, 3]]], dtype=jnp.int32)  # (1, 2, 2)
    logits = jax.nn.one_hot(target, 4) * 100.0
    dice, iou = per_class_dice_iou(logits, target, num_classes=4)
    np.testing.assert_allclose(np.asarray(dice), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(iou), 1.0, rtol=1e-4)


# -------------------------------------------------------------------- solvers
def test_euler_linear_field_exact():
    # dx/dt = c (constant): Euler is exact regardless of step count.
    c = 3.0
    x0 = jnp.zeros((2, 4))
    out = odeint_fixed(lambda t, x: jnp.full_like(x, c), x0, num_steps=2, method="euler")
    np.testing.assert_allclose(np.asarray(out), c, rtol=1e-6)


@pytest.mark.parametrize("method,steps,tol", [
    ("euler", 200, 2e-2),
    ("midpoint", 50, 1e-3),
    ("heun", 50, 1e-3),
    ("rk4", 20, 1e-5),
])
def test_fixed_solvers_exponential(method, steps, tol):
    # dx/dt = x, x(0)=1 → x(1) = e
    x0 = jnp.ones((1,))
    out = odeint_fixed(lambda t, x: x, x0, num_steps=steps, method=method)
    assert float(out[0]) == pytest.approx(float(np.e), rel=tol)


def test_dopri5_exponential():
    x0 = jnp.ones((3, 5))
    out = odeint_dopri5(lambda t, x: x, x0, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.e, rtol=1e-5)


def test_trajectory_nodes():
    x0 = jnp.zeros((1,))
    traj = odeint_fixed(lambda t, x: jnp.ones_like(x), x0, num_steps=5, method="euler", return_trajectory=True)
    assert traj.shape == (5, 1)
    np.testing.assert_allclose(np.asarray(traj[:, 0]), [0, 0.25, 0.5, 0.75, 1.0], rtol=1e-6)


def test_integrate_dispatch():
    x0 = jnp.ones((2,))
    out = integrate(lambda t, x: x, x0, num_steps=2, method="dopri5")
    np.testing.assert_allclose(np.asarray(out), np.e, rtol=1e-3)


def test_solver_is_jittable():
    fn = jax.jit(lambda x: odeint_fixed(lambda t, y: -y, x, num_steps=10, method="rk4"))
    out = fn(jnp.ones((2, 2)))
    np.testing.assert_allclose(np.asarray(out), 1 / np.e, rtol=1e-4)


# ------------------------------------------------------------------ image ops
def test_normalize_denormalize_roundtrip():
    img = jnp.asarray(np.arange(0, 256, 5, dtype=np.uint8).reshape(1, -1, 1, 1))
    norm = normalize_uint8(img)
    assert float(norm.min()) == pytest.approx(-1.0)
    assert float(norm.max()) == pytest.approx(1.0, abs=0.01)
    denorm = denormalize(norm)
    np.testing.assert_allclose(np.asarray(denorm[0, :, 0, 0]), np.arange(0, 256, 5) / 255.0, atol=0.005)


def test_paired_crop_flip_keeps_alignment():
    rng = jax.random.key(0)
    base = jnp.arange(2 * 16 * 16 * 1, dtype=jnp.float32).reshape(2, 16, 16, 1)
    src, tgt = base, base * 2.0  # perfectly correlated pair
    out_src, out_tgt = paired_random_crop_flip(rng, [src, tgt], crop_size=8)
    assert out_src.shape == (2, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(out_tgt), np.asarray(out_src) * 2.0)


def test_paired_crop_randomness_covers_offsets():
    src = jnp.arange(1 * 32 * 32 * 1, dtype=jnp.float32).reshape(1, 32, 32, 1)
    corners = set()
    for i in range(20):
        (out,) = paired_random_crop_flip(jax.random.key(i), [src], crop_size=8, hflip=False, vflip=False)
        corners.add(float(out[0, 0, 0, 0]))
    assert len(corners) > 5  # actually random


# --------------------------------------------------------------- time embeds
def test_timestep_embedding_shape_and_parity():
    t = jnp.array([0.0, 0.5, 1.0])
    emb = timestep_embedding_adm(t, 128)
    assert emb.shape == (3, 128)
    # t=0 → cos part all ones, sin part all zeros.
    np.testing.assert_allclose(np.asarray(emb[0, :64]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 64:]), 0.0, atol=1e-6)
