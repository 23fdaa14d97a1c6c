"""Noise-free quality control: more ODE steps must not degrade quality.

Round-2's only quality data point used the default synthetic pairs, whose
independent per-tile blob noise makes exact translation impossible by
construction — and showed 2-step generation scoring BETTER than 50-step
(BASELINE.md r2), leaving open whether the solver/training stack was wrong.
This control removes the noise: with ``deterministic=True`` the target is an
exact function of the source (synthetic.make_tile_pair), so a converged CFM
must translate near-perfectly and SSIM/PSNR must be monotone-ish (not
degrading) in the ODE step count.

Reference inference contract under test:
/root/reference/src/models/conditional_flow_matching.py:157-170 (ODE from the
source at t=0 to the target stain at t=1; 2 steps for logging/simple FM, 50
for multitask).
"""

import jax
import numpy as np
import pytest

# slow tier: a few hundred real train steps on the accelerator
pytestmark = pytest.mark.slow


def test_ssim_not_degrading_with_ode_steps(tmp_path):
    from stain2stain_tpu.data import PairedDataModule
    from stain2stain_tpu.data.synthetic import generate_paired_dataset
    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.ops.metrics import evaluate_quality
    from stain2stain_tpu.tasks import ConditionalFlowMatchingModule
    from stain2stain_tpu.training import Adam, Trainer
    from stain2stain_tpu.utils.seed import seed_everything

    # Pin the global seed: an earlier in-process train() (e.g. test_infer's
    # fixture) leaves its own seed behind, and this control's convergence
    # gate is calibrated for seed 0.
    seed_everything(0)

    root = generate_paired_dataset(
        tmp_path / "d", n_train=64, n_val=8, n_test=8, size=32, deterministic=True
    )
    dm = PairedDataModule(
        data_dir=str(root), batch_size=16, image_size=32, num_workers=2,
        use_augmentation=False,
    )
    net = UNetModel(
        dim=(3, 32, 32), num_channels=16, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1, dropout=0.0,
    )
    task = ConditionalFlowMatchingModule(net=net, optimizer=lambda: Adam(lr=2e-3))
    trainer = Trainer(
        default_root_dir=str(tmp_path / "logs"), max_epochs=150,
        check_val_every_n_epoch=50, log_every_n_steps=1000, logger=False,
    )
    trainer.fit(task, dm)
    assert trainer.callback_metrics["val/loss"] < 0.02, (
        "control CFM failed to converge on the exactly-learnable dataset: "
        f"val/loss={trainer.callback_metrics['val/loss']:.4f}"
    )

    dm.setup("test")
    by_steps = {}
    for num_steps in (2, 8, 50):
        m = evaluate_quality(
            task, trainer.state.variables, dm.test_dataloader(), num_steps=num_steps
        )
        by_steps[num_steps] = m
    ssim2, ssim8, ssim50 = (by_steps[n]["ssim"] for n in (2, 8, 50))
    print(f"# quality control ssim: 2-step={ssim2:.3f} 8-step={ssim8:.3f} 50-step={ssim50:.3f}")
    # CFM paths are straight lines, so for the EXACT velocity field every
    # Euler step count yields the identical endpoint — any step-count gap
    # measures accumulated field-approximation error, which at this smoke
    # scale is a few 0.01 SSIM (measured: 0.768/0.753/0.736 @ 2/8/50). The
    # r2-style catastrophic inversion (0.55 @ 2-step vs 0.33 @ 50-step on
    # noisy pairs — a 0.22 gap) must not reproduce on this noise-free
    # control, and all step counts must translate well.
    assert ssim50 >= ssim2 - 0.05, f"50-step degraded vs 2-step: {ssim50:.3f} < {ssim2:.3f}"
    assert ssim8 >= ssim2 - 0.05, f"8-step degraded vs 2-step: {ssim8:.3f} < {ssim2:.3f}"
    # Absolute gate, calibrated per platform: the TPU point (bf16 convs +
    # hardware-rbg trainer RNG) converges to 0.768; the CPU point (f32 convs,
    # threefry) to 0.665 at the same budget — same data, same init, different
    # backend numerics. Monotonicity above is the platform-independent claim.
    min_ssim = 0.7 if jax.default_backend() == "tpu" else 0.6
    assert ssim50 > min_ssim, f"converged control should translate well, ssim={ssim50:.3f}"
