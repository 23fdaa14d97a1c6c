"""Mesh/sharding tests. Multi-device cases run on the virtual CPU mesh
(S2S_CPU_MESH=1) and skip on single-device runs; the driver's
dryrun_multichip covers the full sharded train step separately."""

import jax
import numpy as np
import pytest

from stain2stain_tpu.parallel import (
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated_sharding,
    shard_batch,
)

from .conftest import needs_multi_device


def test_create_mesh_single_device():
    mesh = create_mesh(num_devices=1)
    assert mesh.shape == {"data": 1, "fsdp": 1}


def test_mesh_rejects_bad_fsdp():
    with pytest.raises(ValueError):
        create_mesh(num_devices=1, fsdp=3)


@needs_multi_device
def test_batch_shards_over_mesh():
    n = jax.device_count()
    mesh = create_mesh(fsdp=2 if n % 2 == 0 else 1)
    batch = np.arange(n * 4 * 3, dtype=np.float32).reshape(n * 4, 3)
    arr = shard_batch(mesh, batch)
    assert arr.shape == (n * 4, 3)
    assert len(arr.sharding.device_set) == n
    np.testing.assert_array_equal(np.asarray(arr), batch)


@needs_multi_device
def test_param_shardings_split_large_dims():
    n = jax.device_count()
    if n % 2:
        pytest.skip("needs an even device count for fsdp=2")
    mesh = create_mesh(fsdp=2)
    params = {
        "big": np.zeros((2048, 16), np.float32),
        "small": np.zeros((8, 8), np.float32),
    }
    shardings = param_shardings(mesh, params)
    assert shardings["big"].spec[0] == "fsdp"  # largest dim sharded
    assert all(s is None for s in shardings["big"].spec[1:])
    assert shardings["small"].spec == jax.sharding.PartitionSpec()


@needs_multi_device
def test_trainer_fsdp_end_to_end(tmp_path):
    from stain2stain_tpu.data import PairedDataModule
    from stain2stain_tpu.data.synthetic import generate_paired_dataset
    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.ops.solvers import SolverConfig
    from stain2stain_tpu.tasks import ConditionalFlowMatchingModule
    from stain2stain_tpu.training import Adam, ModelCheckpoint, Trainer

    if jax.device_count() % 2:
        pytest.skip("needs an even device count for fsdp=2")
    root = generate_paired_dataset(tmp_path / "d", n_train=8, n_val=4, n_test=2, size=20)
    dm = PairedDataModule(data_dir=str(root), batch_size=8, image_size=16, num_workers=1)
    net = UNetModel(
        dim=(3, 16, 16), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1,
        fused_attention=jax.default_backend() == "tpu",
    )
    task = ConditionalFlowMatchingModule(
        net=net, optimizer=lambda: Adam(lr=1e-3), solver=SolverConfig("euler")
    )
    trainer = Trainer(
        default_root_dir=str(tmp_path / "logs"), max_epochs=1, fsdp=2, fsdp_min_size=8,
        callbacks=[ModelCheckpoint(save_last=True)], logger=False,
    )
    trainer.fit(task, dm)
    sharded = [
        p for p in jax.tree_util.tree_leaves(trainer.state.params)
        if any(s == "fsdp" for s in (p.sharding.spec or ()) if s)
    ]
    assert sharded, "no param actually sharded over the fsdp axis"
    # ragged eval batch (2 test examples over the mesh) pads and runs
    metrics = trainer.test(task, dm, ckpt_path=trainer.checkpoint_callback.last_model_path)
    assert np.isfinite(metrics["test/loss"])


@needs_multi_device
def test_trainer_chained_dispatch_over_mesh(tmp_path):
    """steps_per_execution stacks (steps, batch, ...) and shards the batch
    axis over the full mesh (chunk_sharding): the trainer/tpu.yaml default
    must work data-parallel, not just single-device."""
    from stain2stain_tpu.data import PairedDataModule
    from stain2stain_tpu.data.synthetic import generate_paired_dataset
    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.ops.solvers import SolverConfig
    from stain2stain_tpu.tasks import ConditionalFlowMatchingModule
    from stain2stain_tpu.training import Adam, Trainer

    root = generate_paired_dataset(tmp_path / "d", n_train=16, n_val=4, n_test=2, size=20)
    dm = PairedDataModule(data_dir=str(root), batch_size=8, image_size=16, num_workers=1)
    net = UNetModel(
        dim=(3, 16, 16), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1,
    )
    task = ConditionalFlowMatchingModule(
        net=net, optimizer=lambda: Adam(lr=1e-3), solver=SolverConfig("euler")
    )
    trainer = Trainer(
        default_root_dir=str(tmp_path / "logs"), max_epochs=1,
        steps_per_execution=2, logger=False,
    )
    trainer.fit(task, dm)
    assert trainer.global_step == 2  # 16 tiles / batch 8
    assert trainer._chunks_dispatched == 1
    assert np.isfinite(trainer.callback_metrics.get("train/loss", np.nan))


def test_flatten_padded_matches_per_tensor_adam():
    """flatten_padded is a pure layout change: identical updates to the
    per-tensor Adam chain, with the moment vectors padded to FLAT_ALIGN."""
    import jax.numpy as jnp

    from stain2stain_tpu.training.optim import FLAT_ALIGN, Adam

    params = {
        "w": jnp.linspace(-1.0, 1.0, 37, dtype=jnp.float32).reshape(37, 1),
        "b": jnp.asarray([0.5, -0.25, 3.0], jnp.float32),
    }
    grads = jax.tree_util.tree_map(lambda p: 0.1 * p + 0.01, params)

    flat_tx, plain_tx = Adam(lr=1e-3, flatten=True), Adam(lr=1e-3, flatten=False)
    flat_state, plain_state = flat_tx.init(params), plain_tx.init(params)
    for _ in range(3):
        flat_up, flat_state = flat_tx.update(grads, flat_state, params)
        plain_up, plain_state = plain_tx.update(grads, plain_state, params)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(flat_up[k]), np.asarray(plain_up[k]), rtol=1e-6, atol=1e-7
            )
    # the moment vectors are padded so any power-of-two fsdp axis divides them
    moment_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(flat_state)
        if getattr(leaf, "ndim", 0) == 1 and leaf.size >= FLAT_ALIGN
    ]
    assert moment_leaves, "expected flat moment vectors in the optimizer state"
    assert all(leaf.size % FLAT_ALIGN == 0 for leaf in moment_leaves)
    # LR plateau controller still reaches the injected hyperparams
    from stain2stain_tpu.training.optim import get_learning_rate, set_learning_rate

    assert get_learning_rate(flat_state) == pytest.approx(1e-3)
    flat_state = set_learning_rate(flat_state, 5e-4)
    assert get_learning_rate(flat_state) == pytest.approx(5e-4)


@needs_multi_device
def test_fsdp_shards_flat_optimizer_moments(tmp_path):
    """The ZeRO axis must cover the optimizer state: with the default
    flatten=True Adam, the padded flat moment vectors carry 'fsdp' in their
    PartitionSpec under the Trainer's fsdp path (ADVICE r2: unpadded flat
    moments silently replicated ~280 MB/moment/device)."""
    from stain2stain_tpu.data import PairedDataModule
    from stain2stain_tpu.data.synthetic import generate_paired_dataset
    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.tasks import ConditionalFlowMatchingModule
    from stain2stain_tpu.training import Adam, Trainer

    if jax.device_count() % 2:
        pytest.skip("needs an even device count for fsdp=2")
    root = generate_paired_dataset(tmp_path / "d", n_train=4, n_val=2, n_test=2, size=20)
    dm = PairedDataModule(data_dir=str(root), batch_size=4, image_size=16, num_workers=1)
    net = UNetModel(
        dim=(3, 16, 16), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1,
        fused_attention=jax.default_backend() == "tpu",
    )
    task = ConditionalFlowMatchingModule(net=net, optimizer=lambda: Adam(lr=1e-3))
    trainer = Trainer(
        default_root_dir=str(tmp_path / "logs"), max_epochs=1, fsdp=2,
        fsdp_min_size=8, limit_train_batches=1, limit_val_batches=1, logger=False,
    )
    trainer.fit(task, dm)
    sharded = [
        leaf for leaf in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if any(ax == "fsdp" for ax in (getattr(leaf.sharding, "spec", ()) or ()) if ax)
    ]
    # both Adam moment vectors (mu, nu) at minimum
    assert len(sharded) >= 2, "flat Adam moments not sharded over the fsdp axis"
