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
