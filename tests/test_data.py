"""Data-pipeline tests: every reference datamodule equivalent yields batches
with the right shapes/dtypes/semantics from synthetic fixtures (the reference
ships no data; SURVEY.md §4 calls for hermetic tiny-config runs).
"""

import json

import numpy as np
import pytest

from stain2stain_tpu.data import (
    ClassConditionalAnyToAnyDataModule,
    DataLoader,
    MNISTDataModule,
    PairedDataModule,
    PairedHEIHCDataModule,
    PairedMulticlassDataModule,
    PairedPosNegDataModule,
)
from stain2stain_tpu.data.mnist_datamodule import ArrayDataset
from stain2stain_tpu.data.synthetic import (
    generate_domain_folders,
    generate_paired_dataset,
    generate_pos_neg_layout,
)


@pytest.fixture(scope="module")
def paired_root(tmp_path_factory):
    return generate_paired_dataset(
        tmp_path_factory.mktemp("paired"), n_train=6, n_val=3, n_test=3, size=48,
        with_mask=True, num_mask_classes=3,
    )


def test_paired_datamodule_batches(paired_root):
    dm = PairedDataModule(
        data_dir=str(paired_root), batch_size=2, num_workers=2, image_size=32,
        use_augmentation=True, load_size=48,
    )
    dm.setup()
    batch = next(iter(dm.train_dataloader()))
    src, tgt = batch
    # augmentation crops on device → host yields load_size tiles
    assert src.shape == (2, 48, 48, 3) and src.dtype == np.uint8
    assert tgt.shape == (2, 48, 48, 3)
    assert dm.train_augment == {"crop_size": 32, "hflip": True, "vflip": True}
    val = next(iter(dm.val_dataloader()))
    assert val[0].shape == (2, 32, 32, 3)  # eval path resizes straight


def test_paired_direction_swap(paired_root):
    fwd = PairedDataModule(data_dir=str(paired_root), batch_size=2, image_size=32, num_workers=1)
    rev = PairedDataModule(
        data_dir=str(paired_root), batch_size=2, image_size=32, direction="T2S", num_workers=1
    )
    fwd.setup(), rev.setup()
    f = next(iter(fwd.val_dataloader()))
    r = next(iter(rev.val_dataloader()))
    np.testing.assert_array_equal(f[0], r[1])
    np.testing.assert_array_equal(f[1], r[0])


def test_mask_datamodule_binarizes(paired_root):
    dm = PairedHEIHCDataModule(
        data_dir=str(paired_root), batch_size=2, image_size=32, num_workers=1,
        mask_column="amyloid_filepath",
    )
    dm.setup()
    he, ihc, mask = next(iter(dm.train_dataloader()))
    assert he.shape == (2, 32, 32, 3)
    assert mask.shape == (2, 32, 32, 1) and mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 1}  # >1 → 1 binarization


def test_multiclass_datamodule_keeps_class_ids(paired_root):
    dm = PairedMulticlassDataModule(
        data_dir=str(paired_root), batch_size=2, image_size=32, num_workers=1,
        source_column="he_filepath", target_column="ihc_filepath",
        mask_column="graywhite_filepath",
    )
    dm.setup()
    src, tgt, mask = next(iter(dm.train_dataloader()))
    assert mask.shape == (2, 32, 32) and mask.dtype == np.int32
    assert mask.max() >= 0  # integer ids preserved, no normalize


def test_any2any_datamodule_split_and_labels(tmp_path):
    root = generate_domain_folders(tmp_path / "domains", n_images=8, size=48)
    dm = ClassConditionalAnyToAnyDataModule(
        data_dir=str(root), crop_size=32, batch_size=2, num_workers=1, val_split=0.25
    )
    dm.prepare_data()
    split = json.loads((root / "train_val_split.json").read_text())
    assert split["train_files"] == 6 and split["val_files"] == 2
    # idempotent: second call must not rewrite
    dm.prepare_data()
    dm.setup()
    src, tgt, label = next(iter(dm.train_dataloader()))
    assert src.shape == (2, 32, 32, 3) and tgt.shape == (2, 32, 32, 3)
    assert label.dtype == np.int32 and set(label.tolist()) <= {0, 1, 2}
    # per-epoch domain resampling: labels change across epochs
    loader = dm.train_dataloader()
    loader.set_epoch(0)
    l0 = [b[2].tolist() for b in loader]
    loader.set_epoch(1)
    l1 = [b[2].tolist() for b in loader]
    assert l0 != l1


def test_posneg_datamodule_weights_and_mixing(tmp_path):
    root = generate_pos_neg_layout(tmp_path / "pn", n_pos_train=6, n_neg=2, size=48)
    dm = PairedPosNegDataModule(
        data_dir=str(root), batch_size=4, num_workers=1, image_size=48, crop_size=48,
        use_negative_data=True, negative_data_dir=str(root),
    )
    dm.setup()
    assert len(dm.data_train) == 8
    w = dm._train_weights
    assert w is not None and len(w) == 8
    # 1/N weights: negatives (2) weigh 3× positives (6)
    assert w[-1] == pytest.approx(3 * w[0])
    batch = next(iter(dm.train_dataloader()))
    assert batch[0].shape == (4, 48, 48, 3)


def test_posneg_defaults_positive_only(tmp_path):
    """Reference parity (paired_postive_negative...py:186,245): negatives are
    opt-in, and the flag alone without a directory trains positive-only
    instead of crashing."""
    root = generate_pos_neg_layout(tmp_path / "pn", n_pos_train=6, n_neg=2, size=48)
    dm = PairedPosNegDataModule(
        data_dir=str(root), batch_size=2, num_workers=1, image_size=48
    )
    dm.setup()
    assert len(dm.data_train) == 6 and dm._train_weights is None
    dm2 = PairedPosNegDataModule(
        data_dir=str(root), batch_size=2, num_workers=1, image_size=48,
        use_negative_data=True,  # no negative_data_dir -> positive-only
    )
    dm2.setup()
    assert len(dm2.data_train) == 6


def test_posneg_crop_resize_collates_with_positives(tmp_path):
    """crop_size != image_size: negative crops are resized to image_size so
    the mixed batch collates (review r3)."""
    root = generate_pos_neg_layout(tmp_path / "pn", n_pos_train=4, n_neg=2, size=48)
    dm = PairedPosNegDataModule(
        data_dir=str(root), batch_size=2, num_workers=1, image_size=32, crop_size=48,
        use_negative_data=True, negative_data_dir=str(root),
    )
    dm.setup()
    batch = next(iter(dm.train_dataloader()))
    assert batch[0].shape == (2, 32, 32, 3)


def test_mnist_datamodule_synthetic_fallback():
    dm = MNISTDataModule(data_dir="/nonexistent", batch_size=8, synthetic_size=200)
    dm.setup()
    n = len(dm.data_train) + len(dm.data_val) + len(dm.data_test)
    assert n == 200
    # 55k/5k/10k proportions scaled down
    assert len(dm.data_train) == int(200 * 55 / 70)
    x, y = next(iter(dm.train_dataloader()))
    assert x.shape == (8, 28, 28) and x.dtype == np.uint8
    assert y.dtype == np.int32 and y.min() >= 0 and y.max() <= 9


def test_dataloader_determinism_and_sharding():
    images = np.arange(16, dtype=np.uint8).reshape(16, 1)
    ds = ArrayDataset(images, np.zeros(16, np.int64))
    mk = lambda shard: DataLoader(
        ds, batch_size=8, shuffle=True, seed=3, num_workers=1,
        shard_index=shard, num_shards=2,
    )
    a0 = [b[0].ravel().tolist() for b in mk(0)]
    a0_again = [b[0].ravel().tolist() for b in mk(0)]
    a1 = [b[0].ravel().tolist() for b in mk(1)]
    assert a0 == a0_again  # deterministic under a fixed seed+epoch
    # shards partition each global batch: 4 per shard, disjoint, union = 8
    for b0, b1 in zip(a0, a1):
        assert len(b0) == len(b1) == 4
        assert not (set(b0) & set(b1))
    loader = mk(0)
    loader.set_epoch(1)
    assert [b[0].ravel().tolist() for b in loader] != a0  # reshuffles per epoch


def test_dataloader_propagates_worker_errors():
    class Boom(ArrayDataset):
        def __getitem__(self, idx):
            raise RuntimeError("decode failed")

    ds = Boom(np.zeros((4, 1), np.uint8), np.zeros(4, np.int64))
    loader = DataLoader(ds, batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        next(iter(loader))


def test_native_batch_decode_matches_per_item(paired_root):
    from stain2stain_tpu.data import native

    if not native.available():
        pytest.skip("native loader not built")
    dm = PairedDataModule(data_dir=str(paired_root), batch_size=2, image_size=32, num_workers=1)
    dm.setup()
    ds = dm.datasets["val"]
    batch = ds.get_batch([0, 1])
    assert batch is not None
    per_item = [ds[i] for i in (0, 1)]
    # bilinear resize parity: native is within ±1 uint8 step of cv2
    for field in range(2):
        got = batch[field].astype(int)
        want = np.stack([s[field] for s in per_item]).astype(int)
        assert np.abs(got - want).max() <= 1


def test_native_mask_batch_binarizes(paired_root):
    from stain2stain_tpu.data import native

    if not native.available():
        pytest.skip("native loader not built")
    dm = PairedHEIHCDataModule(
        data_dir=str(paired_root), batch_size=2, image_size=32, num_workers=1
    )
    dm.setup()
    batch = dm.datasets["train"].get_batch([0, 1, 2])
    assert batch[2].shape == (3, 32, 32, 1)
    assert set(np.unique(batch[2])) <= {0, 1}


def test_direction_reference_compat(paired_root, configs_dir):
    """Config-level parity: the shipped paired_data.yaml (direction: HE_to_IHC,
    direction_compat: reference) must swap the pair exactly like the reference
    (/root/reference/src/data/paired_data_module.py:214 swaps for ANY value
    other than 'S2T'), while direction_compat='explicit' keeps it forward."""
    import warnings

    import yaml

    cfg = yaml.safe_load((configs_dir / "data" / "paired_data.yaml").read_text())
    assert cfg["direction"] == "HE_to_IHC"
    assert cfg.get("direction_compat", "reference") == "reference"

    fwd = PairedDataModule(data_dir=str(paired_root), batch_size=2, image_size=32, num_workers=1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        ref = PairedDataModule(
            data_dir=str(paired_root), batch_size=2, image_size=32, num_workers=1,
            direction=cfg["direction"], direction_compat="reference",
        )
        explicit = PairedDataModule(
            data_dir=str(paired_root), batch_size=2, image_size=32, num_workers=1,
            direction=cfg["direction"], direction_compat="explicit",
        )
        fwd.setup(), ref.setup(), explicit.setup()
    assert any("REVERSE" in str(w.message) for w in caught), "swap warning must fire"
    f = next(iter(fwd.val_dataloader()))
    r = next(iter(ref.val_dataloader()))
    e = next(iter(explicit.val_dataloader()))
    np.testing.assert_array_equal(f[0], r[1])  # reference compat: swapped
    np.testing.assert_array_equal(f[1], r[0])
    np.testing.assert_array_equal(f[0], e[0])  # explicit: forward as written
    np.testing.assert_array_equal(f[1], e[1])


def test_synthetic_module_deterministic_variant(tmp_path):
    """deterministic=True yields a separate, exactly-learnable dataset tree
    (the noise-free quality control; synthetic.make_tile_pair)."""
    from stain2stain_tpu.data.synthetic_module import SyntheticPairedDataModule

    kw = dict(data_dir=str(tmp_path), n_train=4, n_val=2, n_test=2,
              tile_size=32, image_size=32, batch_size=2, num_workers=0)
    det = SyntheticPairedDataModule(deterministic=True, **kw)
    noisy = SyntheticPairedDataModule(deterministic=False, **kw)
    assert det.data_dir != noisy.data_dir, "variants must not collide on disk"
    det.prepare_data()
    det.setup("fit")
    batch = next(iter(det.train_dataloader()))
    assert batch[0].shape == (2, 32, 32, 3)
    # Regenerating with the same seed is bit-identical (exact function of the
    # source + seeded structure field).
    import numpy as np

    again = SyntheticPairedDataModule(deterministic=True, **kw)
    again.prepare_data()
    again.setup("fit")
    batch2 = next(iter(again.train_dataloader()))
    np.testing.assert_array_equal(np.asarray(batch[0]), np.asarray(batch2[0]))


def test_device_cache_loader_matches_streaming(paired_root):
    """cache='device' yields the SAME example stream as the streaming loader
    (ordering/shuffle/shard logic is shared via _local_batches), with array
    fields living on device (data/device_cache.py)."""
    import jax

    kw = dict(
        data_dir=str(paired_root), batch_size=2, num_workers=2, image_size=32,
        use_augmentation=True, load_size=48, seed=3,
    )
    stream = PairedDataModule(**kw)
    cached = PairedDataModule(cache="device", **kw)
    for dm in (stream, cached):
        dm.setup("fit")
    for epoch in (0, 1):
        s_loader, c_loader = stream.train_dataloader(), cached.train_dataloader()
        s_loader.set_epoch(epoch)
        c_loader.set_epoch(epoch)
        s_batches, c_batches = list(s_loader), list(c_loader)
        assert len(s_batches) == len(c_batches) > 0
        for sb, cb in zip(s_batches, c_batches):
            assert isinstance(cb[0], jax.Array), "cached batches must be device-resident"
            for sf, cf in zip(sb, cb):
                np.testing.assert_array_equal(np.asarray(sf), np.asarray(cf))
    # eval loaders (no shuffle, ragged final batch) match too
    sv = list(stream.val_dataloader())
    cv = list(cached.val_dataloader())
    assert len(sv) == len(cv)
    for sb, cb in zip(sv, cv):
        np.testing.assert_array_equal(np.asarray(sb[1]), np.asarray(cb[1]))


def test_device_cache_loader_mask_fields(paired_root):
    """Mask datamodules cache every array field (image, image, mask)."""
    import jax

    dm = PairedMulticlassDataModule(
        data_dir=str(paired_root), batch_size=2, num_workers=2, image_size=32,
        source_column="he_filepath", target_column="ihc_filepath",
        mask_column="graywhite_filepath", cache="device",
    )
    dm.setup("fit")
    batch = next(iter(dm.train_dataloader()))
    assert all(isinstance(f, jax.Array) for f in batch[:3])
    assert batch[2].shape[0] == 2  # class-mask field gathered alongside


def test_device_cache_budget_guard(paired_root):
    from stain2stain_tpu.data.device_cache import DeviceCacheLoader

    dm = PairedDataModule(data_dir=str(paired_root), batch_size=2, image_size=32)
    dm.setup("fit")
    loader = DeviceCacheLoader(
        dm.datasets["train"], batch_size=2, max_cache_bytes=64,
    )
    with pytest.raises(ValueError, match="device cache"):
        next(iter(loader))


def test_trainer_fit_with_device_cache(tmp_path):
    """E2E: a tiny CFM fit + eval on device-cached data, chained dispatch on —
    exercises the jax-Array passthrough in Trainer._device_batch and the
    device-side chunk stacking."""
    from stain2stain_tpu.data.synthetic_module import SyntheticPairedDataModule
    from stain2stain_tpu.models import UNetModel
    from stain2stain_tpu.ops.solvers import SolverConfig
    from stain2stain_tpu.tasks import ConditionalFlowMatchingModule
    from stain2stain_tpu.training import CSVLogger, ModelCheckpoint, Trainer
    from stain2stain_tpu.training.optim import Adam

    # batch 8: divisible by the 8-device virtual mesh (S2S_CPU_MESH) so
    # chained dispatch can engage; 16 examples -> 2 steps/epoch = 1 chunk
    dm = SyntheticPairedDataModule(
        data_dir=str(tmp_path / "ds"), n_train=16, n_val=8, n_test=8,
        tile_size=48, image_size=32, batch_size=8, num_workers=0,
        use_augmentation=True, cache="device",
    )
    net = UNetModel(dim=(3, 32, 32), num_channels=8, num_res_blocks=1,
                    channel_mult=(1, 2), attention_resolutions="", num_heads=1,
                    fused_attention=False)
    task = ConditionalFlowMatchingModule(
        net=net, optimizer=lambda: Adam(lr=1e-3), solver=SolverConfig("euler")
    )
    trainer = Trainer(
        default_root_dir=str(tmp_path / "logs"), max_epochs=2,
        steps_per_execution=2,
        callbacks=[ModelCheckpoint(save_last=True)],
        logger=CSVLogger(str(tmp_path / "logs")),
    )
    trainer.fit(task, dm)
    assert trainer._chunks_dispatched > 0, "chained dispatch must engage on cached batches"
    assert "val/loss" in trainer.callback_metrics
    assert np.isfinite(trainer.callback_metrics["val/loss"])
