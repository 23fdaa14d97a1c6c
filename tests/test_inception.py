"""Tests for the JAX InceptionV3 FID extractor (ops/inception.py).

Real pretrained weights cannot exist in this image (no torchvision, no
egress), so these tests validate what can be validated offline: the complete
architecture topology (every conv feeds the next block with consistent
channel counts down to the 2048-d pool3 output), the BN-folding math of the
loader, the converter npz round trip, and the FeatureExtractor plumbing that
selects the Inception path when a weights file is present.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stain2stain_tpu.ops import inception
from stain2stain_tpu.ops.metrics import FeatureExtractor


def test_architecture_forward_shape():
    # Running the full topology with random weights exercises every channel
    # count in CONV_SPECS — any inconsistency fails the conv/concat shapes.
    params = inception.init_params(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    feats = inception.pool3_features(params, x)
    assert feats.shape == (2, inception.FEATURE_DIM)
    assert np.isfinite(np.asarray(feats)).all()
    # stock (non-FID) pooling variant also runs
    feats2 = inception.pool3_features(params, x, fid_variant=False)
    assert feats2.shape == (2, 2048)


def test_conv_spec_inventory():
    # 5 stem convs + 7·3 (A) + 4 (B) + 10·4 (C) + 6 (D) + 9·2 (E) = 94
    assert len(inception.CONV_SPECS) == 94
    # known output widths of each mixed block feed the next block's in_ch
    assert inception.CONV_SPECS["Mixed_5c.branch1x1"][1] == 256
    assert inception.CONV_SPECS["Mixed_5d.branch1x1"][1] == 288
    assert inception.CONV_SPECS["Mixed_6b.branch1x1"][1] == 768
    assert inception.CONV_SPECS["Mixed_7b.branch1x1"][1] == 1280
    assert inception.CONV_SPECS["Mixed_7c.branch1x1"][1] == 2048


def _fake_state_dict(rng: np.random.Generator) -> dict:
    sd = {}
    for name, (out_ch, in_ch, kh, kw) in inception.CONV_SPECS.items():
        sd[f"{name}.conv.weight"] = rng.standard_normal((out_ch, in_ch, kh, kw)).astype(np.float32) * 0.05
        sd[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, out_ch).astype(np.float32)
        sd[f"{name}.bn.bias"] = rng.standard_normal(out_ch).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_mean"] = rng.standard_normal(out_ch).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 2.0, out_ch).astype(np.float32)
    return sd


def test_converter_roundtrip_and_bn_folding(tmp_path):
    from scripts.convert_inception_weights import state_dict_to_npz

    rng = np.random.default_rng(0)
    sd = _fake_state_dict(rng)
    npz = tmp_path / "w.npz"
    state_dict_to_npz(sd, str(npz))
    params = inception.load_params(str(npz))
    assert set(params) == set(inception.CONV_SPECS)

    # BN folding: conv(x;w)+BN ≡ conv(x;w·s)+b with s=γ/√(σ²+ε), b=β−μs.
    name = "Conv2d_1a_3x3"
    x = rng.standard_normal((1, 9, 9, 3)).astype(np.float32)
    w = sd[f"{name}.conv.weight"]
    raw = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))), (2, 2),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    s = sd[f"{name}.bn.weight"] / np.sqrt(sd[f"{name}.bn.running_var"] + inception.BN_EPS)
    expected = np.maximum(
        np.asarray(raw) * s + (sd[f"{name}.bn.bias"] - sd[f"{name}.bn.running_mean"] * s), 0.0
    )
    got = inception._conv(params, name, jnp.asarray(x), stride=2)
    # TPU f32 convs run as bf16 multi-pass by default → ~1e-3 relative noise
    np.testing.assert_allclose(np.asarray(got), expected, rtol=5e-3, atol=5e-3)


def test_loader_rejects_bad_shapes(tmp_path):
    rng = np.random.default_rng(1)
    sd = _fake_state_dict(rng)
    sd["Mixed_5b.branch1x1.conv.weight"] = np.zeros((7, 7, 7, 7), np.float32)
    from scripts.convert_inception_weights import state_dict_to_npz

    npz = tmp_path / "bad.npz"
    state_dict_to_npz(sd, str(npz))
    with pytest.raises(ValueError, match="expected"):
        inception.load_params(str(npz))


def test_feature_extractor_selects_inception(tmp_path, monkeypatch):
    from scripts.convert_inception_weights import state_dict_to_npz

    npz = tmp_path / "w.npz"
    state_dict_to_npz(_fake_state_dict(np.random.default_rng(2)), str(npz))
    monkeypatch.setenv("S2S_INCEPTION_WEIGHTS", str(npz))
    ext = FeatureExtractor(kind="inception")
    assert ext.name == "inception_v3_fid"
    feats = ext(np.random.default_rng(3).uniform(0, 1, (3, 32, 32, 3)).astype(np.float32))
    assert feats.shape == (3, 2048) and feats.dtype == np.float64

    monkeypatch.setenv("S2S_INCEPTION_WEIGHTS", str(tmp_path / "missing.npz"))
    with pytest.raises(RuntimeError, match="unavailable"):
        FeatureExtractor(kind="inception")
    # auto falls back to the random-feature CNN
    auto = FeatureExtractor(kind="auto")
    assert auto.name.startswith("random_cnn")


def test_avg_pool_count_include_pad():
    x = jnp.ones((1, 4, 4, 1))
    incl = inception._avg_pool3(x, count_include_pad=True)
    excl = inception._avg_pool3(x, count_include_pad=False)
    # corner: 4 valid of 9 taps
    np.testing.assert_allclose(float(incl[0, 0, 0, 0]), 4 / 9, rtol=1e-6)
    np.testing.assert_allclose(float(excl[0, 0, 0, 0]), 1.0, rtol=1e-6)


def test_golden_pool3_activations():
    """Committed golden fixture (tests/fixtures/inception_golden.npz,
    regenerate with scripts/gen_inception_golden.py): the converter→BN-fold→
    forward pipeline must reproduce the recorded pool3 activations exactly
    (HIGHEST-precision convs → platform-stable to ~1e-4). Guards the FID
    stack against silent numerical drift until real weights are obtainable."""
    from pathlib import Path

    from scripts.gen_inception_golden import golden_activations

    fixture = Path(__file__).parent / "fixtures" / "inception_golden.npz"
    assert fixture.exists(), "run scripts/gen_inception_golden.py to create it"
    want = np.load(fixture)
    got = golden_activations()
    np.testing.assert_allclose(got["pool3_fid"], want["pool3_fid"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(got["pool3_stock"], want["pool3_stock"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(
        got["pool3_fid_norm"], want["pool3_fid_norm"], rtol=2e-3
    )
