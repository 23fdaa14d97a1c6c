#!/usr/bin/env python
"""Generate the committed golden-activation fixture for the InceptionV3 stack.

Real torchvision/pytorch-fid weights are unobtainable in this image (no
torchvision package, no egress; exhaustive filesystem search found no cached
*.pth — see docs/architecture.md "FID comparability"). This fixture pins the
full converter→loader→forward pipeline numerically instead: a DETERMINISTIC
synthetic torch-layout state dict (seed 0) is run through the converter
contract (scripts/convert_inception_weights.state_dict_to_npz), loaded with
BN folding, and a fixed input's pool3 features are recorded. Any numerical
drift in the topology, folding math, pooling variants, or resize path fails
tests/test_inception.py::test_golden_pool3_activations.

When a real weights drop lands, the same harness verifies it instantly:

    python scripts/convert_inception_weights.py pt_inception.pth w.npz
    S2S_INCEPTION_WEIGHTS=w.npz python -c "from stain2stain_tpu.ops.metrics \
        import FeatureExtractor; print(FeatureExtractor('inception').name)"

Usage: python scripts/gen_inception_golden.py [out.npz]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO_ROOT / ".jax_compile_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

SEED = 0
INPUT_SHAPE = (2, 64, 64, 3)
N_GOLDEN = 16  # leading features kept per image (full 2048-d is overkill)


def fake_state_dict(seed: int = SEED) -> dict:
    """Deterministic torch-layout InceptionV3 state dict (same generator as
    tests/test_inception.py::_fake_state_dict)."""
    from stain2stain_tpu.ops import inception

    rng = np.random.default_rng(seed)
    sd = {}
    for name, (out_ch, in_ch, kh, kw) in inception.CONV_SPECS.items():
        sd[f"{name}.conv.weight"] = (
            rng.standard_normal((out_ch, in_ch, kh, kw)).astype(np.float32) * 0.05
        )
        sd[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, out_ch).astype(np.float32)
        sd[f"{name}.bn.bias"] = rng.standard_normal(out_ch).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_mean"] = rng.standard_normal(out_ch).astype(np.float32) * 0.1
        sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 2.0, out_ch).astype(np.float32)
    return sd


def golden_activations() -> dict:
    import jax

    from scripts.convert_inception_weights import state_dict_to_npz
    from stain2stain_tpu.ops import inception

    with tempfile.TemporaryDirectory() as td:
        npz = str(Path(td) / "w.npz")
        state_dict_to_npz(fake_state_dict(), npz)
        params = inception.load_params(npz)
    x = jax.random.uniform(jax.random.key(SEED), INPUT_SHAPE)
    fid_feats = np.asarray(inception.pool3_features(params, x))
    stock_feats = np.asarray(inception.pool3_features(params, x, fid_variant=False))
    return {
        "seed": np.int64(SEED),
        "input_shape": np.asarray(INPUT_SHAPE, np.int64),
        "pool3_fid": fid_feats[:, :N_GOLDEN].astype(np.float32),
        "pool3_stock": stock_feats[:, :N_GOLDEN].astype(np.float32),
        "pool3_fid_norm": np.linalg.norm(fid_feats, axis=1).astype(np.float32),
    }


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO_ROOT / "tests" / "fixtures" / "inception_golden.npz"
    )
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **golden_activations())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
