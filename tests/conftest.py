"""Global test config: platform selection + persistent compilation cache.

Multi-device strategy (the reference simulates DDP on 2 CPU processes,
/root/reference/tests/test_train.py:65-77): the idiomatic TPU-framework
equivalent is XLA virtual host devices. Set ``S2S_CPU_MESH=1`` to force an
8-device virtual CPU platform for the mesh/sharding tests; by default tests
run on whatever platform JAX picks (TPU on the dev box — the 1-vCPU dev
machine makes the XLA *CPU* backend pathologically slow, so CPU-mesh runs are
opt-in). Tests that need >1 device skip themselves when the platform has only
one (see ``needs_multi_device``).
"""

import os
import sys
from pathlib import Path

if os.environ.get("S2S_CPU_MESH"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
    # On boxes where a sitecustomize registers an accelerator plugin and pins
    # jax_platforms before this file runs, the env var alone is ignored —
    # override the config explicitly (backends are not initialized yet).
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

import jax  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache makes repeated test runs cheap on TPU.
_CACHE_DIR = REPO_ROOT / ".jax_compile_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

needs_multi_device = pytest.mark.skipif(
    jax.device_count() < 2,
    reason="requires >1 device (run with S2S_CPU_MESH=1 for an 8-device virtual CPU mesh)",
)


@pytest.fixture(scope="session")
def repo_root() -> Path:
    return REPO_ROOT


@pytest.fixture(scope="session")
def configs_dir(repo_root: Path) -> Path:
    return repo_root / "configs"
