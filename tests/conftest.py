"""Global test config: force an 8-device virtual CPU mesh before JAX inits.

The reference simulates multi-GPU DDP on CPU via ``ddp_spawn`` 2-process runs
(/root/reference/tests/test_train.py:65-77, configs/trainer/ddp_sim.yaml). The
idiomatic TPU-framework equivalent is XLA's virtual host devices: every test in
this suite sees ``jax.device_count() == 8`` CPU devices, so mesh/pjit paths are
exercised for real without TPU hardware.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root() -> Path:
    return REPO_ROOT


@pytest.fixture(scope="session")
def configs_dir(repo_root: Path) -> Path:
    return repo_root / "configs"
