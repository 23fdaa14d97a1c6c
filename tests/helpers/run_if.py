"""Conditional test gating (reference tests/helpers/run_if.py:28-58 parity).

``@RunIf(tpu=True)`` / ``@RunIf(min_devices=2)`` / ``@RunIf(native_loader=True)``
skip tests whose environment requirements aren't met, instead of failing.
"""

from __future__ import annotations

import shutil

import jax
import pytest


def RunIf(
    min_devices: int = 1,
    tpu: bool = False,
    cpu_only: bool = False,
    native_loader: bool = False,
    sh: bool = False,
    **kwargs,
):
    conditions = []
    reasons = []
    if min_devices > 1:
        conditions.append(jax.device_count() < min_devices)
        reasons.append(f"requires >= {min_devices} devices")
    if tpu:
        conditions.append(jax.default_backend() != "tpu")
        reasons.append("requires a TPU backend")
    if cpu_only:
        conditions.append(jax.default_backend() != "cpu")
        reasons.append("requires the CPU backend")
    if native_loader:
        from stain2stain_tpu.data import native

        conditions.append(not native.available())
        reasons.append("requires the native C++ loader")
    if sh:
        conditions.append(shutil.which("sh") is None)
        reasons.append("requires a POSIX shell")
    return pytest.mark.skipif(any(conditions), reason=" & ".join(reasons) or "RunIf")


__all__ = ["RunIf"]
