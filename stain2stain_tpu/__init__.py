"""stain2stain_tpu — TPU-native histopathology stain-translation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``nirschl-lab/stain2stain``: conditional-flow-matching stain translation
(H&E ↔ IHC/amyloid/LFB, any↔any) on paired tiles, trained data-parallel over
TPU device meshes with a Hydra-compatible config surface.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS even on hosts whose sitecustomize registers an
    # accelerator plugin and pins ``jax_platforms`` programmatically (the env
    # var is read once at jax-import time and a later config pin wins).
    # Re-asserting the user's choice here makes CPU-platform runs of the CLI
    # entry points (tests, dev boxes without the accelerator) work the same
    # way as the test conftest's explicit override. No-op when the backend
    # is already initialized or the env var is unset.
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover — jax absent or backends already live
        pass
