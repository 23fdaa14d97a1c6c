"""stain2stain_tpu — TPU-native histopathology stain-translation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``nirschl-lab/stain2stain``: conditional-flow-matching stain translation
(H&E ↔ IHC/amyloid/LFB, any↔any) on paired tiles, trained data-parallel over
TPU device meshes with a Hydra-compatible config surface.
"""

__version__ = "0.1.0"

import os as _os

def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache for every entry point.

    Only the test conftest and bench.py configured the cache before — each
    subprocess CLI run (src/train.py, the infer CLIs, the slow-tier test
    drives) recompiled every program from scratch, which on a TPU dev tunnel
    costs minutes per program. Honors JAX_COMPILATION_CACHE_DIR when set;
    defaults to <PROJECT_ROOT>/.jax_compile_cache (the repo convention) or
    ~/.cache/stain2stain_tpu/xla. Opt out with S2S_NO_COMPILE_CACHE=1.
    """
    if _os.environ.get("S2S_NO_COMPILE_CACHE"):
        return
    try:
        import jax as _jax

        cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if not cache_dir:
            root = _os.environ.get("PROJECT_ROOT")
            cache_dir = (
                _os.path.join(root, ".jax_compile_cache")
                if root
                else _os.path.expanduser("~/.cache/stain2stain_tpu/xla")
            )
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover — jax absent or config locked
        pass


_enable_compile_cache()

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
