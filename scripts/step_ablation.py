#!/usr/bin/env python
"""Train-step ablations for the flagship 256px operating point.

Each mode runs in its OWN process (axon HBM hygiene — see bench.py):
  base      — dropout 0.1, threefry PRNG (the headline configuration)
  rbg       — dropout 0.1, TPU hardware RBG PRNG for the step RNG
  nodrop    — dropout 0.0 (bounds the total dropout+RNG cost)
  nodrop_na — dropout 0.0 AND no attention (bounds mid-attention cost)

Usage: python scripts/step_ablation.py <mode>
       python scripts/step_ablation.py all   (spawns one subprocess per mode)
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

MODES = {
    # "bits" pins the pre-round-4 PRNG-word mask so these historical rows stay
    # reproducible now that the package default is the counter-hash mask
    "base": dict(dropout=0.1, prng_impl="threefry2x32", dropout_impl="bits"),
    "rbg": dict(dropout=0.1, prng_impl="rbg", dropout_impl="bits"),
    "nodrop": dict(dropout=0.0),
    "nodrop_na": dict(dropout=0.0, attention=False),
    "chain": dict(chained=True, dropout_impl="bits"),  # 5 steps/dispatch, rbg
    "optonly": dict(optonly=True),  # flat-Adam update alone, scan-chained
    # A/B control: the pre-round-3 nn.Dropout path (f32 uniform + stored bool
    # mask) instead of ops/dropout.py's FastDropout — reproduces the old
    # step time on demand.
    "flaxdrop": dict(dropout=0.1, prng_impl="rbg", flax_dropout=True),
    # Post-attention-stats-fix probes: dropping the lane-padded m/l residuals
    # freed ~512 MB at 256px (ops/pallas_attention.py) — re-test the batch-64
    # operating point that OOMed in rounds 2-3, per-step and chained.
    "b64": dict(dropout=0.1, prng_impl="rbg", batches=(64, 32), dropout_impl="bits"),
    "chain64": dict(chained=True, batch=64, dropout_impl="bits"),
    "gen128": dict(gen=(256, (128, 64), 2)),
    # Round-4 candidate: counter-hash dropout mask (murmur3 finalizer over a
    # fused iota — no RngBitGenerator materialization). vs "rbg" isolates the
    # mask-generation HBM cost; vs "nodrop" bounds what remains.
    "hashdrop": dict(dropout=0.1, prng_impl="rbg", dropout_impl="hash"),
    "hashdrop_chain": dict(chained=True, dropout_impl="hash"),
    # Round-5 probe (VERDICT r4 ask #8): the b64 post-mortem pegged batch 32
    # at 15.03 GiB = 94% of HBM with the binding allocation linear in batch
    # (up-path skip-concat gradient working set) — b64 needs 21.7 GiB, but
    # non-power-of-2 batches are legal and 40/48 sit between. Package-default
    # hash dropout (zero mask bytes), rbg, no remat — the production recipe.
    "b40": dict(dropout=0.1, prng_impl="rbg", batches=(48, 40)),
}


def run(mode: str) -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", str(REPO_ROOT / ".jax_compile_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import bench

    cfg = dict(MODES[mode])
    impl = cfg.pop("dropout_impl", None)
    if impl:  # force a specific mask impl (the package default is "hash")
        import stain2stain_tpu.models.unet as unet_mod
        from stain2stain_tpu.ops.dropout import FastDropout as _FD

        unet_mod.FastDropout = lambda rate: _FD(rate, impl=impl)
    if cfg.pop("chained", False):
        tiles = bench.measure_train_chained(256, cfg.pop("batch", 32))
        print(f"ABLATION {mode}: {tiles} tiles/s", flush=True)
        return
    if "gen" in cfg:
        size, batches, n_steps = cfg.pop("gen")
        tiles = bench.measure_generate(size, batches, num_steps=n_steps)
        print(f"ABLATION {mode}: {tiles} tiles/s", flush=True)
        return
    if cfg.pop("optonly", False):
        import time as _time

        import jax.numpy as jnp

        task = bench.build(256, False)
        tx, _ = task.configure_optimizers()
        variables = task.init_variables(
            jax.random.key(1), (jnp.zeros((1, 256, 256, 3), jnp.float32),)
        )
        params = variables["params"]
        grads = jax.tree_util.tree_map(lambda p: 0.01 * jnp.ones_like(p), params)
        opt_state = tx.init(params)

        @jax.jit
        def chained(params, opt_state):
            def body(carry, _):
                p, o = carry
                updates, o2 = tx.update(grads, o, p)
                p2 = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return (p2, o2), ()

            return jax.lax.scan(body, (params, opt_state), None, length=12)[0]

        out = chained(params, opt_state)
        float(jnp.sum(jax.tree_util.tree_leaves(out[0])[0]).astype(jnp.float32))
        t0 = _time.perf_counter()
        for _ in range(4):
            out = chained(params, opt_state)
            float(jnp.sum(jax.tree_util.tree_leaves(out[0])[0]).astype(jnp.float32))
        dt = (_time.perf_counter() - t0) / 4 / 12
        print(f"ABLATION optonly: {dt*1e3:.2f} ms per Adam update", flush=True)
        return
    if cfg.pop("flax_dropout", False):
        from flax import linen as nn

        import stain2stain_tpu.models.unet as unet_mod

        class _FlaxDropout(nn.Module):
            rate: float

            @nn.compact
            def __call__(self, x, deterministic):
                return nn.Dropout(self.rate, deterministic=deterministic)(x)

        unet_mod.FastDropout = _FlaxDropout
    if not cfg.pop("attention", True):
        import stain2stain_tpu.models.unet as unet_mod

        # Kill ALL attention: the level resolver AND the head count (the mid
        # block attends unconditionally, ADM-style, so patching only the
        # resolver left the ~2 ms mid attention in place — the round-3
        # nodrop_na row measured nodrop twice).
        unet_mod.UNetModel._attention_ds = lambda self: ()
        unet_mod.UNetModel._num_heads_for = lambda self, chans: 0
    batches = cfg.pop("batches", (32,))
    result = bench.measure_train(256, batches, **cfg)
    print(f"ABLATION {mode}: {result}", flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "all":
        for mode in sys.argv[2:] or MODES:
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, __file__, mode], capture_output=True, text=True,
                timeout=1200,
            )
            for line in proc.stderr.splitlines():
                if line.startswith("#"):
                    print(f"[{mode}] {line}", flush=True)
            print(proc.stdout.strip(), f"({time.time()-t0:.0f}s)", flush=True)
            time.sleep(60)
    else:
        run(sys.argv[1])
