#!/usr/bin/env python
"""Dropout implementation A/B at the flagship level-0 shape.

Round-3 ablation (scripts/step_ablation.py): with the hardware RBG PRNG the
flagship 256px step still pays ~75 ms for dropout (680.7 ms -> 605.4 ms with
dropout=0). nn.Dropout lowers to uniform-f32 -> compare -> where, which (a)
generates 4 bytes of random bits per element, (b) stores a bool mask for the
backward, and (c) applies `where` in a pass that does not always fuse into
the neighbouring conv. All of it is HBM traffic, not FLOPs.

Variants measured here (fwd+bwd of  sum(dropout(h) * c)  at 32x256x256x128
bf16 — the dominant dropout site; the real step has ~2.3e9 mask elements):

  flax         nn.Dropout semantics: bernoulli(key) + where            (baseline)
  bits32       keep = bits_u32 < thresh; x * keep.astype(bf16)/p_keep
  bits16       same with uint16 bits (half the generator traffic)
  bits16_regen bits16 + custom VJP that REGENERATES the mask from the
               saved key in the backward (no mask storage at all)
  bits16_store bits16 + custom VJP that saves the bf16 mask
  bits8_regen  uint8 bits (quarter traffic; keep-prob quantum 1/256)

Usage: python scripts/dropout_bench.py <variant|all>
Each variant runs in its own subprocess (axon HBM hygiene, see bench.py).
"""

from __future__ import annotations

import subprocess
import sys
import time
from functools import partial
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SHAPE = (32, 256, 256, 128)
RATE = 0.1
VARIANTS = ("flax", "bits32", "bits16", "bits16_regen", "bits16_store", "bits8_regen")


def _mask(key, shape, rate, dtype, nbits):
    import jax
    import jax.numpy as jnp

    utype = {8: jnp.uint8, 16: jnp.uint16, 32: jnp.uint32}[nbits]
    span = 1 << nbits
    thresh = utype(min(span - 1, round((1.0 - rate) * span)))
    bits = jax.random.bits(key, shape, utype)
    return (bits < thresh).astype(dtype) * (1.0 / (1.0 - rate))


def make_fn(variant):
    import jax
    import jax.numpy as jnp

    if variant == "flax":

        def drop(x, key):
            keep = jax.random.bernoulli(key, 1.0 - RATE, x.shape)
            return jnp.where(keep, x / (1.0 - RATE), 0.0)

    elif variant in ("bits32", "bits16", "bits8"):
        nbits = int(variant[4:])

        def drop(x, key):
            return x * _mask(key, x.shape, RATE, x.dtype, nbits)

    elif variant.endswith("_regen"):
        nbits = int(variant[4:-6])

        @partial(jax.custom_vjp, nondiff_argnums=(2,))
        def drop2(x, key, nb):
            return x * _mask(key, x.shape, RATE, x.dtype, nb)

        def fwd(x, key, nb):
            return drop2(x, key, nb), key

        def bwd(nb, key, dy):
            return dy * _mask(key, dy.shape, RATE, dy.dtype, nb), None

        drop2.defvjp(fwd, bwd)
        drop = lambda x, key: drop2(x, key, nbits)  # noqa: E731

    elif variant.endswith("_store"):
        nbits = int(variant[4:-6])

        @partial(jax.custom_vjp, nondiff_argnums=(2,))
        def drop3(x, key, nb):
            return x * _mask(key, x.shape, RATE, x.dtype, nb)

        def fwd(x, key, nb):
            m = _mask(key, x.shape, RATE, x.dtype, nb)
            return x * m, m

        def bwd(nb, m, dy):
            return dy * m, None

        drop3.defvjp(fwd, bwd)
        drop = lambda x, key: drop3(x, key, nbits)  # noqa: E731

    else:
        raise SystemExit(f"unknown variant {variant}")
    return drop


def run(variant: str) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO_ROOT / ".jax_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    drop = make_fn(variant)
    x = jax.random.normal(jax.random.key(0), SHAPE, jnp.bfloat16)
    c = jax.random.normal(jax.random.key(1), SHAPE, jnp.bfloat16)
    key = jax.random.key(2, impl="rbg")

    def loss(x, key):
        # quadratic consumer: grad = 2*(x*mask)*mask depends on x, so the
        # forward multiply cannot be DCE'd, and the dropped activation is a
        # stored residual — exactly like the real step, where conv_out keeps
        # its (dropped) input for the weight gradient.
        y = drop(x, key) * c
        return jnp.sum((y * y).astype(jnp.float32))

    CHAIN = 10

    @jax.jit
    def chained(x, key):
        # chain fwd+bwd CHAIN times inside one program: the axon tunnel's
        # per-dispatch host round-trip (~25 ms) would otherwise swamp the
        # ~10-30 ms kernels being measured. Carrying g -> x makes every
        # iteration's input distinct (no CSE); fold_in varies the key.
        def body(carry, i):
            val, g = jax.value_and_grad(loss)(carry, jax.random.fold_in(key, i))
            return g / (1.0 + val * 1e-30), ()

        return jax.lax.scan(body, x, jnp.arange(CHAIN))[0]

    g = chained(x, key)
    float(jnp.sum(g.astype(jnp.float32)))
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        g = chained(x, key)
        float(jnp.sum(g.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / (reps * CHAIN)
    n = 1
    for d in SHAPE:
        n *= d
    # the step has ~2.3e9 mask elements; scale this site's cost up for context
    print(
        f"DROPOUT {variant}: {dt*1e3:.2f} ms fwd+bwd @ {SHAPE} "
        f"(~{dt*1e3 * 2.3e9 / n:.0f} ms step-equivalent)",
        flush=True,
    )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which != "all":
        run(which)
        return
    for v in VARIANTS:
        proc = subprocess.run(
            [sys.executable, __file__, v], capture_output=True, text=True, timeout=900
        )
        out = (proc.stdout + proc.stderr).strip().splitlines()
        line = next((ln for ln in out if ln.startswith("DROPOUT")), f"{v}: FAILED rc={proc.returncode}")
        print(line, flush=True)
        time.sleep(20)


if __name__ == "__main__":
    main()
