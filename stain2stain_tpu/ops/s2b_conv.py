"""Space-to-batch 3×3 convolution for low-batch / large-spatial shapes.

Why this exists (round-4 roofline, scripts/roofline512.py + BASELINE.md):
the flagship 512×512 train step runs at only 37% of its own compute
roofline, and isolated probes show the cause is per-op — XLA's conv
kernels starve when the batch dim is 4 (31–50% MFU fwd+bwd at the 512px
level shapes vs 55–80% for the same composite at batch 32 / 256²). Conv
is translation-invariant, so a batch-starved conv can be re-expressed as
a batch-rich one: split each image into ``factor × factor`` tiles padded
with a 1-pixel halo (neighbour pixels where they exist, SAME-style zeros
at the outer border), run one VALID conv over the ``B·factor²`` tiles,
and stitch the outputs back. The result is bit-equivalent to
``padding=1`` conv on the full image (tested in tests/test_s2b_conv.py);
the only cost is the halo gather/scatter, which is pure bandwidth
(~2 copies of the activation) against a >1.5× MXU-utilisation win at the
target shapes.

MEASURED RESULT (round 5, 2026-08-20, `scripts/exp512.py s2b_blk2_b4 /
s2b4_blk2_b4`): the win does NOT materialize at the network level —
512px batch-4 block:2 train steps measure 602.7 ms/step (37.2% MFU) at
``factor=2`` and 781.3 ms (28.7%) at ``factor=4`` vs 593–598 ms (37.8%)
for plain convs. The halo gather/scatter bandwidth plus the dx-path
scatter-add offsets the conv-tiling gain at f=2 and dominates at f=4
(where the halo is 2/128 of each tile edge). Together with the round-4
remat/fusion/dropout sweeps this closes the 512px question: 37–38% MFU
IS the ceiling for this compiler at batch 4, and the production answer
for throughput remains 256px batch-32 tiles (64.6% MFU) with
`accumulate_grad_batches`. The op stays available (`s2b_conv=f` on
UNetModel) as an honest, tested negative result.

Autodiff needs no custom VJP: the transform is pad/slice/reshape, so
``jax.vjp`` of the composite yields conv backprops at the SAME
batch-rich shapes (the dx path scatter-adds the halo overlaps).

Reference context: the reference runs torch/cuDNN convs at whatever
batch fits (``/root/reference/src/models/components/unet.py``); this
op is a TPU-specific throughput lever with no reference counterpart.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def space_to_batch_conv(
    x: jax.Array,
    kernel: jax.Array,
    factor: int = 2,
    precision=None,
) -> jax.Array:
    """3×3 stride-1 SAME conv computed as a VALID conv over halo-padded tiles.

    Args:
      x: ``(B, H, W, C)`` activations (NHWC). ``H`` and ``W`` must be
        divisible by ``factor``.
      kernel: ``(3, 3, C, D)`` HWIO weights (any dtype; matmul runs in
        ``x.dtype`` like the ``nn.Conv`` call sites it replaces).
      factor: tile grid edge; ``factor=2`` turns batch 4 @ 512² into
        batch 16 @ 256².

    Returns:
      ``(B, H, W, D)`` — identical (up to dtype rounding) to
      ``lax.conv_general_dilated(x, kernel, (1,1), ((1,1),(1,1)))``.
    """
    if kernel.shape[:2] != (3, 3):
        raise ValueError(f"space_to_batch_conv is specialised to 3x3, got {kernel.shape[:2]}")
    B, H, W, C = x.shape
    f = factor
    if H % f or W % f:
        raise ValueError(f"spatial dims {(H, W)} not divisible by factor {f}")
    th, tw = H // f, W // f

    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # Tile extraction: f² static slices of (th+2, tw+2) with stride th — each
    # tile carries its 1-pixel halo (neighbour rows/cols, or the zero pad at
    # the outer border). Static slices + one concat keep this a pure layout
    # op that XLA can fuse with the producer.
    tiles = [
        xpad[:, i * th : i * th + th + 2, j * tw : j * tw + tw + 2, :]
        for i in range(f)
        for j in range(f)
    ]
    t = jnp.concatenate(tiles, axis=0)  # (f²·B, th+2, tw+2, C)

    y = lax.conv_general_dilated(
        t,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )  # (f²·B, th, tw, D)

    D = y.shape[-1]
    # Stitch: concat order was (i, j) major on a new leading axis of size f².
    y = y.reshape(f, f, B, th, tw, D)
    y = y.transpose(2, 0, 3, 1, 4, 5).reshape(B, H, W, D)
    return y
