#!/usr/bin/env python
"""Convert torchvision / pytorch-fid InceptionV3 weights to the npz format
consumed by stain2stain_tpu.ops.inception (the JAX FID feature extractor).

Run this on any machine that has the weights (this deployment image has no
torchvision and no network egress, so the npz must be produced elsewhere and
copied in):

    # from torchvision (stock ImageNet weights):
    python scripts/convert_inception_weights.py --torchvision out.npz

    # from pytorch-fid's FID-standard checkpoint (recommended — this is the
    # extractor behind published FID numbers):
    python scripts/convert_inception_weights.py --pt path/to/pt_inception-2015-12-05-6726825d.pth out.npz

Then place the npz at <repo>/weights/inception_v3_fid.npz or point
S2S_INCEPTION_WEIGHTS at it. The loader validates every layer shape against
the architecture table (ops/inception.py CONV_SPECS), so a mismatched file
fails loudly rather than producing wrong FIDs.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from stain2stain_tpu.ops.inception import CONV_SPECS  # noqa: E402

_SUFFIXES = (".conv.weight", ".bn.weight", ".bn.bias", ".bn.running_mean", ".bn.running_var")


def state_dict_to_npz(state_dict, out_path: str) -> None:
    """Keep only the feature-path conv/bn tensors, keyed by torch names."""
    arrays = {}
    for layer in CONV_SPECS:
        for suffix in _SUFFIXES:
            key = layer + suffix
            if key not in state_dict:
                raise KeyError(f"state_dict missing {key}")
            v = state_dict[key]
            arrays[key] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} tensors for {len(CONV_SPECS)} layers -> {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torchvision", action="store_true", help="download stock torchvision weights")
    ap.add_argument("--pt", type=str, default=None, help="path to a .pth state_dict (e.g. pytorch-fid)")
    ap.add_argument("out", type=str, help="output .npz path")
    args = ap.parse_args()

    import torch

    if args.pt:
        sd = torch.load(args.pt, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    elif args.torchvision:
        from torchvision.models import Inception_V3_Weights, inception_v3

        sd = inception_v3(weights=Inception_V3_Weights.IMAGENET1K_V1).state_dict()
    else:
        ap.error("pass --torchvision or --pt <path>")
    state_dict_to_npz(sd, args.out)


if __name__ == "__main__":
    main()
