"""stain2stain_tpu — TPU-native histopathology stain-translation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``nirschl-lab/stain2stain``: conditional-flow-matching stain translation
(H&E ↔ IHC/amyloid/LFB, any↔any) on paired tiles, trained data-parallel over
TPU device meshes with a Hydra-compatible config surface.
"""

__version__ = "0.1.0"
