"""Reference-checkpoint migration layer.

A user switching from the reference (``nirschl-lab/stain2stain``) arrives with
Lightning ``.ckpt`` files whose ``state_dict`` holds torch tensors under
guided-diffusion-style names (the velocity net is
``torchcfm.models.unet.UNetModel`` — cfg
/root/reference/configs/model/conditional_flow_matching.yaml:16-26, attribute
``net`` on every LightningModule, /root/reference/src/models/conditional_flow_matching.py:28-42).
This package converts those weights into this framework's flax parameter
pytrees so trained reference models evaluate / infer / fine-tune here without
retraining.
"""

from stain2stain_tpu.compat.torch_unet import (
    convert_lightning_state_dict,
    convert_unet_state_dict,
)

__all__ = ["convert_unet_state_dict", "convert_lightning_state_dict"]
