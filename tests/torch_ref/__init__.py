"""Torch mirror modules for golden-parity testing.

diffusers is not installed in this environment, so these modules re-create
the exact architecture of diffusers' `UNet2DConditionModel` (SD v1.x config)
and `AutoencoderKL` in plain torch, with state_dict keys identical to the
published CompVis/stable-diffusion-v1-4 checkpoints. They serve two roles:

 1. Validate the torch->flax weight converters (`psd_tpu.convert.sd`) on a
    state_dict with the REAL key structure (not a synthetic shape-only dict).
 2. Provide golden forward activations: the flax models must match these
    mirrors numerically, which is the same guarantee as matching diffusers
    provided the mirrors are architecture-faithful (they are written from the
    SD v1.x spec: GN eps 1e-5 UNet / 1e-6 VAE+transformer-norm, exact GELU,
    head_dim=C/8, GEGLU FF, nearest-x2 upsample, asymmetric VAE down-pad).

Nothing here is copied from /root/reference (which contains no model code --
it loads these architectures from HuggingFace at runtime).
"""

from .unet import TorchUNet2DConditionModel  # noqa: F401
from .vae import TorchAutoencoderKL  # noqa: F401
