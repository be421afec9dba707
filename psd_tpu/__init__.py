"""psd_tpu — TPU-native DADD (Disentangled Anatomy-Disease Diffusion) framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
`umutdundar99/progressive-stable-diffusion` stack (see /root/repo/SURVEY.md):
latent diffusion with ordinal (Mayo score) conditioning, patient-anatomy image
conditioning, triple-pathway routed cross-attention, and training-free delta
steering — designed TPU-first (bf16 MXU compute, lax.scan samplers, device-mesh
sharding via jax.sharding, Pallas attention kernels).
"""

__version__ = "0.1.0"
