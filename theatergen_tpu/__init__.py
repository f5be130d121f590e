"""theatergen_tpu — TPU-native character-consistent multi-turn image generation.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
donahowe/TheaterGen (reference layout documented in SURVEY.md):

- ``ops``       — schedulers, attention kernels (Pallas flash + decoupled
                  IP-attention), box/mask geometry, latent composition,
                  cross-attention guidance energies.
- ``models``    — flax modules: SD1.5 UNet, AutoencoderKL VAE, CLIP text /
                  vision towers, ControlNet, IP-Adapter projectors/resampler.
- ``perception``— SAM-style mask refinement and open-vocabulary box detection.
- ``pipelines`` — jitted ``lax.scan`` denoising loops: per-character
                  generation, latent-guidance energy descent, final composed
                  scene pass with ControlNet + frozen-latent replacement.
- ``parallel``  — mesh construction and pjit sharding (dp over dialogues,
                  tp over attention heads/FFN).
- ``training``  — diffusion (noise-prediction) training step for adapter
                  finetuning, sharded over a mesh.
- ``eval``      — CMIGBench metric suite (CCS / TIS / FID, spatial /
                  attribute / negative / numeracy accuracies).
"""

__version__ = "0.1.0"
