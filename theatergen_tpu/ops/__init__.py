"""Core math: schedulers, geometry, latents, attention kernels, guidance."""
