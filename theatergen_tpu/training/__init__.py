"""Diffusion training: noise-prediction loss, optax optimizer, mesh-sharded
train step (adapter finetuning — e.g. IP-Adapter projections — or full UNet)."""
