"""Flax model zoo: UNet, VAE, CLIP towers, ControlNet, IP-Adapter."""
