"""Jitted denoising pipelines (lax.scan loops): txt2img, per-character
generation with IP conditioning + latent guidance, composed final pass."""
