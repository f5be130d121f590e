"""Mesh construction and pjit shardings (dp over dialogues/batch, tp over
attention heads / FFN columns)."""
