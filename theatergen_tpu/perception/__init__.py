"""Perception: promptable segmentation (SAM-style) and open-vocabulary
character detection for mask extraction and the detect-regenerate loop."""
