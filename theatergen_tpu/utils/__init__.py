"""Host-side utilities: tokenization, spec parsing, caching, visualization."""
