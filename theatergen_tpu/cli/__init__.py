"""Command-line drivers: benchmark generation (CMIGBench) and evaluation."""
