"""Command-line drivers: train, validate, infer, analyze, tools."""
