"""Pallas TPU kernels for the hot ops (XLA fallbacks live in ops/)."""
