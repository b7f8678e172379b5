"""Pallas TPU kernels — the native compute layer of winograd_tpu."""
