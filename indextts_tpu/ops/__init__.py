"""Compute primitives: Pallas TPU kernels and XLA-native DSP ops."""
