"""Pallas TPU kernels (VMEM-resident traversal megakernel)."""
