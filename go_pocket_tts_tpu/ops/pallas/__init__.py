"""Pallas TPU kernels for the decode hot path.

These are the TPU analogues of the reference's hand-written SIMD assembly
(`internal/runtime/tensor/dot_amd64.s`, `axpy_amd64.s`): used where XLA's
default lowering leaves performance on the table, with XLA fallbacks kept for
CPU test runs and debugging.
"""
