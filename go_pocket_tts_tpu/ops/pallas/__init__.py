"""Pallas TPU kernels for the decode hot path.

These are the TPU analogues of the reference's hand-written SIMD assembly
(`internal/runtime/tensor/dot_amd64.s`, `axpy_amd64.s`): used where XLA's
default lowering leaves performance on the table, with XLA fallbacks kept for
CPU test runs and debugging.
"""

import functools

import jax


def pin_default_matmul_precision(fn):
    """Trace ``fn`` under matmul precision "default".

    Kernel bodies are traced inside the CALLER's ``jax.default_matmul_
    precision`` context, and Mosaic only lowers DEFAULT/HIGHEST dots — the
    fp32 runtime's "high"/"highest" pins otherwise leak into the kernel
    jaxpr and crash lowering (observed: ``NotImplementedError: Unsupported
    dot precision: HIGH`` in the seanet up-tail under
    ``--matmul-precision high``). Every public kernel entry point wraps
    itself with this; the kernels' numerics were designed and validated at
    default precision (bf16/f32 operands with explicit f32 accumulation),
    so the caller's tier shouldn't apply inside regardless.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("default"):
            return fn(*args, **kwargs)

    return wrapped
