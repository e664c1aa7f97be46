"""TPU compute ops (XLA/Pallas).

The reference's "native" layer is hand-written AVX2/NEON assembly under
`internal/runtime/tensor` and fused CPU kernels under `internal/runtime/ops`.
Here the equivalents are XLA programs (this package) and Pallas TPU kernels
(`ops.pallas`); per-kernel numeric tolerances mirror
`internal/runtime/ops/tolerance.go`.
"""

from go_pocket_tts_tpu.ops.act import elu, gelu_erf, silu
from go_pocket_tts_tpu.ops.norms import layer_norm, modulate, rms_norm_bessel
from go_pocket_tts_tpu.ops.rope import apply_rope, build_rope_tables
from go_pocket_tts_tpu.ops.attention import (
    attention_with_positions,
    attention_with_positions_int8kv,
)
from go_pocket_tts_tpu.ops.conv import (
    causal_conv1d,
    conv1d,
    conv_transpose1d_trim,
    repack_conv_transpose_kernel,
)

# Per-kernel parity budgets vs the reference/upstream oracle
# (internal/runtime/ops/tolerance.go:13-33).
TOLERANCES = {
    "matmul": (1e-4, 1e-4),
    "linear": (1e-4, 1e-4),
    "layer_norm": (1e-4, 1e-4),
    "softmax": (1e-4, 1e-4),
    "attention": (2e-4, 2e-4),
    "rope": (2e-4, 2e-4),
    "conv1d": (2e-4, 2e-4),
    "conv_transpose1d": (2e-4, 2e-4),
}

__all__ = [
    "elu",
    "gelu_erf",
    "silu",
    "layer_norm",
    "modulate",
    "rms_norm_bessel",
    "apply_rope",
    "build_rope_tables",
    "attention_with_positions",
    "attention_with_positions_int8kv",
    "causal_conv1d",
    "conv1d",
    "conv_transpose1d_trim",
    "repack_conv_transpose_kernel",
    "TOLERANCES",
]
