"""Kernel micro-benchmarks (parity with `internal/runtime/ops/ops_bench_test.go`).

Times the hot ops at model shapes on the current backend:

    python -m go_pocket_tts_tpu.bench.microbench

Each op is jitted and timed with a median-of-N wall clock after warmup; on
tunneled dev chips subtract the reported dispatch RTT to estimate device time.
"""

from __future__ import annotations

import time

import numpy as np


def _bench(name, fn, *args, reps: int = 20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:<40} p50 {ts[len(ts) // 2] * 1e3:8.3f} ms   min {ts[0] * 1e3:8.3f} ms")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from go_pocket_tts_tpu import ops

    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")

    # Dispatch RTT floor.
    trivial = jax.jit(lambda x: x + 1)
    _bench("dispatch floor (x+1)", trivial, jnp.zeros((8,)))

    # Decode-step attention at FlowLM shapes.
    b, h, c, d = 1, 16, 448, 64
    q = jnp.asarray(rng.randn(b, h, 1, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, c, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, c, d).astype(np.float32))
    pos_q = jnp.asarray([7], jnp.int32)
    pos_k = jnp.arange(c, dtype=jnp.int32)
    attn = jax.jit(lambda q, k, v: ops.attention_with_positions(q, k, v, pos_q, pos_k))
    _bench("attention step [1,16,1,448,64]", attn, q, k, v)

    # Mimi-decode local attention at 256-frame bucket shapes.
    t = 4096
    qm = jnp.asarray(rng.randn(1, 8, t, 64).astype(np.float32))
    import go_pocket_tts_tpu.ops.local_attention as la

    local = jax.jit(lambda q: la.local_windowed_attention(q, q, q, 250))
    _bench("local attention [1,8,4096,64] w=250", local, qm)

    # RoPE at step shapes.
    cos, sin = ops.build_rope_tables(8192, 64)
    rope = jax.jit(lambda x, p: ops.apply_rope(x, cos, sin, p))
    _bench("rope [1,16,1,64]", rope, q, jnp.int32(7))

    # Transformer-layer matmuls (1024-d model).
    x = jnp.asarray(rng.randn(1, 1024).astype(np.float32), dtype=jnp.bfloat16)
    w_qkv = jnp.asarray(rng.randn(1024, 3072).astype(np.float32), dtype=jnp.bfloat16)
    mm = jax.jit(lambda x, w: jnp.matmul(x, w, preferred_element_type=jnp.float32))
    _bench("qkv matvec [1,1024]x[1024,3072] bf16", mm, x, w_qkv)

    # SEANet transposed conv at decode shapes (256-ch, stride 6).
    xin = jnp.asarray(rng.randn(1, 512, 4096).astype(np.float32), dtype=jnp.bfloat16)
    wtr = jnp.asarray(rng.randn(512, 256, 12).astype(np.float32) * 0.1)
    packed = ops.repack_conv_transpose_kernel(wtr, 1)
    convtr = jax.jit(lambda x: ops.conv_transpose1d_trim(x, packed, None, 6, 1))
    _bench("convT [1,512,4096] s6 k12 -> 256ch", convtr, xin)

    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
