"""Why is the fused int4 Pallas kernel at 0.352 ms/step, not ~0.2?

First hardware cut (2026-08-19): int4-pallas 0.352 ms/step at batch 8 vs
int8-XLA 0.228 — barely better than the rejected XLA split variant (0.366)
despite halving the weight DMA. Three suspects:

1. **dot granularity** — the group-wise scales force 2 dots per 128-row
   group ([8,64]x[64,TN]); a K=4096 linear issues 64 small dots per N-tile,
   and MXU fixed per-dot latency could dominate the (tiny) DMA time.
2. **depack VPU cost** — u8→i32 widen + 2 shifts + 2 bf16 casts per weight
   byte may not hide behind the DMA.
3. **per-call overhead** — ~30 pallas_calls per step pay pipeline ramps the
   XLA whole-graph scheduler avoids (the r2 int8-kernel lesson).

This script times kernel VARIANTS on the step's four transformer shapes
(M=8) with scan-differencing (T=64 vs T=16 inside ONE program; the carry
feeds x so the kernel cannot be hoisted):

- ``int8-xla``     — the champion's weight op (reference)
- ``int4-group``   — the shipped kernel (per-group dots, exact)
- ``int4-bigdot``  — full-tile lo/hi dots, single scale (WRONG numerics;
                     isolates the dot-granularity cost)
- ``int4-wscale``  — depack, group scales applied to the weight tile via a
                     [gt,64,TN] reshape-broadcast, full-tile dots (EXACT
                     numerics; trades small dots for VPU mults on weights)

Decision: if wscale ≈ bigdot ≪ group → adopt the wscale formulation in the
product kernel. If all int4 variants ≈ int8-xla → per-call overhead rules;
keep int8 (rejection stands, now with the mechanism named).

Run on the real chip: ``python scripts/exp_int4_kernel_variants.py``.
CPU crash-smoke: ``POCKETTTS_EXP_SMOKE=1 REPS=1 T_HI=4 T_LO=2 python ...``
(interpret-mode wall times are meaningless; the smoke proves the harness).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

SMOKE = bool(os.environ.get("POCKETTTS_EXP_SMOKE"))
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go_pocket_tts_tpu.models.quantize import quantize_linear
from go_pocket_tts_tpu.ops.pallas.int4_matmul import GROUP_ROWS_PACKED, int4_matmul

REPS = int(os.environ.get("REPS", "3"))
T_HI = int(os.environ.get("T_HI", "2048"))
T_LO = int(os.environ.get("T_LO", "512"))
INTERPRET = SMOKE

# The AR step's transformer linears at batch 8 (d=1024, ffn=4096).
SHAPES = [(8, 1024, 3072), (8, 1024, 1024), (8, 1024, 4096), (8, 4096, 1024)]
if SMOKE:
    SHAPES = [(8, 256, 512)]


def _variant_kernel(x_ref, w_ref, s_ref, o_ref, *, groups: int, mode: str):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    ui = jax.lax.bitcast_convert_type(w_ref[...], jnp.int8).astype(jnp.int32)
    x_dt = x_ref.dtype
    lo = ((ui << 28) >> 28).astype(x_dt)
    hi = (ui >> 4).astype(x_dt)
    if mode == "wscale":
        kp, tn = lo.shape
        s = s_ref[...].astype(x_dt)  # [gt, TN]
        lo = (lo.reshape(groups, GROUP_ROWS_PACKED, tn) * s[:, None, :]).reshape(kp, tn)
        hi = (hi.reshape(groups, GROUP_ROWS_PACKED, tn) * s[:, None, :]).reshape(kp, tn)
    acc = jnp.dot(x_ref[0], lo, preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[1], hi, preferred_element_type=jnp.float32)
    if mode == "bigdot":  # single scale: wrong numerics, perf probe only
        acc = acc * s_ref[0, :][None, :]
    o_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def variant_matmul(x2, w_packed, scale, mode: str, interpret: bool = False):
    two, m, kp = x2.shape
    _, n = w_packed.shape
    g_total = scale.shape[0]
    block_n = 512
    while n % block_n != 0:
        block_n //= 2
    gt = min(8, g_total)
    while g_total % gt != 0:
        gt -= 1
    block_kp = gt * GROUP_ROWS_PACKED
    return pl.pallas_call(
        functools.partial(_variant_kernel, groups=gt, mode=mode),
        grid=(n // block_n, g_total // gt),
        in_specs=[
            pl.BlockSpec((2, m, block_kp), lambda i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kp, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((gt, block_n), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, block_n), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x2, w_packed, scale.astype(jnp.float32))


def timed_loop(step_fn, x0, t_steps):
    """Wall of ``t_steps`` chained applications inside one jit program."""

    @jax.jit
    def run(x):
        def body(carry, _):
            return step_fn(carry), None

        out, _ = jax.lax.scan(body, x, None, length=t_steps)
        return out

    jax.block_until_ready(run(x0))  # compile
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(y, m, k):
    """Feed the output back as the next x (defeats loop hoisting)."""
    y = y.astype(jnp.bfloat16) * 1e-3
    reps = -(-k // y.shape[-1])
    return jnp.tile(y, (1, reps))[:, :k] if reps > 1 else y[:, :k]


for m, k, n in SHAPES:
    rng = np.random.RandomState(k + n)
    w = jnp.asarray(rng.randn(k, n).astype(np.float32) / np.sqrt(k))
    q4 = quantize_linear({"w": w}, bits=4)
    q8 = quantize_linear({"w": w}, bits=8)
    x0 = jnp.asarray(rng.randn(m, k).astype(np.float32)).astype(jnp.bfloat16)

    def xla_int8(x, _q=q8, _k=k, _n=n):
        y = (
            jax.lax.dot_general(
                x, _q["w"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            * _q["scale"]
        )
        return chain(y, m, _k)

    def product(x, _q=q4, _k=k):
        x2 = jnp.moveaxis(x.reshape(m, _k // 2, 2), -1, 0)
        y = int4_matmul(x2, _q["w"], _q["scale"], interpret=INTERPRET)
        return chain(y, m, _k)

    def make_variant(mode, _q=q4, _k=k):
        def f(x):
            x2 = jnp.moveaxis(x.reshape(m, _k // 2, 2), -1, 0)
            y = variant_matmul(x2, _q["w"], _q["scale"], mode, interpret=INTERPRET)
            return chain(y, m, _k)

        return f

    print(f"[{m} x {k} -> {n}]  (packed {k//2*n/1e6:.1f} MB int4, {k*n/1e6:.1f} MB int8)")
    for name, fn in (
        ("int8-xla", xla_int8),
        ("int4-group", product),
        ("int4-bigdot", make_variant("bigdot")),
        ("int4-wscale", make_variant("wscale")),
    ):
        hi_t = timed_loop(fn, x0, T_HI)
        lo_t = timed_loop(fn, x0, T_LO)
        per = (hi_t - lo_t) / (T_HI - T_LO)
        print(f"  {name:12s} {per*1e6:8.1f} us/matmul", flush=True)
