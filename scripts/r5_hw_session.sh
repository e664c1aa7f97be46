#!/bin/bash
# r5 hardware measurement session — run when the tunnel is healthy.
# 2026-08-19 afternoon regime: a process's FIRST device→host fetch can
# stall 40-230 s (wake-up), after which the connection is healthy
# (p50 24 ms steady). bench.py's RTT probe pays the wake-up itself; the
# standalone experiments below inherit a woken tunnel only within their own
# process, so give each a generous timeout. Keep the host otherwise idle
# (1 CPU core) and never run two JAX processes at once.
# Produces /tmp/r5_hw/*.{json,txt}. Order: benches first (gate goal),
# then the decision experiments.
set -u
mkdir -p /tmp/r5_hw
cd "$(dirname "$0")/.."

echo "== tunnel bandwidth probe =="
timeout 600 python - <<'EOF' 2>&1 | grep -v WARNING | tee /tmp/r5_hw/bandwidth.txt
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
for mb in (1, 4):
    n = mb * 512 * 1024
    # Device-COMPUTED payload: host-built arrays (jnp.zeros) keep a
    # client-side copy in the axon runtime, so device_get returns without
    # crossing the tunnel and reads ~77 GB/s. iota forces a real transfer.
    x = jax.jit(lambda: jax.lax.iota(jnp.int16, n))()
    jax.block_until_ready(x)
    jax.device_get(x)  # wake-up fetch (can stall minutes; excluded)
    ts = sorted(
        (lambda t0: (jax.device_get(x), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    print(f"{mb} MB fetch: p50={ts[2]*1e3:.0f} ms -> {mb/ts[2]:.1f} MB/s")
EOF

echo "== bench run 1 (records tunnel_rtt_ms; check REGRESSION lines) =="
timeout 3000 python bench.py > /tmp/r5_hw/bench1.json 2> /tmp/r5_hw/bench1.err
echo "rc=$?"; grep -E "REGRESSION|tunnel" /tmp/r5_hw/bench1.err || true

echo "== bench run 2 (consecutive; goal: zero REGRESSION lines twice) =="
timeout 3000 python bench.py > /tmp/r5_hw/bench2.json 2> /tmp/r5_hw/bench2.err
echo "rc=$?"; grep -E "REGRESSION|tunnel" /tmp/r5_hw/bench2.err || true

echo "== int4 A/B incl. the r5 fused depack-matmul Pallas kernel =="
timeout 1800 python scripts/exp_int4_step.py > /tmp/r5_hw/int4_step.txt 2>&1
echo "rc=$?"; grep -E "per-step" /tmp/r5_hw/int4_step.txt || true

echo "== fp32 precision A/B (config1 headroom: highest vs high vs default) =="
timeout 1800 python scripts/exp_fp32_precision.py > /tmp/r5_hw/fp32_precision.txt 2>&1
echo "rc=$?"; grep -E "wall p50|decision" /tmp/r5_hw/fp32_precision.txt || true

echo "== continuity ladder A/B (config2: plain vs --continuity) =="
POCKETTTS_BENCH_CONFIGS=config2 timeout 1800 python bench.py \
  > /tmp/r5_hw/continuity.json 2> /tmp/r5_hw/continuity.err
echo "rc=$?"

echo "== slot scaling at the afternoon's ~30 MB/s (ceiling should lift) =="
timeout 1800 python scripts/exp_slot_scaling.py > /tmp/r5_hw/slot_scaling.txt 2>&1
echo "rc=$?"; tail -5 /tmp/r5_hw/slot_scaling.txt || true

echo "== burst profile (phase table at today's bandwidth) =="
timeout 1800 python scripts/exp_burst_profile.py > /tmp/r5_hw/burst.txt 2>&1
echo "rc=$?"

echo "done — fold results into PERF.md"
