#!/bin/bash
# r5 hardware measurement session — run when the tunnel is healthy
# (probe: a warm 16-byte fetch must be <0.1 s; see CLAUDE.md).
# Produces /tmp/r5_hw/*.{json,txt}. Order matters: bench populates the
# persistent compile cache for everything after it.
set -u
mkdir -p /tmp/r5_hw
cd "$(dirname "$0")/.."

echo "== tunnel bandwidth probe =="
timeout 300 python - <<'EOF' 2>&1 | grep -v WARNING | tee /tmp/r5_hw/bandwidth.txt
import time, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
for mb in (1, 5):
    n = mb * 512 * 1024
    # Device-COMPUTED payload: host-built arrays (jnp.zeros) keep a
    # client-side copy in the axon runtime, so device_get returns without
    # crossing the tunnel and reads ~77 GB/s. iota forces a real transfer.
    x = jax.jit(lambda: jax.lax.iota(jnp.int16, n))()
    jax.block_until_ready(x)
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

echo "== continuity ladder A/B (config2: plain vs --continuity) =="
POCKETTTS_BENCH_CONFIGS=config2 timeout 1800 python bench.py \
  > /tmp/r5_hw/continuity.json 2> /tmp/r5_hw/continuity.err
echo "rc=$?"

echo "== burst profile (confirm the bandwidth-cap model at today's bw) =="
timeout 1800 python scripts/exp_burst_profile.py > /tmp/r5_hw/burst.txt 2>&1
echo "rc=$?"

echo "== fp32 precision A/B (config1 headroom: highest vs high vs default) =="
timeout 1800 python scripts/exp_fp32_precision.py > /tmp/r5_hw/fp32_precision.txt 2>&1
echo "rc=$?"; grep -E "wall p50|decision" /tmp/r5_hw/fp32_precision.txt || true

echo "done — fold results into PERF.md"
