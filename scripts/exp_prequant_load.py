"""Cold-start comparison: f32 checkpoint + load-time quantization vs a
pre-quantized artifact (`model export --quantize`).

Host-side measurement (checkpoint parse + param-tree build + quantize walk
run on the host CPU regardless of backend), at the real architecture size
(`synthetic.real_arch()`), so the number is meaningful without the TPU
tunnel. Prints one JSON line.

Run: python scripts/exp_prequant_load.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # before any backend init

import numpy as np  # noqa: E402


def _block(tree) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main() -> int:
    from go_pocket_tts_tpu.model_assets.quantize_export import (
        build_quantized_checkpoint,
    )
    from go_pocket_tts_tpu.models import synthetic
    from go_pocket_tts_tpu.models.model import load_model_from_store
    from go_pocket_tts_tpu.models.quantize import quantize_model_params
    from go_pocket_tts_tpu.utils.safetensors import open_store, write_file

    work = "/tmp/prequant_load"
    os.makedirs(work, exist_ok=True)
    arch = synthetic.real_arch()
    f32_path = os.path.join(work, "model.f32.safetensors")
    if not os.path.exists(f32_path):
        write_file(f32_path, synthetic.build_checkpoint(arch, seed=5))

    paths = {"f32": f32_path}
    for tag, bits, fdt in (
        ("int8", 8, "f32"),
        ("int4", 4, "f32"),
        ("int8bf16", 8, "bf16"),
        ("int4bf16", 4, "bf16"),
    ):
        p = os.path.join(work, f"model.{tag}.safetensors")
        if not os.path.exists(p):
            store = open_store(f32_path)
            tensors, metadata, _ = build_quantized_checkpoint(
                store, bits, num_heads=arch.num_heads, float_dtype=fdt
            )
            write_file(p, tensors, metadata=metadata)
        paths[tag] = p

    def time_load(path: str, quantize_bits: int | None) -> float:
        t0 = time.perf_counter()
        model = load_model_from_store(open_store(path), num_heads=arch.num_heads)
        params = model.params
        if quantize_bits:
            params = quantize_model_params(params, bits=quantize_bits)
        _block(params)
        return time.perf_counter() - t0

    # Warm one load so file cache + jit-free numpy paths are steady state.
    time_load(paths["f32"], None)

    results = {
        "sizes_mb": {k: round(os.path.getsize(v) / 1e6, 1) for k, v in paths.items()},
        "load_s": {},
    }
    for name, (path, qbits) in {
        "f32": (paths["f32"], None),
        "f32_quantize_int8": (paths["f32"], 8),
        "f32_quantize_int4": (paths["f32"], 4),
        "prequant_int8": (paths["int8"], None),
        "prequant_int4": (paths["int4"], None),
        "prequant_int8_bf16": (paths["int8bf16"], None),
        "prequant_int4_bf16": (paths["int4bf16"], None),
    }.items():
        times = [time_load(path, qbits) for _ in range(3)]
        results["load_s"][name] = round(float(np.median(times)), 3)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
