"""Driver benchmark: real-time factor on a 20-word utterance, one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

- metric: audio seconds synthesized per wall-clock second ("×-real-time",
  higher is better) on a 20-word utterance, including the full pipeline
  (prefill + jitted AR while-loop + Mimi decode), excluding compilation.
- baseline: BASELINE.md target RTF ≥ 50× per chip → vs_baseline = value / 50.
- also reports p50 time-to-first-audio in the payload's extra fields.

Uses the real checkpoint + tokenizer when present under ``models/``;
otherwise falls back to synthetic weights at the published PocketTTS
dimensions (identical compute graph and cost; EOS forced off so the
workload is the full fixed-length utterance).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TEXT_20_WORDS = (
    "The quick brown fox jumps over the lazy dog while seven wizards "
    "brew quiet potions beneath the ancient willow tree tonight."
)

MODEL_PATH = os.environ.get("POCKETTTS_BENCH_MODEL", "models/tts_b6369a24.safetensors")
TOKENIZER_PATH = os.environ.get("POCKETTTS_BENCH_TOKENIZER", "models/tokenizer.model")
RUNS = int(os.environ.get("POCKETTTS_BENCH_RUNS", "5"))
DTYPE = os.environ.get("POCKETTTS_BENCH_DTYPE", "bfloat16")
QUANT = os.environ.get("POCKETTTS_BENCH_QUANT", "") == "1"
TARGET_X_REALTIME = 50.0


def _load_model_and_tokens():
    import jax.numpy as jnp

    from go_pocket_tts_tpu.models.model import load_model, load_model_from_store

    real = os.path.exists(MODEL_PATH)
    if real:
        model = load_model(MODEL_PATH)
    else:
        from go_pocket_tts_tpu.models import synthetic
        from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

        arch = synthetic.real_arch()
        store = open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=0)))
        model = load_model_from_store(store, num_heads=arch.num_heads)

    if real and os.path.exists(TOKENIZER_PATH):
        from go_pocket_tts_tpu.text.sentencepiece import load_tokenizer
        from go_pocket_tts_tpu.text import prepare_text

        tok = load_tokenizer(TOKENIZER_PATH)
        tokens = tok.encode(prepare_text(TEXT_20_WORDS))
    else:
        # Deterministic pseudo-tokens: 27 ids (typical for a 20-word sentence).
        rng = np.random.RandomState(7)
        n_bins = model.params["flow_lm"]["conditioner_embed"].shape[0]
        tokens = list(rng.randint(0, int(n_bins) - 1, size=27))
    return model, tokens, real


def main() -> int:
    import jax

    # Persistent compilation cache: a fresh bench process reuses executables
    # compiled by earlier runs (first-ever run still pays ~2-5 min).
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass
    import jax.numpy as jnp

    from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
    from go_pocket_tts_tpu.text import estimate_max_frames

    model, tokens, real = _load_model_and_tokens()
    dtype = jnp.bfloat16 if DTYPE == "bfloat16" else jnp.float32
    rt = TPURuntime(model, dtype=dtype, seed=42, quantize=QUANT)

    max_steps = estimate_max_frames(len(tokens))
    cfg = GenerateConfig(
        temperature=0.7,
        # Real weights: normal EOS. Synthetic weights: EOS logits are noise,
        # so pin the workload to the full estimated length.
        eos_threshold=-4.0 if real else 1e9,
        max_steps=max_steps,
    )

    # Warmup / compile.
    rt.generate_audio(tokens, cfg)

    runs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        audio = rt.generate_audio(tokens, cfg)
        wall = time.perf_counter() - t0
        audio_sec = len(audio) / 24_000.0
        runs.append((audio_sec / wall, wall, audio_sec))

    x_rt = sorted(r[0] for r in runs)[len(runs) // 2]

    # Time-to-first-audio over the frame-streaming path (p50 of a few runs;
    # the adaptive 4->16-frame segment programs compile on the first pass and
    # land in the persistent cache). POCKETTTS_BENCH_TTFA=0 skips.
    ttfa_ms = None
    if os.environ.get("POCKETTTS_BENCH_TTFA", "1") != "0":
        try:
            from go_pocket_tts_tpu.runtime.streaming import stream_generate

            ttfas = []
            for _ in range(5):
                t0 = time.perf_counter()
                gen = stream_generate(rt, tokens, cfg)
                next(gen)
                ttfas.append((time.perf_counter() - t0) * 1e3)
                for _blk in gen:  # drain so device state fully resolves
                    pass
            ttfas = ttfas[1:]  # first run may include compiles
            ttfa_ms = sorted(ttfas)[len(ttfas) // 2]
        except Exception as exc:  # noqa: BLE001 - never lose the headline
            print(f"# ttfa measurement failed: {exc}", file=sys.stderr)

    history_note = _record_history(x_rt)
    payload = {
        "metric": "x_realtime_20w_single_chip",
        "value": round(x_rt, 3),
        "unit": "audio_sec/sec",
        "vs_baseline": round(x_rt / TARGET_X_REALTIME, 4),
        "extra": {
            "runs": [
                {"x_realtime": round(x, 2), "wall_s": round(w, 4), "audio_s": round(a, 3)}
                for x, w, a in runs
            ],
            "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
            "int8_weights": QUANT,
            "real_checkpoint": real,
            "tokens": len(tokens),
            "max_steps": max_steps,
            "device": str(jax.devices()[0]),
            "ttfa_ms_p50": round(ttfa_ms, 1) if ttfa_ms is not None else None,
        },
    }
    if history_note:
        payload["extra"]["history"] = history_note
    print(json.dumps(payload))
    return 0


HISTORY_PATH = os.environ.get("POCKETTTS_BENCH_HISTORY", "bench_history.jsonl")


def _record_history(x_rt: float) -> str:
    """Append this run to the perf history and flag regressions (>10% below
    the median of the last 5 recorded runs) — the per-commit perf gate
    VERDICT r1 asked for. Returns a note for the payload ('' if fine)."""
    note = ""
    try:
        prior = []
        if os.path.exists(HISTORY_PATH):
            with open(HISTORY_PATH, "r", encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        try:
                            prior.append(json.loads(line))
                        except json.JSONDecodeError:
                            continue
        recent = [p["x_realtime"] for p in prior[-5:] if "x_realtime" in p]
        if recent:
            ref = sorted(recent)[len(recent) // 2]
            if x_rt < 0.9 * ref:
                note = (
                    f"REGRESSION: {x_rt:.1f}x is >10% below recent median {ref:.1f}x"
                )
                print(f"bench.py WARNING {note}", file=sys.stderr)

        commit = ""
        try:
            import subprocess

            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip()
        except Exception:  # noqa: BLE001
            pass
        with open(HISTORY_PATH, "a", encoding="utf-8") as fh:
            fh.write(
                json.dumps(
                    {
                        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
                        "commit": commit,
                        "x_realtime": round(x_rt, 3),
                        "dtype": DTYPE,
                        "int8_weights": QUANT,
                        "runs": RUNS,
                    }
                )
                + "\n"
            )
    except OSError:
        pass
    return note


if __name__ == "__main__":
    sys.exit(main())
