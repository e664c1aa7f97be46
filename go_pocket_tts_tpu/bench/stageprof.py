"""Stage profiler (parity with `bench/stageprof/stageprof.go:34-245`).

Breaks one synthesis into prepare/prefill/ar/decode/encode wall-times using
the runtime's stage hooks, optionally wrapping the run in a
``jax.profiler.trace`` (the TPU analogue of the reference's pprof labels +
CPU profile flag).
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from go_pocket_tts_tpu.text import prepare_chunks
from go_pocket_tts_tpu.tts.service import MAX_TOKENS_PER_CHUNK
from go_pocket_tts_tpu.utils import wav

__all__ = ["StageProfile", "profile_synthesis"]

log = logging.getLogger("pockettts.stageprof")


@dataclass
class StageProfile:
    stages: Dict[str, float] = field(default_factory=dict)  # seconds
    rtf: float = 0.0
    audio_seconds: float = 0.0

    def format_table(self) -> str:
        lines = [f"{'stage':>10} {'ms':>10}"]
        for name, secs in self.stages.items():
            lines.append(f"{name:>10} {secs * 1e3:>10.1f}")
        lines.append(f"rtf={self.rtf:.4f} audio={self.audio_seconds:.2f}s")
        return "\n".join(lines)


def profile_synthesis(
    service,
    text: str,
    voice_path: str = "",
    jax_trace_dir: Optional[str] = None,
) -> StageProfile:
    prof = StageProfile()

    trace_cm = contextlib.nullcontext()
    if jax_trace_dir:
        import jax

        trace_cm = jax.profiler.trace(jax_trace_dir)

    with trace_cm:
        t0 = time.perf_counter()
        chunks = prepare_chunks(text, service.tokenizer, MAX_TOKENS_PER_CHUNK)
        t1 = time.perf_counter()
        prof.stages["prepare"] = t1 - t0

        samples: List[np.ndarray] = []
        t_gen = 0.0
        staged = getattr(service.runtime, "generate_audio_staged", None)
        for chunk in chunks:
            cfg = service._generate_config(chunk)
            g0 = time.perf_counter()
            with service._lock:
                if staged is not None:
                    pcm, stage_times = staged(chunk.token_ids, cfg)
                    for name, secs in stage_times.items():
                        prof.stages[name] = prof.stages.get(name, 0.0) + secs
                else:
                    pcm = service.runtime.generate_audio(chunk.token_ids, cfg)
            t_gen += time.perf_counter() - g0
            samples.append(pcm)
        prof.stages["generate"] = t_gen

        e0 = time.perf_counter()
        pcm_all = np.concatenate(samples) if samples else np.zeros(0, np.float32)
        wav_bytes = wav.encode_wav(pcm_all)
        prof.stages["encode"] = time.perf_counter() - e0

    prof.audio_seconds = len(pcm_all) / 24_000
    total = sum(prof.stages.values())
    prof.rtf = total / prof.audio_seconds if prof.audio_seconds > 0 else float("inf")
    log.debug("stageprof: %s (%d wav bytes)", prof.stages, len(wav_bytes))
    return prof
