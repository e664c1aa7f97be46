"""Regenerate the golden waveform fixture (run ONLY for intentional math
changes): ``python tests/goldens/regen.py``."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.tts.parity import snapshot_pcm
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

TOKENS = [3, 14, 15, 9, 2, 6]
SEED = 202
MAX_STEPS = 8

arch = synthetic.tiny_arch()
model = load_model_from_store(
    open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(arch, seed=SEED))),
    num_heads=arch.num_heads,
)
rt = TPURuntime(model, seed=0, frame_bucket=64)
audio = rt.generate_audio(
    TOKENS, GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=MAX_STEPS)
)
snap = snapshot_pcm("tpu", audio)
golden = {
    "tokens": TOKENS,
    "checkpoint_seed": SEED,
    "max_steps": MAX_STEPS,
    "num_samples": snap.num_samples,
    "rms": snap.rms,
    "peak_abs": snap.peak_abs,
    "first_samples": [float(x) for x in audio[:16]],
    "mid_samples": [float(x) for x in audio[7000:7016]],
}
out = os.path.join(os.path.dirname(__file__), "generation_tiny.json")
with open(out, "w") as f:
    json.dump(golden, f, indent=2)
print("wrote", out)
