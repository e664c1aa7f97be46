"""Structural test: the serving path runs WITHOUT torch.

The reference proves its "no Python at runtime" claim with a CI job in a
Python-less container (`.github/workflows/test-runtime-native.yml`,
SURVEY.md §4.1 tier 8). The TPU analogue: torch exists in this repo ONLY as
a cross-implementation oracle (`tts/runtime_torch.py`, kernel tests) — the
JAX serving stack must import and synthesize with torch made unimportable.
"""

import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys

class _Block:
    def find_module(self, name, path=None):
        if name == "torch" or name.startswith("torch."):
            return self
    def load_module(self, name):
        raise ImportError(f"torch is blocked in this test ({name})")

sys.meta_path.insert(0, _Block())

import jax
jax.config.update("jax_platforms", "cpu")

from go_pocket_tts_tpu.kernel import PocketTTSKernel
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.text.sentencepiece import SentencePieceModel
from go_pocket_tts_tpu.utils.safetensors import encode_tensors

m = SentencePieceModel()
for p, s, t in [("<unk>", 0.0, 2), ("▁hello", -1.0, 1), ("▁world", -1.0, 1)] + [
    (c, -6.0, 1) for c in "abcdefghijklmnopqrstuvwxyz▁"
]:
    m.pieces.append(p); m.scores.append(s); m.types.append(t)

kernel = PocketTTSKernel(seed=1)
kernel.load_model(
    encode_tensors(synthetic.build_checkpoint(synthetic.tiny_arch(), seed=9)),
    m.serialize(),
)
wav = kernel.synthesize("hello world", temperature=0.0, eos_threshold=1e9)
assert wav[:4] == b"RIFF" and len(wav) > 1000, len(wav)
assert "torch" not in sys.modules
print("NO-TORCH-OK", len(wav))
"""


def test_serving_path_needs_no_torch():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=_ROOT,
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "NO-TORCH-OK" in proc.stdout
