"""Golden waveform regression net.

A committed fixture (temperature 0, fixed synthetic checkpoint) pins the
end-to-end numerics; any refactor that silently changes the math fails here
(the analogue of the reference's committed parity snapshots,
`internal/tts/parity.go` JSON records). Regenerate deliberately with
``python tests/goldens/regen.py`` when the change is intentional.
"""

import json
import os

import numpy as np

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "generation_tiny.json")


def test_generation_matches_golden():
    with open(GOLDEN) as f:
        g = json.load(f)

    arch = synthetic.tiny_arch()
    model = load_model_from_store(
        open_store_from_bytes(
            encode_tensors(synthetic.build_checkpoint(arch, seed=g["checkpoint_seed"]))
        ),
        num_heads=arch.num_heads,
    )
    rt = TPURuntime(model, seed=0, frame_bucket=64)
    audio = rt.generate_audio(
        g["tokens"],
        GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=g["max_steps"]),
    )
    assert len(audio) == g["num_samples"]
    np.testing.assert_allclose(
        float(np.sqrt(np.mean(audio.astype(np.float64) ** 2))), g["rms"], rtol=1e-3
    )
    np.testing.assert_allclose(
        float(np.max(np.abs(audio))), g["peak_abs"], rtol=1e-3
    )
    np.testing.assert_allclose(audio[:16], g["first_samples"], atol=1e-4)
    np.testing.assert_allclose(audio[7000:7016], g["mid_samples"], atol=1e-4)
