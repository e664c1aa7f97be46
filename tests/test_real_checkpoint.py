"""Real-checkpoint tests — skip-if-absent tier (the reference's
`requireCheckpoint` pattern, `internal/native/model_real_test.go:14-133`).

Activate by placing the published assets at ``models/tts_b6369a24.safetensors``
and ``models/tokenizer.model`` (`python -m go_pocket_tts_tpu model download`).
"""

import os

import numpy as np
import pytest

MODEL_PATH = os.environ.get(
    "POCKETTTS_MODEL_SAFETENSORS", "models/tts_b6369a24.safetensors"
)
TOKENIZER_PATH = os.environ.get("POCKETTTS_TOKENIZER_MODEL", "models/tokenizer.model")

requires_checkpoint = pytest.mark.skipif(
    not os.path.exists(MODEL_PATH), reason=f"real checkpoint not present at {MODEL_PATH}"
)
requires_tokenizer = pytest.mark.skipif(
    not os.path.exists(TOKENIZER_PATH), reason="real tokenizer not present"
)


@requires_checkpoint
def test_real_model_loads_with_published_dims():
    from go_pocket_tts_tpu.models.model import load_model

    model = load_model(MODEL_PATH)
    cfg = model.config.flow_lm
    assert cfg.d_model == 1024
    assert cfg.latent_dim == 32
    assert cfg.transformer.num_layers == 6
    assert cfg.transformer.num_heads == 16
    assert model.config.mimi.steps_per_latent == 16
    assert "latent_to_mimi" in model.params  # fused projector built


@requires_checkpoint
def test_real_model_header_keys():
    from go_pocket_tts_tpu.utils.safetensors import validate_model_keys

    validate_model_keys(MODEL_PATH)


@requires_checkpoint
@requires_tokenizer
def test_real_synthesis_end_to_end():
    from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
    from go_pocket_tts_tpu.models.model import load_model
    from go_pocket_tts_tpu.text import prepare_text
    from go_pocket_tts_tpu.text.sentencepiece import load_tokenizer

    tok = load_tokenizer(TOKENIZER_PATH)
    tokens = tok.encode(prepare_text("Hello world, this is a test."))
    assert 0 < len(tokens) <= 50

    rt = TPURuntime(load_model(MODEL_PATH), seed=42)
    audio = rt.generate_audio(tokens, GenerateConfig())
    assert len(audio) % 1920 == 0
    assert len(audio) >= 1920 * 5
    assert np.all(np.isfinite(audio))
    assert float(np.abs(audio).max()) > 1e-3  # not silence
