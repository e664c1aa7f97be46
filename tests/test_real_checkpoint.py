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


@requires_checkpoint
def test_real_quantized_export_roundtrip(tmp_path):
    """Day-one check when assets land: `model export --quantize int8` on the
    REAL checkpoint loads leaf-exact vs load-time quantization (the synthetic
    tests pin the math; this pins it against real weight distributions,
    including any odd shapes the synthetic arch lacks)."""
    from go_pocket_tts_tpu.model_assets.quantize_export import (
        build_quantized_checkpoint,
    )
    from go_pocket_tts_tpu.models.model import load_model, load_model_from_store
    from go_pocket_tts_tpu.models.quantize import quantize_model_params
    from go_pocket_tts_tpu.utils.safetensors import open_store, write_file

    import jax
    import jax.numpy as jnp

    tensors, metadata, quantized = build_quantized_checkpoint(
        open_store(MODEL_PATH), bits=8
    )
    assert quantized, "no linears recorded on the real checkpoint"
    out = tmp_path / "real.int8.safetensors"
    write_file(out, tensors, metadata=metadata)

    pre = load_model_from_store(open_store(out))
    ref_q = quantize_model_params(load_model(MODEL_PATH).params, bits=8)
    la = jax.tree_util.tree_flatten_with_path(pre.params)[0]
    lb = jax.tree_util.tree_flatten_with_path(ref_q)[0]
    assert [p for p, _ in la] == [p for p, _ in lb]
    for (path, x), (_, y) in zip(la, lb):
        assert x.dtype == y.dtype, path
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=str(path))
