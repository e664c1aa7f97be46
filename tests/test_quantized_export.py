"""Pre-quantized checkpoint export (`model export --quantize`).

The contract under test: a pre-quantized artifact loads into EXACTLY the
param tree that load-time quantization (`--runtime-quantize`) would build —
leaf-for-leaf — so serving numerics are bit-identical and the artifact is
just a faster/smaller way to ship the same model.
"""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.cli.main import main
from go_pocket_tts_tpu.model_assets.quantize_export import (
    QUANT_METADATA_KEY,
    build_quantized_checkpoint,
    linear_weight_names,
    quantize_weight_np,
)
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import PocketTTSModel, load_model_from_store
from go_pocket_tts_tpu.models.quantize import quantize_linear, quantize_model_params
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.utils.safetensors import (
    encode_tensors,
    open_store,
    open_store_from_bytes,
    validate_model_keys,
    write_file,
)

ARCH = synthetic.tiny_arch()


def _f32_store():
    return open_store_from_bytes(encode_tensors(synthetic.build_checkpoint(ARCH, seed=9)))


def test_i8_u8_roundtrip_with_metadata():
    t = {
        "q": np.arange(-8, 8, dtype=np.int8).reshape(4, 4),
        "p": np.arange(16, dtype=np.uint8).reshape(2, 8),
        "f": np.linspace(-1, 1, 6, dtype=np.float32).reshape(2, 3),
    }
    data = encode_tensors(t, metadata={"pockettts.quantize": "int8"})
    store = open_store_from_bytes(data)
    assert store.dtype("q") == "I8" and store.dtype("p") == "U8"
    np.testing.assert_array_equal(store.tensor("q"), t["q"])
    np.testing.assert_array_equal(store.tensor("p"), t["p"])
    assert store.tensor("q").dtype == np.int8
    assert store.tensor("p").dtype == np.uint8
    assert store.metadata["pockettts.quantize"] == "int8"


@pytest.mark.parametrize(
    "bits,k",
    [(8, 96), (4, 256), (4, 96)],  # int8; int4 grouped; int4 per-channel
)
def test_quantize_weight_np_matches_runtime(bits, k):
    rng = np.random.RandomState(3)
    w = (rng.randn(24, k) / 7).astype(np.float32)  # torch layout [out, in]
    stored, scale = quantize_weight_np(w, bits)

    ref = quantize_linear({"w": jnp.asarray(w.T)}, bits=bits)  # runtime layout
    ref_scale = np.asarray(ref["scale"])

    if bits == 8:
        assert stored.dtype == np.int8
        np.testing.assert_array_equal(stored.T, np.asarray(ref["w"]))
        np.testing.assert_array_equal(scale, ref_scale)
    else:
        assert stored.dtype == np.uint8 and stored.shape == (24, k // 2)
        # The disk buffer [out, in/2] transposes byte-for-byte into the
        # runtime packed form [in/2, out] (same nibble pairing).
        np.testing.assert_array_equal(stored.T, np.asarray(ref["w"]))
        np.testing.assert_array_equal(scale, ref_scale)


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_flatten_with_path(a)
    lb = jax.tree_util.tree_flatten_with_path(b)
    assert [p for p, _ in la[0]] == [p for p, _ in lb[0]]
    for (path, x), (_, y) in zip(la[0], lb[0]):
        assert x.dtype == y.dtype, (path, x.dtype, y.dtype)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y), err_msg=str(path))


@pytest.mark.parametrize("bits", [8, 4])
def test_prequantized_load_equals_load_time_quantize(bits):
    src = _f32_store()
    tensors, metadata, quantized = build_quantized_checkpoint(
        src, bits, num_heads=ARCH.num_heads
    )
    assert metadata[QUANT_METADATA_KEY] == ("int8" if bits == 8 else "int4-g128")
    assert quantized  # every transformer/flow linear
    store_q = open_store_from_bytes(encode_tensors(tensors, metadata=metadata))

    pre = load_model_from_store(store_q, num_heads=ARCH.num_heads)
    ref = load_model_from_store(_f32_store(), num_heads=ARCH.num_heads)
    ref_q = quantize_model_params(ref.params, bits=bits)
    _assert_trees_equal(pre.params, ref_q)


def test_prequantized_generation_sample_exact_int4():
    src = _f32_store()
    tensors, metadata, _ = build_quantized_checkpoint(src, 4, num_heads=ARCH.num_heads)
    store_q = open_store_from_bytes(encode_tensors(tensors, metadata=metadata))
    pre = load_model_from_store(store_q, num_heads=ARCH.num_heads)
    ref = load_model_from_store(_f32_store(), num_heads=ARCH.num_heads)

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)
    a = TPURuntime(pre, seed=1, frame_bucket=64).generate_audio([3, 7], cfg)
    b = TPURuntime(ref, seed=1, frame_bucket=64, quantize=4).generate_audio([3, 7], cfg)
    np.testing.assert_array_equal(a, b)


def test_export_is_idempotent():
    src = _f32_store()
    tensors, metadata, quantized = build_quantized_checkpoint(
        src, 8, num_heads=ARCH.num_heads
    )
    store_q = open_store_from_bytes(encode_tensors(tensors, metadata=metadata))
    tensors2, _, quantized2 = build_quantized_checkpoint(
        store_q, 8, num_heads=ARCH.num_heads
    )
    assert quantized2 == []  # already-quantized tensors pass through
    assert set(tensors2) == set(tensors)

    # Re-exporting an int8 artifact as int4 quantizes nothing — the metadata
    # must keep telling the truth (int8), not claim int4.
    _, metadata3, quantized3 = build_quantized_checkpoint(
        store_q, 4, num_heads=ARCH.num_heads
    )
    assert quantized3 == []
    assert metadata3[QUANT_METADATA_KEY] == "int8"


def test_odd_input_dim_int4_falls_back_to_int8_everywhere():
    """Odd in-dims can't nibble-pack; BOTH the exporter and load-time
    quantization fall back to int8 so the leaf-exact contract holds."""
    rng = np.random.RandomState(2)
    w = (rng.randn(10, 97) / 5).astype(np.float32)  # odd k
    stored, scale = quantize_weight_np(w, 4)
    assert stored.dtype == np.int8  # exporter fallback

    q = quantize_linear({"w": jnp.asarray(w.T)}, bits=4)
    assert q["w"].dtype == jnp.int8  # runtime fallback matches
    np.testing.assert_array_equal(stored.T, np.asarray(q["w"]))
    np.testing.assert_array_equal(scale, np.asarray(q["scale"]))


def test_read_header_metadata(tmp_path):
    from go_pocket_tts_tpu.utils.safetensors import read_header_metadata

    src = tmp_path / "m.safetensors"
    write_file(
        src,
        {"a": np.zeros((2, 2), np.float32)},
        metadata={QUANT_METADATA_KEY: "int4-g128"},
    )
    assert read_header_metadata(src) == {QUANT_METADATA_KEY: "int4-g128"}
    plain = tmp_path / "p.safetensors"
    write_file(plain, {"a": np.zeros((2, 2), np.float32)})
    assert read_header_metadata(plain) == {}


def test_service_warns_on_quantize_bits_conflict(tmp_path, caplog):
    """--runtime-quantize int8 against an int4 artifact must warn loudly:
    the artifact wins and the configured width is not what serves."""
    import logging

    from go_pocket_tts_tpu.config import Config
    from go_pocket_tts_tpu.tts.service import Service
    from test_tokenizer import _toy_model

    src = _f32_store()
    tensors, metadata, _ = build_quantized_checkpoint(src, 4, num_heads=ARCH.num_heads)
    model_path = tmp_path / "model.int4.safetensors"
    write_file(model_path, tensors, metadata=metadata)
    tok_path = tmp_path / "tok.model"
    tok_path.write_bytes(_toy_model().serialize())

    cfg = Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = str(tok_path)
    cfg.runtime.quantize = True
    cfg.runtime.quantize_bits = 8
    with caplog.at_level(logging.WARNING, logger="pockettts.service"):
        Service.from_config(cfg)
    assert any(
        "int8" in r.getMessage() and "int4" in r.getMessage()
        for r in caplog.records
    ), caplog.records


def test_cli_export_quantize_and_strip(tmp_path, capsys):
    src = tmp_path / "model.safetensors"
    write_file(src, synthetic.build_checkpoint(ARCH, seed=9))
    dst = tmp_path / "model.int4.safetensors"

    rc = main(
        [
            "model",
            "export",
            "--paths-model-path",
            str(src),
            "--output",
            str(dst),
            "--quantize",
            "int4",
            "--strip-voice-cloning",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["format"] == "int4-g128" and out["quantized"] > 0
    assert os.path.getsize(dst) < os.path.getsize(src) * 0.55

    validate_model_keys(dst)
    store = open_store(dst)
    assert store.metadata[QUANT_METADATA_KEY] == "int4-g128"
    assert not any(n.startswith("mimi.encoder") for n in store.names())
    model = load_model_from_store(store, num_heads=ARCH.num_heads)
    lin = model.params["flow_lm"]["transformer"]["layers"][0]["in_proj"]
    assert "scale" in lin


def test_prequantized_through_batched_engine():
    """Config-5 serving shape: pre-quantized artifact == load-time quantize
    through the continuous batcher, sample-exact at temp 0."""
    from go_pocket_tts_tpu.parallel.batching import ContinuousBatcher

    src = _f32_store()
    tensors, metadata, _ = build_quantized_checkpoint(src, 8, num_heads=ARCH.num_heads)
    pre = load_model_from_store(
        open_store_from_bytes(encode_tensors(tensors, metadata=metadata)),
        num_heads=ARCH.num_heads,
    )
    ref = load_model_from_store(_f32_store(), num_heads=ARCH.num_heads)

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)
    a = ContinuousBatcher(
        pre, slots=2, prompt_capacity=64, max_frames=64, seed=3, kv_quantize=True
    )
    b = ContinuousBatcher(
        ref, slots=2, prompt_capacity=64, max_frames=64, seed=3,
        quantize=True, kv_quantize=True,
    )
    a.start()
    b.start()
    try:
        got = a.generate([5, 9, 2], cfg, timeout=60)
        want = b.generate([5, 9, 2], cfg, timeout=60)
    finally:
        a.stop()
        b.stop()
    np.testing.assert_array_equal(got, want)


def test_model_quantized_bits():
    from go_pocket_tts_tpu.models.quantize import model_quantized_bits

    ref = load_model_from_store(_f32_store(), num_heads=ARCH.num_heads)
    assert model_quantized_bits(ref.params) is None
    assert model_quantized_bits(quantize_model_params(ref.params, bits=8)) == 8
    assert model_quantized_bits(quantize_model_params(ref.params, bits=4)) == 4


@pytest.mark.parametrize("bits,k", [(8, 96), (4, 256), (4, 96)])
def test_dequantize_matches_serving_matmul(bits, k):
    """x @ dequant(w).T == the serving path's quantized apply_linear."""
    from go_pocket_tts_tpu.model_assets.quantize_export import dequantize_weight_np
    from go_pocket_tts_tpu.models.params import apply_linear

    rng = np.random.RandomState(11)
    w = (rng.randn(24, k) / 7).astype(np.float32)  # [out, in]
    stored, scale = quantize_weight_np(w, bits)
    deq = dequantize_weight_np(stored, scale)  # [out, in]

    x = rng.randn(3, k).astype(np.float32)
    ref = quantize_linear({"w": jnp.asarray(w.T)}, bits=bits)
    y_serving = np.asarray(apply_linear(ref, jnp.asarray(x)))
    y_deq = x @ deq.T
    np.testing.assert_allclose(y_deq, y_serving, atol=1e-4, rtol=1e-4)


def test_torch_oracle_reads_prequantized_artifact():
    """Cross-engine parity holds on a pre-quantized checkpoint: the torch
    oracle dequantizes I8/U8 weights instead of casting raw codes."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from go_pocket_tts_tpu.tts.runtime_torch import TorchRuntime

    src = _f32_store()
    tensors, metadata, _ = build_quantized_checkpoint(src, 8, num_heads=ARCH.num_heads)
    data = encode_tensors(tensors, metadata=metadata)

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)
    pre = load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)
    a = TPURuntime(pre, seed=1, frame_bucket=64).generate_audio([3, 7], cfg)
    b = TorchRuntime(
        open_store_from_bytes(data), num_heads=ARCH.num_heads, seed=1
    ).generate_audio([3, 7], cfg)
    assert len(a) == len(b)
    rms = np.sqrt(np.mean((a - b) ** 2))
    assert rms < 1e-3, rms


def test_bf16_write_roundtrip():
    """BF16 storage is bit-exact: write bf16, read back the same values."""
    import ml_dtypes

    rng = np.random.RandomState(4)
    f = rng.randn(5, 7).astype(np.float32)
    b = np.asarray(f, dtype=ml_dtypes.bfloat16)
    store = open_store_from_bytes(encode_tensors({"x": b}))
    assert store.dtype("x") == "BF16"
    got = store.tensor("x")  # widens to f32, losslessly for bf16 values
    np.testing.assert_array_equal(got, b.astype(np.float32))


def test_cli_export_bf16_and_quantized_bf16(tmp_path, capsys):
    src = tmp_path / "model.safetensors"
    write_file(src, synthetic.build_checkpoint(ARCH, seed=9))

    bf16 = tmp_path / "model.bf16.safetensors"
    rc = main(
        ["model", "export", "--paths-model-path", str(src),
         "--output", str(bf16), "--dtype", "bf16"]
    )
    assert rc == 0
    capsys.readouterr()
    assert os.path.getsize(bf16) < os.path.getsize(src) * 0.55
    model = load_model_from_store(open_store(bf16), num_heads=ARCH.num_heads)
    assert model.config.flow_lm.d_model == ARCH.d_model

    both = tmp_path / "model.int8.bf16.safetensors"
    rc = main(
        ["model", "export", "--paths-model-path", str(src), "--output",
         str(both), "--quantize", "int8", "--dtype", "bf16"]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["format"] == "int8"
    store = open_store(both)
    # int8 weights + f32 scales + bf16 everything-else
    assert store.dtype("flow_lm.transformer.layers.0.self_attn.in_proj.weight") == "I8"
    assert (
        store.dtype("flow_lm.transformer.layers.0.self_attn.in_proj.weight_scale")
        == "F32"
    )
    assert store.dtype("flow_lm.transformer.layers.0.norm1.weight") == "BF16"
    # tiny arch is conv-heavy; the real arch drops further (PERF.md)
    assert os.path.getsize(both) < os.path.getsize(src) * 0.40

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)
    m = load_model_from_store(store, num_heads=ARCH.num_heads)
    audio = TPURuntime(m, seed=1, frame_bucket=64).generate_audio([3, 7], cfg)
    assert np.all(np.isfinite(audio)) and len(audio) > 0


def test_linear_weight_names_covers_transformer():
    names = linear_weight_names(_f32_store(), num_heads=ARCH.num_heads)
    assert "flow_lm.transformer.layers.0.self_attn.in_proj.weight" in names
    assert "flow_lm.conditioner.embed.weight" not in names  # gather, not linear
