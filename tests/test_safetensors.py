"""safetensors store/reader/writer tests (mirrors the reference's
`internal/safetensors/*_test.go` coverage tiers)."""

import json
import struct

import numpy as np
import pytest

from go_pocket_tts_tpu.utils import safetensors as st


def _encode_raw(header: dict, payload: bytes) -> bytes:
    hb = json.dumps(header).encode()
    return struct.pack("<Q", len(hb)) + hb + payload


def test_roundtrip_f32():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    data = st.encode_tensors({"x": a})
    store = st.open_store_from_bytes(data)
    assert store.names() == ["x"]
    assert store.shape("x") == (3, 4)
    np.testing.assert_array_equal(store.tensor("x"), a)


def test_roundtrip_i64():
    a = np.array([1, -2, 3], dtype=np.int64)
    store = st.open_store_from_bytes(st.encode_tensors({"ids": a}))
    out = store.tensor("ids")
    assert out.dtype == np.int64
    np.testing.assert_array_equal(out, a)
    # tensor_f32 value-casts like the reference store.
    np.testing.assert_array_equal(store.tensor_f32("ids"), a.astype(np.float32))


def test_f16_decode_including_subnormals():
    vals = np.array([0.0, 1.0, -2.5, 6.1e-5, 5.96e-8, 65504.0], dtype=np.float16)
    payload = vals.tobytes()
    data = _encode_raw(
        {"h": {"dtype": "F16", "shape": [6], "data_offsets": [0, len(payload)]}}, payload
    )
    out = st.open_store_from_bytes(data).tensor("h")
    np.testing.assert_allclose(out, vals.astype(np.float32), rtol=0, atol=0)


def test_bf16_decode():
    f32 = np.array([0.0, 1.0, -3.140625, 2.0**100], dtype=np.float32)
    bf16 = (f32.view(np.uint32) >> 16).astype("<u2")
    payload = bf16.tobytes()
    data = _encode_raw(
        {"b": {"dtype": "BF16", "shape": [4], "data_offsets": [0, len(payload)]}}, payload
    )
    out = st.open_store_from_bytes(data).tensor("b")
    np.testing.assert_array_equal(out, f32)  # these values are bf16-exact


def test_invalid_offsets_rejected():
    payload = np.zeros(4, dtype=np.float32).tobytes()
    bad = _encode_raw(
        {"x": {"dtype": "F32", "shape": [4], "data_offsets": [0, 8]}}, payload
    )
    with pytest.raises(st.SafetensorsError):
        st.open_store_from_bytes(bad)


def test_offsets_beyond_payload_rejected():
    bad = _encode_raw({"x": {"dtype": "F32", "shape": [4], "data_offsets": [0, 16]}}, b"\0" * 8)
    with pytest.raises(st.SafetensorsError):
        st.open_store_from_bytes(bad)


def test_unsupported_dtype_rejected():
    bad = _encode_raw({"x": {"dtype": "F64", "shape": [1], "data_offsets": [0, 8]}}, b"\0" * 8)
    with pytest.raises(st.SafetensorsError):
        st.open_store_from_bytes(bad)


def test_key_mapper_rename_and_drop():
    a = np.ones(2, dtype=np.float32)
    b = np.zeros(2, dtype=np.float32)
    data = st.encode_tensors({"old.name": a, "drop.me": b})

    def mapper(name):
        if name == "old.name":
            return "new.name", True
        return name, False

    store = st.open_store_from_bytes(data, key_mapper=mapper)
    assert store.names() == ["new.name"]
    np.testing.assert_array_equal(store.tensor("new.name"), a)


def test_validate_model_keys(tmp_path):
    tensors = {k: np.zeros(1, dtype=np.float32) for k in st.REQUIRED_MODEL_KEYS}
    p = tmp_path / "model.safetensors"
    st.write_file(p, tensors)
    st.validate_model_keys(p)  # should not raise

    tensors = {k: v for k, v in tensors.items() if k != "flow_lm.bos_emb"}
    p2 = tmp_path / "missing.safetensors"
    st.write_file(p2, tensors)
    with pytest.raises(st.SafetensorsError, match="bos_emb"):
        st.validate_model_keys(p2)


# -- voice files ----------------------------------------------------------


def test_voice_embedding_classify_and_load_2d_promotes():
    emb = np.random.RandomState(0).randn(7, 16).astype(np.float32)
    data = st.encode_tensors({"audio_prompt": emb})
    assert st.inspect_voice_file_bytes(data) == st.VoiceFileKind.EMBEDDING
    out = st.load_voice_embedding_from_bytes(data)
    assert out.shape == (1, 7, 16)
    np.testing.assert_array_equal(out[0], emb)


def test_voice_model_state_load_and_reject_as_embedding():
    cache = np.random.RandomState(1).randn(2, 1, 5, 4, 8).astype(np.float32)
    data = st.encode_tensors(
        {
            "transformer.layers.0.self_attn/cache": cache,
            "transformer.layers.0.self_attn/offset": np.array([5.0], dtype=np.float32),
        }
    )
    assert st.inspect_voice_file_bytes(data) == st.VoiceFileKind.MODEL_STATE
    state = st.load_voice_model_state_from_bytes(data)
    mod = state.modules["transformer.layers.0.self_attn"]
    assert mod["cache"].shape == (2, 1, 5, 4, 8)
    assert mod["offset"][0] == 5.0
    with pytest.raises(st.SafetensorsError):
        st.load_voice_embedding_from_bytes(data)


def test_voice_model_state_legacy_current_end():
    cache = np.zeros((2, 1, 6, 4, 8), dtype=np.float32)
    # Legacy files carry current_end instead of offset; offset becomes the
    # first dim of the current_end tensor (reader.go:273-287).
    data = st.encode_tensors(
        {
            "m/cache": cache,
            "m/current_end": np.zeros((6,), dtype=np.float32),
        }
    )
    state = st.load_voice_model_state_from_bytes(data)
    assert state.modules["m"]["offset"][0] == 6.0
