"""Long-form synthesis (BASELINE config 2): 500+ token multi-sentence input
chunked into ≤50-token pieces, bf16 runtime, plus the CLI subprocess backend."""

import numpy as np
import pytest

import jax.numpy as jnp

from go_pocket_tts_tpu.config import TTSConfig
from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import TPURuntime
from go_pocket_tts_tpu.tts.service import Service
from go_pocket_tts_tpu.utils import wav
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

ARCH = synthetic.tiny_arch()


class _Tok:
    """~3 tokens per word so 50-token chunks hold ~16 words."""

    def encode(self, s):
        out = []
        for w in s.split():
            out.extend([abs(hash(w + str(i))) % ARCH.n_bins for i in range(3)])
        return out


@pytest.fixture(scope="module")
def model():
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=99))
    return load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)


def test_longform_bf16_multi_chunk(model):
    """~200 words → 600+ tokens → ≥13 chunks; all synthesized and concatenated;
    EOS disabled so each chunk runs a deterministic frame count."""
    sentences = [f"sentence number {i} about item {i}." for i in range(40)]
    text = " ".join(sentences)

    rt = TPURuntime(model, dtype=jnp.bfloat16, seed=5, frame_bucket=64)
    svc = Service(rt, _Tok(), TTSConfig(temperature=0.7, eos_threshold=1e9, max_steps=4))

    chunks = list(svc.synthesize_stream(text))
    assert len(chunks) >= 10
    total = sum(len(c.samples) for c in chunks)
    assert total == len(chunks) * 4 * 1920
    assert chunks[-1].final

    audio = np.concatenate([c.samples for c in chunks])
    assert np.all(np.isfinite(audio))


def test_cli_backend_subprocess(tmp_path, monkeypatch):
    """The `cli` backend shells out and decodes the WAV from stdout."""
    from go_pocket_tts_tpu.tts.runtime_cli import CLIRuntime

    fake = tmp_path / "pocket-tts"
    payload_wav = tmp_path / "payload.wav"
    payload_wav.write_bytes(
        wav.encode_wav(np.full(480, 0.25, np.float32))
    )
    fake.write_text(
        "#!/bin/sh\n"
        f'cat "{payload_wav}"\n'
    )
    fake.chmod(0o755)

    rt = CLIRuntime(str(fake))
    samples = rt.synthesize_text("hello", "")
    assert len(samples) == 480
    assert abs(float(samples[0]) - 0.25) < 1e-3

    svc = Service(rt, None, TTSConfig(backend="cli"))
    out = svc.synthesize("hello world")
    assert len(out) == 480


def test_cli_backend_failure(tmp_path):
    from go_pocket_tts_tpu.tts.runtime_cli import CLIRuntime

    fake = tmp_path / "pocket-tts"
    fake.write_text("#!/bin/sh\necho doom >&2\nexit 3\n")
    fake.chmod(0o755)
    with pytest.raises(RuntimeError, match="doom"):
        CLIRuntime(str(fake)).synthesize_text("x", "")
