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


# -- long-form continuity (KV state carried across chunks) --------------------


def test_session_first_chunk_matches_plain(model):
    """With no prior state, the session path must produce exactly what the
    plain path produces (same programs, same RNG stream)."""
    from go_pocket_tts_tpu.runtime import GenerateConfig

    cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=4)
    rt_a = TPURuntime(model, seed=11, frame_bucket=64)
    rt_b = TPURuntime(model, seed=11, frame_bucket=64)
    plain = rt_a.generate_audio([5, 9, 2], cfg)
    sess, cont = rt_b.generate_audio_session([5, 9, 2], cfg, None, session_capacity=128)
    np.testing.assert_allclose(sess, plain, atol=1e-5)
    assert cont.capacity >= 128
    assert cont.used_ub == 3 + 4  # tokens + frames


def test_session_state_changes_later_chunks(model):
    """A second chunk generated with carried state must differ from the same
    chunk generated fresh — the state must actually condition generation."""
    from go_pocket_tts_tpu.runtime import GenerateConfig

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    _first, cont = rt.generate_audio_session([5, 9, 2], cfg, None, session_capacity=256)
    with_state, _ = rt.generate_audio_session([7, 1, 4], cfg, cont)
    fresh, _ = rt.generate_audio_session([7, 1, 4], cfg, None, session_capacity=256)
    assert with_state.shape == fresh.shape
    # temperature=0 removes RNG: any difference comes from the carried KV.
    assert not np.allclose(with_state, fresh, atol=1e-5)


def test_session_resets_when_full(model):
    """A chunk that cannot fit in the remaining capacity restarts the session
    instead of corrupting the cache (write indices would wrap)."""
    from go_pocket_tts_tpu.runtime import GenerateConfig

    cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=4)
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    cont = None
    seen = []
    for _ in range(8):  # 8 × (32-token bucket peak) >> 128 capacity
        audio, cont = rt.generate_audio_session(
            [5, 9, 2], cfg, cont, session_capacity=128
        )
        seen.append(cont.used_ub)
        assert len(audio) == 4 * 1920
        assert cont.used_ub + 0 <= cont.capacity
    assert min(seen) < max(seen)  # grew, then reset at least once


def test_service_continuity_end_to_end(model):
    """Service threads the continuation through the chunk loop when the
    continuity knob is on; output chunk count and sizes match the plain path."""
    sentences = [f"sentence number {i} about item {i}." for i in range(12)]
    text = " ".join(sentences)
    rt = TPURuntime(model, dtype=jnp.bfloat16, seed=5, frame_bucket=64)
    svc = Service(
        rt,
        _Tok(),
        TTSConfig(temperature=0.7, eos_threshold=1e9, max_steps=4, continuity=True),
    )
    chunks = list(svc.synthesize_stream(text))
    assert len(chunks) >= 3
    assert all(len(c.samples) == 4 * 1920 for c in chunks)
    assert chunks[-1].final


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


def test_cli_backend_passthrough_args(tmp_path):
    """`--tts-arg k=v` flags reach the wrapped binary normalized to --k=v
    (`cmd/pockettts/synth.go:521-551` semantics)."""
    from go_pocket_tts_tpu.tts.runtime_cli import CLIRuntime, build_passthrough_args

    assert build_passthrough_args(
        [" seed=7 ", "", "--temp=0.5", "-q=1", "speed = fast"]
    ) == ["--seed=7", "--temp=0.5", "-q=1", "--speed=fast"]
    with pytest.raises(ValueError, match="expected key=value"):
        build_passthrough_args(["novalue"])
    with pytest.raises(ValueError, match="empty key"):
        build_passthrough_args(["=x"])

    fake = tmp_path / "pocket-tts"
    payload_wav = tmp_path / "payload.wav"
    argdump = tmp_path / "args.txt"
    payload_wav.write_bytes(wav.encode_wav(np.full(480, 0.25, np.float32)))
    fake.write_text(
        "#!/bin/sh\n"
        f'echo "$@" > "{argdump}"\n'
        f'cat "{payload_wav}"\n'
    )
    fake.chmod(0o755)

    rt = CLIRuntime(str(fake), extra_args=["seed=7", "temp=0.5"])
    samples = rt.synthesize_text("hello", "")
    assert len(samples) == 480
    dumped = argdump.read_text()
    assert "--seed=7" in dumped and "--temp=0.5" in dumped
    assert "--quiet" in dumped  # tts.quiet defaults true like the reference

    rt = CLIRuntime(str(fake), quiet=False)
    rt.synthesize_text("hello", "")
    assert "--quiet" not in argdump.read_text()

    rt = CLIRuntime(str(fake), config_path="/etc/ptts.toml")
    rt.synthesize_text("hello", "")
    assert "--config /etc/ptts.toml" in argdump.read_text()


def test_synth_tts_arg_requires_cli_backend(tmp_path, capsys):
    """Mirror of the reference's guard: --tts-arg with a native backend is
    a hard error (`cmd/pockettts/synth.go:173-174`)."""
    from go_pocket_tts_tpu.cli.main import main

    rc = main(
        ["synth", "--text", "hi", "--out", str(tmp_path / "o.wav"),
         "--tts-arg", "seed=7"]
    )
    assert rc == 2
    assert "--backend cli" in capsys.readouterr().err

    # Malformed items fail with a clean rc=2 parse error, not a traceback
    # out of Service construction.
    rc = main(
        ["synth", "--backend", "cli", "--text", "hi",
         "--out", str(tmp_path / "o.wav"), "--tts-arg", "novalue"]
    )
    assert rc == 2
    assert "expected key=value" in capsys.readouterr().err


def test_cli_backend_failure(tmp_path):
    from go_pocket_tts_tpu.tts.runtime_cli import CLIRuntime

    fake = tmp_path / "pocket-tts"
    fake.write_text("#!/bin/sh\necho doom >&2\nexit 3\n")
    fake.chmod(0o755)
    with pytest.raises(RuntimeError, match="doom"):
        CLIRuntime(str(fake)).synthesize_text("x", "")
