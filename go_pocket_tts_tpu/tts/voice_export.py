"""Voice export: WAV prompt → ``audio_prompt`` embedding safetensors.

Parity with the reference's export-voice pipeline
(`cmd/pockettts/export_voice.go:108-195`, `internal/onnx/voice_encode.go`):

1. load speaker audio (WAV decode, downmix to mono, must be 24 kHz —
   a linear resampler handles other rates)
2. Mimi-encode to latent ``[1, C, T]`` (native JAX encoder — the reference
   needs ONNX Runtime here; see `models/mimi_encoder.py`)
3. layout-normalize to ``[1, T, C]`` and project with the speaker projection
   from the main checkpoint (``condition_provider.conditioners.speaker_wavs.
   output_proj.weight``) → ``[1, T, d_model]``
4. write ``{audio_prompt: [1, T, D]}`` safetensors + suggest a manifest entry
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from go_pocket_tts_tpu.models import mimi_encoder as enc
from go_pocket_tts_tpu.models.mimi import MimiConfig
from go_pocket_tts_tpu.models.params import VarBuilder
from go_pocket_tts_tpu.utils import wav as wavmod
from go_pocket_tts_tpu.utils.safetensors import open_store, write_file

__all__ = ["VoiceEncoder", "export_voice_embedding", "resample_linear"]


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    if src_rate == dst_rate:
        return samples
    n_out = int(round(len(samples) * dst_rate / src_rate))
    x_out = np.linspace(0.0, len(samples) - 1, n_out)
    return np.interp(x_out, np.arange(len(samples)), samples).astype(np.float32)


class VoiceEncoder:
    """Loads the Mimi encoder + speaker projection from the model checkpoint."""

    def __init__(self, store, mimi_cfg: MimiConfig = MimiConfig()) -> None:
        vb = VarBuilder(store)
        # Adopt the loaded checkpoint's upsample grouping for the encoder too.
        from go_pocket_tts_tpu.models.mimi import load_mimi

        _, mimi_cfg = load_mimi(vb, mimi_cfg)
        self.cfg = mimi_cfg
        self.encoder = enc.load_mimi_encoder(vb, mimi_cfg)
        if self.encoder is None:
            raise ValueError(
                "checkpoint has no Mimi encoder weights (voice cloning needs the "
                "full checkpoint, not the no-voice-cloning variant)"
            )
        self.speaker_proj = enc.load_speaker_projection(vb)
        if self.speaker_proj is None:
            raise ValueError(
                "checkpoint missing speaker projection "
                "(condition_provider.conditioners.speaker_wavs.output_proj.weight)"
            )

    def encode_samples(
        self, samples: np.ndarray, sample_rate: int, pad_to_bucket: bool = False
    ) -> np.ndarray:
        """Mono samples → speaker conditioning ``[1, T, d_model]``.

        ``pad_to_bucket=True`` zero-pads the audio to a power-of-two frame
        bucket (floor 64 frames ≈ 5 s) before encoding and trims the latent
        frames back afterwards. The SEANet encoder is causal (left-pad conv
        semantics, `ops/conv.py`), so trailing zero-padding leaves the kept
        frames bit-near-exact (measured ≤3e-8) while keying the encode
        program on ≤4 shapes for any prompt up to ~40 s — the voice-upload
        path stays inside the prewarm/compile-cache contract instead of
        compiling per audio length."""
        if sample_rate != self.cfg.sample_rate:
            samples = resample_linear(samples, sample_rate, self.cfg.sample_rate)
        frames = len(samples) // self.cfg.samples_per_latent
        if pad_to_bucket:
            if frames < 1:
                raise ValueError(
                    "voice audio is shorter than one latent frame "
                    f"({self.cfg.samples_per_latent} samples at "
                    f"{self.cfg.sample_rate} Hz)"
                )
            bucket = 64
            while bucket < frames:
                bucket *= 2
            padded = np.zeros(bucket * self.cfg.samples_per_latent, np.float32)
            padded[: len(samples)] = samples
            samples = padded
        pcm = jnp.asarray(samples, jnp.float32)[None, None, :]
        latent = enc.mimi_encode(self.encoder, self.cfg, pcm)  # [1, C', T]
        latent_tc = jnp.swapaxes(latent, 1, 2)  # [1, T, C'] (voice_encode.go:80-117)
        proj = jnp.matmul(latent_tc, self.speaker_proj.T)  # [1, T, D]
        out = np.asarray(proj, np.float32)
        return out[:, :frames, :] if pad_to_bucket else out

    def encode_wav_bytes(self, data: bytes, pad_to_bucket: bool = False) -> np.ndarray:
        samples, rate = wavmod.decode_wav(data)
        return self.encode_samples(samples, rate, pad_to_bucket=pad_to_bucket)


def export_voice_embedding(
    model_path: str, input_audio: str, output_path: str
) -> np.ndarray:
    """Full export-voice flow; returns the written ``[1, T, D]`` embedding."""
    store = open_store(model_path)
    encoder = VoiceEncoder(store)
    with open(input_audio, "rb") as f:
        emb = encoder.encode_wav_bytes(f.read())
    write_file(output_path, {"audio_prompt": emb})
    return emb


def export_voice_model_state(
    model_path: str, input_audio: str, output_path: str, num_heads: int = 16
) -> int:
    """Export an upstream-format **model-state** voice file.

    The reference shells out to the Python `pocket-tts export-voice` for this
    format (`cmd/pockettts/export_voice.go:61-96`); here it is computed
    natively: encode the speaker audio → speaker conditioning ``[1,T,D]`` →
    prefill the FlowLM transformer with it → save each layer's KV cache in
    the upstream layout ``transformer.layers.N.self_attn/{cache [2,B,T,H,Dh],
    offset}`` (`internal/safetensors/reader.go:127-155`). Such files hydrate
    both this framework's runtime and the reference's.

    Returns the number of conditioning frames (= offset).
    """
    import jax.numpy as jnp

    from go_pocket_tts_tpu.models import flow_lm as flm
    from go_pocket_tts_tpu.models import flow_transformer as ftr
    from go_pocket_tts_tpu.models.model import load_model_from_store

    store = open_store(model_path)
    encoder = VoiceEncoder(store)
    with open(input_audio, "rb") as f:
        emb = encoder.encode_wav_bytes(f.read())  # [1, T, D]
    t_v = emb.shape[1]

    model = load_model_from_store(store, num_heads=num_heads)
    flow = model.params["flow_lm"]
    cfg = model.config.flow_lm
    tcfg = cfg.transformer

    cache = ftr.init_kv_cache(tcfg, batch=1, capacity=t_v)
    cache = flm.prompt(flow, cfg, cache, jnp.asarray(emb))

    tensors = {}
    k_all = np.asarray(cache["k"], np.float32)  # [L, 1, H, T, Dh]
    v_all = np.asarray(cache["v"], np.float32)
    for i in range(tcfg.num_layers):
        # [B,H,T,Dh] → upstream time-major [B,T,H,Dh], stacked K/V first.
        k = np.moveaxis(k_all[i], 1, 2)
        v = np.moveaxis(v_all[i], 1, 2)
        module = f"transformer.layers.{i}.self_attn"
        tensors[f"{module}/cache"] = np.stack([k, v])
        tensors[f"{module}/offset"] = np.array([float(t_v)], np.float32)
    write_file(output_path, tensors)

    # Verify the written file classifies and loads as model state (the
    # reference verifies the exported kind too,
    # `cmd/pockettts/export_voice.go:61-96`).
    from go_pocket_tts_tpu.utils.safetensors import (
        VoiceFileKind,
        inspect_voice_file,
        load_voice_model_state,
    )

    if inspect_voice_file(output_path) != VoiceFileKind.MODEL_STATE:
        raise RuntimeError(f"exported voice file {output_path!r} failed kind check")
    load_voice_model_state(output_path)
    return t_v
