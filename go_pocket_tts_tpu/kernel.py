"""In-memory kernel API: load everything from bytes, synthesize as a library.

This is the capability the reference's browser-WASM kernel exposes
(`cmd/pockettts-wasm/main_wasm.go:75-477`: JS global ``PocketTTSKernel`` with
``version / sampleRate / loadModel / normalize / tokenize / synthesize`` and
per-step progress callbacks). The browser target itself is out of scope for a
TPU framework (SURVEY.md §7.3), but the embedding surface is preserved: no
filesystem access required, voice bytes accepted in either format, progress
callbacks per chunk.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.text import estimate_max_frames, normalize as normalize_text, prepare_chunks
from go_pocket_tts_tpu.text.sentencepiece import load_tokenizer_from_bytes
from go_pocket_tts_tpu.utils import safetensors as st
from go_pocket_tts_tpu.utils import wav
from go_pocket_tts_tpu.version import __version__

__all__ = ["PocketTTSKernel"]


class PocketTTSKernel:
    """Byte-oriented synthesis kernel.

    >>> kernel = PocketTTSKernel()
    >>> kernel.load_model(model_bytes, tokenizer_bytes)
    >>> wav_bytes = kernel.synthesize("Hello world", voice=voice_bytes)
    """

    version = __version__
    sample_rate = 24_000

    def __init__(
        self,
        dtype="float32",
        seed: Optional[int] = None,
        compile_cache_dir: Optional[str] = None,
    ) -> None:
        self._dtype = dtype
        self._seed = seed
        # Persistent XLA compile cache (None = per-user default, "" = off):
        # embedding hosts restart processes too.
        if compile_cache_dir is None:
            from go_pocket_tts_tpu.utils.compile_cache import default_cache_dir

            compile_cache_dir = default_cache_dir()
        self._compile_cache_dir = compile_cache_dir
        self._runtime: Optional[TPURuntime] = None
        self._tokenizer = None

    @property
    def loaded(self) -> bool:
        return self._runtime is not None

    def load_model(self, model_bytes: bytes, tokenizer_bytes: bytes) -> None:
        import jax.numpy as jnp

        from go_pocket_tts_tpu.models.model import load_model_from_store
        from go_pocket_tts_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(self._compile_cache_dir)
        store = st.open_store_from_bytes(model_bytes)
        model = load_model_from_store(store)
        dtype = jnp.bfloat16 if self._dtype == "bfloat16" else jnp.float32
        self._runtime = TPURuntime(model, dtype=dtype, seed=self._seed)
        self._tokenizer = load_tokenizer_from_bytes(tokenizer_bytes)

    def normalize(self, text: str) -> str:
        return normalize_text(text)

    def tokenize(self, text: str) -> List[int]:
        self._require_loaded()
        return self._tokenizer.encode(text)

    def synthesize(
        self,
        text: str,
        voice: Optional[bytes] = None,
        temperature: float = 0.7,
        eos_threshold: float = -4.0,
        lsd_decode_steps: int = 1,
        progress: Optional[Callable[[int, int], None]] = None,
        continuity: bool = False,
    ) -> bytes:
        """Synthesize → WAV bytes. ``voice`` accepts either voice-file format
        (embedding or model-state), like the WASM kernel's voice bytes.

        ``progress(frames_done, frames_total_estimate)`` fires at frame-block
        granularity (every 4–16 generated frames ≈ 320 ms–1.28 s of audio)
        through the frame-streaming path — the reference's per-step progress
        contract (`cmd/pockettts-wasm/main_wasm.go:75-477`) at the finest
        granularity that doesn't force a per-frame TPU host sync. The total
        is the frame estimate and shrinks when EOS ends a chunk early; the
        final call is always ``(total, total)``.

        ``continuity=True`` carries the flow-LM KV state across text chunks
        (long-form prosody); progress keeps block granularity there too via
        the session-aware frame streamer (r4)."""
        self._require_loaded()
        voice_emb = voice_state = None
        if voice:
            kind = st.inspect_voice_file_bytes(voice)
            if kind == st.VoiceFileKind.MODEL_STATE:
                voice_state = st.load_voice_model_state_from_bytes(voice)
            else:
                voice_emb = st.load_voice_embedding_from_bytes(voice)

        chunks = prepare_chunks(self.normalize(text), self._tokenizer)
        estimates = [estimate_max_frames(c.num_tokens) for c in chunks]
        total_est = sum(estimates)
        samples_per = self._runtime.model.config.mimi.samples_per_latent

        if continuity:
            cont = None
            done = 0
            parts: List[np.ndarray] = []
            for i, chunk in enumerate(chunks):
                cfg = GenerateConfig(
                    temperature=temperature,
                    eos_threshold=eos_threshold,
                    max_steps=estimates[i],
                    lsd_decode_steps=lsd_decode_steps,
                    frames_after_eos=chunk.frames_after_eos(),
                    # every chunk: re-applies on an internal session reset;
                    # ignored while carried state survives (service semantics)
                    voice_embedding=voice_emb,
                    voice_model_state=voice_state,
                )
                if progress is None:
                    pcm, cont = self._runtime.generate_audio_session(
                        chunk.token_ids, cfg, cont
                    )
                    parts.append(pcm)
                    done += len(pcm) // samples_per
                    continue
                # Session-aware frame streaming: block-granular progress with
                # carried prosody (blocks concatenate to the session audio).
                blocks, next_state = self._runtime.stream_generate_session(
                    chunk.token_ids, cfg, cont
                )
                chunk_frames = 0
                for block in blocks:
                    parts.append(block)
                    chunk_frames += len(block) // samples_per
                    remaining = max(estimates[i] - chunk_frames, 0)
                    progress(
                        done + chunk_frames,
                        done + chunk_frames + remaining + sum(estimates[i + 1 :]),
                    )
                cont = next_state()
                done += chunk_frames
            if progress is not None:
                progress(done, done)
            pcm_all = np.concatenate(parts) if parts else np.zeros(0, np.float32)
            return wav.encode_wav(pcm_all, self.sample_rate)

        done_frames = 0
        samples: List[np.ndarray] = []
        for i, chunk in enumerate(chunks):
            cfg = GenerateConfig(
                temperature=temperature,
                eos_threshold=eos_threshold,
                max_steps=estimates[i],
                lsd_decode_steps=lsd_decode_steps,
                frames_after_eos=chunk.frames_after_eos(),
                voice_embedding=voice_emb,
                voice_model_state=voice_state,
            )
            if progress is None:
                samples.append(self._runtime.generate_audio(chunk.token_ids, cfg))
                continue
            # Frame streaming gives block-granular progress for free; the
            # blocks concatenate to the same chunk audio.
            from go_pocket_tts_tpu.runtime.streaming import stream_generate

            parts: List[np.ndarray] = []
            chunk_frames = 0
            for block in stream_generate(self._runtime, chunk.token_ids, cfg):
                parts.append(block)
                chunk_frames += len(block) // samples_per
                progress(done_frames + chunk_frames, total_est)
            done_frames += chunk_frames
            # EOS can end the chunk early: shrink the estimate so the bar
            # never runs backwards and the final call is (total, total).
            total_est -= estimates[i] - chunk_frames
            samples.append(
                np.concatenate(parts) if parts else np.zeros(0, np.float32)
            )
        if progress is not None:
            progress(done_frames, done_frames)
        pcm = np.concatenate(samples) if samples else np.zeros(0, np.float32)
        return wav.encode_wav(pcm, self.sample_rate)

    def _require_loaded(self) -> None:
        if self._runtime is None or self._tokenizer is None:
            raise RuntimeError("kernel: loadModel must be called first")
