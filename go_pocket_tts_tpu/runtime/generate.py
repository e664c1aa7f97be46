"""The generation hot path, TPU-first.

The reference's AR loop is host-driven: one Go function call per latent frame
(`internal/tts/runtime_native_safetensors.go:155-201`). On TPU a per-step
host round-trip would cost more than the math, so the **entire AR loop runs
inside one compiled program** as a ``lax.while_loop``:

    carry = (kv_k, kv_v, offset, frame, rng, step, frames_buf,
             n_frames, eos_countdown, done)

with the per-step body = 6-layer transformer step (Tq=1) + EOS logit + LSD
Euler decode of the flowNet — matching `flow_lm.go:238-299` — and the EOS
countdown semantics of `runtime_native_safetensors.go:178-191` (the EOS frame
is kept, then ``frames_after_eos`` more, countdown decremented after the
zero-check, early exit when every batch element is done).

Static/traced split (nothing here recompiles across requests):
- static: bucketed shapes (prompt length, frame budget, KV capacity, batch),
  LSD step count, dtype
- traced: token content, valid lengths, max_steps, temperature,
  eos_threshold, frames_after_eos, RNG key, cache offset

Three compiled programs per shape bucket: ``prefill`` (text conditioning →
KV cache), ``ar_loop`` (frames + counts), ``decode`` (fused latent→mimi +
Mimi chain → PCM). The Mimi chain is fully causal, so decode buckets return
sample-exact prefixes and the host trims to ``n_frames · 1920``.
"""

from __future__ import annotations

import logging
import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from go_pocket_tts_tpu.models import flow_lm as flm
from go_pocket_tts_tpu.models import flow_transformer as ftr
from go_pocket_tts_tpu.models import mimi as mimi_mod
from go_pocket_tts_tpu.models.model import PocketTTSModel
from go_pocket_tts_tpu.text import estimate_max_frames
from go_pocket_tts_tpu.utils import buckets as bk
from go_pocket_tts_tpu.utils.safetensors import VoiceModelState

log = logging.getLogger("pockettts.runtime")

__all__ = ["GenerateConfig", "TPURuntime", "ContinuationState"]


@dataclass
class ContinuationState:
    """Cross-chunk prosody state: the flow-LM KV cache carried from one text
    chunk into the next (long-form continuity — the reference resets state
    per chunk, `service.go:137-152`; this reuses the voice-state hydration
    pattern, where frames already in the cache condition later generation).

    Single-use: the cache buffer is donated to the next dispatch; always
    thread the state returned by the latest call."""

    cache: Dict
    capacity: int
    # Host-side upper bound on written cache slots (the true offset lives on
    # the device; EOS can end a chunk early, so this over-counts safely).
    used_ub: int


@dataclass
class GenerateConfig:
    """Per-chunk generation parameters (`internal/tts/runtime.go:16-45`)."""

    temperature: float = 0.7
    eos_threshold: float = -4.0
    max_steps: int = 0
    estimated_max_steps: int = 0
    lsd_decode_steps: int = 1
    frames_after_eos: int = 3
    voice_embedding: Optional[np.ndarray] = None  # [1, Tv, D]
    voice_model_state: Optional[VoiceModelState] = None
    # Called after generation with (steps_done, max_steps). The reference's
    # per-step callback (`runtime.go:42`) would force per-frame host sync on
    # TPU; chunk-level progress is reported instead.
    step_callback: Optional[Callable[[int, int], None]] = None


# -- jitted stages ----------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def _prefill(params: Dict, cfg, cache: Dict, emb: jax.Array, valid_len: jax.Array) -> Dict:
    return flm.prompt(params, cfg, cache, emb, valid_len)


def _ar_loop_body(
    params: Dict,
    cfg,
    cache: Dict,
    key: jax.Array,
    max_steps: jax.Array,
    eos_threshold: jax.Array,
    temperature: jax.Array,
    frames_after_eos: jax.Array,
    decode_steps: int,
    max_frames: int,
    carry_in: Optional[Dict] = None,
) -> Tuple[jax.Array, jax.Array, Dict]:
    """Run up to ``max_steps`` AR steps (≤ static ``max_frames``).

    ``carry_in`` (optional ``{frame, countdown, done}``) resumes a previous
    segment — the frame-streaming path runs the loop in short segments and
    decodes PCM between them. Returns (frames [B, max_frames, L],
    n_frames [B], carry) where carry holds the cache plus resumable state.
    """
    batch = cache["k"].shape[1]
    latent_dim = params["bos_emb"].shape[0]
    dtype = cache["k"].dtype

    sigma = jnp.sqrt(jnp.maximum(temperature.astype(jnp.float32), 0.0))

    # BOS sentinel: NaN frame (replaced by bos_emb inside the step,
    # `runtime_native_safetensors.go:246-253`).
    frame0 = jnp.full((batch, 1, latent_dim), jnp.nan, dtype=dtype)

    init = {
        "cache": cache,
        "frame": frame0,
        "key": key,
        "step": jnp.int32(0),
        "frames": jnp.zeros((batch, max_frames, latent_dim), dtype=dtype),
        "n_frames": jnp.zeros((batch,), jnp.int32),
        "countdown": jnp.full((batch,), -1, jnp.int32),  # -1 = EOS not seen
        "done": jnp.zeros((batch,), bool),
    }
    if carry_in is not None:
        init.update(
            frame=carry_in["frame"],
            countdown=carry_in["countdown"],
            done=carry_in["done"],
        )

    bound = jnp.minimum(max_steps.astype(jnp.int32), max_frames)

    # Loop-invariant hoists: LSD timestep embeddings and the batched adaLN
    # projection weights (one matmul per step instead of 3·depth+2).
    time_cond = flm.fnet.precompute_time_cond(params["flow_net"], decode_steps)
    fused_ada = flm.fnet.precompute_fused_adaln(params["flow_net"])

    def cond(c):
        return (c["step"] < bound) & ~jnp.all(c["done"])

    def body(c):
        key, sub = jax.random.split(c["key"])
        noise = (
            jax.random.normal(sub, (batch, latent_dim), dtype=jnp.float32) * sigma
        ).astype(dtype)
        new_cache, next_frame, eos_logit = flm.ar_core(
            params, cfg, c["cache"], c["frame"], noise, decode_steps, time_cond, fused_ada
        )
        frames = jax.lax.dynamic_update_slice(
            c["frames"], next_frame, (0, c["step"], 0)
        )
        # EOS bookkeeping (`runtime_native_safetensors.go:178-191`): the frame
        # from the EOS step is kept; countdown decrements after the zero-check.
        is_eos = eos_logit > eos_threshold
        newly = is_eos & (c["countdown"] < 0) & ~c["done"]
        countdown = jnp.where(newly, frames_after_eos, c["countdown"])
        n_frames = jnp.where(~c["done"], c["step"] + 1, c["n_frames"])
        done = c["done"] | (countdown == 0)
        countdown = jnp.where((countdown > 0) & ~done, countdown - 1, countdown)
        return {
            "cache": new_cache,
            "frame": next_frame,
            "key": key,
            "step": c["step"] + 1,
            "frames": frames,
            "n_frames": n_frames,
            "countdown": countdown,
            "done": done,
        }

    out = jax.lax.while_loop(cond, body, init)
    carry = {
        "cache": out["cache"],
        "frame": out["frame"],
        "countdown": out["countdown"],
        "done": out["done"],
        "key": out["key"],
    }
    return out["frames"], out["n_frames"], carry


_ar_loop = partial(
    jax.jit,
    static_argnames=("cfg", "decode_steps", "max_frames"),
    donate_argnames=("cache",),
)(_ar_loop_body)


def _decode_body(params: Dict, mimi_cfg, latent: jax.Array) -> jax.Array:
    """Fused latent→mimi projection + full Mimi decode (shared by the staged
    and fused paths)."""
    fused = params.get("latent_to_mimi")
    if fused is not None:
        out = jnp.matmul(
            latent, fused["w"].astype(latent.dtype), preferred_element_type=jnp.float32
        ).astype(latent.dtype)
        mimi_latent = jnp.swapaxes(out + fused["b"].astype(latent.dtype), 1, 2)
    else:
        flow = params["flow_lm"]
        denorm = latent * flow["emb_std"] + flow["emb_mean"]
        mimi_latent = mimi_mod.quantizer_project(params["mimi"], jnp.swapaxes(denorm, 1, 2))
    return mimi_mod.mimi_decode(params["mimi"], mimi_cfg, mimi_latent)


@partial(
    jax.jit,
    static_argnames=("flow_cfg", "capacity", "dtype"),
    donate_argnames=("voice_cache",),
)
def _embed_prefill(
    params: Dict,
    flow_cfg,
    tokens: jax.Array,  # [B, P] int32, zero-padded
    valid_tokens: jax.Array,  # int32 scalar: real token count
    capacity: int,
    dtype,
    voice_cache: Optional[Dict] = None,
    voice_emb: Optional[jax.Array] = None,  # [B, V, D]
) -> Dict:
    """Program 1 of the utterance pipeline: embed + prefill → KV cache.

    Deliberately a SEPARATE program from the AR loop: when the prefill and
    the while_loop share one program, XLA locks the KV-cache buffer into a
    prefill-shaped layout and the loop's per-step cost doubles (measured
    0.44 ms/step fused vs 0.22 ms isolated, r2). Both programs are
    dispatched back-to-back without blocking, so the split costs no extra
    host round trip — only the final fetch blocks.
    """
    flow = params["flow_lm"]
    emb = flm.text_embeddings(flow, tokens).astype(dtype)
    valid = valid_tokens
    if voice_emb is not None:
        emb = jnp.concatenate([voice_emb.astype(dtype), emb], axis=1)
        valid = valid + voice_emb.shape[1]
    batch = tokens.shape[0]
    cache = (
        voice_cache
        if voice_cache is not None
        else ftr.init_kv_cache(flow_cfg.transformer, batch, capacity, dtype=dtype)
    )
    # Padded token slots embed row 0 of the LUT; they sit past `valid` and
    # are never visible (see transformer_forward_cached).
    return flm.prompt(flow, flow_cfg, cache, emb, valid)


@partial(jax.jit, static_argnames=("mimi_cfg", "decode_frames"))
def _decode_pcm16(
    params: Dict,
    mimi_cfg,
    frames: jax.Array,  # [B, max_frames, L]
    n_frames: jax.Array,  # [B]
    decode_frames: int,
) -> jax.Array:
    """Program 3: mask → fused latent→mimi → Mimi decode → int16.

    Separate from the AR-loop program for the same layout reason as
    ``_embed_prefill``: fusing the Mimi conv chain into the loop program
    costs the loop ~17 ms per utterance (measured r2). Decodes only the
    ``decode_frames`` bucket (n ≤ max_steps ≤ decode_frames) — Mimi cost and
    the device→host payload are linear in T. Returns pcm16
    [B, 1, decode_frames·1920]; the host trims to ``n_frames·1920`` samples
    (everything past it is causal-junk from padded frames)."""
    frames = frames[:, :decode_frames]
    mask = (jnp.arange(decode_frames) < n_frames[:, None])[:, :, None]
    latent = jnp.where(mask, frames, 0.0)
    pcm = _decode_body(params, mimi_cfg, latent)
    # Convert to int16 on-device: the WAV is 16-bit PCM anyway, and this
    # quarters the device→host transfer. Truncation toward zero matches the
    # host encoder (`utils/wav.pcm16_bytes`) bit-exactly.
    return (jnp.clip(pcm.astype(jnp.float32), -1.0, 1.0) * 32767.0).astype(jnp.int16)


_decode = partial(jax.jit, static_argnames=("mimi_cfg",))(_decode_body)


def _fetch_trimmed(pcm: jax.Array, n_frames: jax.Array, samples_per: int) -> np.ndarray:
    """Fetch (pcm16 buffer, n_frames) in ONE overlapped device→host round
    trip and trim on the host.

    The previous pattern — fetch ``n`` (one blocking RTT), then device-slice
    ``pcm[:n·1920]`` (a per-``n`` compiled slice program) and fetch it (a
    second RTT) — cost ~2 round trips per utterance; through the tunneled
    link here that is ~50 ms of the 20-word-utterance latency.
    ``jax.device_get`` issues async copies for both leaves before blocking,
    so the tiny ``n_frames`` transfer rides alongside the PCM payload."""
    pcm_np, n_np = jax.device_get((pcm, n_frames))
    n = int(n_np[0])
    return pcm_np[0, 0, : n * samples_per].astype(np.float32) / 32767.0


# -- runtime ----------------------------------------------------------------


class TPURuntime:
    """The native generation runtime (reference: nativeSafetensorsRuntime,
    `internal/tts/runtime_native_safetensors.go:20-261`).

    One instance wraps a loaded model; ``generate_audio`` is thread-safe for
    reads (each call threads its own RNG key; JAX dispatch serializes device
    work). ``dtype=jnp.bfloat16`` selects the fast path; f32 (default) keeps
    the reference parity budget and uses HIGHEST matmul precision on TPU.
    """

    def __init__(
        self,
        model: PocketTTSModel,
        dtype=jnp.float32,
        seed: Optional[int] = None,
        frame_bucket: int = 256,
        matmul_precision: Optional[str] = None,
        quantize: bool = False,
        pallas: Optional[bool] = None,
    ) -> None:
        self.dtype = jnp.dtype(dtype)
        if quantize:
            from go_pocket_tts_tpu.models.quantize import quantize_model_params

            # ``quantize`` is True (→ int8) or the bit width itself (8 | 4).
            bits = 8 if quantize is True else int(quantize)
            model = PocketTTSModel(
                quantize_model_params(model.params, bits=bits), model.config
            )
        if pallas is None:
            # Tri-state: env "1" forces the full opt-in set, "0" forces off,
            # unset -> auto (the fused decode-attention kernel alone, on TPU
            # backends and non-f32 dtypes only). The interleaved hardware A/B
            # (scripts/exp_pallas_default.py, PERF.md r5): bf16 single -10%,
            # TTFA -11%, capacity-1024 session -26% with the kernel; f32
            # +11% SLOWER (f32 cache tiles double the VMEM-read bytes), so
            # the f32 parity path keeps XLA. CPU interpret mode would be
            # slower than XLA so auto stays off there too.
            env = os.environ.get("POCKETTTS_PALLAS", "")
            if env == "1":
                pallas = True
            elif env == "0":
                pallas = False
        auto_decode_attention = (
            pallas is None
            and self.dtype != jnp.float32
            and jax.default_backend() not in ("cpu",)
        )
        if pallas or auto_decode_attention:
            import dataclasses

            from go_pocket_tts_tpu.models.model import ModelConfig

            tcfg = dataclasses.replace(
                model.config.flow_lm.transformer, use_pallas=True
            )
            flow_cfg = dataclasses.replace(model.config.flow_lm, transformer=tcfg)
            mimi_cfg = model.config.mimi
            if pallas:
                mimi_cfg = dataclasses.replace(mimi_cfg, use_pallas=True)
            model = PocketTTSModel(
                model.params, ModelConfig(flow_lm=flow_cfg, mimi=mimi_cfg)
            )
            # The per-linear quantized Pallas matmul stays explicit opt-in:
            # it was measured SLOWER inside the step (breaks XLA's cross-op
            # weight prefetch, PERF.md int4/int8 kernel decompositions).
            if pallas and quantize:
                from go_pocket_tts_tpu.models.params import set_quantized_matmul_backend

                backend = "pallas"
                if jax.default_backend() == "cpu":
                    backend = "pallas:interpret"
                set_quantized_matmul_backend(backend)
        from go_pocket_tts_tpu.models.model import auto_pallas_mimi

        model = auto_pallas_mimi(model)
        self.model = model if self.dtype == jnp.float32 else model.astype(self.dtype)
        if matmul_precision is None:
            matmul_precision = "highest" if self.dtype == jnp.float32 else "default"
        self.matmul_precision = matmul_precision
        self.frame_bucket = frame_bucket
        self._key = jax.random.PRNGKey(
            seed if seed is not None else time.time_ns() & 0x7FFFFFFF
        )

    # Mimi timing metadata (`runtime_native_safetensors.go:40-49`).
    def mimi_timing(self) -> Tuple[float, float, int]:
        cfg = self.model.config.mimi
        return cfg.frame_rate, cfg.encoder_frame_rate, cfg.steps_per_latent

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _hydrate_voice_cache(
        self, state: VoiceModelState, capacity: int
    ) -> Dict:
        return ftr.kv_cache_from_voice_state(
            self.model.config.flow_lm.transformer,
            state.modules,
            capacity=capacity,
            dtype=self.dtype,
        )

    def generate_audio_async(self, tokens, cfg: GenerateConfig):
        """Dispatch one utterance and return a zero-arg resolver.

        The device work is enqueued immediately (JAX async dispatch); calling
        the resolver blocks on the PCM transfer. Back-to-back callers can
        dispatch utterance k+1 before resolving k, hiding the host↔device
        round-trip (the sustained-throughput serving pattern; the batcher
        generalizes this across concurrent requests).
        """
        pcm, n_frames, samples_per, max_steps, n_tokens = self._dispatch(tokens, cfg)

        def resolve() -> np.ndarray:
            audio = _fetch_trimmed(pcm, n_frames, samples_per)
            if cfg.step_callback is not None:
                cfg.step_callback(len(audio) // samples_per, max_steps)
            return audio

        return resolve

    def _dispatch(self, tokens, cfg: GenerateConfig):
        """Validate, bucket and enqueue one utterance; returns the un-fetched
        device results plus trim metadata."""
        if len(tokens) == 0:
            raise ValueError("generate: token slice must not be empty")
        if cfg.voice_embedding is not None and cfg.voice_model_state is not None:
            raise ValueError(
                "generate: voice embedding and voice model state are mutually exclusive"
            )

        max_steps = cfg.max_steps or cfg.estimated_max_steps or estimate_max_frames(
            len(tokens)
        )
        decode_steps = max(cfg.lsd_decode_steps, 1)

        flow = self.model.params["flow_lm"]
        flow_cfg = self.model.config.flow_lm

        with jax.default_matmul_precision(self.matmul_precision):
            # -- conditioning (host-side validation only; embedding happens
            #    inside the fused program) --------------------------------
            tok_np = np.asarray(tokens, np.int32)
            n_bins = flow["conditioner_embed"].shape[0]
            if np.any(tok_np < 0) or np.any(tok_np >= n_bins):
                raise ValueError(f"token id out of range [0,{n_bins})")

            voice_emb = None
            voice_len = 0
            if cfg.voice_embedding is not None:
                voice_emb = jnp.asarray(cfg.voice_embedding, dtype=self.dtype)
                d_model = flow["conditioner_embed"].shape[1]
                if voice_emb.ndim != 3 or voice_emb.shape[2] != d_model:
                    raise ValueError(
                        f"voice embedding shape {voice_emb.shape} incompatible with "
                        f"d_model {d_model}"
                    )
                voice_len = voice_emb.shape[1]

            # Hydrated voice caches advance the offset before prefill; their
            # length participates in the capacity choice but not the prompt pad.
            voice_frames = 0
            if cfg.voice_model_state is not None:
                first = next(iter(cfg.voice_model_state.modules.values()))
                voice_frames = int(np.asarray(first["offset"]).reshape(-1)[0])

            frame_bucket = bk.pick_bucket(max_steps + 1, (self.frame_bucket, 512, 1024))
            token_bucket = bk.pick_bucket(len(tok_np), bk.PROMPT_BUCKETS)
            capacity = (
                bk.round_up(voice_frames + voice_len + token_bucket, 64) + frame_bucket
            )

            voice_cache = None
            if cfg.voice_model_state is not None:
                voice_cache = self._hydrate_voice_cache(cfg.voice_model_state, capacity)

            tokens_padded = np.zeros((1, token_bucket), np.int32)
            tokens_padded[0, : len(tok_np)] = tok_np

            # -- three back-to-back async dispatches, one blocking fetch ----
            # Prefill, the AR while_loop, and the Mimi decode must each be
            # their own program: sharing one locks buffers into the wrong
            # layouts and slows the loop 2x (see _embed_prefill /
            # _decode_pcm16). Async dispatch means no extra round trips —
            # only the final fetch blocks.
            cache = _embed_prefill(
                self.model.params,
                flow_cfg,
                jnp.asarray(tokens_padded),
                jnp.int32(len(tok_np)),
                capacity,
                self.dtype,
                voice_cache=voice_cache,
                voice_emb=voice_emb,
            )
            frames, n_frames, _ = _ar_loop(
                self.model.params["flow_lm"],
                flow_cfg,
                cache,
                self._next_key(),
                jnp.int32(max_steps),
                jnp.float32(cfg.eos_threshold),
                jnp.float32(cfg.temperature),
                jnp.int32(cfg.frames_after_eos),
                decode_steps,
                frame_bucket,
            )
            pcm = _decode_pcm16(
                self.model.params,
                self.model.config.mimi,
                frames,
                n_frames,
                min(bk.round_up(max_steps, 32), frame_bucket),
            )
        samples_per = self.model.config.mimi.samples_per_latent
        return pcm, n_frames, samples_per, max_steps, len(tokens)

    def generate_audio(self, tokens, cfg: GenerateConfig) -> np.ndarray:
        """Synthesize one ≤50-token chunk → float32 PCM at 24 kHz.

        Stage structure mirrors `runtime_native_safetensors.go:52-238`:
        conditioning → prefill → AR loop → latent→mimi → Mimi decode, all
        inside one compiled program; one dispatch, one fetch.
        """
        t0 = time.perf_counter()
        pcm, n_frames, samples_per, max_steps, n_tokens = self._dispatch(tokens, cfg)
        audio = _fetch_trimmed(pcm, n_frames, samples_per)
        n = len(audio) // samples_per

        if cfg.step_callback is not None:
            cfg.step_callback(n, max_steps)

        log.debug(
            "generation complete: tokens=%d frames=%d total=%.1fms",
            n_tokens,
            n,
            (time.perf_counter() - t0) * 1e3,
        )
        return audio

    # Cache size ceiling for continuity sessions. The model is trained at
    # ~1k positions (SURVEY §2: RoPE tables cover 8192 but the reference
    # caps context near 1k); a filled session resets rather than degrade.
    SESSION_CAPACITY = 1024

    def _session_ladder(self, max_capacity: int) -> tuple:
        """Ascending KV-capacity buckets for continuity sessions.

        Sessions start in the smallest bucket that fits the first chunk and
        the carried cache zero-pads up the ladder at chunk boundaries,
        instead of paying max-capacity attention reads from chunk 1
        (hardware r4/r5: a fixed 1024 capacity cost ~40% of longform
        throughput vs the plain per-chunk path whose caches are ~320 deep).
        Three rungs bound the compiled program variants per (token, frame)
        bucket pair; padded positions sit beyond the write offset so they
        are masked out — outputs are capacity-invariant.
        """
        return tuple(b for b in (384, 640) if b < max_capacity) + (max_capacity,)

    @staticmethod
    def _grow_cache(cache: Dict, capacity: int) -> Dict:
        """Zero-pad a carried KV cache ``{k,v: [L,B,H,C,Dh]}`` to a larger
        capacity (one device-side pad per growth, ~10s of MB — negligible
        against the per-step attention savings of starting small)."""
        pad = capacity - cache["k"].shape[3]
        widths = [(0, 0)] * 3 + [(0, pad)] + [(0, 0)]
        return {
            **cache,
            "k": jnp.pad(cache["k"], widths),
            "v": jnp.pad(cache["v"], widths),
        }

    def _session_setup(
        self,
        tokens,
        cfg: GenerateConfig,
        cont: Optional[ContinuationState],
        session_capacity: int,
    ):
        """Shared per-chunk session setup: validation, capacity/reset
        bookkeeping, voice hydration, and the prefill program.

        Used by both :meth:`generate_audio_session` and the streamed
        `_stream_session_blocks` so their bookkeeping cannot drift — the
        temp-0 sample-exactness of streamed vs plain sessions depends on the
        two paths running identical prefill programs. Returns
        ``(cache, capacity, used0, max_steps, decode_steps, frame_bucket,
        n_tokens)``.
        """
        if len(tokens) == 0:
            raise ValueError("generate: token slice must not be empty")
        if cfg.voice_embedding is not None and cfg.voice_model_state is not None:
            raise ValueError(
                "generate: voice embedding and voice model state are mutually exclusive"
            )
        max_steps = cfg.max_steps or cfg.estimated_max_steps or estimate_max_frames(
            len(tokens)
        )
        decode_steps = max(cfg.lsd_decode_steps, 1)
        flow_cfg = self.model.config.flow_lm
        flow = self.model.params["flow_lm"]

        tok_np = np.asarray(tokens, np.int32)
        n_bins = flow["conditioner_embed"].shape[0]
        if np.any(tok_np < 0) or np.any(tok_np >= n_bins):
            raise ValueError(f"token id out of range [0,{n_bins})")
        token_bucket = bk.pick_bucket(len(tok_np), bk.PROMPT_BUCKETS)
        frame_bucket = bk.pick_bucket(max_steps + 1, (self.frame_bucket, 512, 1024))

        # Peak write index this chunk: prefill pads to token_bucket; the AR
        # loop writes at offset+len(tokens)+step. Grow the carried cache up
        # the session ladder when the chunk won't fit; reset only once the
        # ceiling is reached.
        chunk_extent = max(token_bucket, len(tok_np) + max_steps)
        max_capacity = session_capacity or self.SESSION_CAPACITY
        ladder = self._session_ladder(max_capacity)
        if cont is not None and cont.used_ub + chunk_extent > cont.capacity:
            needed = cont.used_ub + chunk_extent
            grow_to = next(
                (b for b in ladder if b >= needed and b > cont.capacity), None
            )
            if grow_to is None:
                log.info(
                    "continuity session full (%d + %d > %d): resetting",
                    cont.used_ub,
                    chunk_extent,
                    cont.capacity,
                )
                cont = None
            else:
                log.debug(
                    "continuity session growing %d -> %d", cont.capacity, grow_to
                )
                cont = ContinuationState(
                    cache=self._grow_cache(cont.cache, grow_to),
                    capacity=grow_to,
                    used_ub=cont.used_ub,
                )

        with jax.default_matmul_precision(self.matmul_precision):
            if cont is not None:
                capacity = cont.capacity
                voice_cache = cont.cache
                voice_emb = None
                used0 = cont.used_ub
            else:
                voice_emb = None
                voice_len = 0
                if cfg.voice_embedding is not None:
                    voice_emb = jnp.asarray(cfg.voice_embedding, dtype=self.dtype)
                    voice_len = voice_emb.shape[1]
                voice_frames = 0
                if cfg.voice_model_state is not None:
                    first = next(iter(cfg.voice_model_state.modules.values()))
                    voice_frames = int(np.asarray(first["offset"]).reshape(-1)[0])
                min_needed = (
                    bk.round_up(voice_frames + voice_len + token_bucket, 64)
                    + frame_bucket
                )
                capacity = next(
                    (b for b in ladder if b >= min_needed),
                    bk.round_up(min_needed, 64),
                )
                voice_cache = None
                if cfg.voice_model_state is not None:
                    voice_cache = self._hydrate_voice_cache(
                        cfg.voice_model_state, capacity
                    )
                used0 = voice_frames + voice_len

            tokens_padded = np.zeros((1, token_bucket), np.int32)
            tokens_padded[0, : len(tok_np)] = tok_np
            cache = _embed_prefill(
                self.model.params,
                flow_cfg,
                jnp.asarray(tokens_padded),
                jnp.int32(len(tok_np)),
                capacity,
                self.dtype,
                voice_cache=voice_cache,
                voice_emb=voice_emb,
            )
        return cache, capacity, used0, max_steps, decode_steps, frame_bucket, len(tok_np)

    def generate_audio_session(
        self,
        tokens,
        cfg: GenerateConfig,
        cont: Optional[ContinuationState] = None,
        session_capacity: int = 0,
    ) -> Tuple[np.ndarray, ContinuationState]:
        """Synthesize one chunk, carrying KV state across calls.

        Pass the returned :class:`ContinuationState` as ``cont`` for the next
        chunk: its text is appended to the live cache (after the previous
        chunk's frames) and generation continues with full attention over the
        session history — prosody flows through chunk boundaries instead of
        resetting (an upstream deviation the reference cannot express; its
        per-chunk loop is `service.go:137-152`).

        Voice conditioning applies on the first chunk only; continued chunks
        inherit it through the carried cache. When the next chunk cannot fit
        in the session cache, the session resets transparently (prosody
        reset every ~1k positions ≈ 80 s of audio).
        """
        (
            cache,
            capacity,
            used0,
            max_steps,
            decode_steps,
            frame_bucket,
            n_tokens,
        ) = self._session_setup(tokens, cfg, cont, session_capacity)
        flow_cfg = self.model.config.flow_lm
        flow = self.model.params["flow_lm"]

        with jax.default_matmul_precision(self.matmul_precision):
            frames, n_frames, carry = _ar_loop(
                flow,
                flow_cfg,
                cache,
                self._next_key(),
                jnp.int32(max_steps),
                jnp.float32(cfg.eos_threshold),
                jnp.float32(cfg.temperature),
                jnp.int32(cfg.frames_after_eos),
                decode_steps,
                frame_bucket,
            )
            pcm = _decode_pcm16(
                self.model.params,
                self.model.config.mimi,
                frames,
                n_frames,
                min(bk.round_up(max_steps, 32), frame_bucket),
            )
            samples_per = self.model.config.mimi.samples_per_latent
            audio = _fetch_trimmed(pcm, n_frames, samples_per)

        n = len(audio) // samples_per
        if cfg.step_callback is not None:
            cfg.step_callback(n, max_steps)
        new_cont = ContinuationState(
            cache=carry["cache"],
            capacity=capacity,
            used_ub=used0 + n_tokens + n,
        )
        return audio, new_cont

    def stream_generate_session(
        self,
        tokens,
        cfg: GenerateConfig,
        cont: Optional[ContinuationState] = None,
    ):
        """Frame streaming + continuity for one chunk → ``(blocks, next_state)``
        (same contract as ``BatcherRuntime.stream_generate_session``, so the
        Service's streaming-continuity path works at ``batch_slots=0``)."""
        from go_pocket_tts_tpu.runtime.streaming import stream_generate_session

        return stream_generate_session(self, tokens, cfg, cont)

    def generate_audio_staged(self, tokens, cfg: GenerateConfig):
        """Profiling variant: runs prefill / AR loop / decode as separate
        programs with blocking boundaries and returns
        (audio, {"prefill": s, "ar": s, "decode": s}).

        Slower than the fused path (extra dispatches + syncs) — used by
        stageprof for the per-stage breakdown the reference logs
        (`runtime_native_safetensors.go:74-235`).
        """
        if len(tokens) == 0:
            raise ValueError("generate: token slice must not be empty")
        max_steps = cfg.max_steps or cfg.estimated_max_steps or estimate_max_frames(
            len(tokens)
        )
        decode_steps = max(cfg.lsd_decode_steps, 1)
        flow = self.model.params["flow_lm"]
        flow_cfg = self.model.config.flow_lm
        stages: Dict[str, float] = {}

        with jax.default_matmul_precision(self.matmul_precision):
            tok_np = np.asarray(tokens, np.int32)
            emb = flm.text_embeddings(flow, jnp.asarray(tok_np[None, :])).astype(self.dtype)
            prompt_bucket = bk.pick_bucket(emb.shape[1], bk.PROMPT_BUCKETS)
            frame_bucket = bk.pick_bucket(max_steps + 1, (self.frame_bucket, 512, 1024))
            capacity = bk.round_up(prompt_bucket, 64) + frame_bucket
            cache = ftr.init_kv_cache(flow_cfg.transformer, 1, capacity, dtype=self.dtype)
            padded = jnp.pad(emb, ((0, 0), (0, prompt_bucket - emb.shape[1]), (0, 0)))

            t0 = time.perf_counter()
            cache = _prefill(flow, flow_cfg, cache, padded, jnp.int32(emb.shape[1]))
            jax.block_until_ready(cache["k"])
            stages["prefill"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            frames, n_frames, _ = _ar_loop(
                flow,
                flow_cfg,
                cache,
                self._next_key(),
                jnp.int32(max_steps),
                jnp.float32(cfg.eos_threshold),
                jnp.float32(cfg.temperature),
                jnp.int32(cfg.frames_after_eos),
                decode_steps,
                frame_bucket,
            )
            n = int(n_frames[0])
            stages["ar"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            decode_bucket = bk.pick_bucket(n, bk.DECODE_BUCKETS)
            latent = frames[:, :decode_bucket]
            mask = (jnp.arange(decode_bucket) < n)[None, :, None]
            latent = jnp.where(mask, latent, 0.0)
            pcm = _decode(self.model.params, self.model.config.mimi, latent)
            samples_per = self.model.config.mimi.samples_per_latent
            audio = np.asarray(pcm[0, 0, : n * samples_per], np.float32)
            stages["decode"] = time.perf_counter() - t0
        return audio, stages
