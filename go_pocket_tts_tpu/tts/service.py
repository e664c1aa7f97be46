"""TTS orchestration service (parity with `internal/tts/service.go`).

``Service`` owns the tokenizer + a runtime backend and drives:
text → :func:`prepare_chunks` (≤50-token chunks) → per-chunk voice-conditioned
generation → concatenated PCM (`service.go:115-156`). Streaming yields one
:class:`PCMChunk` per text chunk (`service.go:161-200`); frame-level PCM
streaming is provided by the runtime's streaming decoder (a capability the Go
reference left as a TODO, `PLAN.md:9-17`).

Backend strategy (`service.go:39-98`, `config/backend.go`):
- ``tpu``: the JAX/XLA engine (:class:`runtime.TPURuntime`)
- ``torch``: CPU torch oracle engine (:mod:`tts.runtime_torch`) — the
  alternate-backend slot the reference fills with ONNX Runtime
- ``cli``: subprocess to an external ``pocket-tts`` binary
"""

from __future__ import annotations

import contextlib
import logging
import threading
from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional

import numpy as np

from go_pocket_tts_tpu.config import (
    BACKEND_CLI,
    BACKEND_TORCH,
    BACKEND_TPU,
    Config,
    normalize_backend,
)
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.text import ChunkMetadata, estimate_max_frames, prepare_chunks
from go_pocket_tts_tpu.text.sentencepiece import load_tokenizer
from go_pocket_tts_tpu.utils import safetensors as st

log = logging.getLogger("pockettts.service")

__all__ = ["Service", "PCMChunk", "MAX_TOKENS_PER_CHUNK"]

# Token budget per synthesis chunk (`internal/tts/service.go:23`).
MAX_TOKENS_PER_CHUNK = 50

_DEFAULT_MAX_STEPS = 256  # config default used by generationStepLimit


@dataclass
class PCMChunk:
    samples: np.ndarray
    chunk_index: int
    final: bool


class CancelledError(RuntimeError):
    """Request cancelled (the ctx-cancellation analogue)."""


@dataclass
class _VoiceConditioning:
    embedding: Optional[np.ndarray] = None
    model_state: Optional[st.VoiceModelState] = None

    def apply_to(self, cfg: GenerateConfig) -> None:
        cfg.voice_embedding = self.embedding
        cfg.voice_model_state = self.model_state


_voice_cache: dict = {}
_voice_cache_lock = threading.Lock()


def load_voice_conditioning(voice_path: str) -> _VoiceConditioning:
    """Inspect + load a voice file: model-state → KV hydration; embedding →
    prepend (`service.go:202-244`).

    Loads are cached by (path, mtime) — the reference re-reads the file per
    synthesize call, which is wasted I/O on a hot serving path.
    """
    if not voice_path or not voice_path.strip():
        return _VoiceConditioning()
    import os

    try:
        mtime = os.stat(voice_path).st_mtime_ns
    except OSError:
        mtime = None
    key = (voice_path, mtime)
    with _voice_cache_lock:
        cached = _voice_cache.get(key)
    if cached is not None:
        return cached

    kind = st.inspect_voice_file(voice_path)
    if kind == st.VoiceFileKind.MODEL_STATE:
        cond = _VoiceConditioning(model_state=st.load_voice_model_state(voice_path))
    else:
        cond = _VoiceConditioning(embedding=st.load_voice_embedding(voice_path))
    with _voice_cache_lock:
        if len(_voice_cache) > 32:
            _voice_cache.clear()
        _voice_cache[key] = cond
    return cond


def _stream_pcm_chunks(blocks, chunk_index: int, last_chunk: bool):
    """Wrap a PCM-block iterator as PCMChunks, marking the LAST block of the
    last chunk ``final=True`` (one-block lookahead). A final chunk that
    produces zero blocks still emits an empty final marker so consumers that
    wait on ``final`` never hang."""
    prev: Optional[np.ndarray] = None
    for block in blocks:
        if prev is not None:
            yield PCMChunk(samples=prev, chunk_index=chunk_index, final=False)
        prev = block
    if prev is not None:
        yield PCMChunk(samples=prev, chunk_index=chunk_index, final=last_chunk)
    elif last_chunk:
        yield PCMChunk(
            samples=np.zeros(0, np.float32), chunk_index=chunk_index, final=True
        )


class Service:
    """Owns tokenizer + runtime; thread-safe via an internal lock around the
    runtime (one request generates at a time per service; the HTTP layer adds
    its own worker-pool semaphore on top, `server.go:112-134`)."""

    def __init__(self, runtime, tokenizer, tts_cfg) -> None:
        self.runtime = runtime
        self.tokenizer = tokenizer
        self.tts_cfg = tts_cfg
        # Concurrency-native runtimes (the continuous batcher) handle their
        # own scheduling; others are serialized per service.
        if getattr(runtime, "concurrent_safe", False):
            self._lock = contextlib.nullcontext()
        else:
            self._lock = threading.Lock()

    # -- construction ------------------------------------------------------

    @classmethod
    def from_config(cls, cfg: Config) -> "Service":
        backend = normalize_backend(cfg.tts.backend)
        tokenizer = None
        if backend != BACKEND_CLI:
            tokenizer = load_tokenizer(cfg.paths.tokenizer_model)

        if backend == BACKEND_TPU:
            import jax.numpy as jnp

            from go_pocket_tts_tpu.models.model import load_model

            # Persistent compilation cache BEFORE any compile: repeat synth
            # invocations and server restarts reuse executables (measured
            # second synth invocation 9.0 -> 3.3 s).
            from go_pocket_tts_tpu.utils.compile_cache import enable_compile_cache

            enable_compile_cache(cfg.runtime.compile_cache_dir)

            model = load_model(cfg.paths.model_path)
            from go_pocket_tts_tpu.models.quantize import model_quantized_bits

            pre_bits = model_quantized_bits(model.params)
            if pre_bits:
                # `model export --quantize` artifact: the weights arrived
                # already quantized, so any --runtime-quantize walk is a no-op.
                log.info(
                    "checkpoint is pre-quantized (int%d); load-time weight "
                    "quantization is skipped",
                    pre_bits,
                )
                cfg_bits = cfg.runtime.quantize_bits or 8
                if cfg.runtime.quantize and cfg_bits != pre_bits:
                    # The artifact always wins — re-quantizing quantized
                    # weights is a no-op — so say loudly that the configured
                    # (or autotuned) width is NOT what will serve.
                    log.warning(
                        "runtime.quantize requests int%d but the checkpoint "
                        "carries int%d weights; the artifact's int%d serves",
                        cfg_bits,
                        pre_bits,
                        pre_bits,
                    )
                if pre_bits == 4:
                    # Hardware-measured (PERF.md r5): the int4 batched step
                    # is ~1.6x slower than int8 on TPU v5e — int4 artifacts
                    # optimize size/cold-load, not serving throughput.
                    log.warning(
                        "serving from an int4 artifact: measured ~1.6x "
                        "slower per AR step than int8 on TPU; prefer "
                        "`model export --quantize int8` for serving"
                    )
            dtype = jnp.bfloat16 if cfg.runtime.dtype == "bfloat16" else jnp.float32
            seed = None if cfg.runtime.seed < 0 else cfg.runtime.seed
            pallas_opt = {
                "auto": None,
                "on": True,
                "true": True,
                "1": True,
                "off": False,
                "false": False,
                "0": False,
            }.get(str(cfg.runtime.pallas).strip().lower(), "bad")
            if pallas_opt == "bad":
                raise ValueError(
                    f"--runtime-pallas must be auto, on, or off "
                    f"(got {cfg.runtime.pallas!r})"
                )
            if cfg.runtime.batch_slots > 1:
                from go_pocket_tts_tpu.parallel.batching import BatcherRuntime

                mesh = None
                if cfg.runtime.tp_devices > 1:
                    from go_pocket_tts_tpu.parallel.mesh import dp_tp_mesh

                    mesh = dp_tp_mesh(
                        max(cfg.runtime.dp_devices, 1), cfg.runtime.tp_devices
                    )
                elif cfg.runtime.dp_devices > 1:
                    from go_pocket_tts_tpu.parallel.mesh import dp_mesh

                    mesh = dp_mesh(cfg.runtime.dp_devices)
                runtime = BatcherRuntime(
                    model,
                    slots=cfg.runtime.batch_slots,
                    dtype=dtype,
                    seed=seed,
                    mesh=mesh,
                    prompt_capacity=max(cfg.runtime.batch_prompt_capacity, 1),
                    quantize=cfg.runtime.quantize_bits if cfg.runtime.quantize else False,
                    kv_quantize=cfg.runtime.kv_quantize,
                    steps_per_sync=max(cfg.runtime.steps_per_sync, 1),
                    steps_per_sync_burst=max(cfg.runtime.steps_per_sync_burst, 0),
                    pallas=pallas_opt,
                )
                log.info(
                    "loaded TPU batched runtime model=%s dtype=%s slots=%d mesh=%s",
                    cfg.paths.model_path,
                    dtype,
                    cfg.runtime.batch_slots,
                    None if mesh is None else dict(mesh.shape),
                )
            else:
                if cfg.runtime.kv_quantize:
                    raise ValueError(
                        "--runtime-kv-quantize requires the batched runtime: "
                        "set --runtime-batch-slots > 1 (the single-request AR "
                        "step is weight-bound; int8 KV only pays at batch>1)"
                    )
                if cfg.runtime.tp_devices > 1 or cfg.runtime.dp_devices > 1:
                    # Mesh execution rides the continuous batcher; a silent
                    # single-chip fallback would report wrong benchmark
                    # numbers as "N-way parallel", so refuse loudly.
                    raise ValueError(
                        "--runtime-tp/--runtime-dp require the batched runtime: "
                        "set --runtime-batch-slots > 1 (got "
                        f"tp={cfg.runtime.tp_devices} dp={cfg.runtime.dp_devices} "
                        f"batch_slots={cfg.runtime.batch_slots})"
                    )
                runtime = TPURuntime(
                    model,
                    dtype=dtype,
                    seed=seed,
                    frame_bucket=cfg.runtime.frame_bucket,
                    matmul_precision=cfg.runtime.matmul_precision or None,
                    quantize=cfg.runtime.quantize_bits if cfg.runtime.quantize else False,
                    pallas=pallas_opt,
                )
                log.info(
                    "loaded TPU runtime model=%s dtype=%s", cfg.paths.model_path, dtype
                )
        elif backend == BACKEND_TORCH:
            from go_pocket_tts_tpu.tts.runtime_torch import TorchRuntime

            runtime = TorchRuntime.from_checkpoint(
                cfg.paths.model_path,
                seed=None if cfg.runtime.seed < 0 else cfg.runtime.seed,
            )
            log.info("loaded torch-cpu runtime model=%s", cfg.paths.model_path)
        elif backend == BACKEND_CLI:
            from go_pocket_tts_tpu.tts.runtime_cli import CLIRuntime

            runtime = CLIRuntime(
                cfg.tts.cli_path or "pocket-tts",
                quiet=cfg.tts.quiet,
                extra_args=cfg.tts.cli_args,
                config_path=cfg.tts.cli_config_path,
            )
        else:  # pragma: no cover
            raise ValueError(f"unsupported backend {backend!r}")
        return cls(runtime, tokenizer, cfg.tts)

    # -- synthesis ---------------------------------------------------------

    def _generate_config(
        self, chunk: ChunkMetadata, deadline: Optional[float] = None
    ) -> GenerateConfig:
        """Per-chunk config with the dynamic step limit (`service.go:255-278`):
        the estimate wins unless the user overrode max_steps away from the
        default.

        ``deadline`` (absolute ``time.monotonic()`` seconds) additionally
        clamps the step budget: one step = one 80 ms latent frame, so the
        remaining wall-clock budget maps directly to a frame bound whenever
        generation runs at ≥1× real time. On-device programs cannot be
        aborted mid-run, so this is how a request timeout fires on time even
        for single-chunk requests (the reference cancels via ctx inside its
        generation loop, `runtime_native_safetensors.go:155-201`).
        """
        frame_rate, _enc, _steps = self.runtime.mimi_timing()
        estimated = estimate_max_frames(chunk.num_tokens, frame_rate)
        configured = self.tts_cfg.max_steps
        # An explicitly user-set max_steps wins even when it equals the
        # default (config layer sets the marker); a non-default value also
        # counts as user intent (direct-construction callers).
        user_set = (
            getattr(self.tts_cfg, "max_steps_user_set", False)
            or configured != _DEFAULT_MAX_STEPS
        )
        if estimated > 0 and (configured <= 0 or not user_set):
            max_steps = estimated
        else:
            max_steps = configured
        if deadline is not None:
            import time as _time

            remaining = deadline - _time.monotonic()
            if remaining <= 0:
                raise CancelledError("request deadline exceeded before dispatch")
            budget = max(int(remaining * frame_rate), 1)
            if budget < max_steps:
                log.info(
                    "clamping max_steps %d -> %d (%.1fs deadline budget)",
                    max_steps,
                    budget,
                    remaining,
                )
                max_steps = budget
        return GenerateConfig(
            temperature=self.tts_cfg.temperature,
            eos_threshold=self.tts_cfg.eos_threshold,
            max_steps=max_steps,
            estimated_max_steps=estimated,
            lsd_decode_steps=self.tts_cfg.lsd_decode_steps,
            frames_after_eos=chunk.frames_after_eos(),
        )

    def synthesize(
        self,
        input_text: str,
        voice_path: str = "",
        cancel: Optional[Callable[[], bool]] = None,
        deadline: Optional[float] = None,
        continuity: Optional[bool] = None,
    ) -> np.ndarray:
        """Full-text synthesis → float32 PCM (`service.go:115-156`)."""
        return np.concatenate(
            [
                c.samples
                for c in self.synthesize_stream(
                    input_text,
                    voice_path,
                    cancel,
                    deadline=deadline,
                    continuity=continuity,
                )
            ]
            or [np.zeros(0, np.float32)]
        )

    def estimate_total_frames(self, input_text: str) -> int:
        """Best-effort total-frame estimate for a request (progress bars).

        Uses the same chunker and the runtime's own frame rate
        (``mimi_timing``), so the estimate is consistent with the per-chunk
        ``estimated_max_steps`` the generation path computes — callers must
        not re-derive this with a default frame rate.
        """
        if self.tokenizer is None or self.runtime is None:
            return 0
        try:
            frame_rate, _enc, _steps = self.runtime.mimi_timing()
        except AttributeError:
            frame_rate = 0.0  # estimate_max_frames falls back to its default
        return sum(
            estimate_max_frames(c.num_tokens, frame_rate)
            for c in prepare_chunks(input_text, self.tokenizer, MAX_TOKENS_PER_CHUNK)
        )

    @property
    def supports_frame_streaming(self) -> bool:
        return isinstance(self.runtime, TPURuntime) or hasattr(
            self.runtime, "stream_generate"
        )

    def synthesize_stream(
        self,
        input_text: str,
        voice_path: str = "",
        cancel: Optional[Callable[[], bool]] = None,
        frame_streaming: bool = False,
        deadline: Optional[float] = None,
        continuity: Optional[bool] = None,
    ) -> Iterator[PCMChunk]:
        """Streaming generator.

        ``frame_streaming=False``: one PCMChunk per text chunk
        (`service.go:161-200`). ``frame_streaming=True`` (TPU runtime only):
        PCM emitted every few latent frames via the stateful block decoder —
        the frame-level streaming the reference lists as TODO (`PLAN.md:9-17`).
        ``continuity`` overrides the service-level ``--continuity`` default
        for this request (None = use the configured default).
        """
        if self.runtime is None:
            raise RuntimeError("tts runtime unavailable")
        # CLI backend synthesizes whole text in the subprocess (no local
        # tokenizer round-trip, like the reference's cliSynthesizer).
        if hasattr(self.runtime, "synthesize_text"):
            pcm = self.runtime.synthesize_text(input_text, voice_path)
            yield PCMChunk(samples=pcm, chunk_index=0, final=True)
            return
        chunks = prepare_chunks(input_text, self.tokenizer, MAX_TOKENS_PER_CHUNK)
        conditioning = load_voice_conditioning(voice_path)
        use_frames = frame_streaming and self.supports_frame_streaming

        # Long-form continuity: thread the runtime's KV state through the
        # chunk loop so prosody carries across chunk boundaries (the
        # reference resets per chunk, `service.go:137-152`). Sequential by
        # nature, so it takes precedence over the parallel chunk paths.
        use_continuity = (
            getattr(self.tts_cfg, "continuity", False)
            if continuity is None
            else bool(continuity)
        )
        if (
            not use_frames
            and use_continuity
            and hasattr(self.runtime, "generate_audio_session")
        ):
            with self._lock:
                cont = None
                for i, chunk in enumerate(chunks):
                    if cancel is not None and cancel():
                        raise CancelledError("synthesis cancelled")
                    cfg = self._generate_config(chunk, deadline)
                    # Apply the voice to EVERY chunk: runtimes ignore it while
                    # carried state survives, but an internal session reset
                    # (capacity full) must re-apply it — gating on our local
                    # `cont` would silently drop the voice after a reset.
                    conditioning.apply_to(cfg)
                    pcm, cont = self.runtime.generate_audio_session(
                        chunk.token_ids, cfg, cont
                    )
                    yield PCMChunk(
                        samples=pcm, chunk_index=i, final=i == len(chunks) - 1
                    )
            return

        # Concurrency-native runtime + multi-chunk text: submit every chunk
        # up front so they generate together in the shared batch (the
        # reference synthesizes chunks strictly sequentially,
        # `service.go:137-152`); yield in order.
        if (
            not use_frames
            and len(chunks) > 1
            and hasattr(self.runtime, "batcher")
        ):
            futures = []
            for chunk in chunks:
                cfg = self._generate_config(chunk, deadline)
                conditioning.apply_to(cfg)
                futures.append(self.runtime.batcher.submit(chunk.token_ids, cfg))
            for i, fut in enumerate(futures):
                if cancel is not None and cancel():
                    raise CancelledError("synthesis cancelled")
                yield PCMChunk(
                    samples=fut.result(timeout=getattr(self.runtime, "_timeout", 300.0)),
                    chunk_index=i,
                    final=i == len(futures) - 1,
                )
            return

        # Sequential runtime + multi-chunk text + async-capable runtime:
        # one-deep pipeline — dispatch chunk k+1 before resolving chunk k's
        # PCM, hiding the per-chunk host↔device round trip (the reference
        # synthesizes chunks strictly sequentially, `service.go:137-152`).
        if (
            not use_frames
            and len(chunks) > 1
            and hasattr(self.runtime, "generate_audio_async")
        ):
            with self._lock:
                pending = None  # (resolver, index)
                for i, chunk in enumerate(chunks):
                    if cancel is not None and cancel():
                        raise CancelledError("synthesis cancelled")
                    cfg = self._generate_config(chunk, deadline)
                    conditioning.apply_to(cfg)
                    resolver = self.runtime.generate_audio_async(chunk.token_ids, cfg)
                    if pending is not None:
                        yield PCMChunk(
                            samples=pending[0](), chunk_index=pending[1], final=False
                        )
                    pending = (resolver, i)
                yield PCMChunk(
                    samples=pending[0](), chunk_index=pending[1], final=True
                )
            return

        # Frame-streaming + continuity through the batcher: sequential chunk
        # loop threading the lane KV snapshot, blocks yielded as they arrive.
        if (
            use_frames
            and use_continuity
            and hasattr(self.runtime, "stream_generate_session")
        ):
            # The lock matters for the single-request TPURuntime (r4: it
            # grew stream_generate_session too); it is a nullcontext for
            # the concurrency-native batcher.
            with self._lock:
                cont = None
                for i, chunk in enumerate(chunks):
                    if cancel is not None and cancel():
                        raise CancelledError("synthesis cancelled")
                    cfg = self._generate_config(chunk, deadline)
                    # Every chunk (see the non-streaming continuity loop
                    # above): an internal session reset must re-apply the
                    # voice.
                    conditioning.apply_to(cfg)
                    blocks, next_state = self.runtime.stream_generate_session(
                        chunk.token_ids, cfg, cont
                    )
                    yield from _stream_pcm_chunks(blocks, i, i == len(chunks) - 1)
                    cont = next_state()
            return

        for i, chunk in enumerate(chunks):
            if cancel is not None and cancel():
                raise CancelledError("synthesis cancelled")
            cfg = self._generate_config(chunk, deadline)
            conditioning.apply_to(cfg)
            last_chunk = i == len(chunks) - 1
            if use_frames:
                if hasattr(self.runtime, "stream_generate"):
                    # Concurrency-native runtime (batcher): streams through
                    # the shared batch, no service lock needed.
                    blocks_iter = self.runtime.stream_generate(chunk.token_ids, cfg)
                    yield from _stream_pcm_chunks(blocks_iter, i, last_chunk)
                    continue

                from go_pocket_tts_tpu.runtime.streaming import stream_generate

                # Yield as blocks arrive (this is the TTFA path). The lock is
                # held across the chunk — same policy as the reference, which
                # holds a worker slot for the whole request.
                with self._lock:
                    yield from _stream_pcm_chunks(
                        stream_generate(self.runtime, chunk.token_ids, cfg),
                        i,
                        last_chunk,
                    )
            else:
                with self._lock:
                    pcm = self.runtime.generate_audio(chunk.token_ids, cfg)
                yield PCMChunk(samples=pcm, chunk_index=i, final=last_chunk)

    def prewarm(self, token_lengths=(10, 30, 50), voice_paths=()) -> None:
        """Compile the common shape buckets before serving traffic.

        First-request latency is otherwise dominated by XLA compilation (tens
        of seconds per shape bucket). Shapes depend only on bucketed token
        count / step budget, so dummy token IDs compile the same executables
        real requests will hit.

        Voice conditioning adds its own shape keys — embedding voices change
        the prompt width (programs key on ``(voice_len, bucket)``), and
        model-state voices hydrate through a different prefill — so pass the
        serving voices' file paths via ``voice_paths`` to warm those too
        (``serve --prewarm`` passes every voice in the manifest).
        """
        own = getattr(self.runtime, "prewarm", None)
        if own is not None:
            # Concurrency-native runtimes (the continuous batcher) know their
            # own program variants — burst admission counts, block decode —
            # which the single-request warm below would miss.
            own(token_lengths)
            # Continuity adds its own variants (lane snapshot, hydrated
            # per-slot prefill): a cold compile mid-traffic stalls every
            # lane ~2-3 s through a remote-compile tunnel. Warm whenever the
            # runtime supports sessions — clients can opt in per request
            # ({"continuity": true}) even when the server default is off.
            if hasattr(self.runtime, "generate_audio_session"):
                cfg = self._generate_config(
                    ChunkMetadata(text="", token_ids=[0, 0, 0], num_tokens=3, num_words=3)
                )
                cfg.max_steps = 2
                cfg.eos_threshold = 1e9  # pin the step count during warmup
                _pcm, cont = self.runtime.generate_audio_session([0, 0, 0], cfg, None)
                if cont is not None:
                    self.runtime.generate_audio_session([0, 0, 0], cfg, cont)
                log.info("prewarmed continuity session path")
            self._prewarm_voices(voice_paths, token_lengths)
            return
        gen = getattr(self.runtime, "generate_audio", None)
        if gen is None:
            return
        for n in token_lengths:
            cfg = self._generate_config(
                ChunkMetadata(text="", token_ids=[0] * n, num_tokens=n, num_words=n)
            )
            cfg.max_steps = cfg.estimated_max_steps
            with self._lock:
                gen([0] * n, cfg)
            log.info("prewarmed bucket for %d tokens", n)
        # Continuity programs (plain + streamed sessions): a cold compile
        # mid-traffic stalls ~2-3 s through a remote-compile tunnel. Warm
        # whenever the runtime supports sessions — clients can opt in per
        # request ({"continuity": true}) even when the server default is off.
        if hasattr(self.runtime, "generate_audio_session"):
            cfg = self._generate_config(
                ChunkMetadata(text="", token_ids=[0, 0, 0], num_tokens=3, num_words=3)
            )
            cfg.max_steps = 2
            cfg.eos_threshold = 1e9  # pin the step count during warmup
            with self._lock:
                _pcm, cont = self.runtime.generate_audio_session([0, 0, 0], cfg, None)
                if cont is not None:
                    _pcm, cont = self.runtime.generate_audio_session(
                        [0, 0, 0], cfg, cont
                    )
                if hasattr(self.runtime, "stream_generate_session"):
                    # 4+8+16 = compile every adaptive segment variant at the
                    # session capacity, fresh and carried.
                    cfg.max_steps = 28
                    blocks, next_state = self.runtime.stream_generate_session(
                        [0, 0, 0], cfg, None
                    )
                    for _ in blocks:
                        pass
                    blocks, _ = self.runtime.stream_generate_session(
                        [0, 0, 0], cfg, next_state()
                    )
                    for _ in blocks:
                        pass
            log.info("prewarmed continuity session path")
        self._prewarm_voices(voice_paths, token_lengths)

    def prewarm_voice(self, voice_path: str, token_lengths=(10, 30, 50)) -> bool:
        """Warm one voice's conditioning programs; True if fully warmed.

        The runtime voice-upload path (``POST /voices``) calls this right
        after registering a new voice so its first request pays no XLA
        compile — the same contract ``serve --prewarm`` establishes for
        manifest voices."""
        return self._prewarm_voices([voice_path], token_lengths) == 1

    def _prewarm_voices(self, voice_paths, token_lengths) -> int:
        """Warm voice-conditioned program variants (see ``prewarm``);
        returns how many voices warmed fully.

        Best-effort: a voice that fails to load or exceeds capacity is
        skipped with a warning — prewarm must never block serving."""
        warmed = 0
        gen = getattr(self.runtime, "generate_audio", None)
        if gen is None:
            return warmed
        from go_pocket_tts_tpu.utils import buckets as bk

        for vp in voice_paths:
            try:
                conditioning = load_voice_conditioning(vp)
            except Exception as exc:  # noqa: BLE001 - warm-up only
                log.warning("prewarm: voice %r skipped (%s)", vp, exc)
                continue
            # Embedding voices shift the prompt width by their length, so
            # the warm token counts must land in each PROMPT bucket at that
            # offset — the caller's token_lengths would miss buckets (e.g.
            # voice_len 5 with lengths (10,30,50) never hits bucket 32).
            voice_len = (
                0
                if conditioning.embedding is None
                else int(np.asarray(conditioning.embedding).shape[-2])
            )
            # Two bucketing schemes exist and the warm must cover BOTH
            # (extra warms just hit the cache):
            # - the batcher folds voice_len into the prompt bucket
            #   (admission pads ids to bucket - voice_len) → smallest token
            #   count landing in each bucket at this voice's offset;
            # - the single-request TPURuntime buckets the TOKEN count alone
            #   and keys capacity on voice_len + token_bucket → smallest
            #   count per plain token bucket (1, 17, 33 for ≤50 tokens).
            # Token counts cap at MAX_TOKENS_PER_CHUNK; unreachable skip.
            warm_lengths, prev = set(), 0
            for b in bk.PROMPT_BUCKETS:
                n = max(prev + 1 - voice_len, 1)
                if (
                    n <= MAX_TOKENS_PER_CHUNK
                    and bk.pick_bucket(n + voice_len, bk.PROMPT_BUCKETS) == b
                ):
                    warm_lengths.add(n)
                if prev + 1 <= MAX_TOKENS_PER_CHUNK:
                    warm_lengths.add(prev + 1)
                prev = b
            warm_lengths = sorted(warm_lengths) or [1]
            # Full-slot bursts are their own program variants (count padded
            # to 1 or slots): with a batcher, warm every length at BOTH
            # counts by submitting a whole wave; waiting between lengths
            # keeps each wave admitted together.
            batcher = getattr(self.runtime, "batcher", None)
            fully_warmed = True
            for n in warm_lengths:
                cfg = self._generate_config(
                    ChunkMetadata(
                        text="", token_ids=[0] * n, num_tokens=n, num_words=n
                    )
                )
                cfg.max_steps = 2
                cfg.eos_threshold = 1e9
                conditioning.apply_to(cfg)
                try:
                    if batcher is not None and batcher.slots > 1:
                        futs = [
                            batcher.submit([0] * n, cfg)
                            for _ in range(batcher.slots)
                        ]
                        for f in futs:
                            f.result(timeout=600)
                    with self._lock:
                        gen([0] * n, cfg)
                except Exception as exc:  # noqa: BLE001 - warm-up only
                    log.warning(
                        "prewarm: voice %r at %d tokens skipped (%s)", vp, n, exc
                    )
                    fully_warmed = False
                    break
            if fully_warmed:
                warmed += 1
                log.info("prewarmed voice conditioning: %s", vp)
            else:
                log.warning("prewarm: voice %r only partially warmed", vp)
        return warmed

    def close(self) -> None:
        close = getattr(self.runtime, "close", None)
        if close is not None:
            close()
