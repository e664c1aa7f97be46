"""Runtime voice upload: WAV bytes → encoded, registered, prewarmed voice.

Beyond reference parity: the Go server's voice list is immutable after start
(`internal/server/server.go:160-167`) and voice cloning needs an offline
export step through an external ONNX tool (`cmd/pockettts/export_voice.go:
108-195`). Here `POST /voices` clones a voice from speaker audio at runtime
via the native Mimi encoder (`models/mimi_encoder.py`), registers it with the
live `VoiceManager`, and prewarms its conditioning program variants so the
first request using it pays no XLA compile — closing the last hole in the
prewarm contract (ad-hoc voice files used to compile their conditioning
shapes on first use).

Security posture: the endpoint is OFF unless `serve --voice-upload-dir` names
a writable directory — an open server must not accept file writes by default.
Voice ids are restricted to a filename-safe charset (the id becomes the
on-disk name), audio size is capped before the body is read, and the
safetensors file lands via atomic replace.
"""

from __future__ import annotations

import logging
import os
import re
import threading

import numpy as np

__all__ = ["DuplicateVoice", "VoiceUploader"]

log = logging.getLogger("pockettts.voice_upload")

_ID_RE = re.compile(r"[A-Za-z0-9][A-Za-z0-9._-]{0,63}\Z")


class DuplicateVoice(ValueError):
    """The voice id is already registered (HTTP 409)."""


class VoiceUploader:
    """Encode + persist + register + prewarm uploaded speaker audio.

    The Mimi ``VoiceEncoder`` is built lazily on the first upload (it loads
    encoder weights from the model checkpoint) and cached; encodes pad the
    audio to a frame bucket so uploads key on a handful of XLA programs
    (`VoiceEncoder.encode_samples(pad_to_bucket=True)`).
    """

    def __init__(
        self,
        model_path: str,
        upload_dir: str,
        voices,
        service=None,
        max_audio_bytes: int = 16 << 20,
        prewarm: bool = True,
    ) -> None:
        self.model_path = model_path
        self.upload_dir = upload_dir
        self.voices = voices
        self.service = service
        self.max_audio_bytes = int(max_audio_bytes)
        self.prewarm = bool(prewarm)
        self._encoder = None
        self._lock = threading.Lock()

    def _get_encoder(self):
        with self._lock:
            if self._encoder is None:
                from go_pocket_tts_tpu.tts.voice_export import VoiceEncoder
                from go_pocket_tts_tpu.utils.safetensors import open_store

                try:
                    self._encoder = VoiceEncoder(open_store(self.model_path))
                except ValueError as exc:
                    # Checkpoint lacks encoder weights / speaker projection —
                    # a server-configuration problem, not a bad request.
                    raise RuntimeError(str(exc)) from exc
            return self._encoder

    def upload(self, voice_id: str, wav_bytes: bytes, license: str = "") -> dict:
        """Full upload flow; returns the JSON-ready voice record.

        Raises ``ValueError`` for bad input (id, audio), ``DuplicateVoice``
        for an already-registered id, and ``RuntimeError`` for server-side
        failures (checkpoint without encoder weights, unwritable dir).
        """
        if not voice_id or not _ID_RE.match(voice_id):
            raise ValueError(
                "voice id must be 1-64 chars of [A-Za-z0-9._-] starting "
                "with a letter or digit"
            )
        if len(wav_bytes) > self.max_audio_bytes:
            raise ValueError(
                f"voice audio exceeds maximum size of {self.max_audio_bytes} bytes"
            )
        if any(v.id == voice_id for v in self.voices.list_voices()):
            raise DuplicateVoice(f"duplicate voice id {voice_id!r}")

        encoder = self._get_encoder()
        emb = encoder.encode_wav_bytes(wav_bytes, pad_to_bucket=True)
        frames = int(emb.shape[1])

        from go_pocket_tts_tpu.utils.safetensors import write_file

        # Absolute: a manifest-backed VoiceManager resolves RELATIVE paths
        # against the manifest's directory, not the server's cwd — a
        # relative registration here would point at the wrong file
        # (caught driving the live server; see tests).
        path = os.path.abspath(os.path.join(self.upload_dir, f"{voice_id}.safetensors"))
        try:
            os.makedirs(self.upload_dir, exist_ok=True)
            write_file(path, {"audio_prompt": np.asarray(emb, np.float32)})
        except OSError as exc:
            raise RuntimeError(f"cannot write voice file: {exc}") from exc

        try:
            voice = self.voices.register(voice_id, path, license=license)
        except ValueError as exc:
            # Lost a registration race after the early check.
            raise DuplicateVoice(str(exc)) from exc

        prewarmed = False
        if self.prewarm and self.service is not None:
            warm = getattr(self.service, "prewarm_voice", None)
            if warm is not None:
                prewarmed = bool(warm(path))
        log.info(
            "voice uploaded: id=%s frames=%d path=%s prewarmed=%s",
            voice_id,
            frames,
            path,
            prewarmed,
        )
        return {
            "id": voice.id,
            "path": voice.path,
            "license": voice.license,
            "frames": frames,
            "prewarmed": prewarmed,
        }
