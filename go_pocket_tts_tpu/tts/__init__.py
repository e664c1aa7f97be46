"""TTS orchestration: service, voices, parity harness, backends."""

from go_pocket_tts_tpu.tts.service import PCMChunk, Service
from go_pocket_tts_tpu.tts.voices import Voice, VoiceManager

__all__ = ["Service", "PCMChunk", "Voice", "VoiceManager"]
