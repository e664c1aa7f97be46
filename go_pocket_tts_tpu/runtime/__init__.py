"""Generation runtime: jitted prefill / AR loop / decode and orchestration."""

from go_pocket_tts_tpu.runtime.generate import GenerateConfig, TPURuntime

__all__ = ["GenerateConfig", "TPURuntime"]
