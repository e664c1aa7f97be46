"""Generation runtime: jitted prefill / AR loop / decode and orchestration."""

from go_pocket_tts_tpu.runtime.generate import (
    ContinuationState,
    GenerateConfig,
    TPURuntime,
)

__all__ = ["ContinuationState", "GenerateConfig", "TPURuntime"]
