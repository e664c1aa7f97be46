"""go-pocket-tts-tpu: a TPU-native (JAX/XLA/Pallas) PocketTTS framework.

A from-scratch re-design of the capabilities of CWBudde/go-pocket-tts
(reference: pure-Go CPU inference of Kyutai's PocketTTS ~100M-param
text-to-speech model) for TPU hardware:

- weights load directly from ``safetensors`` into JAX pytrees
  (``utils.safetensors``, ``models.model``)
- the autoregressive FlowLM frame loop runs as a single jitted
  ``lax.while_loop`` over a static-capacity KV cache (``runtime.generate``)
- the Mimi decoder (transposed-conv upsampling + windowed transformer +
  SEANet vocoder) is a fused XLA program (``models.mimi``)
- text preparation, chunking and the SentencePiece tokenizer mirror the
  reference's behavioural contracts exactly (``text``)
- serving (HTTP + CLI), voice cloning, benchmarking and multi-chip
  data-parallel execution live in ``server``, ``cli``, ``tts``, ``bench``
  and ``parallel``.

Reference behaviour citations in docstrings use ``file:line`` paths
relative to the reference checkout (CWBudde/go-pocket-tts).
"""

from go_pocket_tts_tpu.version import __version__

__all__ = ["__version__"]
