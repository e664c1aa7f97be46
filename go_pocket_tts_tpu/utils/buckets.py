"""Shape bucketing for recompile-free serving.

XLA compiles one program per distinct shape. Variable-length prompts and
frame counts are padded up to a small set of buckets so every request after
warmup hits a cached executable (SURVEY.md §7.3 "dynamic control flow under
jit"). All padded computation is masked (prompt) or causal-discarded (Mimi
decode), so bucketing is exact, not approximate.
"""

from __future__ import annotations

from typing import Sequence, Tuple

__all__ = ["round_up", "pick_bucket", "PROMPT_BUCKETS", "FRAME_BUCKETS", "DECODE_BUCKETS"]

# Prompt length (voice frames + text tokens). A chunk is ≤50 tokens; voice
# model-state prompts add a few hundred frames.
PROMPT_BUCKETS: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024)

# AR frame budget: 50-token chunks cap at ceil((50/3+2)·12.5)=234 plus ≤5
# frames after EOS (text/prepare.py), so 256 covers the default config.
FRAME_BUCKETS: Tuple[int, ...] = (64, 128, 256, 512, 1024)

# Mimi decode latent length buckets.
DECODE_BUCKETS: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024)


def round_up(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket ≥ n; multiples of the largest bucket beyond that."""
    if n <= 0:
        return buckets[0]
    for b in buckets:
        if n <= b:
            return b
    return round_up(n, buckets[-1])
