"""Benchmark harnesses: RTF/TTFA measurement, stats, stage profiler."""

from go_pocket_tts_tpu.bench.harness import (
    BenchStats,
    RunResult,
    calc_rtf,
    check_rtf_threshold,
    compute_stats,
    format_json,
    format_table,
    run_bench,
)

__all__ = [
    "BenchStats",
    "RunResult",
    "calc_rtf",
    "check_rtf_threshold",
    "compute_stats",
    "format_json",
    "format_table",
    "run_bench",
]
