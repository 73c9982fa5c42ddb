"""Roofline accounting shared by the benchmarks.

The reference publishes no utilization numbers at all (SURVEY §6); this
framework reports achieved TFLOP/s and MFU (fraction of chip bf16 peak)
for both the synthesis program (bench.py) and the train step
(scripts/bench_training.py), using XLA's own FLOP count of the compiled
program so the numerator matches what actually ran.
"""

from __future__ import annotations

import os

# v5e bf16 peak per chip; override with NS2VC_PEAK_TFLOPS for other chips
DEFAULT_PEAK_TFLOPS = 197.0


def peak_tflops() -> float:
    return float(os.environ.get("NS2VC_PEAK_TFLOPS", DEFAULT_PEAK_TFLOPS))


def compiled_flops(compiled) -> float | None:
    """XLA's FLOP count of a `jit(...).lower(...).compile()` executable.
    Returns None when the backend exposes no cost analysis."""
    try:
        ca = compiled.cost_analysis()
        d = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(d["flops"])
    except Exception:
        return None


def mfu_metrics(flops: float | None, seconds: float,
                prefix: str = "") -> dict:
    """{<prefix>tflops_per_sec, <prefix>mfu} for one timed execution, or
    {} when flops is unavailable."""
    if not flops or seconds <= 0:
        return {}
    return {
        f"{prefix}tflops_per_sec": round(flops / seconds / 1e12, 1),
        f"{prefix}mfu": round(flops / seconds / (peak_tflops() * 1e12), 3),
    }
