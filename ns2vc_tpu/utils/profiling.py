"""Profiling / tracing — a first-class subsystem the reference lacks
(SURVEY.md section 5: the reference has only tqdm bars and a timeit print,
infer_tool.py:59-66).

- `trace(logdir)`: context manager around `jax.profiler` producing
  TensorBoard-viewable traces (works on TPU and CPU);
- `annotate(name)`: named region for the trace timeline;
- Trainer integration: set `profile_from_step`/`profile_num_steps` env
  (NS2VC_PROFILE_AT=100:5) to capture steps 100..104 of a training run.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: `with annotate('sampler'): ...`."""
    return jax.profiler.TraceAnnotation(name)


def profile_window_from_env() -> tuple[int, int] | None:
    """Parse NS2VC_PROFILE_AT='<start_step>:<num_steps>'."""
    spec = os.environ.get("NS2VC_PROFILE_AT")
    if not spec:
        return None
    try:
        start, num = spec.split(":")
        return int(start), int(num)
    except ValueError:
        print(f"ignoring malformed NS2VC_PROFILE_AT={spec!r}")
        return None
