"""Profiling / observability helpers.

Analog of the reference's tracing hooks (SURVEY.md §5.1:
``torch.profiler`` around benchmark samples, CUDA-event timing, memory
introspection printers): ``jax.profiler`` traces plus tunnel-safe wall
timing and device/host memory reporting.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an xplane trace viewable in TensorBoard/XProf
    (the torch.profiler analog, reference generate.py:348-353)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 3, overhead_s: Optional[float] = None):
    """Tunnel-safe timing: forces a host value fetch and optionally
    subtracts the per-call dispatch overhead. Returns (result, best_s)."""
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)  # sync + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, out)
        best = min(best, time.perf_counter() - t0)
    if overhead_s:
        best = max(best - overhead_s, 0.0)
    return out, best


def measure_dispatch_overhead(reps: int = 3) -> float:
    """Fixed per-call cost of a null jit round trip (~30 ms on the axon
    tunnel; ~us locally)."""
    import jax.numpy as jnp
    null = jax.jit(lambda a: a + 1)
    z = jnp.zeros((8, 128))
    _ = np.asarray(null(z))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(null(z))
        best = min(best, time.perf_counter() - t0)
    return best


def log_memory(tag: str = "") -> dict:
    """Device + host memory report (reference print_gpu_usage /
    log_current_memory_usage, activations.py:260-272)."""
    stats = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            if s:
                stats[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use", 0),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                }
        except Exception:
            pass
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    stats["host_rss_kb"] = int(line.split()[1])
    except OSError:
        pass
    logger.info("memory%s: %s", f" [{tag}]" if tag else "", stats)
    return stats


def decode_metrics(cfg, tok_s: float, bits_per_weight: float = 16.0) -> dict:
    """tok/s -> achieved GB/s and TFLOPS (reference generate.py:374-381)."""
    n = cfg.num_params()
    bytes_per_tok = n * bits_per_weight / 8
    return {
        "tok_s": tok_s,
        "achieved_GBps": tok_s * bytes_per_tok / 1e9,
        "achieved_TFLOPS": tok_s * 2 * n / 1e12,
    }
