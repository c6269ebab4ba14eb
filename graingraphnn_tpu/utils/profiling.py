"""Profiling and roofline accounting.

The reference has no tracing/profiling beyond wall-clock prints
(SURVEY §5); the scaling targets require per-kernel roofline utilization.
This module provides:

  * `trace(logdir)` — context manager around jax.profiler (view in
    TensorBoard / xprof);
  * analytic FLOP/byte models for the fused periodic conv and the full
    GrainNN forward;
  * `roofline(time_s, flops, bytes_)` — achieved fraction of compute and
    bandwidth peaks.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict


@dataclasses.dataclass
class ChipSpec:
    name: str
    peak_flops: float     # FLOP/s at the measured dtype
    hbm_bw: float         # bytes/s

    @classmethod
    def v5e_bf16(cls):
        return cls("TPU v5e bf16", 197e12, 819e9)

    @classmethod
    def v5e_fp32(cls):
        # MXU fp32 throughput is ~1/4 of bf16 on v5e-class chips
        return cls("TPU v5e fp32", 49e12, 819e9)


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def conv_cost(ns: int, nd: int, k: int, f_src: int, f_dst: int,
              gates: int, channels: int, dtype_bytes: int = 4) -> Dict[str, float]:
    """FLOPs/bytes of one fused periodic-conv application
    (ops.period_conv.apply_period_conv)."""
    gc = gates * channels
    flops = 0.0
    # node-level projections: key, value (src), query, skip (dst), Pk, Pv
    flops += 2 * ns * f_src * gc * 2
    flops += 2 * nd * f_dst * gc * 2
    flops += 2 * nd * 3 * gc * 2
    # edge stage: shift correction, value MLP (block-diag), logits, softmax
    flops += 2 * nd * k * 3 * gc * 2          # shift @ W
    flops += 2 * nd * k * gc * channels       # l2 matmul per gate block
    flops += nd * k * gc * 3                  # logits product+sum, alpha mult
    flops += nd * k * gates * 6               # softmax

    bytes_ = 0.0
    bytes_ += (ns * f_src + nd * f_dst) * dtype_bytes          # node features
    bytes_ += 2 * nd * k * gc * dtype_bytes                    # gathered K,V
    bytes_ += (f_src + f_dst + gc) * gc * dtype_bytes          # weights
    bytes_ += nd * gc * dtype_bytes                            # output
    return {"flops": flops, "bytes": bytes_}


def model_forward_cost(ng: int, nj: int, ring: int, f_grain: int, f_joint: int,
                       channels: int, layers: int = 1) -> Dict[str, float]:
    """One GrainNN encoder+decoder forward (2 stacks x per-layer fused cell =
    3 conv applications each)."""
    fg = f_grain + channels
    fj = f_joint + channels
    total = {"flops": 0.0, "bytes": 0.0}
    for _ in range(2):  # encoder + decoder
        for c in (
            conv_cost(ng, nj, 3, fg, fj, 4, channels),    # push
            conv_cost(nj, nj, 3, fj, fj, 4, channels),    # connect
            conv_cost(nj, ng, ring, fj, fg, 4, channels),  # pull
        ):
            total["flops"] += c["flops"]
            total["bytes"] += c["bytes"]
    return total


def roofline(time_s: float, flops: float, bytes_: float,
             spec: ChipSpec | None = None) -> Dict[str, float]:
    spec = spec or ChipSpec.v5e_fp32()
    return {
        "chip": spec.name,
        "achieved_tflops": flops / time_s / 1e12,
        "compute_fraction": flops / time_s / spec.peak_flops,
        "achieved_gbps": bytes_ / time_s / 1e9,
        "bandwidth_fraction": bytes_ / time_s / spec.hbm_bw,
        "arithmetic_intensity": flops / max(bytes_, 1.0),
        "ridge_intensity": spec.peak_flops / spec.hbm_bw,
    }


def slope_time(f, n1: int = 100, n2: int = 900, reps: int = 3) -> float:
    """Device seconds per iteration of `f` (carry -> carry), measured as the
    slope between two scan lengths inside single compiled programs.

    On tunneled/remote accelerators a single dispatch carries tens of ms of
    fixed launch overhead; naive timeit-style loops measure that overhead,
    not the kernel (observed ~30 ms/launch on this environment's TPU). The
    slope cancels it."""
    import jax
    import jax.numpy as jnp

    def make_rep(n):
        @jax.jit
        def rep(c0):
            out, _ = jax.lax.scan(lambda c, _: (f(c), None), c0, jnp.arange(n))
            return out

        return rep

    r1, r2 = make_rep(n1), make_rep(n2)
    x0 = jnp.float32(1.0)
    jax.block_until_ready(r1(x0))
    jax.block_until_ready(r2(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(r1(x0))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(r2(x0))
        t2 = time.perf_counter() - t0
        ts.append((t2 - t1) / (n2 - n1))
    return min(ts)


def timeit(fn, *args, iters: int = 50) -> float:
    """Steady-state seconds per call (jax-blocking)."""
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
