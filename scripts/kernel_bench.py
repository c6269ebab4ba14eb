"""On-hardware kernel benchmark + compiled numerics check (VERDICT r1 #3).

Runs the fused Pallas conv COMPILED on the current accelerator (not
interpret mode) against the XLA fp32 formulation at the 40 um and 120 um
graph scales, for the high-degree pull conv (K=16) and the K=3 connect
conv. Reports slope-based device times (launch overhead cancelled — see
utils.profiling.slope_time), numerics vs fp32, and MXU roofline fractions.

Writes artifacts/kernels_tpu.json and prints it.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graingraphnn_tpu.graph import schema
from graingraphnn_tpu.kernels.edge_stage import LANES, apply_period_conv_pallas
from graingraphnn_tpu.ops import period_conv
from graingraphnn_tpu.utils import profiling
from __graft_entry__ import _synthetic_sample

G, C = 4, 96
BF16_PEAK = 197e12


def kernel_mxu_flops(nd: int, k: int, gc: int) -> float:
    """MXU work actually executed per kernel call: per-edge key/value
    projections ([T,128]x[128,GC] x2), value MLP ([T,GC]x[GC,GC] dense
    block-diag), gate reduce/expand one-hots, query+skip."""
    return (
        2 * nd * k * LANES * gc * 2     # k, v projections
        + 2 * nd * k * gc * gc          # l2 dense block-diag
        + 2 * nd * k * gc * LANES * 2   # gate reduce + expand
        + 2 * nd * LANES * gc * 2       # q, skip
    )


HBM_PEAK = 819e9   # v5e HBM bandwidth, bytes/s


def kernel_bytes(nd: int, k: int, gc: int) -> float:
    """Minimum HBM traffic per kernel call: the gathered source rows
    (bf16, the only per-edge HBM-resident array), destination rows,
    weights (once), and the fp32 output."""
    return (
        nd * k * LANES * 2      # xe gather read
        + nd * LANES * 2        # xd read
        + nd * k * 2 * 4        # elen + mask (f32)
        + 4 * LANES * gc * 2 + gc * gc * 2   # weights
        + nd * gc * 4           # output write
    )


def bench_case(name, params, x_src, x_dst, nbr, elen, mask, tiles=(64,)):
    kw = dict(num_gates=G, out_channels=C)
    o_x = period_conv.apply_period_conv(params, x_src, x_dst, nbr, elen, mask, **kw)
    o_p = apply_period_conv_pallas(params, x_src, x_dst, nbr, elen, mask, **kw)
    scale = float(jnp.abs(o_x).max())
    err = np.abs(np.asarray(o_p) - np.asarray(o_x))

    def fx(c):
        xs = x_src.at[0, 0].add(c * 1e-20)
        return period_conv.apply_period_conv(
            params, xs, x_dst, nbr, elen, mask, **kw
        ).sum() * 1e-20 + c

    def make_fp(tile):
        def fp(c):
            xs = x_src.at[0, 0].add(c * 1e-20)
            return apply_period_conv_pallas(
                params, xs, x_dst, nbr, elen, mask, tile=tile, **kw
            ).sum() * 1e-20 + c
        return fp

    t_x = profiling.slope_time(fx)
    tile_times = {}
    for t in tiles:
        try:
            tile_times[t] = profiling.slope_time(make_fp(t))
        except Exception:
            # K-flattened kernel: [T*K, GC] intermediates bust scoped
            # VMEM at big tiles — record as absent, keep the sweep honest
            tile_times[t] = float("inf")
    best_tile = min(tile_times, key=tile_times.get)
    t_p = tile_times[best_tile]
    nd, k = nbr.shape
    mxu = kernel_mxu_flops(nd, k, G * C)
    byt = kernel_bytes(nd, k, G * C)
    # roofline: which resource binds at this arithmetic intensity
    t_mxu = mxu / BF16_PEAK
    t_hbm = byt / HBM_PEAK
    bound = "mxu" if t_mxu >= t_hbm else "hbm"
    roof_t = max(t_mxu, t_hbm)
    return {
        "case": name,
        "xla_fp32_us": round(t_x * 1e6, 1),
        "pallas_bf16_us": round(t_p * 1e6, 1),
        "tile": best_tile,
        "tile_sweep_us": {t: (round(v * 1e6, 1) if v != float("inf")
                              else "vmem_bust")
                          for t, v in tile_times.items()},
        "speedup": round(t_x / t_p, 2),
        "rel_err_max": round(float(err.max()) / scale, 4),
        "rel_err_mean": round(float(err.mean()) / scale, 6),
        "kernel_mxu_tflops": round(mxu / t_p / 1e12, 1),
        "mxu_bf16_peak_fraction": round(mxu / t_p / BF16_PEAK, 3),
        "flops_per_byte": round(mxu / byt, 1),
        "binding_roof": bound,
        "roofline_attained_fraction": round(roof_t / t_p, 3),
    }


def main():
    out = {"device": str(jax.devices()[0])}
    cases = []
    # SURVEY §7.3(4): the small graphs are small-matrix bound; the
    # 240um-scale (~75k-edge) and ~1M-edge synthetic configs measure the
    # kernel where it can be roofline-bound, with a tile-shape sweep
    scales = (
        ("40um_scale", (128, 256), (64,)),
        ("120um_scale", (1024, 2048), (64, 128, 256)),
        ("240um_scale_75k_edges", (4096, 8192), (64, 128, 256)),
        ("1M_edges", (49152, 98304), (64, 128, 256)),
    )
    for label, (ng, nj), tiles in scales:
        s = _synthetic_sample(ng=ng, nj=nj, seed=3)
        p_pull = period_conv.init_period_conv(
            jax.random.PRNGKey(2), schema.JOINT_DIM, schema.GRAIN_DIM, C, G
        )
        cases.append(bench_case(
            f"{label}_pull_K16", p_pull, s.joint_x, s.grain_x,
            s.pull_nbr, s.pull_len, s.pull_mask, tiles=tiles,
        ))
        print(json.dumps(cases[-1]))
        p_conn = period_conv.init_period_conv(
            jax.random.PRNGKey(3), schema.JOINT_DIM, schema.JOINT_DIM, C, G
        )
        cases.append(bench_case(
            f"{label}_connect_K3", p_conn, s.joint_x, s.joint_x,
            s.connect_nbr, s.connect_len, s.connect_mask, tiles=tiles,
        ))
        print(json.dumps(cases[-1]))
    out["cases"] = cases
    os.makedirs("artifacts", exist_ok=True)
    # preserve keys other tools append (control experiment, error notes)
    path = "artifacts/kernels_tpu.json"
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        for k, v in old.items():
            out.setdefault(k, v)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
