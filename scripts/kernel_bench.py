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


def bench_case(name, params, x_src, x_dst, nbr, elen, mask):
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

    def fp(c):
        xs = x_src.at[0, 0].add(c * 1e-20)
        return apply_period_conv_pallas(
            params, xs, x_dst, nbr, elen, mask, **kw
        ).sum() * 1e-20 + c

    t_x = profiling.slope_time(fx)
    t_p = profiling.slope_time(fp)
    nd, k = nbr.shape
    mxu = kernel_mxu_flops(nd, k, G * C)
    return {
        "case": name,
        "xla_fp32_us": round(t_x * 1e6, 1),
        "pallas_bf16_us": round(t_p * 1e6, 1),
        "speedup": round(t_x / t_p, 2),
        "rel_err_max": round(float(err.max()) / scale, 4),
        "rel_err_mean": round(float(err.mean()) / scale, 6),
        "kernel_mxu_tflops": round(mxu / t_p / 1e12, 1),
        "mxu_bf16_peak_fraction": round(mxu / t_p / BF16_PEAK, 3),
    }


def main():
    out = {"device": str(jax.devices()[0])}
    cases = []
    for label, (ng, nj) in (("40um_scale", (128, 256)), ("120um_scale", (1024, 2048))):
        s = _synthetic_sample(ng=ng, nj=nj, seed=3)
        p_pull = period_conv.init_period_conv(
            jax.random.PRNGKey(2), schema.JOINT_DIM, schema.GRAIN_DIM, C, G
        )
        cases.append(bench_case(
            f"{label}_pull_K16", p_pull, s.joint_x, s.grain_x,
            s.pull_nbr, s.pull_len, s.pull_mask,
        ))
        p_conn = period_conv.init_period_conv(
            jax.random.PRNGKey(3), schema.JOINT_DIM, schema.JOINT_DIM, C, G
        )
        cases.append(bench_case(
            f"{label}_connect_K3", p_conn, s.joint_x, s.joint_x,
            s.connect_nbr, s.connect_len, s.connect_mask,
        ))
    out["cases"] = cases
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/kernels_tpu.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
