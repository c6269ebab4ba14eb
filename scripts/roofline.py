"""Roofline measurement of the fused conv and the full forward on the
current accelerator (scan-amortized)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from graingraphnn_tpu.graph import schema
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.ops import period_conv
from graingraphnn_tpu.utils import profiling
from __graft_entry__ import _synthetic_sample

N_SCAN = 50


def scan_wrap(f, args):
    @jax.jit
    def g(*a):
        def body(c, _):
            o = f(*a)
            return c + jax.tree_util.tree_leaves(o)[0].sum() * 1e-20, None
        r, _ = jax.lax.scan(body, 0.0, None, length=N_SCAN)
        return r
    import time
    jax.block_until_ready(g(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(g(*args))
    return (time.perf_counter() - t0) / N_SCAN


def main():
    out = {}
    G, C = 4, 96

    # single conv at 120um-class scale
    ng, nj = 1024, 2048
    s = _synthetic_sample(ng=ng, nj=nj, seed=3)
    params = period_conv.init_period_conv(
        jax.random.PRNGKey(2), schema.JOINT_DIM, schema.GRAIN_DIM, C, G
    )
    t = scan_wrap(
        lambda: period_conv.apply_period_conv(
            params, s.joint_x, s.grain_x, s.pull_nbr, s.pull_len, s.pull_mask,
            num_gates=G, out_channels=C,
        ),
        (),
    )
    cost = profiling.conv_cost(nj, ng, schema.DEFAULT_GRAIN_RING,
                               schema.JOINT_DIM, schema.GRAIN_DIM, G, C)
    out["conv_pull_1024g"] = {
        "time_us": round(t * 1e6, 1),
        **{k: round(v, 4) for k, v in profiling.roofline(t, **{
            "flops": cost["flops"], "bytes_": cost["bytes"]}).items()
           if isinstance(v, float)},
    }

    # full forward at the same scale
    hp = hyper.regressor(0)
    rp = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    t = scan_wrap(lambda: grain_nn.apply_regressor(rp, hp, s), ())
    cost = profiling.model_forward_cost(
        ng, nj, schema.DEFAULT_GRAIN_RING, schema.GRAIN_DIM, schema.JOINT_DIM, C
    )
    out["regressor_fwd_1024g"] = {
        "time_us": round(t * 1e6, 1),
        **{k: round(v, 4) for k, v in profiling.roofline(t, **{
            "flops": cost["flops"], "bytes_": cost["bytes"]}).items()
           if isinstance(v, float)},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
