"""Micro-breakdown of the ELL-rebuild ('sample') stage at the 120 um scale.

The round-3 STEP_BREAKDOWN shows rebuild at 1.3-1.45 ms per step at BOTH
scales — nearly scale-independent, i.e. dispatch/fusion-bound, not
arithmetic-bound. This script times each sub-piece of make_sample (and the
finalize-stage centers build) inside a jitted lax.scan with a data
dependency between iterations, so per-program launch overhead is amortized
and XLA cannot constant-fold the inputs — the numbers reflect in-scan cost,
the regime the rollout actually runs in (VERDICT round-3 item 1).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import _real_state  # noqa: E402
from graingraphnn_tpu.graph import schema  # noqa: E402
from graingraphnn_tpu.rollout import device_rollout as dr  # noqa: E402
from graingraphnn_tpu.rollout import topology_jit as tj  # noqa: E402

REPS = 200


def scan_time(make_body, init, reps=REPS):
    """Time a jitted lax.scan of `reps` body iterations; the body must
    thread a carry so iterations cannot be collapsed. Returns ms/iter net
    of the empty-scan floor."""

    @jax.jit
    def run(carry):
        def body(c, _):
            return make_body(c), None

        c, _ = jax.lax.scan(body, carry, None, length=reps)
        return c

    out = run(init)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = run(init)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / reps * 1e3


def main():
    st = _real_state(120)
    NG, NJ = st.xg.shape[0], st.xj.shape[0]
    EQ = st.E_pq.shape[1]
    EP = st.E_pp.shape[1]
    print(f"NG={NG} NJ={NJ} EQ={EQ} EP={EP}")
    ring = tj.RING_MAX

    # per-iteration perturbation: flip nothing real, but depend on the carry
    def dep(x, v):
        return x + (v & 0)  # int carry dep, compiles to cheap add-zero

    floor = scan_time(lambda c: c + 1, jnp.zeros((8, 128), jnp.int32))
    print(f"empty-scan floor: {floor:.4f} ms/iter")

    def mk(builder, *shape_args):
        def body(carry):
            E0, E1, acc = carry
            pq_len = dr._coo_lengths(st.xj[:, :2], st.xg[:, :2], E0, E1)
            nbr, ln, msk, ov = builder(E0, E1, pq_len, *shape_args)
            acc = acc + nbr[0, 0]
            return dep(E0, acc), dep(E1, acc), acc

        return body

    init_q = (st.E_pq[0], st.E_pq[1], jnp.int32(0))
    rows = {}
    rows["pull_rank_crossbar_ms"] = scan_time(
        mk(dr.build_ell_rank, NG, ring), init_q)
    rows["pull_sorted_ms"] = scan_time(mk(dr.build_ell_sorted, NG, ring),
                                       init_q)
    rows["push_deg3_ms"] = scan_time(
        mk(lambda s, d, a, n, k: dr.build_ell_deg3(d, s, a, n, k),
           NJ, schema.JG_DEGREE), init_q)

    init_p = (st.E_pp[0], st.E_pp[1], jnp.int32(0))
    rows["connect_deg3_ms"] = scan_time(
        mk(dr.build_ell_deg3, NJ, schema.JJ_DEGREE), init_p)

    def lengths_body(carry):
        E0, E1, acc = carry
        pq_len = dr._coo_lengths(st.xj[:, :2], st.xg[:, :2], E0, E1)
        acc = acc + pq_len[0].astype(jnp.int32)
        return dep(E0, acc), dep(E1, acc), acc

    rows["lengths_only_ms"] = scan_time(lengths_body, init_q)

    def sample_body(carry):
        s, acc = carry
        sample, ov = dr.make_sample(s, ring)
        acc = acc + sample.pull_nbr[0, 0]
        s = s._replace(E_pq=dep(s.E_pq, acc))
        return s, acc

    rows["make_sample_ms"] = scan_time(sample_body, (st, jnp.int32(0)))

    def centers_body(carry):
        s, acc = carry
        xg = dr.centers_stage(s.xg, s.xj, s.E_pq, ring)
        acc = acc + xg[0, 0].astype(jnp.int32)
        s = s._replace(E_pq=dep(s.E_pq, acc))
        return s, acc

    rows["centers_stage_ms"] = scan_time(centers_body, (st, jnp.int32(0)))

    def compact_body(carry):
        s, acc = carry
        E_pp, n = dr.compact_stage(s.E_pp)
        acc = acc + n
        s = s._replace(E_pp=dep(E_pp, acc))
        return s, acc

    rows["compact_stage_ms"] = scan_time(compact_body, (st, jnp.int32(0)))

    rows = {k: round(v - (0 if k.endswith("floor") else 0), 4)
            for k, v in rows.items()}
    rows["empty_scan_floor_ms"] = round(floor, 4)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
