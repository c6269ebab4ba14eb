"""Single-launch topology editor: kernels/editor_core.py as one Pallas TPU
kernel, with the whole graph state resident in VMEM for the duration of the
update (reference semantics: models.py:614-845).

The HLO editor (rollout/topology_jit.update_jit) spends its wall-clock on
per-op dispatch — hundreds of tiny gathers/scatters inside lax.while_loop
chains. Here the identical algorithm (editor_core) lowers to ONE kernel:
E_pp/E_pq/positions/masks are loaded into VMEM once, every event step is a
handful of straight-line VPU ops, and the state is stored back once.

`update_fused(..., use_pallas=False)` runs the same core as plain XLA — the
path the CPU oracle tests exercise (tests/test_editor_fused.py asserts
equality against topology_jit.update_jit on real rollout traces).

Scope: the nucleation-free editor pass, static or moving melt pool (the
active-window masks ride state.active_j / the active_g argument, round 5;
nucleation stays on topology_jit.nucleate_jit, run after this editor).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..rollout import topology_jit as tj
from . import editor_core as ec


def _kernel(ptr_ref, thr_ref, pp_ref, pq_ref, posx_ref, posy_ref, gx_ref,
            gy_ref, yjx_ref, yjy_ref, mg_ref, mj_ref, yg0_ref, prob_ref,
            ge_ref, aj_ref, ag_ref,
            pp_o, pq_o, posx_o, posy_o, gx_o, gy_o, yjx_o, yjy_o, mg_o,
            mj_o, ptr_o, sw0_o, sw1_o, extra_o,
            *, num_grains: int, max_switch: int):
    st, sw0, sw1, extra = ec.editor_core(
        pp_ref[0:1, :], pp_ref[1:2, :], pq_ref[0:1, :], pq_ref[1:2, :],
        posx_ref[:], posy_ref[:], gx_ref[:], gy_ref[:],
        yjx_ref[:], yjy_ref[:], mg_ref[:], mj_ref[:],
        ptr_ref[0, 0], yg0_ref[:], prob_ref[:], ge_ref[:],
        thr_ref[0, 0], num_grains, max_switch,
        aj=aj_ref[:], ag=ag_ref[:],
    )
    (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr) = st
    pp_o[0:1, :] = pp0
    pp_o[1:2, :] = pp1
    pq_o[0:1, :] = pq0
    pq_o[1:2, :] = pq1
    posx_o[:] = posx
    posy_o[:] = posy
    gx_o[:] = gx
    gy_o[:] = gy
    yjx_o[:] = yjx
    yjy_o[:] = yjy
    mg_o[:] = mg
    mj_o[:] = mj
    ptr_o[0, 0] = ptr
    sw0_o[:] = sw0
    sw1_o[:] = sw1
    extra_o[:] = extra


@partial(jax.jit, static_argnames=("num_grains", "max_switch", "use_pallas",
                                   "interpret"))
def update_fused(
    state: tj.TopoState,
    edge_logits: jnp.ndarray,    # [EP] (slack columns padded with -inf)
    grain_events: jnp.ndarray,   # [GE] grain ids sorted by area asc, -1 pad
    y_grain: jnp.ndarray,        # [NG, 2] regressor grain outputs
    threshold: float,
    num_grains: int,
    max_switch: int = tj.MAX_SWITCH,
    use_pallas: bool = True,
    interpret: bool = False,
    active_g: jnp.ndarray | None = None,   # [NG] bool meltpool window
):
    """Drop-in counterpart of topology_jit.update_jit on its flagship scope
    (+ meltpool active windows: state.active_j / active_g, round 5).
    Returns (state, switching [max_switch, 2], extra [max_extra])."""
    assert state.q_ptr is None, "nucleation slack: use topology_jit"
    EP = state.E_pp.shape[1]
    GE = grain_events.shape[0]
    MS = max_switch
    MX = 2 * GE * (ec.RING + 1) + 2 * MS

    prob = jax.nn.sigmoid(edge_logits)[None, :]
    xj = state.xj
    args = dict(
        pp=state.E_pp.astype(jnp.int32),
        pq=state.E_pq.astype(jnp.int32),
        posx=xj[:, 0][None, :], posy=xj[:, 1][None, :],
        gx=xj[:, 6][None, :], gy=xj[:, 7][None, :],
        yjx=state.y_joint[:, 0][None, :], yjy=state.y_joint[:, 1][None, :],
        mg=state.mask_g.astype(jnp.int32)[None, :],
        mj=state.mask_j.astype(jnp.int32)[None, :],
        yg0=y_grain[:, 0][None, :], prob=prob,
        ge=grain_events.astype(jnp.int32)[None, :],
        aj=(jnp.ones((1, xj.shape[0]), jnp.int32)
            if state.active_j is None
            else state.active_j.astype(jnp.int32)[None, :]),
        ag=(jnp.ones((1, state.mask_g.shape[0]), jnp.int32)
            if active_g is None
            else active_g.astype(jnp.int32)[None, :]),
    )

    if use_pallas:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        NJ = xj.shape[0]
        NGr = args["mg"].shape[1]
        f32, i32 = jnp.float32, jnp.int32
        out_shape = [
            jax.ShapeDtypeStruct((2, EP), i32),    # pp
            jax.ShapeDtypeStruct((2, state.E_pq.shape[1]), i32),  # pq
            jax.ShapeDtypeStruct((1, NJ), f32),    # posx
            jax.ShapeDtypeStruct((1, NJ), f32),    # posy
            jax.ShapeDtypeStruct((1, NJ), f32),    # gx
            jax.ShapeDtypeStruct((1, NJ), f32),    # gy
            jax.ShapeDtypeStruct((1, NJ), f32),    # yjx
            jax.ShapeDtypeStruct((1, NJ), f32),    # yjy
            jax.ShapeDtypeStruct((1, NGr), i32),   # mg
            jax.ShapeDtypeStruct((1, NJ), i32),    # mj
            jax.ShapeDtypeStruct((1, 1), i32),     # ptr
            jax.ShapeDtypeStruct((MS, 1), i32),    # sw0
            jax.ShapeDtypeStruct((MS, 1), i32),    # sw1
            jax.ShapeDtypeStruct((1, MX), i32),    # extra
        ]
        vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        outs = pl.pallas_call(
            partial(_kernel, num_grains=num_grains, max_switch=MS),
            out_shape=out_shape,
            in_specs=[smem, smem] + [vmem] * 15,
            out_specs=[vmem] * 10 + [smem] + [vmem] * 3,
            interpret=interpret,
            # the whole graph state lives in VMEM for the kernel's duration;
            # at packed-batch scales (B lanes concatenated) the footprint
            # passes the 16M default scoped limit — v5e has 128MiB physical
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(
            jnp.asarray(state.append_ptr, jnp.int32).reshape(1, 1),
            jnp.asarray(threshold, jnp.float32).reshape(1, 1),
            args["pp"], args["pq"], args["posx"], args["posy"],
            args["gx"], args["gy"], args["yjx"], args["yjy"],
            args["mg"], args["mj"], args["yg0"], args["prob"], args["ge"],
            args["aj"], args["ag"],
        )
        (pp, pq, posx, posy, gx, gy, yjx, yjy, mg, mj, ptr_o, sw0, sw1,
         extra) = outs
        ptr = ptr_o[0, 0]
    else:
        st, sw0, sw1, extra = ec.editor_core(
            args["pp"][0:1, :], args["pp"][1:2, :],
            args["pq"][0:1, :], args["pq"][1:2, :],
            args["posx"], args["posy"], args["gx"], args["gy"],
            args["yjx"], args["yjy"], args["mg"], args["mj"],
            jnp.asarray(state.append_ptr, jnp.int32),
            args["yg0"], args["prob"], args["ge"],
            jnp.asarray(threshold, jnp.float32), num_grains, MS,
            aj=args["aj"], ag=args["ag"],
        )
        (pp0, pp1, pq0, pq1, posx, posy, gx, gy, yjx, yjy, mg, mj,
         ptr) = st
        pp = jnp.concatenate([pp0, pp1], axis=0)
        pq = jnp.concatenate([pq0, pq1], axis=0)

    xj = (xj.at[:, 0].set(posx[0])
            .at[:, 1].set(posy[0])
            .at[:, 6].set(gx[0])
            .at[:, 7].set(gy[0]))
    y_joint = jnp.stack([yjx[0], yjy[0]], axis=1)
    new_state = state._replace(
        E_pp=pp, E_pq=pq, xj=xj, y_joint=y_joint,
        mask_g=mg[0].astype(state.mask_g.dtype),
        mask_j=mj[0].astype(state.mask_j.dtype),
        append_ptr=jnp.asarray(ptr, state.append_ptr.dtype),
    )
    switching = jnp.concatenate([sw0, sw1], axis=1)
    return new_state, switching, extra[0]
