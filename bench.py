"""Benchmark — prints ONE JSON line.

Headline: **device-resident rollout throughput** (edges/s/chip), the literal
BASELINE.json metric. A fully-jitted lax.scan of rollout spans
(rollout.device_rollout: forward + feature integration + jit topology editor
+ device ELL rebuild, zero host transfers) over a real Voronoi
microstructure at the 120 um paper scale (~1043 grains / 2086 joints), with
the shipped trained checkpoints (artifacts/40um) and the reference's
thresholds (test.py:187-188).

Baseline: the reference's own rollout driver (/root/reference/test.py, torch)
run on this machine's CPU — the only hardware both frameworks share — on its
headline 40 um seed10020 case: 16.89 s inference loop for 21 spans x ~2124
live message edges ≈ 2,640 edges/s (measured via scripts/ab_rollout.py;
artifacts/ab). The reference publishes no rollout throughput of its own.

Also reported (extra keys in the same line): the same-case 40 um rollout
rate, and the training-step throughput vs the reference's logged training
rate (regressor0_logfile: 38,461 samples x 50 epochs, batch 4, 33,573 s on
one GPU ≈ 117.5k edges/s including backward).
"""

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: the batched-rollout scan alone costs
# minutes of compile time; cache hits make reruns (and the driver's bench
# invocation) measure compute, not compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REFERENCE_TRAIN_EDGES_PER_S = 38461 * 50 * 3 * 684 / 33573.0  # ≈ 117.5k
REFERENCE_ROLLOUT_EDGES_PER_S = 21 * 2124 / 16.89             # ≈ 2,640


def _real_state(lxd: int, seed: int = 5):
    """Real Voronoi microstructure (generate mode, periodic BC) packed into
    a device rollout state, with the patch rescale applied for domains
    larger than the 40 um training patch (test.py:29-55,310-312) — the
    physically-correct inference configuration. Round 2's bench skipped the
    rescale at 120 um, which pushed the features out of distribution and
    saturated the editor's event budgets every step."""
    from graingraphnn_tpu.data import extraction, heterograph
    from graingraphnn_tpu.rollout import device_driver as dd

    traj = extraction.TrajectoryExtractor(
        lxd=lxd, seed=seed, frames=121, bc="periodic",
        physical_params={"G": 1.904, "R": 0.558},  # the training seed's
        # thermal conditions: inference inside the training hull, the
        # regime the model is calibrated for (out-of-hull G,R saturates
        # the event budgets — artifacts/CALIBRATION_120um.json)
    )
    traj.area_counts = dict(zip(*np.unique(traj.alpha_field, return_counts=True)))
    traj.area_traj.append(dict(traj.area_counts))
    traj.states.append(heterograph.tensorize(traj, 0))
    hg0 = extraction.make_test_sample(traj, span=6)
    st, _offset, _factor = dd.init_scaled_state(hg0, traj)
    return st


def _check_capacity(aux):
    """Abort rather than report throughput on a corrupted graph: a tripped
    ring/append-capacity flag means edges were silently dropped inside the
    scan (device_rollout.build_ell_sorted / topology_jit appends)."""
    for flag in ("ring_overflow", "pp_overflow"):
        hits = np.asarray(aux[flag])
        if bool(hits.any()):
            step = int(np.argmax(hits))
            raise RuntimeError(
                f"rollout capacity bust: {flag} at scan step {step} — "
                "raise `ring`/`pp_cap` instead of benchmarking a corrupted "
                "graph"
            )


def bench_rollout(lxd: int, n_steps: int = 20, pallas: bool = False,
                  fused_editor: bool = True):
    import jax

    from graingraphnn_tpu.rollout import device_rollout as dr
    from graingraphnn_tpu.train import checkpoint

    params_r, hp_r, _ = checkpoint.load("artifacts/40um/regressor0")
    params_c, hp_c, _ = checkpoint.load("artifacts/40um/classifier1")
    st = _real_state(lxd)
    run = dr.make_rollout_scan(
        params_r, hp_r, params_c, hp_c, n_steps=n_steps, c_threshold=0.99,
        pallas=pallas, fused_editor=fused_editor,
    )
    # warmup includes the aux device->host pull: the tunneled TPU pays a
    # large one-time cost on a program's first D2H
    st2, aux = run(st)
    _check_capacity(aux)
    edges = float(np.asarray(aux["message_edges"]).sum())
    dt = float("inf")
    # min-of-5: the tunneled device's per-sync round trip varies by
    # session (~+-10% on a 20-step window); more draws tighten the floor
    for _ in range(5):
        t0 = time.perf_counter()
        st2, aux = run(st)
        np.asarray(aux["message_edges"])  # forces completion
        dt = min(dt, time.perf_counter() - t0)
    return edges / dt, dt / n_steps * 1e3


def bench_rollout_batched(lxd: int, B: int = 8, n_steps: int = 20,
                          pallas=False, packed_forward: bool = False):
    """B independent rollouts advanced together by one vmapped fused step
    over stacked lanes — one launch evaluates a whole G,R grid of seeds
    (the reference runs them serially, plots/test_grid.py). vmap of the
    fused editor = a Pallas grid dimension at single-lane budgets; the
    packed block-diagonal alternative scales editor chains AND vector
    widths by B (~B^2 editor cost: 140 vs 81 ms/step at 8x120um,
    scripts/{packed,batched}_fused_check.py). A v5e core runs lanes
    sequentially, so this is a capacity/latency feature, not a
    throughput multiplier — the single-graph scan remains the headline."""
    from graingraphnn_tpu.rollout import device_rollout as dr
    from graingraphnn_tpu.train import checkpoint

    params_r, hp_r, _ = checkpoint.load("artifacts/40um/regressor0")
    params_c, hp_c, _ = checkpoint.load("artifacts/40um/classifier1")
    states = [_real_state(lxd, seed=5 + i) for i in range(B)]
    st = dr.stack_states(states)
    run = dr.make_rollout_scan_batched(
        params_r, hp_r, params_c, hp_c, n_steps=n_steps, c_threshold=0.99,
        pallas=pallas, fused_editor=True, packed_forward=packed_forward,
    )
    st2, aux = run(st)
    _check_capacity(aux)
    edges = float(np.asarray(aux["message_edges"]).sum())
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        st2, aux = run(st)
        np.asarray(aux["message_edges"])
        dt = min(dt, time.perf_counter() - t0)
    return edges / dt, dt / n_steps * 1e3


def _real_train_batch(batch_size: int, lxd: int = 40):
    """Training batch over real Voronoi microstructures (generate mode) at
    the 40 um training-patch scale — the real degree/edge-length
    distribution, not a synthetic ring. Targets are random (they change the
    loss value, not the step cost)."""
    from graingraphnn_tpu.data import extraction, heterograph
    from graingraphnn_tpu.graph import schema, state

    rng = np.random.default_rng(0)
    raws = []
    for seed in range(1, batch_size + 1):
        traj = extraction.TrajectoryExtractor(
            lxd=lxd, seed=seed, frames=121, bc="periodic",
            physical_params={"G": 4.0, "R": 1.0},
        )
        traj.area_counts = dict(
            zip(*np.unique(traj.alpha_field, return_counts=True))
        )
        traj.area_traj.append(dict(traj.area_counts))
        traj.states.append(heterograph.tensorize(traj, 0))
        raws.append(extraction.make_test_sample(traj, span=6))
    caps = [
        (
            r.feature_dicts["grain"].shape[0],
            r.feature_dicts["joint"].shape[0],
            int((r.edge_index_dicts[schema.EDGE_TYPES[2]][0] > -1).sum()),
        )
        for r in raws
    ]
    ng = state.round_up(max(c[0] for c in caps), 8)
    nj = state.round_up(max(c[1] for c in caps), 8)
    ne = state.round_up(max(c[2] for c in caps), 8)
    samples = []
    for r, cap in zip(raws, caps):
        # label arrays must align with the LIVE-compacted edge list that
        # build_sample produces (sentinel columns dropped before padding)
        n_jj = cap[2]
        targets = {
            "grain": rng.uniform(-0.9, 0.9,
                                 (r.feature_dicts["grain"].shape[0], 2)
                                 ).astype(np.float32),
            "joint": rng.uniform(-0.9, 0.9,
                                 (r.feature_dicts["joint"].shape[0], 2)
                                 ).astype(np.float32),
            "grain_event": (
                rng.uniform(size=r.feature_dicts["grain"].shape[0]) < 0.1
            ).astype(np.float32),
            "edge_event": rng.choice(
                [-100.0, 0.0, 1.0], size=n_jj, p=[0.1, 0.8, 0.1]
            ).astype(np.float32),
        }
        samples.append(
            state.build_sample(
                r.feature_dicts, r.edge_index_dicts, r.edge_weight_dicts,
                {"grain": r.mask["grain"], "joint": r.mask["joint"]},
                targets, grain_cap=ng, joint_cap=nj, jj_edge_cap=ne,
            )
        )
    return state.stack(samples)


def bench_train():
    import jax
    import optax

    from graingraphnn_tpu.graph import state
    from graingraphnn_tpu.models import grain_nn, hyper
    from graingraphnn_tpu.train import trainer

    BATCH, TRAIN_STEPS = 4, 50
    batch = _real_train_batch(BATCH)
    edges_per_sample = int(
        np.asarray(batch.push_mask).sum()
        + np.asarray(batch.pull_mask).sum()
        + np.asarray(batch.connect_mask).sum()
    ) // BATCH

    hp = hyper.regressor(0)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    tx = optax.adam(hp.lr)
    opt_state = tx.init(params)
    loss_fn = trainer.make_loss_fn(hp)

    @jax.jit
    def many_steps(params, opt_state, batch):
        def body(carry, _):
            p, o = carry
            lval, grads = jax.value_and_grad(loss_fn)(p, batch)
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), lval

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=TRAIN_STEPS
        )
        return params, opt_state, losses

    p, o, losses = many_steps(params, opt_state, batch)
    _ = float(np.asarray(losses).sum())
    t0 = time.perf_counter()
    p, o, losses = many_steps(p, o, batch)
    _ = float(np.asarray(losses).sum())
    dt = time.perf_counter() - t0
    return TRAIN_STEPS / dt * BATCH * edges_per_sample


def main():
    # All rollout rows run the fused single-launch Pallas editor
    # (kernels/editor_pallas): BIT-IDENTICAL edits to the HLO editor
    # (tests/test_editor_fused.py, scripts/packed_fused_check.py), ~2x
    # end-to-end — no numerics tradeoff, so it headlines.
    # Forward stays fp32 XLA: the bf16 Pallas conv wins 1.3-1.7x per conv
    # but bf16 noise flips threshold-adjacent events (event Jaccard
    # 0.95-0.98 across 5 cases, artifacts/pallas_rollout_ab.json) — all
    # QoI-bearing numbers keep the fp32 forward.
    rollout_120, ms_120 = bench_rollout(120, pallas=False)
    rollout_120_pl, ms_120_pl = bench_rollout(120, pallas=True)
    rollout_40, ms_40 = bench_rollout(40, pallas=False)
    batched_eps, batched_ms = bench_rollout_batched(120, B=8)
    # hybrid (round 4, VERDICT r3 task 4): packed forward over all lanes
    # through the fused Pallas conv at f32 operands + per-lane vmapped
    # fused editor — the first batched config to EXCEED the single-lane
    # rate (throughput multiplier, not just capacity)
    hybrid_eps, hybrid_ms = bench_rollout_batched(
        120, B=8, pallas="fp32", packed_forward=True)
    train_eps = bench_train()
    row = {
        "metric": "rollout_edges_per_s_per_chip",
        "value": round(rollout_120, 1),
        "unit": "edges/s",
        "vs_baseline": round(rollout_120 / REFERENCE_ROLLOUT_EDGES_PER_S, 1),
        "rollout_ms_per_step_120um": round(ms_120, 2),
        "rollout_kernel": "fp32 XLA forward + fused Pallas editor "
                          "(bit-identical edits; QoI-parity)",
        "rollout_120um_bf16_pallas_fwd_edges_per_s": round(
            rollout_120_pl, 1),
        # legacy alias for round-over-round consumers (pre-round-3 key;
        # same series: bf16 Pallas-forward rollout rate at 120 um)
        "rollout_120um_pallas_edges_per_s": round(rollout_120_pl, 1),
        "rollout_ms_per_step_120um_bf16_pallas_fwd": round(ms_120_pl, 2),
        "rollout_40um_edges_per_s": round(rollout_40, 1),
        "rollout_40um_vs_baseline": round(
            rollout_40 / REFERENCE_ROLLOUT_EDGES_PER_S, 1
        ),
        "rollout_batched_8x120um_edges_per_s": round(batched_eps, 1),
        "rollout_batched_ms_per_step": round(batched_ms, 2),
        "rollout_hybrid_8x120um_edges_per_s": round(hybrid_eps, 1),
        "rollout_hybrid_ms_per_step": round(hybrid_ms, 2),
        "rollout_hybrid_config": "packed forward (one flat 8-lane node "
                                 "table through the fused Pallas conv, f32 "
                                 "operands) + per-lane vmapped fused "
                                 "editor",
        "train_edges_per_s": round(train_eps, 1),
        "train_vs_baseline": round(
            train_eps / REFERENCE_TRAIN_EDGES_PER_S, 3
        ),
    }
    # the number of record for README/STATUS quotes: scripts/
    # check_readme_numbers.py (run in the test suite) diffs the docs
    # against this artifact, ending the round-over-round quote drift
    try:
        with open("artifacts/BENCH_LOCAL.json", "w") as f:
            json.dump(row, f, indent=1)
    except OSError:
        pass
    print(json.dumps(row))


if __name__ == "__main__":
    main()
