"""Benchmark: training-step throughput (edges/s) of the flagship GrainNN
regressor on the current accelerator.

Baseline: the reference's only wall-clock training number — regressor0
trained 38,461 samples x 50 epochs (batch 4) in 33,573 s on one GPU
(model/regressor0_logfile), i.e. ~57.3 samples/s over ~2052 message-passing
edges per sample ≈ 1.18e5 edges/s including the backward pass.

Methodology: one jitted lax.scan of TRAIN_STEPS full train steps (forward +
backward + Adam) over a batch-4 stack of training-patch-sized graphs (118
grains / 236 joints / 708 edges per edge type, matching the reference's
training distribution), so dispatch latency amortizes as it would in a real
input pipeline. Prints ONE JSON line.
"""

import json
import time

import numpy as np

REFERENCE_EDGES_PER_S = 38461 * 50 * 3 * 684 / 33573.0  # ≈ 117.5k edges/s


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _synthetic_sample
    from graingraphnn_tpu.graph import state
    from graingraphnn_tpu.models import grain_nn, hyper
    from graingraphnn_tpu.train import trainer

    BATCH = 4
    TRAIN_STEPS = 50
    ng, nj = 118, 236

    samples = [
        _synthetic_sample(ng=ng, nj=nj, seed=i, with_targets=True)
        for i in range(BATCH)
    ]
    batch = state.stack(samples)
    edges_per_sample = int(
        np.asarray(batch.push_mask).sum()
        + np.asarray(batch.pull_mask).sum()
        + np.asarray(batch.connect_mask).sum()
    ) // BATCH

    hp = hyper.regressor(0)  # shipped config: hidden 96, batch 4
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

    # compile + warmup
    p, o, losses = many_steps(params, opt_state, batch)
    jax.block_until_ready(losses)

    t0 = time.perf_counter()
    p, o, losses = many_steps(p, o, batch)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0

    steps_per_s = TRAIN_STEPS / dt
    edges_per_s = steps_per_s * BATCH * edges_per_sample
    print(
        json.dumps(
            {
                "metric": "train_step_edges_per_s",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / REFERENCE_EDGES_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
