"""Stacked-vmap batched rollout with the fused editor: per-lane parity vs
single-lane scans at identical capacities, plus timing vs the packed
block-diagonal path. vmap of the single-launch Pallas editor = a grid
dimension (B kernel instances with single-lane budgets), avoiding the
packed path's ~B^2 editor blowup."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import numpy as np  # noqa: E402

import bench  # noqa: E402
from graingraphnn_tpu.rollout import device_rollout as dr  # noqa: E402
from graingraphnn_tpu.train import checkpoint  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LXD = int(sys.argv[2]) if len(sys.argv) > 2 else 120
N_STEPS = 20
PARITY_LANES = (0, 3)

params_r, hp_r, _ = checkpoint.load("artifacts/40um/regressor0")
params_c, hp_c, _ = checkpoint.load("artifacts/40um/classifier1")
states = [bench._real_state(LXD, seed=5 + i) for i in range(B)]
st = dr.stack_states(states)
print(f"stacked B={B} lxd={LXD}: NG={st.xg.shape[1]} NJ={st.xj.shape[1]} "
      f"EP={st.E_pp.shape[2]}", flush=True)

run_b = dr.make_rollout_scan_batched(
    params_r, hp_r, params_c, hp_c, n_steps=N_STEPS, c_threshold=0.99,
    fused_editor=True,
)
st2, aux = run_b(st)
bench._check_capacity(aux)
dt = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    st2, aux = run_b(st)
    np.asarray(aux["message_edges"])
    dt = min(dt, time.perf_counter() - t0)
edges = float(np.asarray(aux["message_edges"]).sum())
print(f"vmap+fused: {dt / N_STEPS * 1e3:.3f} ms/step, "
      f"{edges / dt:,.0f} edges/s", flush=True)

# per-lane parity: single-lane scan over the SAME padded capacities
run_1 = dr.make_rollout_scan(
    params_r, hp_r, params_c, hp_c, n_steps=N_STEPS, c_threshold=0.99,
    fused_editor=True,
)
for lane in PARITY_LANES:
    lane_st = dr.DeviceRolloutState(
        *(jax.tree_util.tree_map(lambda a: a[lane], tuple(st))))
    s1, _aux1 = run_1(lane_st)
    for name in ("E_pp", "E_pq", "mask_g", "mask_j", "n_pp"):
        a = np.asarray(getattr(s1, name))
        b = np.asarray(getattr(st2, name))[lane]
        assert np.array_equal(a, b), f"lane {lane}: {name} mismatch"
    for name in ("xg", "xj"):
        a = np.asarray(getattr(s1, name))
        b = np.asarray(getattr(st2, name))[lane]
        np.testing.assert_allclose(a, b, atol=1e-5,
                                   err_msg=f"lane {lane}: {name}")
    print(f"lane {lane} parity ok", flush=True)
print("BATCHED VMAP+FUSED PARITY OK", flush=True)
