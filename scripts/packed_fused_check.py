"""Packed-batch (B lanes, budgets x B) parity + timing: fused editor vs HLO
editor on TPU. Resumes the round-3 check the fused-editor session left
pending: the fused core's fixed-trip loops must behave identically when the
per-step budgets scale with B."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from graingraphnn_tpu.rollout import device_rollout as dr  # noqa: E402
from graingraphnn_tpu.rollout import topology_jit as tj  # noqa: E402
from graingraphnn_tpu.train import checkpoint  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LXD = int(sys.argv[2]) if len(sys.argv) > 2 else 40
N_STEPS = 20

params_r, hp_r, _ = checkpoint.load("artifacts/40um/regressor0")
params_c, hp_c, _ = checkpoint.load("artifacts/40um/classifier1")
states = [bench._real_state(LXD, seed=5 + i) for i in range(B)]
st = dr.pack_states(states)
print(f"packed B={B} lxd={LXD}: NG={st.xg.shape[0]} NJ={st.xj.shape[0]} "
      f"EP={st.E_pp.shape[1]}", flush=True)

results = {}
for fused in (False, True):
    run = dr.make_rollout_scan(
        params_r, hp_r, params_c, hp_c, n_steps=N_STEPS, c_threshold=0.99,
        max_elim=tj.MAX_ELIM * B, max_switch=tj.MAX_SWITCH * B,
        fused_editor=fused,
    )
    st2, aux = run(st)
    bench._check_capacity(aux)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        st2, aux = run(st)
        np.asarray(aux["message_edges"])
        dt = min(dt, time.perf_counter() - t0)
    edges = float(np.asarray(aux["message_edges"]).sum())
    results[fused] = (st2, edges / dt, dt / N_STEPS * 1e3)
    print(f"fused={fused}: {dt / N_STEPS * 1e3:.3f} ms/step, "
          f"{edges / dt:,.0f} edges/s", flush=True)

s_a, s_b = results[False][0], results[True][0]
for name in ("E_pp", "E_pq", "mask_g", "mask_j", "n_pp"):
    a, b = np.asarray(getattr(s_a, name)), np.asarray(getattr(s_b, name))
    assert np.array_equal(a, b), f"{name} mismatch"
for name in ("xg", "xj"):
    a, b = np.asarray(getattr(s_a, name)), np.asarray(getattr(s_b, name))
    np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)
print(f"PACKED PARITY OK  speedup={results[False][2] / results[True][2]:.2f}x",
      flush=True)
