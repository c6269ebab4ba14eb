"""Cross-implementation rollout A/B (VERDICT round-1 item 2).

Runs the REFERENCE rollout driver (/root/reference/test.py:353-577, on CPU
via tools/pygshim) and this framework's rollout engine with IDENTICAL
weights (exported through data/torch_bridge.py) and identical thresholds,
then compares per-layer pixel errors and event predictions step by step.

Usage:
    python scripts/ab_rollout.py [--seed 10020] [--c_threshold 0.6]

Outputs artifacts/ab/AB_REPORT.md + AB_seed<seed>.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def prepare(seed: int, workdir: str):
    truth = os.path.join(workdir, "truth")
    model = os.path.join(workdir, "model")
    run = os.path.join(workdir, "run")
    for d in (truth, model, run):
        os.makedirs(d, exist_ok=True)
    import glob
    import gzip

    for pkl in glob.glob(f"{REFERENCE}/graphs/40_40/seed{seed}_G*.pkl"):
        shutil.copy(pkl, truth)
    with gzip.open(f"{REFERENCE}/graphs/40_40/traj{seed}.pkl.gz", "rb") as f:
        data = f.read()
    with open(os.path.join(truth, f"traj{seed}.pkl"), "wb") as f:
        f.write(data)

    from graingraphnn_tpu.data import torch_bridge
    from graingraphnn_tpu.train import checkpoint

    for name in ("regressor0", "classifier1"):
        params, hp, _extra = checkpoint.load(f"{REPO}/artifacts/40um/{name}")
        torch_bridge.save_torch_checkpoint(f"{model}/{name}.pt", params, hp)
    return truth, model, run


def run_reference(seed: int, truth: str, model: str, run: str):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}/tools/pygshim:{REFERENCE}"
    env["MPLBACKEND"] = "Agg"
    proc = subprocess.run(
        [sys.executable, f"{REFERENCE}/test.py", "--device=cpu",
         f"--truth_dir={truth}/", f"--model_dir={model}/", f"--seed={seed}"],
        cwd=run, env=env, capture_output=True, text=True, timeout=1800,
    )
    log = proc.stdout + proc.stderr
    with open(os.path.join(run, "ref_rollout.log"), "w") as f:
        f.write(log)
    if proc.returncode != 0:
        raise RuntimeError(f"reference rollout failed:\n{log[-3000:]}")

    layer_errs = []
    with open(os.path.join(run, f"seed{seed}.txt")) as f:
        for line in f:
            h, e = line.split()
            layer_errs.append((float(h), float(e)))
    hits = [tuple(map(int, m)) for m in
            re.findall(r"grain events hit rate: (\d+)/(\d+)", log)]
    preds = [int(m) for m in
             re.findall(r"toal/true/false positives of grain events: (\d+)/", log)]
    ks = re.search(r"KS stats ([\d.]+)", log)
    return {
        "layer_errs": layer_errs,
        "events_tp": hits[-1][0] if hits else None,
        "events_truth": hits[-1][1] if hits else None,
        "events_pred": preds[-1] if preds else None,
        "events_per_step": hits,
        "KS": float(ks.group(1)) if ks else None,
    }


def run_ours(seed: int, c_threshold: float, cache_dir: str):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from graingraphnn_tpu.data import extraction
    from graingraphnn_tpu.rollout.engine import RolloutEngine
    from graingraphnn_tpu.train import checkpoint

    traj = extraction.TrajectoryExtractor(lxd=40, seed=seed, frames=121)
    traj.match_graph = False
    traj.extract(f"{REFERENCE}/rawdat_PF/40_40", cache_dir=cache_dir)
    hg0 = extraction.make_test_sample(traj, span=6)
    params_r, hp_r, _ = checkpoint.load(f"{REPO}/artifacts/40um/regressor0")
    params_c, hp_c, _ = checkpoint.load(f"{REPO}/artifacts/40um/classifier1")
    engine = RolloutEngine(
        params_r, hp_r, params_c, hp_c, c_threshold=c_threshold, seed=seed
    )
    res = engine.run(hg0, traj, span=6, compare=True)
    return {
        "layer_errs": [(float(h), float(e)) for h, e in res["layer_err_list"]],
        "events_tp": res["events_tp"],
        "events_truth": res["events_truth"],
        "events_pred": res["events_pred"],
        "KS": res.get("KS"),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=10020)
    ap.add_argument("--c_threshold", type=float, default=0.6,
                    help="reference test.py hardcodes 0.6 (test.py:188)")
    ap.add_argument("--workdir", type=str, default="/tmp/ab_rollout")
    args = ap.parse_args()

    truth, model, run = prepare(args.seed, args.workdir)
    print("running reference rollout (CPU, pygshim)...")
    ref = run_reference(args.seed, truth, model, run)
    print("running graingraphnn_tpu rollout...")
    ours = run_ours(args.seed, args.c_threshold,
                    os.path.join(args.workdir, "cache"))

    # align per-height error curves
    rows = []
    div_height = None
    ours_by_h = {round(h, 3): e for h, e in ours["layer_errs"]}
    for h, e_ref in ref["layer_errs"]:
        e_ours = ours_by_h.get(round(h, 3))
        d = None if e_ours is None else e_ours - e_ref
        rows.append((h, e_ref, e_ours, d))
        if div_height is None and d is not None and abs(d) > 0.05:
            div_height = h

    os.makedirs(f"{REPO}/artifacts/ab", exist_ok=True)
    report = {
        "seed": args.seed,
        "c_threshold": args.c_threshold,
        "reference": ref,
        "ours": ours,
        "divergence_height_gt_0.05": div_height,
    }
    with open(f"{REPO}/artifacts/ab/AB_seed{args.seed}.json", "w") as f:
        json.dump(report, f, indent=1)

    lines = [
        f"# Rollout A/B — seed {args.seed}, identical weights, "
        f"thresholds R=1e-4 C={args.c_threshold}",
        "",
        "Reference = /root/reference/test.py run on CPU (pygshim) with weights",
        "exported from artifacts/40um via data/torch_bridge.py. Ours =",
        "rollout/engine.py with the same checkpoints.",
        "",
        "| height (um) | ref layer err | ours layer err | diff |",
        "|---|---|---|---|",
    ]
    for h, a, b, d in rows:
        lines.append(
            f"| {h:.1f} | {a:.4f} | {'-' if b is None else f'{b:.4f}'} |"
            f" {'-' if d is None else f'{d:+.4f}'} |"
        )
    lines += [
        "",
        f"Events (tp/truth/pred): reference {ref['events_tp']}/"
        f"{ref['events_truth']}/{ref['events_pred']} — ours "
        f"{ours['events_tp']}/{ours['events_truth']}/{ours['events_pred']}",
        f"KS: reference {ref['KS']} — ours {ours['KS']}",
        f"First |diff| > 0.05: "
        f"{'never' if div_height is None else f'height {div_height}'}",
    ]
    with open(f"{REPO}/artifacts/ab/AB_REPORT.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
