"""Halo-exchange communication evidence (VERDICT round-2 weak item 4).

The ≥80% multi-host scaling target cannot be measured on this mount (one
real chip); what CAN be measured is everything the target depends on:

  1. per-stripe load balance of REAL microstructures (the stripes are a
     spatial partition — imbalance idles devices),
  2. the exact bytes each device exchanges per conv under the halo scheme
     (two neighbor-stripe ppermutes), compared against the 2/D whole-graph
     fraction the design claims and against the all-gather alternative,
  3. a latency/bandwidth projection of those bytes onto public TPU ICI
     numbers vs the measured per-conv compute time.

Writes artifacts/HALO_COMM.json.

ICI figures used (public, per chip): v5e ~ 1600 Gbit/s aggregate ICI
(2 links x ~100 GB/s effective unidirectional is the conservative figure
used here: 45 GB/s per direction per link) and ~1 us per-hop latency.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from graingraphnn_tpu.data import extraction, heterograph, reference_io  # noqa: E402
from graingraphnn_tpu.parallel import halo  # noqa: E402

ICI_BW_GBPS = 45.0     # per-direction per-link, conservative effective
ICI_HOP_US = 1.0
F_NODE = 4             # bytes per f32


def _step_breakdown_120():
    """Corrected compute reference: the shipped fp32 + fused-editor row of
    artifacts/STEP_BREAKDOWN.json (launch-overhead-subtracted)."""
    with open(os.path.join(REPO, "artifacts", "STEP_BREAKDOWN.json")) as f:
        rows = json.load(f)["rows"]
    row = next(r for r in rows
               if r["lxd"] == 120 and not r["pallas"] and r["fused_editor"])
    return row["ms_per_step"], row["components_ms"]["forward_ms"], \
        row["components_ms"]["editor_ms"] + row["components_ms"]["finalize_ms"]


STEP_MS_120, FWD_MS_120, EDIT_FIN_MS_120 = _step_breakdown_120()


def graph_arrays(case):
    if case == "seed10020":
        return reference_io.heterograph_to_arrays(
            reference_io.load_sample_list(
                "/root/reference/graphs/40_40/seed10020_G1.904_R0.558_span6.pkl"
            )[0]
        )
    # 120um seed0 fixture
    return reference_io.heterograph_to_arrays(
        reference_io.load_sample_list(
            "/root/reference/graphs/120_120/seed0_G10.0_R2.0_span6.pkl"
        )[0]
    )


def analyze(case, D_list):
    a = graph_arrays(case)
    gx = np.asarray(a["features"]["grain"])
    jx = np.asarray(a["features"]["joint"])
    rows = []
    for D in D_list:
        try:
            striped, meta = halo.build_striped(
                a["features"], a["edge_index"], a["edge_weight"], a["mask"], D
            )
        except ValueError as e:
            rows.append({"D": D, "error": str(e)})
            continue
        g_sizes = meta.stripe_sizes["grain"]
        j_sizes = meta.stripe_sizes["joint"]
        balance_g = max(g_sizes) / max(np.mean(g_sizes), 1e-9)
        balance_j = max(j_sizes) / max(np.mean(j_sizes), 1e-9)

        # bytes exchanged per conv per device: the two ppermutes move the
        # neighbor stripes' node tables (features at layer 0, hidden C=96
        # thereafter — we count the larger hidden table, 2 tensors/conv)
        C = 96
        halo_bytes = 2 * (meta.grain_cap * C + meta.joint_cap * C) * F_NODE
        # all-gather alternative: (D-1)/D of the whole node table
        allg_bytes = (D - 1) / D * (len(gx) + len(jx)) * C * F_NODE
        # the "2/D of the graph" model from the module docstring
        model_bytes = 2 / D * (len(gx) + len(jx)) * C * F_NODE

        t_comm_us = halo_bytes / (ICI_BW_GBPS * 1e3) + 2 * ICI_HOP_US
        rows.append({
            "D": D,
            "grain_stripe_sizes": list(map(int, g_sizes)),
            "joint_stripe_sizes": list(map(int, j_sizes)),
            "load_balance_max_over_mean": {
                "grain": round(balance_g, 3), "joint": round(balance_j, 3)},
            "halo_bytes_per_conv_per_device": int(halo_bytes),
            "model_2_over_D_bytes": int(model_bytes),
            "halo_vs_model_ratio": round(halo_bytes / model_bytes, 3),
            "allgather_bytes_per_conv_per_device": int(allg_bytes),
            "halo_vs_allgather": round(halo_bytes / max(allg_bytes, 1), 3),
            "projected_comm_us_per_conv": round(t_comm_us, 2),
        })
    return {"case": case, "n_grains": len(gx), "n_joints": len(jx),
            "stripes": rows}


def main():
    out = {
        "ici_assumptions": {
            "bw_gb_s_per_direction": ICI_BW_GBPS, "hop_latency_us": ICI_HOP_US,
            "note": "conservative public v5e-class figures; one-chip mount "
                    "— this is a projection, not a multi-host measurement",
        },
        "compute_reference": {
            # round-5 correction (VERDICT r4 task 6): the round-2 figure
            # (14.3 ms/step) predated the fused editor AND the launch-
            # overhead correction; the corrected STEP_BREAKDOWN shows the
            # shipped fp32 + fused-editor config at 3.767 ms/step with a
            # 2.043 ms forward
            "measured_ms_per_step_120um_fp32": STEP_MS_120,
            "forward_ms_per_step_120um": FWD_MS_120,
            "convs_per_step": 18,
            "ms_per_conv": round(FWD_MS_120 / 18, 4),
            "source": "artifacts/STEP_BREAKDOWN.json (lxd=120, fp32, "
                      "fused_editor) forward_ms / 18 convs "
                      "(3 convs x 3 cells x 2 models)",
        },
        "cases": [
            analyze("seed10020", [2, 4, 8]),
            analyze("seed0_120um", [2, 4, 8, 16]),
        ],
    }
    # efficiency projection for the 120um case at each measured D, against
    # the CORRECTED compute split (VERDICT r4 task 6): forward splits over
    # stripes; the sharded editor's detection/closure is O(E/D) but its
    # O(workset) mini edit stays replicated, so the editor+finalize time
    # is kept whole (worst case) in the projection
    case = out["cases"][1]
    projections = {}
    for row in case["stripes"]:
        D = row.get("D")
        if D is None or "error" in row:
            continue
        t_comm_ms = row["projected_comm_us_per_conv"] * 18 / 1e3
        t_fwd_ms = FWD_MS_120 / D
        t_step_partitioned = t_fwd_ms + t_comm_ms + EDIT_FIN_MS_120
        projections[f"D{D}"] = {
            "comm_ms_per_step": round(t_comm_ms, 3),
            "forward_ms_per_step_per_device": round(t_fwd_ms, 3),
            "editor_finalize_ms_replicated": round(EDIT_FIN_MS_120, 3),
            "forward_scaling_efficiency_projection": round(
                t_fwd_ms / (t_fwd_ms + t_comm_ms), 3),
            "step_speedup_projection_vs_single": round(
                STEP_MS_120 / t_step_partitioned, 3),
            "comm_overlappable": bool(t_comm_ms < t_fwd_ms),
        }
    out["projection_120um"] = {
        "note": "with the corrected 3.77 ms/step split the forward is "
                "2.04 ms — comm stays below the per-device forward slice "
                "(overlappable) only up to the D where 2.04/D drops under "
                "the ~18-conv latency floor; the Amdahl bound is the "
                "replicated O(workset) mini edit + finalize "
                "(projected; unmeasurable on this one-chip mount)",
        **projections,
    }
    path = os.path.join(REPO, "artifacts", "HALO_COMM.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["projection_120um"], indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
