"""Step-resynchronized rollout A/B (VERDICT round-2 item 1).

Round 2's end-to-end A/B (scripts/ab_rollout.py) found the two
implementations diverging on rollout events with identical weights and
thresholds (reference 74/75 vs ours 70/75 on seed10020) without isolating
chaos amplification from a semantic editor mismatch. This harness settles
it by TEACHER-FORCING: the reference rollout (/root/reference/test.py:353-577
replicated in-process through tools/pygshim) evolves the state span by span;
at the start of every span, OUR pipeline (jitted forward + feature
integration + host topology editor, rollout/engine.py steps <1>-<3>) is run
from the reference's exact pre-span state, and the two span edit sets are
diffed:

  - area-triggered eliminations  (pred grain_area < 1e-4, test.py:418-420)
  - forced eliminations + two-sided cleanup   (models.py:690-722)
  - executed neighbor switches   (sigmoid(edge_event) > 0.6, models.py:624-630)
  - post-edit connectivity       (undirected E_pp set, E_pq set)
  - post-edit junction placements

Every differing item is classified:
  (a) knife-edge — the decision inputs (grain area vs 1e-4, switch
      probability vs 0.6) fall on OPPOSITE sides of the threshold between
      the two implementations: fp forward noise at a threshold, not a
      semantic difference;
  (b) cascade — a downstream consequence of an earlier knife-edge in the
      same span (e.g. a switch dropped because the knife-edge elimination
      consumed its edge);
  (c) RULE MISMATCH — identical decision inputs produce different edits:
      a semantic difference in the editor that must be fixed.

Usage:
    python scripts/ab_stepwise.py [--seed 10020] [--tol_prob 0.02]

Writes artifacts/ab/AB_STEPWISE.md + AB_STEPWISE_seed<seed>.json.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)

R_THRESHOLD = 1e-4   # test.py:187
C_THRESHOLD = 0.6    # test.py:188
TRAIN_FRAMES = 120
TRAIN_DELTA_Z = 0.4


# ---------------------------------------------------------------------------
# reference side: in-process replication of test.py:288-577 (periodic BC,
# static melt pool, no nucleation — the flagship 40um configuration)
# ---------------------------------------------------------------------------
class RefSession:
    def __init__(self, truth_dir: str, model_dir: str, seed: int):
        sys.path.insert(0, f"{REPO}/tools/pygshim")
        sys.path.insert(1, REFERENCE)
        os.environ["MPLBACKEND"] = "Agg"
        import glob

        import dill
        import torch
        from torch_geometric.loader import DataLoader

        from data_loader import DynamicHeteroGraphTemporalSignal  # noqa: E501 reference module
        from graph_trajectory import graph_trajectory
        from models import GrainNN_classifier, GrainNN_regressor
        from parameters import classifier_transfered, regressor

        # the traj pickle was written by a reference script run as __main__,
        # so dill resolves its class via the __main__ namespace
        import __main__

        __main__.graph_trajectory = graph_trajectory

        self.torch = torch
        torch.manual_seed(seed)
        np.random.seed(seed)

        datasets = sorted(glob.glob(f"{truth_dir}/seed{seed}_G*.pkl"))
        assert datasets, f"no test pickles under {truth_dir}"
        test_list = []
        for case in datasets:
            with open(case, "rb") as inp:
                test_list.append(dill.load(inp)[0])
        sample = test_list[0]
        test_tensor = DynamicHeteroGraphTemporalSignal(test_list)
        heteroData = test_tensor[0]

        hp = regressor(0)
        hpc = classifier_transfered(1)
        hp.metadata = heteroData.metadata()
        hp.features = sample.features
        hp.targets = sample.targets
        hp.device = "cpu"
        hpc.metadata = hp.metadata
        hpc.features = hp.features
        hpc.device = hp.device

        self.Rmodel = GrainNN_regressor(hp)
        self.Rmodel.load_state_dict(
            torch.load(f"{model_dir}/regressor0.pt", map_location="cpu"))
        self.Rmodel.eval()
        self.Cmodel = GrainNN_classifier(hpc, self.Rmodel)
        self.Cmodel.load_state_dict(
            torch.load(f"{model_dir}/classifier1.pt", map_location="cpu"))
        self.Cmodel.eval()
        self.Rmodel.threshold = R_THRESHOLD
        self.Cmodel.threshold = C_THRESHOLD

        loader = DataLoader(test_tensor, shuffle=False)
        self.data = next(iter(loader))
        with open(f"{truth_dir}/traj{seed}.pkl", "rb") as inp:
            self.traj = dill.load(inp)

        name = os.path.basename(datasets[0])
        self.span = int(name[name.find("span") + 4:-4]) if "span" in name else 6
        traj = self.traj
        traj.span = self.span
        traj.raise_err = False

        self.imagesize = (int(traj.lxd / 0.08) + 1, int(traj.lxd / 0.08) + 1)

        data = self.data
        data["mask"]["joint"] = 1 + 0 * data["mask"]["joint"]
        traj.extraV_traj = []
        X = {k: v.clone() for k, v in data.x_dict.items()}
        traj.GNN_update(0, X, data["mask"], True, data.edge_index_dict, True)
        traj.frames = int((traj.final_height - traj.ini_height) / TRAIN_DELTA_Z) + 1

        self.geometry_scaling = {
            "domain_offset": 0, "domain_factor": traj.lxd / traj.patch_size}
        assert self.geometry_scaling["domain_factor"] <= 1, \
            "stepwise A/B covers the unscaled 40um case"
        assert traj.BC == "periodic"

        self.grain_event_list: list = []
        traj.plot_polygons(self.imagesize)
        self.layer_err_list = [(traj.ini_height, traj.error_layer)]
        self.grain_acc_list = [(traj.ini_height, 0, 0, 0)]

    # -- state snapshot in plain numpy ---------------------------------
    def snapshot(self) -> dict:
        d = self.data
        return {
            "x_grain": d.x_dict["grain"].detach().numpy().copy(),
            "x_joint": d.x_dict["joint"].detach().numpy().copy(),
            "E_pp": d.edge_index_dict["joint", "connect", "joint"].detach().numpy().copy(),
            "E_pq": d.edge_index_dict["joint", "pull", "grain"].detach().numpy().copy(),
            "E_qp": d.edge_index_dict["grain", "push", "joint"].detach().numpy().copy(),
            "attr_pp": d.edge_attr_dict["joint", "connect", "joint"].detach().numpy().copy(),
            "attr_pq": d.edge_attr_dict["joint", "pull", "grain"].detach().numpy().copy(),
            "attr_qp": d.edge_attr_dict["grain", "push", "joint"].detach().numpy().copy(),
            "mask_g": d["mask"]["grain"].detach().numpy().copy(),
            "mask_j": d["mask"]["joint"].detach().numpy().copy(),
        }

    # -- one reference span (test.py:353-577) --------------------------
    def run_span(self, frame: int) -> dict:
        torch = self.torch
        data, traj = self.data, self.traj
        height = traj.ini_height + frame * TRAIN_DELTA_Z

        with torch.no_grad():
            edge_index = data.edge_index_dict.copy()
            edge_feature = data.edge_attr_dict.copy()
            pred = self.Rmodel(data.x_dict, edge_index, edge_feature)
            pred_c = self.Cmodel(data.x_dict, edge_index, edge_feature)
            pred.update(pred_c)

            dec = decision_inputs(
                pred["edge_event"].detach().numpy(),
                pred["grain_area"].detach().numpy(),
                pred["grain"].detach().numpy(),
                data.edge_index_dict["joint", "connect", "joint"].detach().numpy(),
                data["mask"]["grain"].detach().numpy(),
            )

            self.Rmodel.update(data.x_dict, pred, self.geometry_scaling)
            data.x_dict["grain"][:, 2] += self.span / (TRAIN_FRAMES + 1)
            data.x_dict["joint"][:, 2] += self.span / (TRAIN_FRAMES + 1)
            zmax = TRAIN_FRAMES / (TRAIN_FRAMES + 1)
            if data.x_dict["grain"][0, 2] > zmax:
                data.x_dict["grain"][:, 2] = zmax
                data.x_dict["joint"][:, 2] = zmax

            pred["grain_event"] = ((data["mask"]["grain"][:, 0] > 0)
                                   & (pred["grain_area"] < R_THRESHOLD)
                                   ).nonzero().view(-1)
            pred["grain_event"] = pred["grain_event"][
                torch.argsort(pred["grain_area"][pred["grain_event"]])]
            n_area = len(pred["grain_event"])
            dec["area_elim"] = [int(g) for g in pred["grain_event"]]

            data.x_dict, edge_index_dict, pairs = self.Cmodel.update(
                data.x_dict, data.edge_index_dict, data.edge_attr_dict,
                pred, data["mask"], self.geometry_scaling, 0.0)
            data.edge_index_dict = edge_index_dict

            dec["forced_elim"] = [int(g) for g in pred["grain_event"][n_area:]]
            dec["switch_exec"] = [
                tuple(sorted((int(a), int(b)))) for a, b in pairs]
            self.grain_event_list.extend(
                int(g) for g in pred["grain_event"].detach().numpy())

            topo = len(pred["grain_event"]) > 0 or len(pairs) > 0

            X = {k: v.clone() for k, v in data.x_dict.items()}
            traj.GNN_update(frame, X, data["mask"], topo,
                            data.edge_index_dict, True)

            truth = set().union(*traj.grain_events[:frame + 1])
            truth = {i - 1 for i in truth}
            tp = len(set(self.grain_event_list) & truth)
            self.grain_acc_list.append(
                (height, len(truth), len(self.grain_event_list), tp))

            traj.plot_polygons(self.imagesize)
            self.layer_err_list.append((height, traj.error_layer))

            # <5> next-step inputs
            for grain, coor in traj.region_center.items():
                data.x_dict["grain"][grain - 1, :2] = torch.FloatTensor(coor)
            data.edge_attr_dict = {}
            for edge_type, index in data.edge_index_dict.items():
                src_x = data.x_dict[edge_type[0]][index[0], :2]
                dst_x = data.x_dict[edge_type[-1]][index[-1], :2]
                rel = src_x - dst_x
                rel = -1 * (rel > 0.5) + 1 * (rel < -0.5) + rel
                data.edge_attr_dict[edge_type] = torch.sqrt(
                    rel[:, 0] ** 2 + rel[:, 1] ** 2).view(-1, 1)

        dec.update(post_edit_record(
            data.edge_index_dict["joint", "connect", "joint"].detach().numpy(),
            data.edge_index_dict["joint", "pull", "grain"].detach().numpy(),
            data["mask"]["grain"].detach().numpy(),
            data.x_dict["joint"].detach().numpy(),
        ))
        dec["layer_err"] = float(traj.error_layer)
        dec["events_tp"], dec["events_truth"] = tp, len(truth)
        return dec


# ---------------------------------------------------------------------------
# shared decision-record helpers
# ---------------------------------------------------------------------------
def decision_inputs(edge_logits, grain_area, grain_y, E_pp, mask_g) -> dict:
    """Pre-threshold decision inputs: switch probabilities keyed by sorted
    junction pair (live src<dst columns), predicted areas and dareas per
    live grain."""
    prob = 1.0 / (1.0 + np.exp(-np.asarray(edge_logits, np.float64)))
    probs = {}
    for c in range(E_pp.shape[1]):
        s, d = int(E_pp[0, c]), int(E_pp[1, c])
        if 0 <= s < d:
            probs[(s, d)] = float(prob[c])
    live = np.asarray(mask_g).reshape(-1) > 0
    areas = {i: float(grain_area[i]) for i in range(len(live)) if live[i]}
    dareas = {i: float(grain_y[i, 0]) for i in range(len(live)) if live[i]}
    return {"probs": probs, "areas": areas, "dareas": dareas}


def post_edit_record(E_pp, E_pq, mask_g, x_joint) -> dict:
    pp = set()
    for c in range(E_pp.shape[1]):
        s, d = int(E_pp[0, c]), int(E_pp[1, c])
        if s >= 0 and d >= 0:
            pp.add((min(s, d), max(s, d)))
    pq = set()
    for c in range(E_pq.shape[1]):
        j, g = int(E_pq[0, c]), int(E_pq[1, c])
        if j >= 0 and g >= 0:
            pq.add((j, g))
    dead = [int(i) for i in np.nonzero(np.asarray(mask_g).reshape(-1) <= 0)[0]]
    return {"pp_after": pp, "pq_after": pq, "dead_grains": dead,
            "joint_pos": np.asarray(x_joint)[:, :2].copy()}


# ---------------------------------------------------------------------------
# our side: engine steps <1>-<3> from a reference snapshot
# ---------------------------------------------------------------------------
class OursSession:
    def __init__(self, seed: int):
        import jax

        jax.config.update("jax_platforms", "cpu")
        from graingraphnn_tpu.rollout.engine import RolloutEngine
        from graingraphnn_tpu.train import checkpoint

        params_r, hp_r, _ = checkpoint.load(f"{REPO}/artifacts/40um/regressor0")
        params_c, hp_c, _ = checkpoint.load(f"{REPO}/artifacts/40um/classifier1")
        self.engine = RolloutEngine(
            params_r, hp_r, params_c, hp_c,
            r_threshold=R_THRESHOLD, c_threshold=C_THRESHOLD, seed=seed)
        self.engine._bc = "periodic"

    def run_span(self, snap: dict, span: int) -> dict:
        from graingraphnn_tpu.graph import schema, state
        from graingraphnn_tpu.rollout.topology import TopologyEditor

        eng = self.engine
        x = {"grain": snap["x_grain"].astype(np.float64).copy(),
             "joint": snap["x_joint"].astype(np.float64).copy()}
        edges = {"connect": snap["E_pp"].astype(np.int64).copy(),
                 "pull": snap["E_pq"].astype(np.int64).copy(),
                 "push": snap["E_qp"].astype(np.int64).copy()}
        edge_attr = {
            schema.EDGE_TYPES[0]: snap["attr_qp"].astype(np.float64).copy(),
            schema.EDGE_TYPES[1]: snap["attr_pq"].astype(np.float64).copy(),
            schema.EDGE_TYPES[2]: snap["attr_pp"].astype(np.float64).copy(),
        }
        mask = {"grain": snap["mask_g"].astype(np.int64).reshape(-1, 1).copy(),
                "joint": snap["mask_j"].astype(np.int64).reshape(-1, 1).copy()}
        eng._mask = mask

        caps = (state.round_up(len(x["grain"]), 8),
                state.round_up(len(x["joint"]), 16),
                state.round_up(edges["connect"].shape[1], 32))
        (y_r, y_c), _ = eng._forward(
            {k: v.astype(np.float32) for k, v in x.items()},
            edges, edge_attr, caps)
        ng, nj = len(x["grain"]), len(x["joint"])
        ne = edges["connect"].shape[1]
        pred = {
            "joint": np.asarray(y_r["joint"], np.float64)[:nj],
            "grain": np.asarray(y_r["grain"], np.float64)[:ng],
            "grain_area": np.asarray(y_r["grain_area"], np.float64)[:ng],
            "edge_event": np.asarray(y_c["edge_event"], np.float64)[:ne],
        }
        dec = decision_inputs(pred["edge_event"], pred["grain_area"],
                              pred["grain"], edges["connect"], mask["grain"])

        # <2> feature integration (engine.run, mirrors models.py:510-516)
        x["joint"][:, :2] += pred["joint"] / schema.TARGET_SCALING["joint"]
        x["grain"][:, schema.GRAIN_AREA_COL] += (
            pred["grain"][:, 0] / schema.TARGET_SCALING["grain"])
        x["grain"][:, schema.GRAIN_EXTRAV_COL] = pred["grain"][:, 1]
        x["joint"][:, 6:8] = pred["joint"]
        x["grain"][:, schema.GRAIN_DAREA_COL] = pred["grain"][:, 0]
        x["grain"][:, 2] += span / (TRAIN_FRAMES + 1)
        x["joint"][:, 2] += span / (TRAIN_FRAMES + 1)
        zmax = TRAIN_FRAMES / (TRAIN_FRAMES + 1)
        if x["grain"][0, 2] > zmax:
            x["grain"][:, 2] = zmax
            x["joint"][:, 2] = zmax

        # <3> events + editor
        live_g = mask["grain"][:, 0] > 0
        cand = np.nonzero(live_g & (pred["grain_area"] < R_THRESHOLD))[0]
        cand = cand[np.argsort(pred["grain_area"][cand])]
        pred["grain_event"] = cand
        dec["area_elim"] = [int(g) for g in cand]

        editor = TopologyEditor(threshold=C_THRESHOLD)
        x, edges, switching_list, extra_events = editor.update(
            x, edges, pred, mask)
        dec["forced_elim"] = [int(g) for g in extra_events]
        dec["switch_exec"] = [
            tuple(sorted((int(a), int(b)))) for a, b in switching_list]
        dec.update(post_edit_record(
            edges["connect"], edges["pull"], mask["grain"], x["joint"]))
        return dec


# ---------------------------------------------------------------------------
# diff + classification
# ---------------------------------------------------------------------------
def classify_span(ref: dict, ours: dict, tol_prob: float, tol_area: float) -> dict:
    items = []

    def knife(kind, item, r, o, thr):
        side_r, side_o = r < thr, o < thr
        cls = "knife-edge" if side_r != side_o else "rule-mismatch"
        items.append({
            "kind": kind, "item": str(item), "class": cls,
            "ref_input": r, "ours_input": o, "threshold": thr,
            "ref_margin": r - thr, "ours_margin": o - thr,
        })
        return cls

    # eliminations
    er, eo = set(ref["area_elim"]), set(ours["area_elim"])
    elim_knife = False
    for g in sorted(er ^ eo):
        c = knife("area_elim", g,
                  ref["areas"].get(g, np.inf), ours["areas"].get(g, np.inf),
                  R_THRESHOLD)
        elim_knife |= c == "knife-edge"

    # switch candidates (pre-editor): prob > threshold on live pairs
    cr = {k for k, p in ref["probs"].items() if p > C_THRESHOLD}
    co = {k for k, p in ours["probs"].items() if p > C_THRESHOLD}
    cand_knife = False
    for pair in sorted(cr ^ co):
        c = knife("switch_candidate", pair,
                  -ref["probs"].get(pair, 0.0), -ours["probs"].get(pair, 0.0),
                  -C_THRESHOLD)
        cand_knife |= c == "knife-edge"

    # executed switches: only meaningful to compare when the upstream
    # decisions matched; otherwise differences cascade from the knife-edge
    sr = set(ref["switch_exec"])
    so = set(ours["switch_exec"])
    upstream_differs = (er != eo) or (cr != co)
    for pair in sorted(sr ^ so):
        if upstream_differs and (elim_knife or cand_knife):
            items.append({"kind": "switch_exec", "item": str(pair),
                          "class": "cascade",
                          "note": "upstream knife-edge changed the edit set"})
        else:
            items.append({"kind": "switch_exec", "item": str(pair),
                          "class": "rule-mismatch",
                          "ref_prob": ref["probs"].get(pair),
                          "ours_prob": ours["probs"].get(pair)})

    # forced eliminations
    fr, fo = set(ref["forced_elim"]), set(ours["forced_elim"])
    for g in sorted(fr ^ fo):
        cls = ("cascade" if upstream_differs and (elim_knife or cand_knife)
               else "rule-mismatch")
        items.append({"kind": "forced_elim", "item": str(g), "class": cls})

    # post-edit graphs: compare only when ALL edits matched
    edits_match = er == eo and sr == so and fr == fo and cr == co
    pp_d = len(ref["pp_after"] ^ ours["pp_after"])
    pq_d = len(ref["pq_after"] ^ ours["pq_after"])
    pos_delta = 0.0
    nj = min(len(ref["joint_pos"]), len(ours["joint_pos"]))
    rel = np.abs(ref["joint_pos"][:nj] - ours["joint_pos"][:nj])
    rel = np.minimum(rel, 1.0 - rel)  # periodic
    pos_delta = float(rel.max()) if nj else 0.0
    if edits_match:
        if pp_d or pq_d:
            items.append({"kind": "rewiring", "item": f"pp^{pp_d},pq^{pq_d}",
                          "class": "rule-mismatch",
                          "pp_sym_diff": pp_d, "pq_sym_diff": pq_d})
        if pos_delta > 5e-3:
            items.append({"kind": "placement", "item": f"max|dx|={pos_delta:.4g}",
                          "class": "rule-mismatch"})
    elif pp_d or pq_d:
        items.append({"kind": "rewiring", "item": f"pp^{pp_d},pq^{pq_d}",
                      "class": "cascade" if (elim_knife or cand_knife)
                      else "rule-mismatch"})

    classes = {i["class"] for i in items}
    if not items:
        span_class = "match"
    elif "rule-mismatch" in classes:
        span_class = "rule-mismatch"
    else:
        span_class = "knife-edge"

    common = set(ref["probs"]) & set(ours["probs"])
    max_prob_diff = max(
        (abs(ref["probs"][k] - ours["probs"][k]) for k in common), default=0.0)
    common_g = set(ref["areas"]) & set(ours["areas"])
    max_area_diff = max(
        (abs(ref["areas"][k] - ours["areas"][k]) for k in common_g), default=0.0)
    return {
        "class": span_class, "items": items,
        "max_prob_diff": max_prob_diff, "max_area_diff": max_area_diff,
        "pp_sym_diff": pp_d, "pq_sym_diff": pq_d,
        "joint_pos_maxdelta": pos_delta,
        "area_elim_ref": sorted(er), "area_elim_ours": sorted(eo),
        "forced_ref": sorted(fr), "forced_ours": sorted(fo),
        "switch_ref": sorted(sr), "switch_ours": sorted(so),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=10020)
    ap.add_argument("--workdir", type=str, default="/tmp/ab_stepwise")
    ap.add_argument("--tol_prob", type=float, default=0.02)
    ap.add_argument("--tol_area", type=float, default=2e-5)
    args = ap.parse_args()

    from ab_rollout import prepare  # same workdir layout as the e2e A/B

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    truth, model, _run = prepare(args.seed, args.workdir)

    ours = OursSession(args.seed)
    ref = RefSession(truth, model, args.seed)
    span = ref.span
    frames = ref.traj.frames

    spans = []
    for frame in range(span, frames, span):
        snap = ref.snapshot()
        print(f"span frame={frame} ({frame/(frames-1):.2f}) ...", flush=True)
        dec_ref = ref.run_span(frame)
        dec_ours = ours.run_span(copy.deepcopy(snap), span)
        rec = classify_span(dec_ref, dec_ours, args.tol_prob, args.tol_area)
        rec["frame"] = frame
        rec["height"] = ref.traj.ini_height + frame * TRAIN_DELTA_Z
        rec["ref_layer_err"] = dec_ref["layer_err"]
        spans.append(rec)
        n_rm = sum(1 for i in rec["items"] if i["class"] == "rule-mismatch")
        print(f"  -> {rec['class']} ({len(rec['items'])} diffs, {n_rm} rule)",
              flush=True)

    counts = {"match": 0, "knife-edge": 0, "rule-mismatch": 0}
    for r in spans:
        counts[r["class"]] += 1
    report = {
        "seed": args.seed, "span": span, "n_spans": len(spans),
        "counts": counts,
        "ref_events_final": ref.grain_acc_list[-1],
        "spans": spans,
    }
    os.makedirs(f"{REPO}/artifacts/ab", exist_ok=True)

    def default(o):
        if isinstance(o, set):
            return sorted(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        raise TypeError(type(o))

    slim = copy.deepcopy(report)
    for r in slim["spans"]:
        for k in ("pp_after", "pq_after", "joint_pos"):
            r.pop(k, None)
    with open(f"{REPO}/artifacts/ab/AB_STEPWISE_seed{args.seed}.json", "w") as f:
        json.dump(slim, f, indent=1, default=default)

    lines = [
        f"# Step-resynchronized rollout A/B — seed {args.seed}",
        "",
        "Teacher-forced: the reference rollout (test.py:353-577, in-process",
        "via tools/pygshim) evolves the state; our pipeline (engine steps",
        "<1>-<3> + host topology editor) runs from the reference's exact",
        "pre-span state each span; the span edit sets are diffed and every",
        "difference is classified knife-edge / cascade / rule-mismatch.",
        "",
        f"Spans: {len(spans)} — match {counts['match']}, knife-edge "
        f"{counts['knife-edge']}, RULE MISMATCH {counts['rule-mismatch']}",
        "",
        "| frame | height | class | elims ref/ours | switches ref/ours |"
        " forced ref/ours | pp diff | max prob diff | notes |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in spans:
        notes = "; ".join(
            f"{i['kind']}:{i['item']}[{i['class']}]" for i in r["items"][:4])
        lines.append(
            f"| {r['frame']} | {r['height']:.1f} | {r['class']} |"
            f" {len(r['area_elim_ref'])}/{len(r['area_elim_ours'])} |"
            f" {len(r['switch_ref'])}/{len(r['switch_ours'])} |"
            f" {len(r['forced_ref'])}/{len(r['forced_ours'])} |"
            f" {r['pp_sym_diff']} | {r['max_prob_diff']:.2e} | {notes} |")
    lines += ["", "## Classification details", ""]
    for r in spans:
        if not r["items"]:
            continue
        lines.append(f"### frame {r['frame']} (h={r['height']:.1f}) — {r['class']}")
        for i in r["items"]:
            lines.append(f"- `{i['kind']}` {i['item']}: **{i['class']}** "
                         + json.dumps({k: v for k, v in i.items()
                                       if k not in ('kind', 'item', 'class')},
                                      default=default))
        lines.append("")
    with open(f"{REPO}/artifacts/ab/AB_STEPWISE.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[:40]))
    print(f"\nwrote artifacts/ab/AB_STEPWISE.md "
          f"({counts['rule-mismatch']} rule-mismatch spans)")


if __name__ == "__main__":
    main()
