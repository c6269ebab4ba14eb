"""torch <-> JAX weight bridge for reference parity.

Maps this framework's fused-gate parameter pytrees (models/cells.py,
models/grain_nn.py) to/from the PyTorch reference's state_dict layout
(models.py:351 GrainNN_regressor, :529 GrainNN_classifier, cells
heteropgclstm.py:48-99), so that:

* JAX-trained weights can be loaded into the *actual reference model code*
  (run on CPU via tools/pygshim) for per-layer activation parity and
  cross-implementation rollout A/B;
* reference ``.pt`` checkpoints (torch state_dicts) can be imported into the
  JAX framework.

Gate packing: the reference keeps four independent HeteroConv modules
(conv_i/f/c/o, heteropgclstm.py:48-88); here the four gates are fused along
the output axis in order (i, f, c, o) (cells.GATE_ORDER). Per edge type and
gate g:

    ours key.w[:, g*C:(g+1)*C]   =  theirs conv_g.convs.<et>.lin_key.weight.T
    ours l2.w[g]                 =  theirs lin_l2.weight.T    ([in, out])
    ours edge.w[g*C:(g+1)*C]     =  theirs lin_edge.weight[:, 0]
    ours bias[<nt>][g]           =  theirs b_g.<nt>[0]

Only the shipped configuration space is bridged: layers == 1 (all reference
configs, parameters.py:49,90,130), history=False, edge_len=False. The
reference's edge_len head is declared with an input width its own forward
never produces (models.py:395 vs :461) and its history LSTM is off in every
shipped model.
"""

from __future__ import annotations

import sys
from collections import OrderedDict
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..models.cells import GATE_ORDER
from ..models.hyper import HyperParams

REPO_ROOT = Path(__file__).resolve().parents[2]
PYGSHIM_DIR = REPO_ROOT / "tools" / "pygshim"
REFERENCE_DIR = Path("/root/reference")

# my conv-dict key -> reference ModuleDict key ('__'.join(edge_type))
EDGE_KEY_TO_REF = {
    "push": "grain__push__joint",
    "pull": "joint__pull__grain",
    "connect": "joint__connect__joint",
}

_STACKS = (("encoder", "gclstm_encoder"), ("decoder", "gclstm_decoder"))


def ensure_reference_importable(reference_dir: Path = REFERENCE_DIR):
    """Put the PyG shim and the reference repo on sys.path (shim first so
    `import torch_geometric` resolves to tools/pygshim)."""
    for p in (str(PYGSHIM_DIR), str(reference_dir)):
        if p not in sys.path:
            sys.path.insert(0, p)


def _t(a) -> "np.ndarray":
    return np.asarray(a, dtype=np.float32)


def _check_layers(hp: HyperParams):
    if hp.layers != 1:
        raise NotImplementedError(
            "torch bridge covers the shipped configs (layers == 1); the "
            "reference SAGE cells for layers >= 2 carry dead W_* parameters "
            "(heterogclstm.py:56-89) with no counterpart here"
        )
    if hp.history or hp.edge_len:
        raise NotImplementedError("bridge covers history=False, edge_len=False")


def _export_cell(sd: OrderedDict, prefix: str, cell: Dict, C: int):
    """One fused HeteroPGCLSTM cell -> reference cell state_dict entries."""
    for g, gate in enumerate(GATE_ORDER):
        lo, hi = g * C, (g + 1) * C
        for my_key, ref_key in EDGE_KEY_TO_REF.items():
            conv = cell["conv"][my_key]
            base = f"{prefix}.conv_{gate}.convs.{ref_key}"
            sd[f"{base}.lin_key.weight"] = _t(conv["key"]["w"][:, lo:hi]).T
            sd[f"{base}.lin_key.bias"] = _t(conv["key"]["b"][lo:hi])
            sd[f"{base}.lin_query.weight"] = _t(conv["query"]["w"][:, lo:hi]).T
            sd[f"{base}.lin_query.bias"] = _t(conv["query"]["b"][lo:hi])
            sd[f"{base}.lin_value.weight"] = _t(conv["value"]["w"][:, lo:hi]).T
            sd[f"{base}.lin_value.bias"] = _t(conv["value"]["b"][lo:hi])
            sd[f"{base}.lin_l2.weight"] = _t(conv["l2"]["w"][g]).T
            sd[f"{base}.lin_l2.bias"] = _t(conv["l2"]["b"][g])
            sd[f"{base}.lin_edge.weight"] = _t(conv["edge"]["w"][lo:hi])[:, None]
            sd[f"{base}.lin_skip.weight"] = _t(conv["skip"]["w"][:, lo:hi]).T
            sd[f"{base}.lin_skip.bias"] = _t(conv["skip"]["b"][lo:hi])
        for nt in ("grain", "joint"):
            sd[f"{prefix}.b_{gate}.{nt}"] = _t(cell["bias"][nt][g])[None, :]


def _import_cell(sd: Dict, prefix: str, C: int, in_grain: int, in_joint: int):
    """Reference cell state_dict entries -> one fused cell param dict."""
    fan = {"push": in_grain + C, "pull": in_joint + C, "connect": in_joint + C}
    dst_fan = {"push": in_joint + C, "pull": in_grain + C, "connect": in_joint + C}
    conv = {}
    for my_key, ref_key in EDGE_KEY_TO_REF.items():
        kw = np.zeros((fan[my_key], 4 * C), np.float32)
        kb = np.zeros(4 * C, np.float32)
        qw = np.zeros((dst_fan[my_key], 4 * C), np.float32)
        qb = np.zeros(4 * C, np.float32)
        vw = np.zeros((fan[my_key], 4 * C), np.float32)
        vb = np.zeros(4 * C, np.float32)
        l2w = np.zeros((4, C, C), np.float32)
        l2b = np.zeros((4, C), np.float32)
        ew = np.zeros(4 * C, np.float32)
        sw = np.zeros((dst_fan[my_key], 4 * C), np.float32)
        sb = np.zeros(4 * C, np.float32)
        for g, gate in enumerate(GATE_ORDER):
            lo, hi = g * C, (g + 1) * C
            base = f"{prefix}.conv_{gate}.convs.{ref_key}"
            kw[:, lo:hi] = _t(sd[f"{base}.lin_key.weight"]).T
            kb[lo:hi] = _t(sd[f"{base}.lin_key.bias"])
            qw[:, lo:hi] = _t(sd[f"{base}.lin_query.weight"]).T
            qb[lo:hi] = _t(sd[f"{base}.lin_query.bias"])
            vw[:, lo:hi] = _t(sd[f"{base}.lin_value.weight"]).T
            vb[lo:hi] = _t(sd[f"{base}.lin_value.bias"])
            l2w[g] = _t(sd[f"{base}.lin_l2.weight"]).T
            l2b[g] = _t(sd[f"{base}.lin_l2.bias"])
            ew[lo:hi] = _t(sd[f"{base}.lin_edge.weight"])[:, 0]
            sw[:, lo:hi] = _t(sd[f"{base}.lin_skip.weight"]).T
            sb[lo:hi] = _t(sd[f"{base}.lin_skip.bias"])
        conv[my_key] = {
            "key": {"w": jnp.asarray(kw), "b": jnp.asarray(kb)},
            "query": {"w": jnp.asarray(qw), "b": jnp.asarray(qb)},
            "value": {"w": jnp.asarray(vw), "b": jnp.asarray(vb)},
            "l2": {"w": jnp.asarray(l2w), "b": jnp.asarray(l2b)},
            "edge": {"w": jnp.asarray(ew)},
            "skip": {"w": jnp.asarray(sw), "b": jnp.asarray(sb)},
        }
    bias = {}
    for nt in ("grain", "joint"):
        b = np.zeros((4, C), np.float32)
        for g, gate in enumerate(GATE_ORDER):
            b[g] = _t(sd[f"{prefix}.b_{gate}.{nt}"])[0]
        bias[nt] = jnp.asarray(b)
    return {"conv": conv, "bias": bias}


def _linear_out(sd: OrderedDict, name: str, p: Dict):
    sd[f"{name}.weight"] = _t(p["w"]).T
    sd[f"{name}.bias"] = _t(p["b"])


def _linear_in(sd: Dict, name: str) -> Dict:
    return {
        "w": jnp.asarray(_t(sd[f"{name}.weight"]).T),
        "b": jnp.asarray(_t(sd[f"{name}.bias"])),
    }


def regressor_to_state_dict(params: Dict, hp: HyperParams) -> OrderedDict:
    """JAX regressor params -> reference GrainNN_regressor state_dict
    (numpy values; call `to_torch` to tensorize)."""
    _check_layers(hp)
    C = hp.layer_size
    sd: OrderedDict = OrderedDict()
    for mine, theirs in _STACKS:
        _export_cell(sd, f"{theirs}.cell_list.0", params[mine][0], C)
    _linear_out(sd, "linear.grain", params["head"]["grain"])
    _linear_out(sd, "linear.joint", params["head"]["joint"])
    return sd


def classifier_to_state_dict(params: Dict, hp: HyperParams) -> OrderedDict:
    _check_layers(hp)
    C = hp.layer_size
    sd: OrderedDict = OrderedDict()
    for mine, theirs in _STACKS:
        _export_cell(sd, f"{theirs}.cell_list.0", params[mine][0], C)
    _linear_out(sd, "lin1", params["lin1"])
    _linear_out(sd, "lin2", params["lin2"])
    return sd


def regressor_from_state_dict(sd: Dict, hp: HyperParams) -> Dict:
    """Reference GrainNN_regressor state_dict -> JAX params pytree."""
    _check_layers(hp)
    C = hp.layer_size
    params = {
        mine: [_import_cell(sd, f"{theirs}.cell_list.0", C, hp.in_grain, hp.in_joint)]
        for mine, theirs in _STACKS
    }
    params["head"] = {
        "grain": _linear_in(sd, "linear.grain"),
        "joint": _linear_in(sd, "linear.joint"),
    }
    return params


def classifier_from_state_dict(sd: Dict, hp: HyperParams) -> Dict:
    _check_layers(hp)
    C = hp.layer_size
    params = {
        mine: [_import_cell(sd, f"{theirs}.cell_list.0", C, hp.in_grain, hp.in_joint)]
        for mine, theirs in _STACKS
    }
    params["lin1"] = _linear_in(sd, "lin1")
    params["lin2"] = _linear_in(sd, "lin2")
    return params


def to_torch(sd: OrderedDict) -> "OrderedDict":
    """numpy state_dict -> torch tensors (contiguous, float32)."""
    import torch

    return OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v).copy())) for k, v in sd.items()
    )


def from_torch(sd) -> Dict:
    """torch state_dict -> numpy dict (accepts tensors or arrays)."""
    out = {}
    for k, v in sd.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def save_torch_checkpoint(path: str, params: Dict, hp: HyperParams):
    """Write a reference-loadable `.pt` (torch.save of the state_dict), the
    format `test.py:178,183` consumes."""
    import torch

    if hp.model_type == "regressor":
        sd = regressor_to_state_dict(params, hp)
    else:
        sd = classifier_to_state_dict(params, hp)
    torch.save(to_torch(sd), path)


def load_torch_checkpoint(path: str, hp: HyperParams) -> Dict:
    """Read a reference `.pt` state_dict into a JAX params pytree."""
    import torch

    sd = from_torch(torch.load(path, map_location="cpu", weights_only=True))
    if hp.model_type == "regressor":
        return regressor_from_state_dict(sd, hp)
    return classifier_from_state_dict(sd, hp)
