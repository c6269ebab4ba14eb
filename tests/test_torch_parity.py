"""Per-layer activation parity vs the ACTUAL PyTorch reference model code.

The reference `models.py` / `heteropgclstm.py` / `periodGATconv.py` are
instantiated on CPU (PyG provided by tools/pygshim — a minimal pure-torch
surface of the exact call patterns the reference uses), JAX-initialized
weights are transplanted through data/torch_bridge.py, and activations are
compared per gate-conv (24 PeriodConv applications), per cell state (h, c
for encoder and decoder), and at the heads — on the real seed10020 frame
sample. This is the BASELINE.json "verify per-layer activations allclose"
requirement: a sign error inside any single gate projection fails here even
if training could compensate for it.

Reference call stack covered: models.py:401-453 (regressor forward),
models.py:572-611 (classifier forward), heteropgclstm.py:111-183,
periodGATconv.py:157-236.
"""

from __future__ import annotations

import numpy as np
import pytest

from graingraphnn_tpu.data import reference_io, torch_bridge
from graingraphnn_tpu.graph import schema
from graingraphnn_tpu.models import cells, grain_nn
from graingraphnn_tpu.models.hyper import HyperParams
from graingraphnn_tpu.ops.period_conv import apply_period_conv

torch = pytest.importorskip("torch")

FIXTURE = "/root/reference/graphs/40_40/seed10020_G1.904_R0.558_span6.pkl"

C = 96  # shipped layer_size (parameters.py:17, regressor0)

ATOL = 2e-4  # fp32 reassociation across frameworks (sums ordered differently)
RTOL = 2e-4


def make_hp(model_type="regressor") -> HyperParams:
    return HyperParams(
        model_type=model_type, model_id=0, lr=5e-3, layer_size=C,
        batch_size=4, decay_step=10, epoch=50, frames=121,
    )


class RefHyper:
    """Duck-typed stand-in for parameters.Param: the attributes
    GrainNN_regressor/classifier read (models.py:357-399,531-570)."""

    def __init__(self, layer_size):
        self.features = {
            "grain": list(schema.GRAIN_FEATURES) + list(schema.GRAIN_GRAD_FEATURES),
            "joint": list(schema.JOINT_FEATURES) + list(schema.JOINT_GRAD_FEATURES),
        }
        self.targets = {"grain": ["darea", "extraV"], "joint": ["dx", "dy"]}
        self.metadata = (["grain", "joint"], [tuple(et) for et in schema.EDGE_TYPES])
        self.layer_size = layer_size
        self.layers = 1
        self.out_win = 1
        self.window = 1
        self.device = "cpu"


@pytest.fixture(scope="module")
def fixture_arrays():
    hgs = reference_io.load_sample_list(FIXTURE)
    return reference_io.heterograph_to_arrays(hgs[0])


@pytest.fixture(scope="module")
def jax_sample(fixture_arrays):
    hgs = reference_io.load_sample_list(FIXTURE)
    return reference_io.heterograph_to_sample(hgs[0])


def torch_inputs(arrays):
    x_dict = {
        nt: torch.from_numpy(np.asarray(v, np.float32).copy())
        for nt, v in arrays["features"].items()
    }
    edge_index_dict = {
        tuple(et): torch.from_numpy(np.asarray(idx, np.int64).copy())
        for et, idx in arrays["edge_index"].items()
    }
    edge_attr_dict = {
        tuple(et): torch.from_numpy(np.asarray(w, np.float32).reshape(-1, 1).copy())
        for et, w in arrays["edge_weight"].items()
    }
    return x_dict, edge_index_dict, edge_attr_dict


def build_reference_model(model_type, arrays, state_dict):
    """Instantiate the real reference model, materialize its lazy linears
    with one dummy forward, then strict-load the transplanted weights."""
    torch_bridge.ensure_reference_importable()
    from models import GrainNN_classifier, GrainNN_regressor  # reference code

    hyper = RefHyper(C)
    model = (
        GrainNN_regressor(hyper)
        if model_type == "regressor"
        else GrainNN_classifier(hyper)
    )
    model.eval()
    x, ei, ea = torch_inputs(arrays)
    with torch.no_grad():
        model(x, ei, ea)  # materialize lazy PyG Linears (as dist_train.py:384-387)
    model.load_state_dict(torch_bridge.to_torch(state_dict), strict=True)
    return model


def attach_hooks(model):
    """Capture every PeriodConv output (post-skip) and every cell (h, c)."""
    acts = {}

    def conv_hook(name):
        def fn(_mod, _inp, out):
            acts[name] = out.detach().numpy()

        return fn

    def cell_hook(name):
        def fn(_mod, _inp, out):
            h, c = out
            for nt in ("grain", "joint"):
                acts[f"{name}.h.{nt}"] = h[nt].detach().numpy()
                acts[f"{name}.c.{nt}"] = c[nt].detach().numpy()

        return fn

    for stack in ("gclstm_encoder", "gclstm_decoder"):
        cell = model.get_submodule(f"{stack}.cell_list.0")
        cell.register_forward_hook(cell_hook(stack))
        for gate in cells.GATE_ORDER:
            conv = getattr(cell, f"conv_{gate}")
            for et_key, sub in conv.convs.items():
                sub.register_forward_hook(conv_hook(f"{stack}.{gate}.{et_key}"))
    return acts


def jax_intermediates(params, sample):
    """Recompute the fused JAX forward capturing the same intermediates the
    torch hooks see (per-gate per-edge-type conv outputs, h/c per stack)."""
    import jax.numpy as jnp

    records = {}
    h, c = cells.zero_state(sample, C)
    stacks = {"encoder": "gclstm_encoder", "decoder": "gclstm_decoder"}
    for mine, theirs in stacks.items():
        cell = params[mine][0]
        xg = jnp.concatenate([sample.grain_x, h["grain"]], axis=1)
        xj = jnp.concatenate([sample.joint_x, h["joint"]], axis=1)
        kw = dict(num_gates=4, out_channels=C)
        outs = {
            "grain__push__joint": apply_period_conv(
                cell["conv"]["push"], xg, xj, sample.push_nbr,
                sample.push_len, sample.push_mask, **kw,
            ),
            "joint__connect__joint": apply_period_conv(
                cell["conv"]["connect"], xj, xj, sample.connect_nbr,
                sample.connect_len, sample.connect_mask, **kw,
            ),
            "joint__pull__grain": apply_period_conv(
                cell["conv"]["pull"], xj, xg, sample.pull_nbr,
                sample.pull_len, sample.pull_mask, **kw,
            ),
        }
        for g, gate in enumerate(cells.GATE_ORDER):
            for et_key, fused in outs.items():
                records[f"{theirs}.{gate}.{et_key}"] = np.asarray(
                    fused[:, g * C : (g + 1) * C]
                )
        joint_gates = (
            outs["grain__push__joint"]
            + outs["joint__connect__joint"]
            + cell["bias"]["joint"].reshape(-1)
        )
        grain_gates = outs["joint__pull__grain"] + cell["bias"]["grain"].reshape(-1)
        h_g, c_g = cells._lstm_update(grain_gates, c["grain"], C)
        h_j, c_j = cells._lstm_update(joint_gates, c["joint"], C)
        h = {"grain": h_g, "joint": h_j}
        c = {"grain": c_g, "joint": c_j}
        for nt in ("grain", "joint"):
            records[f"{theirs}.h.{nt}"] = np.asarray(h[nt])
            records[f"{theirs}.c.{nt}"] = np.asarray(c[nt])
    return records, h


def test_regressor_per_layer_parity(fixture_arrays, jax_sample):
    import jax

    hp = make_hp("regressor")
    params = grain_nn.init_regressor(jax.random.PRNGKey(7), hp)

    sd = torch_bridge.regressor_to_state_dict(params, hp)
    n_params = sum(int(np.prod(v.shape)) for v in sd.values())
    assert n_params == 1_204_612  # reference logfile param count

    model = build_reference_model("regressor", fixture_arrays, sd)
    acts = attach_hooks(model)
    x, ei, ea = torch_inputs(fixture_arrays)
    with torch.no_grad():
        y_ref = model(x, ei, ea)

    records, _h = jax_intermediates(params, jax_sample)
    assert set(acts) == set(records)
    for name in sorted(acts):
        np.testing.assert_allclose(
            records[name], acts[name], rtol=RTOL, atol=ATOL,
            err_msg=f"activation mismatch at {name}",
        )

    y_jax = grain_nn.apply_regressor(params, hp, jax_sample)
    np.testing.assert_allclose(
        np.asarray(y_jax["joint"]), y_ref["joint"].numpy(), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(y_jax["grain"]), y_ref["grain"].numpy(), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(y_jax["grain_area"]),
        y_ref["grain_area"].numpy(),
        rtol=RTOL,
        atol=ATOL,
    )


def test_classifier_per_layer_parity(fixture_arrays, jax_sample):
    import jax

    hp = make_hp("classifier")
    params = grain_nn.init_classifier(jax.random.PRNGKey(11), hp)

    sd = torch_bridge.classifier_to_state_dict(params, hp)
    n_params = sum(int(np.prod(v.shape)) for v in sd.values())
    assert n_params == 1_204_806  # reference logfile param count

    model = build_reference_model("classifier", fixture_arrays, sd)
    acts = attach_hooks(model)
    x, ei, ea = torch_inputs(fixture_arrays)
    with torch.no_grad():
        y_ref = model(x, ei, ea)

    records, _h = jax_intermediates(params, jax_sample)
    for name in sorted(acts):
        np.testing.assert_allclose(
            records[name], acts[name], rtol=RTOL, atol=ATOL,
            err_msg=f"activation mismatch at {name}",
        )

    y_jax = grain_nn.apply_classifier(params, hp, jax_sample)
    np.testing.assert_allclose(
        np.asarray(y_jax["edge_event"]),
        y_ref["edge_event"].numpy(),
        rtol=RTOL,
        atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(y_jax["edge"]), y_ref["edge"].numpy(), rtol=RTOL, atol=ATOL
    )


def test_torch_to_jax_roundtrip(fixture_arrays, jax_sample):
    """Reverse direction: a torch-side random init imported into JAX gives
    the same head outputs (exercises *_from_state_dict, the path that will
    load real reference .pt checkpoints)."""
    import jax

    hp = make_hp("regressor")
    params0 = grain_nn.init_regressor(jax.random.PRNGKey(3), hp)
    sd0 = torch_bridge.regressor_to_state_dict(params0, hp)
    model = build_reference_model("regressor", fixture_arrays, sd0)

    # perturb the torch side so the import is not trivially params0
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.01 * torch.randn_like(p))

    sd = torch_bridge.from_torch(model.state_dict())
    params = torch_bridge.regressor_from_state_dict(sd, hp)

    x, ei, ea = torch_inputs(fixture_arrays)
    with torch.no_grad():
        y_ref = model(x, ei, ea)
    y_jax = grain_nn.apply_regressor(params, hp, jax_sample)
    np.testing.assert_allclose(
        np.asarray(y_jax["joint"]), y_ref["joint"].numpy(), rtol=RTOL, atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(y_jax["grain"]), y_ref["grain"].numpy(), rtol=RTOL, atol=ATOL
    )
