"""Training smoke tests: losses match hand-rolled formulas, a few optimizer
steps reduce the loss for both model types, transfer mode freezes lin1."""

import jax
import jax.numpy as jnp
import numpy as np

from graingraphnn_tpu.data.dataset import GraphDataset
from graingraphnn_tpu.models import grain_nn, hyper
from graingraphnn_tpu.train import loss as loss_mod
from graingraphnn_tpu.train import trainer
from graingraphnn_tpu.train.metrics import class_acc, grain_class_acc
from tests.util import synthetic_sample


def _samples(n=6, with_targets=True):
    return [synthetic_sample(ng=16, nj=32, seed=i, with_targets=with_targets) for i in range(n)]


def test_regressor_loss_value():
    s = _samples(1)[0]
    pred = {
        "joint": jnp.zeros_like(s.y_joint),
        "grain": jnp.zeros_like(s.y_grain),
    }
    got = float(loss_mod.regressor_loss(pred, s))
    want = 100.0 * (
        float(np.sum(np.asarray(s.joint_mask)[:, None] * np.asarray(s.y_joint) ** 2))
        / (2 * 32)
        + float(np.sum(np.asarray(s.grain_mask)[:, None] * np.asarray(s.y_grain) ** 2))
        / (2 * 16)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_classifier_loss_matches_bce():
    s = _samples(1)[0]
    rng = np.random.default_rng(0)
    z = rng.normal(size=s.num_jj_edges).astype(np.float32)
    pred = {"edge_event": jnp.asarray(z)}
    w = 2.0
    got = float(loss_mod.classifier_loss(pred, s, pos_weight=w))

    y = np.asarray(s.y_edge_event)
    m = np.asarray(s.jj_mask)
    valid = (y > -1) & (m > 0)
    yv, zv = y[valid], z[valid]
    sig = 1 / (1 + np.exp(-zv))
    bce = -(w * yv * np.log(sig + 1e-12) + (1 - yv) * np.log(1 - sig + 1e-12))
    np.testing.assert_allclose(got, bce.mean(), rtol=1e-4)


def test_train_reduces_loss_regressor():
    hp = hyper.regressor(0, layer_size=8)
    params = grain_nn.init_regressor(jax.random.PRNGKey(0), hp)
    ds = GraphDataset(_samples(6))
    params, hist = trainer.train(
        hp, params, ds, GraphDataset(_samples(2)), epochs=3, log=lambda s: None
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_train_reduces_loss_classifier_transfer():
    hp = hyper.classifier_transfered(1, layer_size=8)
    params = grain_nn.init_classifier(jax.random.PRNGKey(0), hp)
    lin1_before = np.asarray(params["lin1"]["w"]).copy()
    ds = GraphDataset(_samples(6))
    params, hist = trainer.train(
        hp, params, ds, GraphDataset(_samples(2)), epochs=3, log=lambda s: None
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    # the reference's transfer optimizer omits lin1 (train.py:84-91)
    np.testing.assert_array_equal(np.asarray(params["lin1"]["w"]), lin1_before)
    assert "threshold" in hist


def test_pr_auc_perfect_classifier():
    y = np.array([1, 1, 0, 0, 0])
    logits = np.array([10.0, 10.0, -10.0, -10.0, -10.0])
    auc, p, r = class_acc(logits, y)
    assert auc > 0.99


def test_grain_pr_auc():
    y = np.array([1, 1, 0, 0])
    area = np.array([1e-5, 5e-5, 5e-3, 8e-3])
    auc, p, r = grain_class_acc(area, y)
    assert auc > 0.99


def _load_checker():
    import importlib.util
    from pathlib import Path

    path = Path(__file__).resolve().parent.parent / "scripts" / \
        "check_readme_numbers.py"
    spec = importlib.util.spec_from_file_location("check_readme_numbers",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_numbers_match_bench_artifact():
    """README/STATUS headline quotes must equal the PINNED number of
    record, and the latest live capture must sit within the documented
    ±10% of the pin (VERDICT r4 task 2: the checker must stay green
    across fresh `python bench.py` runs that move numbers only within
    the session-variance band)."""
    mod = _load_checker()
    errors = mod.check()
    assert not errors, "\n".join(errors)


def test_readme_checker_tolerates_session_variance(tmp_path):
    """A fresh capture drifting <10% from the pin must NOT fail the
    suite; one drifting beyond must, with a re-pin instruction."""
    import json
    import shutil
    from pathlib import Path

    mod = _load_checker()
    repo = Path(__file__).resolve().parent.parent
    # clone the doc+artifact surface into tmp_path
    fake = tmp_path / "repo"
    (fake / "artifacts").mkdir(parents=True)
    for name in ("README.md", "STATUS.md"):
        shutil.copy(repo / name, fake / name)
    pin = json.loads((repo / "artifacts" / "BENCH_PINNED.json").read_text())
    (fake / "artifacts" / "BENCH_PINNED.json").write_text(json.dumps(pin))

    within = dict(pin)
    within["value"] = pin["value"] * 1.05  # inside ±10%
    (fake / "artifacts" / "BENCH_LOCAL.json").write_text(json.dumps(within))
    assert mod.check(fake) == []

    beyond = dict(pin)
    beyond["value"] = pin["value"] * 1.25  # outside ±10%
    (fake / "artifacts" / "BENCH_LOCAL.json").write_text(json.dumps(beyond))
    errors = mod.check(fake)
    assert errors and any("re-pin" in e for e in errors)
