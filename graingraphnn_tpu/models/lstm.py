"""Per-node-type temporal LSTM over past gradient features
(reference models.LSTM, models.py:304-347): the optional `history` branch of
both GrainNN models. A 2-layer LSTM (torch gate order i,f,g,o) runs over the
de-interleaved window of past per-feature gradients and its last hidden
state is concatenated to the graph encoder output."""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

NUM_LAYERS = 2  # models.py:320


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_lstm(key, input_dim: int, hidden: int, dtype=jnp.float32) -> Dict:
    """torch.nn.LSTM default init: U(-1/sqrt(H), 1/sqrt(H)) for all params."""
    layers = []
    bound = 1.0 / math.sqrt(hidden)
    for layer in range(NUM_LAYERS):
        in_dim = input_dim if layer == 0 else hidden
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        layers.append({
            "w_ih": _uniform(k1, (in_dim, 4 * hidden), bound, dtype),
            "w_hh": _uniform(k2, (hidden, 4 * hidden), bound, dtype),
            "b_ih": _uniform(k3, (4 * hidden,), bound, dtype),
            "b_hh": _uniform(k4, (4 * hidden,), bound, dtype),
        })
    return {"layers": layers}


def apply_lstm(params: Dict, x: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """x: [N, T, D] -> last-step hidden state [N, H]."""
    H = hidden

    def cell_step(layer, carry, x_t):
        h, c = carry
        gates = (
            x_t @ layer["w_ih"] + layer["b_ih"] + h @ layer["w_hh"] + layer["b_hh"]
        )
        i = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        f = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    seq = jnp.swapaxes(x, 0, 1)  # [T, N, D]
    out = seq
    for layer in params["layers"]:
        N = x.shape[0]
        init = (jnp.zeros((N, H), x.dtype), jnp.zeros((N, H), x.dtype))
        _, out = jax.lax.scan(lambda c, xt: cell_step(layer, c, xt), init, out)
    return out[-1]


def history_inputs(x: jnp.ndarray, dim: int, seq_len: int) -> jnp.ndarray:
    """De-interleave the trailing seq_len*dim gradient columns into a
    time-major window, oldest first (models.py:328-341: strided slices per
    feature, flipped along time)."""
    feats = []
    for i in range(dim):
        cols = x[:, x.shape[1] - seq_len * dim + i :: dim]  # [N, seq_len]
        feats.append(jnp.flip(cols, axis=1))
    return jnp.stack(feats, axis=2)  # [N, seq_len, dim]
