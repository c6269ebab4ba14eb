"""Fixed-capacity, mask-padded graph containers (the jit-friendly data model).

The reference keeps PyG ``HeteroData`` with dynamically sized edge tensors
(data_loader.py:113-162) and already masks dead nodes instead of deleting
rows (graph_trajectory.py:906-951).  Here that convention is made explicit
and static:

* node arrays are padded to fixed capacities with 0/1 live masks;
* adjacency is stored destination-major in ELL ("padded neighbor list")
  form — every junction has exactly 3 junction and 3 grain neighbors
  (reference invariant, graph_trajectory.py:985-988), and each grain keeps a
  fixed-capacity ring of junctions — so segment softmax / segment sum become
  dense masked reductions over a static neighbor axis with **no scatters**;
* the directed joint-joint COO edge list is retained (padded) because the
  classifier head scores each directed jj edge (models.py:595-609) and the
  topology editor rewires COO edges.

Everything is a registered pytree (`flax.struct.dataclass`), so samples flow
through jit/vmap/pjit and stack into batches with a tree-map.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import schema


@struct.dataclass
class GraphSample:
    """One padded heterogeneous grain graph (optionally with training targets).

    Leading batch dimensions are allowed on every field (use `stack`).
    """

    # node features (gradient-augmented schema) and live masks
    grain_x: jnp.ndarray   # [NG, 11] float32
    joint_x: jnp.ndarray   # [NJ, 8] float32
    grain_mask: jnp.ndarray  # [NG] float32
    joint_mask: jnp.ndarray  # [NJ] float32

    # ELL adjacency, destination-major
    # ('grain','push','joint'): the 3 grain neighbors feeding each junction
    push_nbr: jnp.ndarray    # [NJ, 3] int32
    push_len: jnp.ndarray    # [NJ, 3] float32 (gj edge length)
    push_mask: jnp.ndarray   # [NJ, 3] float32
    # ('joint','connect','joint'): the 3 junction neighbors of each junction
    connect_nbr: jnp.ndarray   # [NJ, 3] int32
    connect_len: jnp.ndarray   # [NJ, 3] float32
    connect_mask: jnp.ndarray  # [NJ, 3] float32
    # ('joint','pull','grain'): the ring of junctions around each grain
    pull_nbr: jnp.ndarray    # [NG, K] int32
    pull_len: jnp.ndarray    # [NG, K] float32
    pull_mask: jnp.ndarray   # [NG, K] float32

    # directed joint-joint COO edges (classifier pair head + topology labels)
    jj_src: jnp.ndarray   # [E] int32
    jj_dst: jnp.ndarray   # [E] int32
    jj_len: jnp.ndarray   # [E] float32
    jj_mask: jnp.ndarray  # [E] float32

    # training targets (zeros when absent)
    y_grain: jnp.ndarray      # [NG, 2] scaled [darea, extraV]
    y_joint: jnp.ndarray      # [NJ, 2] scaled [dx, dy]
    y_edge_event: jnp.ndarray  # [E] float32 in {-100, 0, 1}
    y_grain_event: jnp.ndarray  # [NG] float32 in {0, 1}
    y_edge: jnp.ndarray       # [E] float32 scaled edge-length change
    y_edge_mask: jnp.ndarray  # [E] float32

    # unpadded row counts (the reference's loss averages over ALL rows of its
    # trajectory-sized arrays, train.py:33-38 — keep those denominators exact
    # under padding)
    n_grain_rows: jnp.ndarray  # scalar float32
    n_joint_rows: jnp.ndarray  # scalar float32
    n_jj_rows: jnp.ndarray     # scalar float32

    @property
    def num_grains(self) -> int:
        return self.grain_x.shape[-2]

    @property
    def num_joints(self) -> int:
        return self.joint_x.shape[-2]

    @property
    def num_jj_edges(self) -> int:
        return self.jj_src.shape[-1]


def _pad2(a: np.ndarray, rows: int, fill=0.0) -> np.ndarray:
    a = np.asarray(a)
    out = np.full((rows,) + a.shape[1:], fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


def build_ell(
    src: np.ndarray,
    dst: np.ndarray,
    attr: np.ndarray,
    num_dst: int,
    max_deg: int,
):
    """Destination-major padded neighbor lists from a COO edge list (host)."""
    nbr = np.zeros((num_dst, max_deg), dtype=np.int32)
    length = np.zeros((num_dst, max_deg), dtype=np.float32)
    mask = np.zeros((num_dst, max_deg), dtype=np.float32)
    fill = np.zeros(num_dst, dtype=np.int32)
    for s, d, a in zip(src, dst, attr):
        if s < 0 or d < 0:
            continue
        k = fill[d]
        if k >= max_deg:
            raise ValueError(
                f"degree overflow: dst {d} has more than {max_deg} neighbors"
            )
        nbr[d, k] = s
        length[d, k] = a
        mask[d, k] = 1.0
        fill[d] += 1
    return nbr, length, mask


def build_sample(
    feature_dicts: Dict[str, np.ndarray],
    edge_index_dicts: Dict[tuple, np.ndarray],
    edge_weight_dicts: Dict[tuple, np.ndarray],
    mask_dicts: Dict[str, np.ndarray],
    target_dicts: Optional[Dict[str, np.ndarray]] = None,
    *,
    grain_cap: Optional[int] = None,
    joint_cap: Optional[int] = None,
    jj_edge_cap: Optional[int] = None,
    grain_ring: int = schema.DEFAULT_GRAIN_RING,
) -> GraphSample:
    """Build a padded `GraphSample` from reference-layout numpy dicts.

    The input layout matches graph_trajectory.form_states_tensor
    (graph_trajectory.py:901-1005) after gradient augmentation
    (graph_datastruct.py:851-1011): features already include the appended
    gradient columns.
    """
    gx = np.asarray(feature_dicts["grain"], dtype=np.float32)
    jx = np.asarray(feature_dicts["joint"], dtype=np.float32)
    ng, nj = gx.shape[0], jx.shape[0]
    NG = grain_cap or ng
    NJ = joint_cap or nj
    if NG < ng or NJ < nj:
        raise ValueError("capacity smaller than live node count")

    gmask = np.asarray(mask_dicts["grain"], dtype=np.float32).reshape(-1)
    jmask = np.asarray(mask_dicts["joint"], dtype=np.float32).reshape(-1)

    push_t, pull_t, connect_t = schema.EDGE_TYPES

    def coo(et):
        e = np.asarray(edge_index_dicts[et], dtype=np.int64)
        w = np.asarray(edge_weight_dicts[et], dtype=np.float32).reshape(-1)
        # drop sentinel (-1) edges
        live = (e[0] >= 0) & (e[1] >= 0)
        return e[0][live], e[1][live], w[live], live

    p_src, p_dst, p_w, _ = coo(push_t)
    c_src, c_dst, c_w, jj_live = coo(connect_t)
    q_src, q_dst, q_w, _ = coo(pull_t)

    push_nbr, push_len, push_mask = build_ell(p_src, p_dst, p_w, NJ, schema.JG_DEGREE)
    connect_nbr, connect_len, connect_mask = build_ell(
        c_src, c_dst, c_w, NJ, schema.JJ_DEGREE
    )
    pull_nbr, pull_len, pull_mask = build_ell(q_src, q_dst, q_w, NG, grain_ring)

    E = jj_edge_cap or len(c_src)
    if E < len(c_src):
        raise ValueError("jj edge capacity too small")
    jj_src = _pad2(c_src.astype(np.int32), E)
    jj_dst = _pad2(c_dst.astype(np.int32), E)
    jj_len = _pad2(c_w.astype(np.float32), E)
    jj_mask = np.zeros(E, dtype=np.float32)
    jj_mask[: len(c_src)] = 1.0

    zeros_g2 = np.zeros((NG, 2), dtype=np.float32)
    zeros_j2 = np.zeros((NJ, 2), dtype=np.float32)
    y_grain, y_joint = zeros_g2, zeros_j2
    y_edge_event = np.full(E, float(schema.EDGE_EVENT_INVALID), dtype=np.float32)
    y_grain_event = np.zeros(NG, dtype=np.float32)
    y_edge = np.zeros(E, dtype=np.float32)
    y_edge_mask = np.zeros(E, dtype=np.float32)

    if target_dicts:
        if "grain" in target_dicts:
            y_grain = _pad2(np.asarray(target_dicts["grain"], np.float32), NG)
        if "joint" in target_dicts:
            y_joint = _pad2(np.asarray(target_dicts["joint"], np.float32), NJ)
        if "grain_event" in target_dicts:
            y_grain_event = _pad2(
                np.asarray(target_dicts["grain_event"], np.float32).reshape(-1), NG
            )
        if "edge_event" in target_dicts:
            # labels are given on live jj edges only (graph_datastruct.py:898)
            lab = np.asarray(target_dicts["edge_event"], np.float32).reshape(-1)
            y_edge_event = _pad2(lab, E, fill=float(schema.EDGE_EVENT_INVALID))
        if "edge" in target_dicts:
            y_edge = _pad2(np.asarray(target_dicts["edge"], np.float32).reshape(-1), E)
        if "edge_mask" in target_dicts:
            y_edge_mask = _pad2(
                np.asarray(target_dicts["edge_mask"], np.float32).reshape(-1), E
            )

    return GraphSample(
        grain_x=jnp.asarray(_pad2(gx, NG)),
        joint_x=jnp.asarray(_pad2(jx, NJ)),
        grain_mask=jnp.asarray(_pad2(gmask, NG)),
        joint_mask=jnp.asarray(_pad2(jmask, NJ)),
        push_nbr=jnp.asarray(push_nbr),
        push_len=jnp.asarray(push_len),
        push_mask=jnp.asarray(push_mask),
        connect_nbr=jnp.asarray(connect_nbr),
        connect_len=jnp.asarray(connect_len),
        connect_mask=jnp.asarray(connect_mask),
        pull_nbr=jnp.asarray(pull_nbr),
        pull_len=jnp.asarray(pull_len),
        pull_mask=jnp.asarray(pull_mask),
        jj_src=jnp.asarray(jj_src),
        jj_dst=jnp.asarray(jj_dst),
        jj_len=jnp.asarray(jj_len),
        jj_mask=jnp.asarray(jj_mask),
        y_grain=jnp.asarray(y_grain),
        y_joint=jnp.asarray(y_joint),
        y_edge_event=jnp.asarray(y_edge_event),
        y_grain_event=jnp.asarray(y_grain_event),
        y_edge=jnp.asarray(y_edge),
        y_edge_mask=jnp.asarray(y_edge_mask),
        n_grain_rows=jnp.asarray(float(ng), jnp.float32),
        n_joint_rows=jnp.asarray(float(nj), jnp.float32),
        n_jj_rows=jnp.asarray(float(len(c_src)), jnp.float32),
    )


def stack(samples) -> GraphSample:
    """Stack equally padded samples into one batched GraphSample."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *samples)


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def build_ell_device(
    src: "jnp.ndarray",
    dst: "jnp.ndarray",
    attr: "jnp.ndarray",
    num_dst: int,
    max_deg: int,
):
    """jit-compatible destination-major ELL construction from a padded COO
    edge list (-1 marks dead columns). Counterpart of the host `build_ell`;
    slot order matches it (ascending edge index per destination), so the
    masked-softmax attention sees identical neighbor ordering.

    O(num_dst * E) comparisons — trivial at grain-graph sizes, and it keeps
    the whole rollout step on device when combined with the jit topology
    editor (rollout.topology_jit).
    """
    E = src.shape[0]
    live = (src >= 0) & (dst >= 0)

    def row(j):
        cond = live & (dst == j)
        # top_k over negated indices = first-max_deg ascending nonzero; XLA's
        # nonzero cumsum lowering is quadratic on TPU (see
        # rollout.topology_jit._nonzero)
        key = jnp.where(cond, -jnp.arange(E, dtype=jnp.int32), jnp.int32(-(2**30)))
        v, _ = jax.lax.top_k(key, max_deg)
        ok = v > -(2**30)
        idx_safe = jnp.where(ok, -v, 0)
        nbr = jnp.where(ok, src[idx_safe], 0)
        length = jnp.where(ok, attr[idx_safe], 0.0)
        return nbr.astype(jnp.int32), length, ok.astype(jnp.float32)

    return jax.vmap(row)(jnp.arange(num_dst))
