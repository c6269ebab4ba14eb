"""graingraphnn_tpu — a TPU-native (JAX/XLA/Pallas) framework for dynamic
heterogeneous grain-graph neural networks.

Re-designed from scratch with the capabilities of YigongQin/GrainGraphNN
(reference mounted read-only at /root/reference): a GNN surrogate for 3D grain
microstructure evolution in additive-manufacturing solidification, built around

  * a periodic graph-transformer convolution (reference: periodGATconv.py),
  * heterogeneous graph-conv LSTM cells (reference: heteropgclstm.py),
  * regressor + classifier models with a dynamic-topology rollout engine
    (reference: models.py, test.py, graph_trajectory.py).

The TPU-first architecture differs deliberately from the reference:

  * Graphs are immutable pytrees of fixed-capacity padded arrays with live
    masks (`graph.state.GraphSample`) — no dynamic shapes under jit.
  * Message passing uses a padded-neighbor (ELL) adjacency so that segment
    softmax / segment sum become dense masked reductions over a static
    neighbor axis — no scatters in the hot path.
  * The periodic relative-position encoding is decomposed algebraically so
    that all input-dimension matmuls run per *node* on the MXU and only
    hidden-dimension gathers plus a 3-vector shift correction run per edge.
  * The four LSTM gates are fused into one convolution with 4x-wide outputs
    per edge type (`models.cells`).
  * Data/tensor/graph parallelism is expressed with `jax.sharding` meshes and
    XLA collectives (`parallel/`), not NCCL.
"""

__version__ = "0.1.0"
