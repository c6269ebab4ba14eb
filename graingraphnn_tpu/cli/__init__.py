"""Command-line drivers, mirroring the reference's entry points:

  python -m graingraphnn_tpu.cli.extract    (graph_trajectory.py __main__)
  python -m graingraphnn_tpu.cli.train      (train.py)
  python -m graingraphnn_tpu.cli.dist_train (dist_train.py — dp over mesh)
  python -m graingraphnn_tpu.cli.test       (test.py rollout inference)
"""
