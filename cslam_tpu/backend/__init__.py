"""Pose-graph optimization back-end: GNC-robust Gauss-Newton/LM in JAX,
factor-graph containers, g2o I/O, distributed multi-robot solves."""
