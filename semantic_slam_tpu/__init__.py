"""semantic_slam_tpu — TPU-native visual planar semantic SLAM (VPS-SLAM class).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hridaybavle/semantic_slam: VIO-pose ingestion, planar-surface extraction from
RGB-D clouds inside detector bounding boxes, semantic landmark association,
and SE(3)+point pose-graph optimization via a batched Schur-complement LM
solver, shardable over a TPU device mesh.
"""

__version__ = "0.1.0"

from semantic_slam_tpu.config import PROFILES, SlamConfig  # noqa: F401


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name == "SlamEngine":
        from semantic_slam_tpu.runtime.engine import SlamEngine

        return SlamEngine
    if name == "replay":
        from semantic_slam_tpu.io import replay

        return replay
    raise AttributeError(name)
