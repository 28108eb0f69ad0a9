"""Fitness-weighted odometry-edge information (the reference's dead path,
made real).

``InformationMatrixCalculator::calc_information_matrix``'s non-constant
branch (/root/reference/src/ps_graph_slam/information_matrix_calculator.cpp:
37-50) is dead code there: every shipped config sets
``use_const_inf_matrix: true``, the fitness score is hardcoded to 0.9 (the
``calc_fitness_score(cloud1, cloud2, relpose)`` call is commented out), and
the weight parameters (``var_gain_a``, ``min/max_stddev_x/q``,
``fitness_score_thresh``) are declared but NEVER initialized
(information_matrix_calculator.hpp:26-38) — enabling it would read
indeterminate values. This module implements the evident intent — the
hdl_graph_slam scheme the reference's class descends from — as a working
opt-in (``InformationConfig.use_const_inf_matrix=False``):

* ``fitness_score``: mean squared nearest-neighbor distance between the two
  keyframes' clouds with the second transformed by the measured relative
  pose (what the commented-out call computed) — TPU-native as a strided
  subsample + one [S,S] distance matmul on the MXU instead of a kd-tree;
* ``weight``: the exact saturating-exponential interpolation of the
  reference header (information_matrix_calculator.hpp:20-24), including its
  misleading argument name (``max_x`` is the fitness threshold);
* ``fitness_info6``: identity with the translation/rotation blocks divided
  by the interpolated VARIANCE — note the asymmetry with the constant path,
  which divides by the STDDEV (PARITY quirk 3); the fitness branch of the
  reference divides by ``w_x`` = an interpolated variance, so we keep each
  branch faithful to itself.

Default parameters are hdl_graph_slam's (the upstream project): var_gain_a
20.0, stddev_x in [0.1, 5.0], stddev_q in [0.05, 0.2], threshold 0.5.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.core import geometry as geo


def weight(a: float, max_x: float, min_y: float, max_y: float, x: float) -> float:
    """information_matrix_calculator.hpp:20-24, verbatim semantics."""
    y = (1.0 - math.exp(-a * x)) / (1.0 - math.exp(-a * max_x))
    return min_y + (max_y - min_y) * y


@partial(jax.jit, static_argnames=("S",))
def fitness_score(
    points_a: jax.Array,  # [..., 3] cam-frame cloud at keyframe a (flattened ok)
    valid_a: jax.Array,
    points_b: jax.Array,  # [..., 3] cloud at keyframe b
    valid_b: jax.Array,
    relpose7: jax.Array,  # a^-1 b (the odometry edge measurement)
    max_range: float = 2.0,
    S: int = 1024,
) -> jax.Array:
    """Mean squared NN distance of (relpose * b) against a, over a strided
    S-point subsample of each cloud; pairs farther than ``max_range`` don't
    count (hdl_graph_slam's calc_fitness_score contract: returns
    max_range^2 when nothing matches)."""
    pa = points_a.reshape(-1, 3)
    pb = points_b.reshape(-1, 3)
    va = valid_a.reshape(-1)
    vb = valid_b.reshape(-1)
    dtype = pa.dtype

    ia = jnp.linspace(0, pa.shape[0] - 1, S).astype(jnp.int32)
    ib = jnp.linspace(0, pb.shape[0] - 1, S).astype(jnp.int32)
    A, wa = pa[ia], va[ia].astype(dtype)
    B, wb = pb[ib], vb[ib].astype(dtype)

    Bt = jax.vmap(lambda p: geo.pose_apply(relpose7, p))(B)

    big = jnp.asarray(1e12, dtype)
    # [S,S] squared distances via the (|x|^2 + |y|^2 - 2 x.y) expansion —
    # the cross term is one MXU matmul
    d2 = (
        jnp.sum(Bt * Bt, axis=1)[:, None]
        + jnp.sum(A * A, axis=1)[None, :]
        - 2.0 * (Bt @ A.T)
    )
    d2 = jnp.where(wa[None, :] > 0, d2, big)
    nn = jnp.min(d2, axis=1)  # per-b nearest squared distance
    ok = (wb > 0) & (nn <= max_range * max_range)
    n = jnp.sum(ok.astype(dtype))
    mean = jnp.sum(jnp.where(ok, nn, 0.0)) / jnp.maximum(n, 1.0)
    return jnp.where(n > 0, mean, jnp.asarray(max_range * max_range, dtype))


def fitness_info6(
    fitness: float,
    var_gain_a: float,
    min_stddev_x: float,
    max_stddev_x: float,
    min_stddev_q: float,
    max_stddev_q: float,
    fitness_score_thresh: float,
    dtype=np.float32,
) -> np.ndarray:
    """The reference's fitness branch (information_matrix_calculator.cpp:
    37-50) with real parameters: interpolate variances by the fitness score
    and divide identity blocks by them."""
    min_var_x, max_var_x = min_stddev_x**2, max_stddev_x**2
    min_var_q, max_var_q = min_stddev_q**2, max_stddev_q**2
    f = min(float(fitness), fitness_score_thresh)
    w_x = weight(var_gain_a, fitness_score_thresh, min_var_x, max_var_x, f)
    w_q = weight(var_gain_a, fitness_score_thresh, min_var_q, max_var_q, f)
    inf = np.eye(6, dtype=dtype)
    inf[:3, :3] /= w_x
    inf[3:, 3:] /= w_q
    return inf
