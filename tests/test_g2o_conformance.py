"""g2o ASCII conformance: pin the export to a hand-verified fixture.

No g2o build or wheel is reachable from this rig (zero egress — see
BASELINE.md), so the export format is pinned two ways instead:

1. a COMMITTED byte-exact fixture (tests/golden/conformance.g2o) whose
   every line was hand-checked against the g2o source grammar:
     * VERTEX_SE3:QUAT  id tx ty tz qx qy qz qw          (vertex_se3.cpp)
     * FIX id                                  (OptimizableGraph::save)
     * VERTEX_TRACKXYZ  id x y z                   (vertex_pointxyz.cpp)
     * EDGE_SE3:QUAT    id1 id2 tx ty tz qx qy qz qw  + 21 upper-tri 6x6
     * EDGE_SE3_TRACKXYZ id1 id2 paramId x y z       + 6 upper-tri 3x3
       (edge_se3_pointxyz.cpp: writeParamIds BEFORE the measurement)
     * PARAMS_SE3OFFSET id tx ty tz qx qy qz qw   (parameter_se3_offset)
   with the reference's conventions on top: identity offset parameter id 0
   (graph_slam.cpp:75-83), one id counter shared across vertex types with
   SE3 first (graph_slam.cpp:106,129), first SE3 vertex fixed;
2. an independent grammar validator in this file (token counts, id ranges,
   quaternion normalization, info-matrix symmetry/PSD) applied to every
   line — parsing rules derived from the g2o sources, not from g2o_io.py.
"""

import math
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.graph import state as gs
from semantic_slam_tpu.io import g2o_io

GOLDEN = Path(__file__).parent / "golden" / "conformance.g2o"


def _fixture_graph():
    """Tiny exactly-specified graph: 3 keyframes, 2 landmarks, 2 odom
    edges, 3 observation edges."""
    g = gs.make_graph(4, 4, 4, 4, dtype=jnp.float64)
    poses = jnp.asarray(
        [
            [0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
            [2.0, 0.5, 0.0, math.sqrt(0.5), 0.0, 0.0, math.sqrt(0.5)],
        ]
    )
    lms = jnp.asarray([[1.5, 2.0, 0.5], [2.5, -1.0, 0.25]])
    meas = jnp.asarray(
        [
            [1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0],
            [1.0, 0.5, 0.0, math.sqrt(0.5), 0.0, 0.0, math.sqrt(0.5)],
        ]
    )
    info6 = jnp.tile(jnp.diag(jnp.asarray([150.0, 150.0, 150.0, 1e5, 1e5, 1e5]))[None], (2, 1, 1))
    lmeas = jnp.asarray([[1.5, 2.0, 0.5], [0.5, 2.0, 0.5], [0.75, 1.25, 0.25]])
    info3 = jnp.tile((10.0 * jnp.eye(3))[None], (3, 1, 1))
    return g._replace(
        poses=g.poses.at[:3].set(poses),
        num_poses=jnp.asarray(3, jnp.int32),
        landmarks=g.landmarks.at[:2].set(lms),
        num_landmarks=jnp.asarray(2, jnp.int32),
        odom_i=g.odom_i.at[:2].set(jnp.asarray([0, 1], jnp.int32)),
        odom_j=g.odom_j.at[:2].set(jnp.asarray([1, 2], jnp.int32)),
        odom_meas=g.odom_meas.at[:2].set(meas),
        odom_info=g.odom_info.at[:2].set(info6),
        num_odom=jnp.asarray(2, jnp.int32),
        lme_k=g.lme_k.at[:3].set(jnp.asarray([0, 1, 2], jnp.int32)),
        lme_l=g.lme_l.at[:3].set(jnp.asarray([0, 0, 1], jnp.int32)),
        lme_meas=g.lme_meas.at[:3].set(lmeas),
        lme_info=g.lme_info.at[:3].set(info3),
        num_lme=jnp.asarray(3, jnp.int32),
    )


def test_export_matches_committed_fixture(tmp_path):
    path = tmp_path / "out.g2o"
    g2o_io.save_g2o(str(path), _fixture_graph())
    assert path.read_text() == GOLDEN.read_text()


def test_fixture_satisfies_g2o_grammar():
    """Independent validator: every line checked against the g2o source
    grammar (field counts/types per tag, id conventions, symmetric info)."""
    lines = GOLDEN.read_text().splitlines()
    n_se3 = n_xyz = 0
    ids_seen = set()
    fixed = []
    for ln in lines:
        tok = ln.split()
        tag = tok[0]
        if tag == "PARAMS_SE3OFFSET":
            assert len(tok) == 9
            assert int(tok[1]) == 0  # reference registers offset param id 0
            vals = list(map(float, tok[2:9]))
            assert vals == [0, 0, 0, 0, 0, 0, 1]  # identity offset
        elif tag == "VERTEX_SE3:QUAT":
            assert len(tok) == 9
            vid = int(tok[1])
            assert vid == n_se3  # SE3 vertices first, consecutive from 0
            ids_seen.add(vid)
            q = np.array(list(map(float, tok[5:9])))  # qx qy qz qw
            np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)
            n_se3 += 1
        elif tag == "FIX":
            assert len(tok) == 2
            fixed.append(int(tok[1]))
        elif tag == "VERTEX_TRACKXYZ":
            assert len(tok) == 5
            vid = int(tok[1])
            assert vid == n_se3 + n_xyz  # shared counter, landmarks after
            ids_seen.add(vid)
            n_xyz += 1
        elif tag == "EDGE_SE3:QUAT":
            # id1 id2 + 7 measurement + 21 upper-tri of 6x6
            assert len(tok) == 1 + 2 + 7 + 21
            assert int(tok[1]) in ids_seen and int(tok[2]) in ids_seen
            q = np.array(list(map(float, tok[6:10])))
            np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)
            ut = np.array(list(map(float, tok[10:31])))
            m = np.zeros((6, 6))
            k = 0
            for i in range(6):
                for j in range(i, 6):
                    m[i, j] = m[j, i] = ut[k]
                    k += 1
            assert np.all(np.linalg.eigvalsh(m) > 0)
        elif tag == "EDGE_SE3_TRACKXYZ":
            # id1 id2 paramId + 3 measurement + 6 upper-tri of 3x3
            assert len(tok) == 1 + 2 + 1 + 3 + 6
            assert int(tok[1]) < n_se3  # pose side
            assert n_se3 <= int(tok[2]) < n_se3 + n_xyz  # landmark side
            assert int(tok[3]) == 0  # offset parameter id
            ut = np.array(list(map(float, tok[7:13])))
            m = np.zeros((3, 3))
            k = 0
            for i in range(3):
                for j in range(i, 3):
                    m[i, j] = m[j, i] = ut[k]
                    k += 1
            assert np.all(np.linalg.eigvalsh(m) > 0)
        else:
            raise AssertionError(f"unknown tag {tag}")
    assert fixed == [0]  # exactly the first SE3 vertex is fixed
    assert n_se3 == 3 and n_xyz == 2


def test_fixture_round_trips():
    g = g2o_io.load_g2o(str(GOLDEN))
    ref = _fixture_graph()
    np.testing.assert_allclose(np.asarray(g.poses[:3]), np.asarray(ref.poses[:3]), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(g.landmarks[:2]), np.asarray(ref.landmarks[:2]), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(g.lme_meas[:3]), np.asarray(ref.lme_meas[:3]), atol=1e-12
    )
