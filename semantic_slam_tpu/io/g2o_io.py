"""g2o ASCII graph save/load.

``GraphSLAM::save`` dumps the optimizer in g2o's text format
(``graph_slam.cpp:236-239``); this module writes the same vertex/edge tags
(VERTEX_SE3:QUAT, VERTEX_TRACKXYZ, EDGE_SE3:QUAT, EDGE_SE3_TRACKXYZ,
PARAMS_SE3OFFSET) so graphs cross-load into stock g2o tooling for
validation, and — unlike the reference, which has no restore path at all —
also loads them back (SURVEY.md §5 checkpoint/resume gap)."""

from __future__ import annotations

import numpy as np

from semantic_slam_tpu.graph.state import GraphState


def _upper_triangular(m: np.ndarray) -> list[float]:
    n = m.shape[0]
    return [float(m[i, j]) for i in range(n) for j in range(i, n)]


def save_g2o(path: str, g: GraphState, pn=None) -> None:
    """Write the graph; pass PlaneNodes as ``pn`` to also emit VERTEX_PLANE /
    EDGE_SE3_PLANE records (the wire format of the reference's disabled
    custom edge, edge_se3_plane.hpp:28-47: 4 plane coeffs + upper-tri info;
    VERTEX_PLANE follows g2o slam3d_addons: coeffs + RGB color)."""
    K = int(g.num_poses)
    L = int(g.num_landmarks)
    poses = np.asarray(g.poses[:K], np.float64)
    lms = np.asarray(g.landmarks[:L], np.float64)
    with open(path, "w") as f:
        # identity sensor offset, parameter id 0 (graph_slam.cpp:75-83)
        f.write("PARAMS_SE3OFFSET 0 0 0 0 0 0 0 1\n")
        # vertex ids share one counter across types, SE3 first (quirk 10:
        # ids come from vertices().size(); here keyframes precede landmarks)
        for i, p in enumerate(poses):
            tx, ty, tz, qw, qx, qy, qz = p
            f.write(f"VERTEX_SE3:QUAT {i} {tx} {ty} {tz} {qx} {qy} {qz} {qw}\n")
            if i == 0:
                f.write("FIX 0\n")
        for l, x in enumerate(lms):
            f.write(f"VERTEX_TRACKXYZ {K + l} {x[0]} {x[1]} {x[2]}\n")
        E1 = int(g.num_odom)
        oi = np.asarray(g.odom_i[:E1])
        oj = np.asarray(g.odom_j[:E1])
        om = np.asarray(g.odom_meas[:E1], np.float64)
        oinfo = np.asarray(g.odom_info[:E1], np.float64)
        for e in range(E1):
            tx, ty, tz, qw, qx, qy, qz = om[e]
            ut = " ".join(str(v) for v in _upper_triangular(oinfo[e]))
            f.write(
                f"EDGE_SE3:QUAT {oi[e]} {oj[e]} {tx} {ty} {tz} {qx} {qy} {qz} {qw} {ut}\n"
            )
        E2 = int(g.num_lme)
        lk = np.asarray(g.lme_k[:E2])
        ll = np.asarray(g.lme_l[:E2])
        lmeas = np.asarray(g.lme_meas[:E2], np.float64)
        linfo = np.asarray(g.lme_info[:E2], np.float64)
        for e in range(E2):
            ut = " ".join(str(v) for v in _upper_triangular(linfo[e]))
            f.write(
                f"EDGE_SE3_TRACKXYZ {lk[e]} {K + ll[e]} 0 "
                f"{lmeas[e,0]} {lmeas[e,1]} {lmeas[e,2]} {ut}\n"
            )
        if pn is not None:
            P = int(pn.num_planes)
            planes = np.asarray(pn.planes[:P], np.float64)
            for p in range(P):
                n = planes[p]
                f.write(
                    f"VERTEX_PLANE {K + L + p} {n[0]} {n[1]} {n[2]} {n[3]} 0 0 0\n"
                )
            E3 = int(pn.num_pe)
            pk = np.asarray(pn.pe_k[:E3])
            pp = np.asarray(pn.pe_p[:E3])
            pmeas = np.asarray(pn.pe_meas[:E3], np.float64)
            pinfo = np.asarray(pn.pe_info[:E3], np.float64)
            for e in range(E3):
                ut = " ".join(str(v) for v in _upper_triangular(pinfo[e]))
                m = pmeas[e]
                f.write(
                    f"EDGE_SE3_PLANE {pk[e]} {K + L + pp[e]} "
                    f"{m[0]} {m[1]} {m[2]} {m[3]} {ut}\n"
                )


def load_g2o(path: str, make_graph_fn=None, with_planes: bool = False):
    """Parse a graph written by save_g2o back into a GraphState (and, with
    ``with_planes=True``, a PlaneNodes alongside)."""
    import jax.numpy as jnp

    from semantic_slam_tpu.graph import state as gs

    poses, lms = [], []
    pose_ids: dict[int, int] = {}
    lm_ids: dict[int, int] = {}
    odom, lme = [], []
    planes: list[list[float]] = []
    plane_ids: dict[int, int] = {}
    pedges = []

    def sym_from_ut(vals, n):
        m = np.zeros((n, n))
        it = iter(vals)
        for i in range(n):
            for j in range(i, n):
                m[i, j] = m[j, i] = next(it)
        return m

    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            tag = tok[0]
            if tag == "VERTEX_SE3:QUAT":
                vid = int(tok[1])
                tx, ty, tz, qx, qy, qz, qw = map(float, tok[2:9])
                pose_ids[vid] = len(poses)
                poses.append([tx, ty, tz, qw, qx, qy, qz])
            elif tag == "VERTEX_TRACKXYZ":
                vid = int(tok[1])
                lm_ids[vid] = len(lms)
                lms.append([float(tok[2]), float(tok[3]), float(tok[4])])
            elif tag == "EDGE_SE3:QUAT":
                i, j = int(tok[1]), int(tok[2])
                tx, ty, tz, qx, qy, qz, qw = map(float, tok[3:10])
                info = sym_from_ut([float(v) for v in tok[10:31]], 6)
                odom.append((i, j, [tx, ty, tz, qw, qx, qy, qz], info))
            elif tag == "EDGE_SE3_TRACKXYZ":
                i, j = int(tok[1]), int(tok[2])
                meas = [float(tok[4]), float(tok[5]), float(tok[6])]
                info = sym_from_ut([float(v) for v in tok[7:13]], 3)
                lme.append((i, j, meas, info))
            elif tag == "VERTEX_PLANE":
                vid = int(tok[1])
                plane_ids[vid] = len(planes)
                planes.append([float(t) for t in tok[2:6]])
            elif tag == "EDGE_SE3_PLANE":
                i, j = int(tok[1]), int(tok[2])
                meas = [float(t) for t in tok[3:7]]
                info = sym_from_ut([float(v) for v in tok[7:13]], 3)
                pedges.append((i, j, meas, info))

    def cap(n):
        c = 16
        while c < n:
            c *= 2
        return c

    g = gs.make_graph(
        cap(len(poses)), cap(max(len(lms), 1)), cap(max(len(odom), 1)),
        cap(max(len(lme), 1)), dtype=jnp.float64,
    )
    K, L, E1, E2 = len(poses), len(lms), len(odom), len(lme)
    g = g._replace(
        poses=g.poses.at[:K].set(jnp.asarray(poses)),
        num_poses=jnp.asarray(K, jnp.int32),
        landmarks=g.landmarks.at[:L].set(jnp.asarray(np.asarray(lms).reshape(L, 3))),
        num_landmarks=jnp.asarray(L, jnp.int32),
    )
    if E1:
        g = g._replace(
            odom_i=g.odom_i.at[:E1].set(jnp.asarray([pose_ids[e[0]] for e in odom], jnp.int32)),
            odom_j=g.odom_j.at[:E1].set(jnp.asarray([pose_ids[e[1]] for e in odom], jnp.int32)),
            odom_meas=g.odom_meas.at[:E1].set(jnp.asarray([e[2] for e in odom])),
            odom_info=g.odom_info.at[:E1].set(jnp.asarray([e[3] for e in odom])),
            num_odom=jnp.asarray(E1, jnp.int32),
        )
    if E2:
        g = g._replace(
            lme_k=g.lme_k.at[:E2].set(jnp.asarray([pose_ids[e[0]] for e in lme], jnp.int32)),
            lme_l=g.lme_l.at[:E2].set(jnp.asarray([lm_ids[e[1]] for e in lme], jnp.int32)),
            lme_meas=g.lme_meas.at[:E2].set(jnp.asarray([e[2] for e in lme])),
            lme_info=g.lme_info.at[:E2].set(jnp.asarray([e[3] for e in lme])),
            num_lme=jnp.asarray(E2, jnp.int32),
        )
    if not with_planes:
        return g

    from semantic_slam_tpu.graph import planes as planes_ext

    P, E3 = len(planes), len(pedges)
    pn = planes_ext.make_planes(cap(max(P, 1)), cap(max(E3, 1)), dtype=jnp.float64)
    if P:
        pn = pn._replace(
            planes=pn.planes.at[:P].set(jnp.asarray(planes)),
            num_planes=jnp.asarray(P, jnp.int32),
        )
    if E3:
        pn = pn._replace(
            pe_k=pn.pe_k.at[:E3].set(jnp.asarray([pose_ids[e[0]] for e in pedges], jnp.int32)),
            pe_p=pn.pe_p.at[:E3].set(jnp.asarray([plane_ids[e[1]] for e in pedges], jnp.int32)),
            pe_meas=pn.pe_meas.at[:E3].set(jnp.asarray([e[2] for e in pedges])),
            pe_info=pn.pe_info.at[:E3].set(jnp.asarray([e[3] for e in pedges])),
            num_pe=jnp.asarray(E3, jnp.int32),
        )
    return g, pn
