"""Association parity fuzzing.

``reference_associate`` below is a direct Python transcription of
``data_association::find_matches / associate_lanmarks``
(``/root/reference/include/ps_graph_slam/data_association.h:75-318``) —
same loop structure, same candidate order, same thresholds — with the two
documented divergences applied (distance_min reset per detection; stored
world pose instead of the UB node-pointer read). The vectorized
implementation must agree with it on randomized scenarios in both gating
modes, including intra-frame landmark creation chains.
"""

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.assoc import association as assoc
from semantic_slam_tpu.frontend.segmentation import DetectedObjects


def reference_associate(table, dets, use_maha, maha_thres, eq_thres, noise):
    """Transcription of the reference loops. table: dict of lists."""
    results = []
    first_frame = len(table["world"]) == 0
    Q = np.eye(3) * noise
    for j in range(len(dets["w"])):
        if not dets["valid"][j]:
            results.append((0, False))
            continue
        w = dets["w"][j]
        if first_frame:
            # find_matches first-object path: map new, no matching (:79-85)
            lid = len(table["world"])
            table["world"].append(w.copy())
            table["cov"].append(Q.copy())
            table["cls"].append(dets["cls"][j])
            table["pt"].append(dets["pt"][j])
            results.append((lid, True))
            continue
        found = False
        dmin = np.inf  # divergence: reset per detection (quirk 2 FIXED)
        nearest = -1
        for i in range(len(table["world"])):
            if table["cls"][i] != dets["cls"][j]:
                continue
            if table["pt"][i] != dets["pt"][j]:
                continue
            found = True
            z = w - table["world"][i]
            if use_maha:
                d = float(z @ np.linalg.inv(table["cov"][i] + Q) @ z)
            else:
                d = float(np.linalg.norm(z))
            if d < dmin:
                dmin = d
                nearest = i
        thres = maha_thres if use_maha else eq_thres
        if (not found) or dmin > thres:
            lid = len(table["world"])
            table["world"].append(w.copy())
            table["cov"].append(Q.copy())
            table["cls"].append(dets["cls"][j])
            table["pt"].append(dets["pt"][j])
            results.append((lid, True))
        else:
            results.append((nearest, False))
    return results


def run_ours(table_init, dets, use_maha, maha_thres, eq_thres, noise):
    M = len(dets["w"])
    L = 32
    t = assoc.make_table(L, jnp.float64)
    n0 = len(table_init["world"])
    if n0:
        t = assoc.LandmarkTable(
            world=t.world.at[:n0].set(jnp.asarray(np.stack(table_init["world"]))),
            cov=t.cov.at[:n0].set(jnp.asarray(np.stack(table_init["cov"]))),
            class_id=t.class_id.at[:n0].set(jnp.asarray(table_init["cls"], jnp.int32)),
            plane_type=t.plane_type.at[:n0].set(jnp.asarray(table_init["pt"], jnp.int32)),
            normal=t.normal,
            count=jnp.asarray(n0, jnp.int32),
        )
    # detections pass through pose_cam; use identity robot pose and invert the
    # cam->world mapping by feeding cam coords that map onto the target world
    # points: world = T @ [c,1] + t_robot with T = chain at identity. Simpler:
    # exploit linearity — compute the cam coords via the inverse chain.
    from semantic_slam_tpu.core import np_geometry as npg

    T = npg.t_cam_world(np.zeros(6), 0.0)
    R = T[:3, :3]
    cam = (np.stack(dets["w"]) @ np.linalg.inv(R).T)  # world -> cam coords

    d = DetectedObjects(
        valid=jnp.asarray(dets["valid"]),
        class_id=jnp.asarray(dets["cls"], jnp.int32),
        prob=jnp.ones((M,), jnp.float64),
        plane_type=jnp.asarray(dets["pt"], jnp.int32),
        num_points=jnp.full((M,), 500.0, jnp.float64),
        pose_cam=jnp.asarray(cam),
        normal_cam=jnp.tile(jnp.asarray([0, 0, -1, 1.0], jnp.float64), (M, 1)),
        world_pose=jnp.zeros((M, 3), jnp.float64),
    )
    t2, res = assoc.associate(
        t, d, jnp.zeros(6, jnp.float64), jnp.asarray(0.0, jnp.float64),
        jnp.asarray(use_maha), jnp.asarray(maha_thres, jnp.float64),
        jnp.asarray(eq_thres, jnp.float64), jnp.asarray(noise, jnp.float64),
    )
    return t2, res


class TestAssociationFuzz:
    def test_fuzz_against_reference_transcription(self, rng):
        for trial in range(25):
            use_maha = bool(trial % 2)
            n_existing = int(rng.integers(0, 6))
            M = 8
            noise = 0.3
            maha_thres, eq_thres = 6.0, 1.2

            table_ref = {
                "world": [rng.uniform(-4, 4, 3) for _ in range(n_existing)],
                "cov": [np.eye(3) * rng.uniform(0.05, 0.5) for _ in range(n_existing)],
                "cls": [int(rng.integers(0, 3)) for _ in range(n_existing)],
                "pt": [int(rng.integers(0, 2)) for _ in range(n_existing)],
            }
            table_init = {k: [np.copy(v) if isinstance(v, np.ndarray) else v for v in vs] for k, vs in table_ref.items()}

            dets = {
                "w": [],
                "cls": [],
                "pt": [],
                "valid": [],
            }
            for m in range(M):
                if n_existing and rng.random() < 0.5:
                    # near an existing landmark (should match)
                    base = table_ref["world"][int(rng.integers(0, n_existing))]
                    w = base + rng.normal(size=3) * 0.2
                else:
                    w = rng.uniform(-4, 4, 3)
                dets["w"].append(w)
                dets["cls"].append(int(rng.integers(0, 3)))
                dets["pt"].append(int(rng.integers(0, 2)))
                dets["valid"].append(bool(rng.random() > 0.15))

            want = reference_associate(
                table_ref, dets, use_maha, maha_thres, eq_thres, noise
            )
            t2, res = run_ours(table_init, dets, use_maha, maha_thres, eq_thres, noise)

            got_ids = np.asarray(res.lm_id)
            got_new = np.asarray(res.is_new)
            for m in range(M):
                if not dets["valid"][m]:
                    assert not got_new[m]
                    continue
                wid, wnew = want[m]
                assert bool(got_new[m]) == wnew, (
                    f"trial {trial} det {m}: new {bool(got_new[m])} vs {wnew}"
                )
                assert int(got_ids[m]) == wid, (
                    f"trial {trial} det {m}: id {int(got_ids[m])} vs {wid}"
                )
            assert int(t2.count) == len(table_ref["world"])
            np.testing.assert_allclose(
                np.asarray(t2.world[: int(t2.count)]),
                np.stack(table_ref["world"]),
                atol=1e-9,
            )
