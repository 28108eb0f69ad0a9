"""Viz-bag export: the reference's publisher surface serialized as a bag.

The reference publishes optimized Path/PoseArray, a landmark MarkerArray
with per-class colors and h/v-dependent cuboid scales, the corrected robot
pose, the VIO path, and the map->odom TF
(semantic_graph_slam_ros.cpp:94-110,227-452); rviz renders them. Here the
same topics (md5-pinned standard types) are written by write_viz_bag and
validated by decoding the bag with the generic reader.
"""

import numpy as np
import pytest

from semantic_slam_tpu.config import (
    AssociationConfig,
    CapacityConfig,
    InformationConfig,
    KeyframeConfig,
    SegmentationConfig,
    SlamConfig,
    SolverConfig,
)
from semantic_slam_tpu.io import replay as replay_mod
from semantic_slam_tpu.io import synthetic as synth_mod
from semantic_slam_tpu.io.rosbag import bag_info, read_messages
from semantic_slam_tpu.io import rosbag_write as rw
from semantic_slam_tpu.runtime.engine import SlamEngine
from semantic_slam_tpu.viz.markers import CLASS_COLORS
from semantic_slam_tpu.viz.rviz_bag import voxel_markers, write_viz_bag

# official ROS constants for the output-surface types
KNOWN_MD5 = {
    "std_msgs/ColorRGBA": "a29a96539573343b1310c73607334b00",
    "nav_msgs/Path": "6227e2b7e9cce15051f669a5e197bbf7",
    "geometry_msgs/PoseArray": "916c28c5764443f268b296bb671b9d97",
    "geometry_msgs/Transform": "ac9eff44abf714214112b05d54a3cf9b",
    "geometry_msgs/TransformStamped": "b5764a33bfeb3588febc2682852579b0",
    "tf2_msgs/TFMessage": "94810edda583a504dfda3829e70d7eec",
    "visualization_msgs/Marker": "4048c9de2a16f4ae8e0538085ebf1b97",
    "visualization_msgs/MarkerArray": "d155b9ce5188fbaf89745847fd5882d7",
}


@pytest.mark.parametrize("msg_type", sorted(KNOWN_MD5))
def test_known_md5(msg_type):
    assert rw.compute_md5(msg_type) == KNOWN_MD5[msg_type]


@pytest.fixture(scope="module")
def session():
    log = synth_mod.make_synthetic_log(
        seed=3, n_steps=180, sensor_every=5, drift_noise=0.008, loops=1.0
    )
    cfg = SlamConfig(
        camera_angle_deg=0.0,
        strict_reference_frames=True,
        keyframe=KeyframeConfig(delta_trans=0.4, delta_angle=0.4, delta_time=2.0),
        segmentation=SegmentationConfig(
            num_point_seg=100, norm_point_thres=400, planar_area=0.01,
            crop_height=64, crop_width=64, max_planes_per_detection=2,
            num_hypotheses=64, normal_smoothing_size=10,
        ),
        association=AssociationConfig(
            use_maha_dist=False, use_eq_dist=True, eq_dist_thres=1.0,
            land_noise_low=0.1,
        ),
        information=InformationConfig(
            use_const_inf_matrix=True, const_stddev_x=0.00667,
            const_stddev_q=0.00001,
        ),
        solver=SolverConfig(max_iterations=16, dtype="float64"),
        capacity=CapacityConfig(
            max_keyframes=64, max_landmarks=16, max_odom_edges=64,
            max_landmark_edges=256, max_detections_per_frame=4,
        ),
    )
    eng = SlamEngine(cfg)
    replay_mod.replay(log, eng)
    return eng


@pytest.fixture(scope="module")
def viz_bag(session, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("viz") / "viz.bag")
    counts = write_viz_bag(path, session, path_stride=3)
    msgs: dict[str, list] = {}
    for topic, _, t, msg in read_messages(path):
        msgs.setdefault(topic, []).append((t, msg))
    return path, counts, msgs


class TestVizBag:
    def test_topics_and_counts(self, session, viz_bag):
        path, counts, msgs = viz_bag
        n = len(session.keyframes)
        info = bag_info(path)
        assert info["/robot_pose"] == ("geometry_msgs/PoseStamped", n)
        assert info["/tf"] == ("tf2_msgs/TFMessage", n)
        assert info["/corres_vio_path"] == ("nav_msgs/Path", 1)
        assert info["/mapped_landmarks"][0] == "visualization_msgs/MarkerArray"
        assert counts == {t: c for t, (_, c) in info.items()}

    def test_progressive_path_and_final_full(self, session, viz_bag):
        _, _, msgs = viz_bag
        paths = [m for _, m in msgs["/robot_path"]]
        lengths = [len(p["poses"]) for p in paths]
        assert lengths == sorted(lengths)
        assert lengths[-1] == len(session.keyframes)
        # poses match the engine's optimized trajectory
        last = paths[-1]["poses"]
        kf = session.get_keyframe_poses()
        got = np.array([
            [pp["pose"]["position"][k] for k in "xyz"] for pp in last
        ])
        np.testing.assert_allclose(got, kf[:, :3], atol=1e-9)

    def test_robot_pose_stream_stamped_in_order(self, session, viz_bag):
        _, _, msgs = viz_bag
        ts = [t for t, _ in msgs["/robot_pose"]]
        assert ts == sorted(ts)
        assert ts[0] >= 1e9  # epoch-rebased (ROS time is unsigned)

    def test_final_tf_matches_engine_map2odom(self, session, viz_bag):
        _, _, msgs = viz_bag
        tf = msgs["/tf"][-1][1]["transforms"][0]
        assert tf["header"]["frame_id"] == "map"
        assert tf["child_frame_id"] == "odom"
        m2o = session.get_map2odom()
        tr, q = tf["transform"]["translation"], tf["transform"]["rotation"]
        np.testing.assert_allclose(
            [tr["x"], tr["y"], tr["z"]], m2o[:3], atol=1e-9
        )
        np.testing.assert_allclose(
            [q["w"], q["x"], q["y"], q["z"]], m2o[3:], atol=1e-9
        )

    def test_landmark_markers(self, session, viz_bag):
        _, _, msgs = viz_bag
        lms = session.get_mapped_landmarks()
        assert len(lms["pose"]) > 0, "fixture must map landmarks"
        markers = msgs["/mapped_landmarks"][0][1]["markers"]
        assert len(markers) == len(lms["pose"])
        for i, m in enumerate(markers):
            assert m["ns"] == "mapped_landmarks" and m["type"] == 1  # CUBE
            cid = int(lms["class_id"][i])
            r, g, b = CLASS_COLORS.get(cid, (0.5, 0.5, 0.5))
            assert (m["color"]["r"], m["color"]["g"], m["color"]["b"]) == (
                pytest.approx(r), pytest.approx(g), pytest.approx(b)
            )
            # h/v scale rule: horizontal = thin in z, vertical = thin in x
            hv = int(lms["plane_type"][i])
            thin = "z" if hv == 0 else "x"
            assert m["scale"][thin] == pytest.approx(0.05)
            np.testing.assert_allclose(
                [m["pose"]["position"][k] for k in "xyz"],
                lms["pose"][i], atol=1e-9,
            )

    def test_vio_path_matches_traj(self, session, viz_bag):
        _, _, msgs = viz_bag
        vio = msgs["/corres_vio_path"][0][1]["poses"]
        assert len(vio) == len(session.vio_traj)


class TestVoxelMarkers:
    def test_cube_list(self):
        centers = np.array([[0.0, 0.0, 0.0], [0.1, 0.0, 0.0], [0.0, 0.1, 0.2]])
        arr = voxel_markers(5.0, centers, 0.05)
        (m,) = arr["markers"]
        assert m["type"] == 6 and m["ns"] == "occupancy"  # CUBE_LIST
        assert len(m["points"]) == 3
        assert m["scale"] == {"x": 0.05, "y": 0.05, "z": 0.05}
        # the marker survives serialization through the real encoder
        data = rw.serialize_message("visualization_msgs/MarkerArray", arr)
        assert len(data) > 100


def test_viz_bag_vio_predating_first_keyframe(session, tmp_path):
    """Epoch base must cover vio_traj samples earlier than the first keyframe.

    With kf_stamps[0] >= 1 (epoch_offset 0) and a dead-reckoned VIO sample at
    a negative stamp, the writer previously raised inside _pack_time.
    """
    import dataclasses

    class Wrap:
        def __init__(self, e):
            self._e = e

        def __getattr__(self, k):
            return getattr(self._e, k)

    w = Wrap(session)
    # shift keyframes past t=1 so epoch_offset(kf0) would be 0, then add one
    # vio sample BEFORE time zero
    w.keyframes = [
        dataclasses.replace(k, stamp=k.stamp + 5.0) for k in session.keyframes
    ]
    w.vio_traj = [(-0.5, session.vio_traj[0][1])] + [
        (t + 5.0, p) for t, p in session.vio_traj
    ]
    w.robot_traj = [(t + 5.0, p) for t, p in session.robot_traj]
    path = str(tmp_path / "neg_vio.bag")
    counts = write_viz_bag(path, w)
    assert counts["/corres_vio_path"] >= 1
    stamps = [t for _, _, t, _ in read_messages(path)]
    assert min(stamps) >= 0.0


def test_detected_landmarks_stream(session, tmp_path):
    """Opt-in per-frame /detected_landmarks completes the reference's
    13-publisher surface (publishDetectedLandmarks): white h/v cubes at the
    detections' world poses, recomputed post-hoc per keyframe."""
    path = str(tmp_path / "det.bag")
    counts = write_viz_bag(path, session, detections=True)
    assert counts.get("/detected_landmarks", 0) >= 1
    det_kfs = [k for k in session.keyframes
               if k.boxes is not None and len(k.boxes) > 0]
    assert counts["/detected_landmarks"] <= len(det_kfs)
    seen = 0
    for topic, msg_type, t, msg in read_messages(path):
        if topic != "/detected_landmarks":
            continue
        assert msg_type == "visualization_msgs/MarkerArray"
        for m in msg["markers"]:
            assert m["ns"] == "my_namespace"  # reference :316
            assert m["type"] == 1  # CUBE
            c = m["color"]
            assert (c["r"], c["g"], c["b"], c["a"]) == (1.0, 1.0, 1.0, 1.0)
            s = (m["scale"]["x"], m["scale"]["y"], m["scale"]["z"])
            assert s in ((0.3, 0.3, 0.01), (0.01, 0.3, 0.3))
            seen += 1
    assert seen >= 1
    # world poses come from the same frontend the engine ran: at least one
    # marker lies within the eq gate of a mapped landmark
    lms = session.get_mapped_landmarks()
    if len(lms["pose"]):
        pos = []
        for topic, _, _, msg in read_messages(path):
            if topic == "/detected_landmarks":
                pos += [[m["pose"]["position"][k] for k in "xyz"]
                        for m in msg["markers"]]
        d = np.linalg.norm(
            np.asarray(pos)[:, None, :] - np.asarray(lms["pose"])[None], axis=-1
        )
        assert d.min() < 1.0
