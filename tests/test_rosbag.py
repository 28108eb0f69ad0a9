"""rosbag v2.0 reader: container parsing, generic message decoding, and the
reference-node topic routing (semantic_graph_slam_ros.cpp:69-91).

The fixtures hand-encode a bag byte-for-byte per the public rosbag 2.0
format (length-prefixed records, header-field blocks, bz2/none chunks) and
the ROS1 serialization rules, so the reader is validated against the wire
format rather than against itself.
"""

import bz2
import struct

import numpy as np
import pytest

from semantic_slam_tpu.io import rosbag as rb
from semantic_slam_tpu.io.replay import ReplayLog


# ---------------------------------------------------------------------------
# bag + message encoders (test-side, independent of the reader)
# ---------------------------------------------------------------------------


def _field(name: str, value: bytes) -> bytes:
    body = name.encode() + b"=" + value
    return struct.pack("<I", len(body)) + body


def _record(fields: dict[str, bytes], data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return (
        struct.pack("<I", len(header))
        + header
        + struct.pack("<I", len(data))
        + data
    )


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _header_msg(seq: int, t: float, frame: str = "map") -> bytes:
    sec = int(np.floor(t))
    nsec = min(int(round((t - sec) * 1e9)), 999_999_999)
    return struct.pack("<3I", seq, sec, nsec) + _string(frame)


def _point(x, y, z) -> bytes:
    return struct.pack("<3d", x, y, z)


def _quat(x, y, z, w) -> bytes:
    return struct.pack("<4d", x, y, z, w)


def _pose(t3, qxyzw) -> bytes:
    return _point(*t3) + _quat(*qxyzw)


def _odometry(t: float, t3, qxyzw, cov=None) -> bytes:
    cov = np.zeros(36) if cov is None else np.asarray(cov, np.float64).reshape(-1)
    twist = struct.pack("<6d", *np.zeros(6)) + struct.pack("<36d", *np.zeros(36))
    return (
        _header_msg(0, t)
        + _string("base")
        + _pose(t3, qxyzw)
        + struct.pack("<36d", *cov)
        + twist
    )


def _pose_stamped(t: float, t3, qxyzw) -> bytes:
    return _header_msg(0, t) + _pose(t3, qxyzw)


def _vicon_state(t: float, t3, qxyzw, has_pose=True) -> bytes:
    twist = struct.pack("<6d", *np.zeros(6))
    accel = struct.pack("<3d", 0.0, 0.0, 0.0)
    return (
        _header_msg(0, t)
        + _pose(t3, qxyzw)
        + twist
        + accel
        + struct.pack("<3?", has_pose, False, False)
    )


def _pointcloud2(t: float, xyz: np.ndarray, row_pad: int = 0) -> bytes:
    """Organized float32 cloud with a 16-byte point step (x,y,z,rgb-pad).

    ``row_pad`` appends that many bytes of padding per row (row_step >
    width*point_step), which real recorded bags can contain.
    """
    h, w, _ = xyz.shape
    fields = b""
    for i, name in enumerate(("x", "y", "z")):
        fields += _string(name) + struct.pack("<IBI", 4 * i, 7, 1)
    n_fields = struct.pack("<I", 3)
    step = 16
    row_step = step * w + row_pad
    grid = np.full((h, row_step), 0xAB, np.uint8)  # poison the padding
    grid[:, : step * w] = 0
    pts = grid[:, : step * w].reshape(h, w, step)
    pts[:, :, :12] = xyz.astype(np.float32).view(np.uint8).reshape(h, w, 12)
    data = grid.tobytes()
    return (
        _header_msg(0, t, "camera")
        + struct.pack("<II", h, w)
        + n_fields
        + fields
        + struct.pack("<?", False)
        + struct.pack("<II", step, row_step)
        + struct.pack("<I", len(data))
        + data
        + struct.pack("<?", False)
    )


def _bounding_boxes(t: float, boxes) -> bytes:
    """darknet-style BoundingBoxes: header, image_header, BoundingBox[]."""
    out = _header_msg(0, t) + _header_msg(0, t) + struct.pack("<I", len(boxes))
    for cls, prob, xmin, ymin, xmax, ymax in boxes:
        out += _string(cls) + struct.pack("<d4q", prob, xmin, ymin, xmax, ymax)
    return out


def _detected_objects(t: float, objs) -> bytes:
    out = _header_msg(0, t) + struct.pack("<I", len(objs))
    for cls, prob, tlx, tly, w, h in objs:
        out += _string(cls) + struct.pack("<f4i", prob, tlx, tly, w, h)
    return out


HEADER_DEF = """MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id"""

GEOM_DEFS = """MSG: geometry_msgs/Pose
geometry_msgs/Point position
geometry_msgs/Quaternion orientation
================================================================================
MSG: geometry_msgs/Point
float64 x
float64 y
float64 z
================================================================================
MSG: geometry_msgs/Quaternion
float64 x
float64 y
float64 z
float64 w"""

SEP = "=" * 80

ODOMETRY_DEF = f"""Header header
string child_frame_id
geometry_msgs/PoseWithCovariance pose
geometry_msgs/TwistWithCovariance twist
{SEP}
{HEADER_DEF}
{SEP}
MSG: geometry_msgs/PoseWithCovariance
geometry_msgs/Pose pose
float64[36] covariance
{SEP}
{GEOM_DEFS}
{SEP}
MSG: geometry_msgs/TwistWithCovariance
geometry_msgs/Twist twist
float64[36] covariance
{SEP}
MSG: geometry_msgs/Twist
geometry_msgs/Vector3 linear
geometry_msgs/Vector3 angular
{SEP}
MSG: geometry_msgs/Vector3
float64 x
float64 y
float64 z"""

POSE_STAMPED_DEF = f"""Header header
geometry_msgs/Pose pose
{SEP}
{HEADER_DEF}
{SEP}
{GEOM_DEFS}"""

VICON_DEF = f"""Header header
geometry_msgs/Pose pose
geometry_msgs/Twist twist
geometry_msgs/Vector3 accel
bool has_pose
bool has_twist
bool has_accel
{SEP}
{HEADER_DEF}
{SEP}
{GEOM_DEFS}
{SEP}
MSG: geometry_msgs/Twist
geometry_msgs/Vector3 linear
geometry_msgs/Vector3 angular
{SEP}
MSG: geometry_msgs/Vector3
float64 x
float64 y
float64 z"""

CLOUD_DEF = f"""Header header
uint32 height
uint32 width
PointField[] fields
bool is_bigendian
uint32 point_step
uint32 row_step
uint8[] data
bool is_dense
{SEP}
{HEADER_DEF}
{SEP}
MSG: sensor_msgs/PointField
string name
uint32 offset
uint8 datatype
uint32 count"""

BBOXES_DEF = f"""Header header
Header image_header
BoundingBox[] bounding_boxes
{SEP}
{HEADER_DEF}
{SEP}
MSG: semantic_SLAM/BoundingBox
string Class
float64 probability
int64 xmin
int64 ymin
int64 xmax
int64 ymax"""

DETOBJ_DEF = f"""Header header
ObjectInfo[] objects
{SEP}
{HEADER_DEF}
{SEP}
MSG: semantic_SLAM/ObjectInfo
string type
float32 prob
int32 tl_x
int32 tl_y
int32 width
int32 height"""


class BagWriter:
    def __init__(self):
        self.conns: list[bytes] = []
        self.msgs: list[bytes] = []
        self._topic_to_conn: dict[str, int] = {}

    def connection(self, topic: str, msg_type: str, definition: str) -> int:
        cid = len(self.conns)
        self._topic_to_conn[topic] = cid
        data = (
            _field("topic", topic.encode())
            + _field("type", msg_type.encode())
            + _field("md5sum", b"0" * 32)
            + _field("message_definition", definition.encode())
        )
        self.conns.append(
            _record(
                {
                    "op": b"\x07",
                    "conn": struct.pack("<I", cid),
                    "topic": topic.encode(),
                },
                data,
            )
        )
        return cid

    def message(self, topic: str, rx_time: float, payload: bytes):
        cid = self._topic_to_conn[topic]
        sec = int(rx_time)
        nsec = int(round((rx_time - sec) * 1e9))
        self.msgs.append(
            _record(
                {
                    "op": b"\x02",
                    "conn": struct.pack("<I", cid),
                    "time": struct.pack("<II", sec, nsec),
                },
                payload,
            )
        )

    def tobytes(self, compression: str = "none") -> bytes:
        inner = b"".join(self.conns + self.msgs)
        chunk_data = bz2.compress(inner) if compression == "bz2" else inner
        chunk = _record(
            {
                "op": b"\x05",
                "compression": compression.encode(),
                "size": struct.pack("<I", len(inner)),
            },
            chunk_data,
        )
        bag_header = _record(
            {
                "op": b"\x03",
                "index_pos": struct.pack("<Q", 0),
                "conn_count": struct.pack("<I", len(self.conns)),
                "chunk_count": struct.pack("<I", 1),
            },
            b" " * 64,
        )
        return rb.MAGIC + bag_header + chunk


def _demo_bag(compression="none") -> BagWriter:
    w = BagWriter()
    w.connection("/rovio/odometry", "nav_msgs/Odometry", ODOMETRY_DEF)
    w.connection(
        "/SQ04/snap_vislam/vislam/pose", "geometry_msgs/PoseStamped", POSE_STAMPED_DEF
    )
    w.connection("/depth_registered/points", "sensor_msgs/PointCloud2", CLOUD_DEF)
    w.connection(
        "/darknet_ros/bounding_boxes", "semantic_SLAM/BoundingBoxes", BBOXES_DEF
    )
    w.connection(
        "/image_processed/bounding_boxes", "semantic_SLAM/DetectedObjects", DETOBJ_DEF
    )
    w.connection("/SQ04/vicon", "acl_msgs/ViconState", VICON_DEF)
    w.connection("/vrpn_client_node/realsense/pose", "nav_msgs/Odometry", ODOMETRY_DEF)
    w.connection("/unrelated/topic", "geometry_msgs/PoseStamped", POSE_STAMPED_DEF)

    cov = np.arange(36, dtype=np.float64) / 100.0
    w.message(
        "/rovio/odometry",
        10.05,
        _odometry(10.0, (1.0, 2.0, 3.0), (0.0, 0.0, 0.0, 1.0), cov),
    )
    # snap: header stamp 20.0, receive time 20.5 — the event must use 20.5
    w.message(
        "/SQ04/snap_vislam/vislam/pose",
        20.5,
        _pose_stamped(20.0, (4.0, 5.0, 6.0), (0.0, 0.0, 0.70710678, 0.70710678)),
    )

    xyz = np.arange(4 * 3 * 3, dtype=np.float32).reshape(4, 3, 3)
    xyz[1, 1] = np.nan
    w.message("/depth_registered/points", 30.0, _pointcloud2(30.0, xyz))

    w.message(
        "/darknet_ros/bounding_boxes",
        40.0,
        _bounding_boxes(
            40.0,
            [("chair", 0.9, 100, 120, 180, 200), ("dog", 0.5, 10, 20, 30, 40)],
        ),
    )
    w.message(
        "/image_processed/bounding_boxes",
        41.0,
        _detected_objects(41.0, [("bucket", 0.8, 50, 60, 70, 80)]),
    )

    w.message(
        "/SQ04/vicon", 50.0, _vicon_state(50.0, (7.0, 8.0, 9.0), (0, 0, 0, 1))
    )
    w.message(
        "/SQ04/vicon",
        51.0,
        _vicon_state(51.0, (1.0, 1.0, 1.0), (0, 0, 0, 1), has_pose=False),
    )
    w.message(
        "/vrpn_client_node/realsense/pose",
        52.0,
        _odometry(52.0, (2.0, 2.0, 2.0), (0.0, 0.0, 0.0, 1.0)),
    )
    w.message(
        "/unrelated/topic", 60.0, _pose_stamped(60.0, (0, 0, 0), (0, 0, 0, 1))
    )
    return w


@pytest.fixture(params=["none", "bz2"])
def bag_path(request, tmp_path):
    p = tmp_path / f"demo_{request.param}.bag"
    p.write_bytes(_demo_bag().tobytes(compression=request.param))
    return str(p)


class TestReadBag:
    def test_routing_and_values(self, bag_path):
        log = rb.read_bag(bag_path)
        assert isinstance(log, ReplayLog)
        assert len(log.odom) == 2
        assert len(log.clouds) == 1
        assert len(log.detections) == 2
        assert len(log.gt) == 2  # has_pose=False vicon sample dropped

        rovio = log.odom[0]
        assert rovio.source == "rovio"
        assert rovio.t == pytest.approx(10.0)  # header stamp, not rx time
        np.testing.assert_allclose(rovio.pose7, [1, 2, 3, 1, 0, 0, 0])
        np.testing.assert_allclose(
            rovio.cov, (np.arange(36) / 100.0).reshape(6, 6)
        )

        snap = log.odom[1]
        assert snap.source == "snap"
        # snapVIOCallback uses ros::Time::now() -> bag receive time
        assert snap.t == pytest.approx(20.5)
        np.testing.assert_allclose(
            snap.pose7, [4, 5, 6, 0.70710678, 0, 0, 0.70710678], atol=1e-9
        )
        assert snap.cov is None

    def test_cloud_grid(self, bag_path):
        log = rb.read_bag(bag_path)
        cl = log.clouds[0]
        assert cl.points.shape == (4, 3, 3)
        assert cl.t == pytest.approx(30.0)
        assert not cl.valid[1, 1] and cl.valid[0, 0]
        assert cl.points[0, 1, 2] == pytest.approx(5.0)
        assert cl.points[3, 2, 0] == pytest.approx(33.0)

    def test_cloud_grid_with_row_padding(self, tmp_path):
        """row_step > width*point_step must not shear the decoded XYZ grid."""
        xyz = np.arange(4 * 3 * 3, dtype=np.float32).reshape(4, 3, 3)
        w = BagWriter()
        w.connection("/depth_registered/points", "sensor_msgs/PointCloud2", CLOUD_DEF)
        w.message("/depth_registered/points", 30.0, _pointcloud2(30.0, xyz, row_pad=24))
        p = tmp_path / "padded.bag"
        p.write_bytes(w.tobytes())
        cl = rb.read_bag(str(p)).clouds[0]
        np.testing.assert_allclose(cl.points, xyz)
        assert cl.valid.all()

    def test_detections(self, bag_path):
        log = rb.read_bag(bag_path)
        dk = log.detections[0]
        # darknet boxes -> tl + |max-min| extents (ros adapter :196-205)
        np.testing.assert_allclose(dk.boxes[0], [100, 120, 80, 80])
        assert dk.class_ids[0] == 0  # chair
        assert dk.class_ids[1] == -1  # 'dog' not whitelisted
        assert dk.probs[0] == pytest.approx(0.9)

        simple = log.detections[1]
        np.testing.assert_allclose(simple.boxes[0], [50, 60, 70, 80])
        assert simple.class_ids[0] == 5  # bucket
        assert simple.probs[0] == pytest.approx(0.8, abs=1e-6)

    def test_gt(self, bag_path):
        log = rb.read_bag(bag_path)
        np.testing.assert_allclose(log.gt[0].pose7, [7, 8, 9, 1, 0, 0, 0])
        np.testing.assert_allclose(log.gt[1].pose7, [2, 2, 2, 1, 0, 0, 0])

    def test_unmapped_topic_ignored(self, bag_path):
        # /unrelated/topic decodes but routes nowhere
        log = rb.read_bag(bag_path)
        total = len(log.odom) + len(log.clouds) + len(log.detections) + len(log.gt)
        assert total == 7

    def test_custom_topic_map(self, bag_path):
        log = rb.read_bag(bag_path, topic_map={"/unrelated/topic": ("odom", "orb")})
        assert len(log.odom) == 1 and log.odom[0].source == "orb"
        assert not log.clouds and not log.detections and not log.gt

    def test_bag_info(self, bag_path):
        info = rb.bag_info(bag_path)
        assert info["/rovio/odometry"] == ("nav_msgs/Odometry", 1)
        assert info["/SQ04/vicon"] == ("acl_msgs/ViconState", 2)

    def test_magic_check(self, tmp_path):
        p = tmp_path / "not_a_bag.bag"
        p.write_bytes(b"hello world")
        with pytest.raises(ValueError, match="not a rosbag"):
            rb.read_bag(str(p))


class TestBaginfoCli:
    def test_baginfo_lists_topics(self, bag_path, capsys):
        from semantic_slam_tpu.cli import main

        main(["baginfo", bag_path])
        out = capsys.readouterr().out
        assert "/rovio/odometry" in out and "nav_msgs/Odometry" in out
        assert "-> odom (rovio)" in out
        assert "/unrelated/topic" in out  # listed, just unrouted


class TestReplayThroughEngine:
    def test_bag_feeds_replay(self, bag_path):
        """The decoded log drives the replay driver (odometry fixups
        included) without touching a real engine."""
        from semantic_slam_tpu.io.replay import replay

        class SpyEngine:
            def __init__(self):
                self.calls = []

            def run(self):
                self.calls.append(("run",))

            def set_point_cloud(self, pts, valid):
                self.calls.append(("cloud", pts.shape))

            def set_detections(self, boxes, cids, probs):
                self.calls.append(("det", len(boxes)))

            def vio_callback(self, t, pose, cov):
                self.calls.append(("vio", t, tuple(np.round(pose, 6))))

        eng = SpyEngine()
        log = rb.read_bag(bag_path)
        replay(log, eng, run_ticks=False)
        kinds = [c[0] for c in eng.calls]
        assert kinds.count("vio") == 2
        assert kinds.count("cloud") == 1
        assert kinds.count("det") == 2
        # snap odometry goes through the NED->ENU fixup before vio_callback
        snap_call = [c for c in eng.calls if c[0] == "vio"][1]
        assert snap_call[1] == pytest.approx(20.5)
