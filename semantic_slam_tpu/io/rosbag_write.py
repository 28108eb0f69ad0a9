"""Pure-python rosbag v2.0 writer — export sessions as reference-ready bags.

The reference node is driven by ``rosbag play`` of recorded datasets
(``launch/*.launch:5-8``). This module is the write side of
``io/rosbag.py``: it serializes a ``ReplayLog`` onto the exact topics the
reference subscribes to (``src/semantic_graph_slam_ros.cpp:69-91``), so a
synthetic scene generated here can be played into the ACTUAL reference
node for A/B comparison — and written bags round-trip through our own
``read_bag``.

Standards compliance (so stock ``rosbag``/rviz tooling accepts the files):

* **md5sums** are computed from the message-definition text with the real
  ROS algorithm (``gentools.compute_md5_text``): constants first, primitive
  fields verbatim (array suffix kept), nested-message field types replaced
  by the nested type's md5 with the array suffix dropped, result stripped
  then hashed. Tests pin the well-known constants (std_msgs/Header
  ``2176deca…``, nav_msgs/Odometry ``cd5e73d1…``, …).
* **container layout** follows the bag 2.0 spec: a 4096-byte-padded file
  header record (op=3) pointing at the index section, chunk records (op=5,
  ``none``/``bz2``) holding connection + message records, per-connection
  index-data records (op=4, ver 1) after each chunk, then the index
  section: connection records (op=7) and chunk-info records (op=6, ver 1).

Wire encoders are compiled from the same definition text the reader's
``_MsgCatalog`` consumes, so the two sides cannot drift apart.
"""

from __future__ import annotations

import bz2
import dataclasses
import hashlib
import struct
from typing import Callable

import numpy as np

from semantic_slam_tpu.config import SEMANTIC_CLASSES
from semantic_slam_tpu.io.replay import (
    CloudEvent,
    DepthEvent,
    DetectionEvent,
    GtEvent,
    OdomEvent,
    ReplayLog,
)
from semantic_slam_tpu.io.rosbag import MAGIC, _PRIMITIVES

_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")

_OP_MSG = 0x02
_OP_BAGHDR = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNKINFO = 0x06
_OP_CONN = 0x07

# ---------------------------------------------------------------------------
# Message definitions (official .msg texts, comment-free)
# ---------------------------------------------------------------------------

MSG_DEFS: dict[str, str] = {
    "std_msgs/Header": "uint32 seq\ntime stamp\nstring frame_id\n",
    "geometry_msgs/Point": "float64 x\nfloat64 y\nfloat64 z\n",
    "geometry_msgs/Quaternion": "float64 x\nfloat64 y\nfloat64 z\nfloat64 w\n",
    "geometry_msgs/Vector3": "float64 x\nfloat64 y\nfloat64 z\n",
    "geometry_msgs/Pose": (
        "geometry_msgs/Point position\ngeometry_msgs/Quaternion orientation\n"
    ),
    "geometry_msgs/PoseStamped": "Header header\ngeometry_msgs/Pose pose\n",
    "geometry_msgs/PoseWithCovariance": (
        "geometry_msgs/Pose pose\nfloat64[36] covariance\n"
    ),
    "geometry_msgs/Twist": (
        "geometry_msgs/Vector3 linear\ngeometry_msgs/Vector3 angular\n"
    ),
    "geometry_msgs/TwistWithCovariance": (
        "geometry_msgs/Twist twist\nfloat64[36] covariance\n"
    ),
    "nav_msgs/Odometry": (
        "Header header\nstring child_frame_id\n"
        "geometry_msgs/PoseWithCovariance pose\n"
        "geometry_msgs/TwistWithCovariance twist\n"
    ),
    "sensor_msgs/PointField": (
        "uint8 INT8=1\nuint8 UINT8=2\nuint8 INT16=3\nuint8 UINT16=4\n"
        "uint8 INT32=5\nuint8 UINT32=6\nuint8 FLOAT32=7\nuint8 FLOAT64=8\n"
        "string name\nuint32 offset\nuint8 datatype\nuint32 count\n"
    ),
    "sensor_msgs/PointCloud2": (
        "Header header\nuint32 height\nuint32 width\n"
        "sensor_msgs/PointField[] fields\nbool is_bigendian\n"
        "uint32 point_step\nuint32 row_step\nuint8[] data\nbool is_dense\n"
    ),
    # output/visualization types — the reference's publisher surface
    # (semantic_graph_slam_ros.cpp:94-110): paths, pose arrays, landmark
    # markers, map->odom TF
    "std_msgs/ColorRGBA": "float32 r\nfloat32 g\nfloat32 b\nfloat32 a\n",
    "nav_msgs/Path": "Header header\ngeometry_msgs/PoseStamped[] poses\n",
    "geometry_msgs/PoseArray": "Header header\ngeometry_msgs/Pose[] poses\n",
    "geometry_msgs/Transform": (
        "geometry_msgs/Vector3 translation\ngeometry_msgs/Quaternion rotation\n"
    ),
    "geometry_msgs/TransformStamped": (
        "Header header\nstring child_frame_id\ngeometry_msgs/Transform transform\n"
    ),
    "tf2_msgs/TFMessage": "geometry_msgs/TransformStamped[] transforms\n",
    "visualization_msgs/Marker": (
        "uint8 ARROW=0\nuint8 CUBE=1\nuint8 SPHERE=2\nuint8 CYLINDER=3\n"
        "uint8 LINE_STRIP=4\nuint8 LINE_LIST=5\nuint8 CUBE_LIST=6\n"
        "uint8 SPHERE_LIST=7\nuint8 POINTS=8\nuint8 TEXT_VIEW_FACING=9\n"
        "uint8 MESH_RESOURCE=10\nuint8 TRIANGLE_LIST=11\n"
        "uint8 ADD=0\nuint8 MODIFY=0\nuint8 DELETE=2\nuint8 DELETEALL=3\n"
        "Header header\nstring ns\nint32 id\nint32 type\nint32 action\n"
        "geometry_msgs/Pose pose\ngeometry_msgs/Vector3 scale\n"
        "std_msgs/ColorRGBA color\nduration lifetime\nbool frame_locked\n"
        "geometry_msgs/Point[] points\nstd_msgs/ColorRGBA[] colors\n"
        "string text\nstring mesh_resource\nbool mesh_use_embedded_materials\n"
    ),
    "visualization_msgs/MarkerArray": "visualization_msgs/Marker[] markers\n",
    # the darknet_ros release layout the reference's launch files pair with
    "darknet_ros_msgs/BoundingBox": (
        "float64 probability\nint64 xmin\nint64 ymin\nint64 xmax\nint64 ymax\n"
        "int16 id\nstring Class\n"
    ),
    "darknet_ros_msgs/BoundingBoxes": (
        "Header header\nHeader image_header\n"
        "darknet_ros_msgs/BoundingBox[] bounding_boxes\n"
    ),
}

_BUILTINS = set(_PRIMITIVES) | {"string", "time", "duration"}


def _resolve(typ: str, pkg: str) -> str:
    if typ == "Header":
        return "std_msgs/Header"
    if "/" not in typ:
        return f"{pkg}/{typ}"
    return typ


def _parse_fields_of(full_type: str):
    """Yield (kind, typ, name, is_array, arr_n, const_val) per definition line;
    kind is 'const' or 'field'."""
    for raw in MSG_DEFS[full_type].splitlines():
        # string constants keep everything after '='; others strip comments
        head = raw.split("#", 1)[0].strip()
        if not head:
            continue
        parts = head.split(None, 1)
        if len(parts) != 2:
            continue
        typ, rest = parts[0], parts[1].strip()
        if "=" in rest:
            name, val = rest.split("=", 1)
            if typ == "string":
                val = raw.split("=", 1)[1].strip()
            yield "const", typ, name.strip(), False, None, val.strip()
            continue
        arr_n: int | None = None
        is_array = False
        if typ.endswith("]"):
            base, bracket = typ.split("[", 1)
            typ, is_array = base, True
            count = bracket[:-1]
            arr_n = int(count) if count else None
        yield "field", typ, rest, is_array, arr_n, None


def compute_md5(full_type: str, _memo: dict[str, str] | None = None) -> str:
    """ROS message md5 (gentools.compute_md5_text semantics)."""
    memo = _memo if _memo is not None else {}
    if full_type in memo:
        return memo[full_type]
    pkg = full_type.rpartition("/")[0]
    lines: list[str] = []
    fields: list[str] = []
    for kind, typ, name, is_array, arr_n, val in _parse_fields_of(full_type):
        if kind == "const":
            lines.append(f"{typ} {name}={val}")
        elif typ in _BUILTINS:
            suffix = ""
            if is_array:
                suffix = f"[{arr_n}]" if arr_n is not None else "[]"
            fields.append(f"{typ}{suffix} {name}")
        else:
            sub = compute_md5(_resolve(typ, pkg), memo)
            fields.append(f"{sub} {name}")  # array suffix dropped, per gentools
    text = "\n".join(lines + fields).strip()
    md5 = hashlib.md5(text.encode()).hexdigest()
    memo[full_type] = md5
    return md5


def full_definition(full_type: str) -> str:
    """``gendeps --cat`` text: top-level definition + every dependency once,
    separated by '='-bars — the message_definition field rosbag stores."""
    seen: list[str] = []

    def deps(t: str):
        pkg = t.rpartition("/")[0]
        for kind, typ, _, _, _, _ in _parse_fields_of(t):
            if kind != "field" or typ in _BUILTINS:
                continue
            r = _resolve(typ, pkg)
            if r not in seen:
                seen.append(r)
                deps(r)

    deps(full_type)
    parts = [MSG_DEFS[full_type]]
    for d in seen:
        parts.append("=" * 80 + f"\nMSG: {d}\n" + MSG_DEFS[d])
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# Wire encoders compiled from the definitions (mirror of the reader)
# ---------------------------------------------------------------------------


def _encoder_for(
    full_type: str, _memo: dict[str, Callable] | None = None
) -> Callable[[bytearray, dict], None]:
    memo = _memo if _memo is not None else {}
    if full_type in memo:
        return memo[full_type]
    pkg = full_type.rpartition("/")[0]
    steps: list[tuple[str, Callable[[bytearray, object], None]]] = []

    def encode(out: bytearray, msg: dict) -> None:
        for name, fn in steps:
            fn(out, msg[name])

    memo[full_type] = encode  # placeholder for recursive types

    for kind, typ, name, is_array, arr_n, _ in _parse_fields_of(full_type):
        if kind != "field":
            continue
        steps.append((name, _field_encoder(typ, pkg, is_array, arr_n, memo)))
    return encode


def _encode_string(out: bytearray, v) -> None:
    b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    out += _U32.pack(len(b))
    out += b


def _encode_time(out: bytearray, t) -> None:
    sec = int(t)
    nsec = int(round((float(t) - sec) * 1e9))
    if nsec >= 1_000_000_000:
        sec, nsec = sec + 1, nsec - 1_000_000_000
    out += struct.pack("<II", sec, nsec)


def _field_encoder(
    typ: str, pkg: str, is_array: bool, arr_n: int | None, memo: dict
) -> Callable[[bytearray, object], None]:
    if typ in _PRIMITIVES:
        code, np_dt = _PRIMITIVES[typ]
        st = struct.Struct("<" + code)
        dt = np.dtype(np_dt)
        if not is_array:
            def prim(out: bytearray, v) -> None:
                out += st.pack(dt.type(v).item() if typ != "bool" else bool(v))
            return prim

        def prim_array(out: bytearray, v) -> None:
            arr = np.ascontiguousarray(np.asarray(v), dtype=dt).ravel()
            if arr_n is None:
                out += _U32.pack(arr.size)
            elif arr.size != arr_n:
                raise ValueError(f"fixed array size {arr_n} != {arr.size}")
            out += arr.tobytes()
        return prim_array

    if typ == "string":
        elem: Callable[[bytearray, object], None] = _encode_string
    elif typ in ("time", "duration"):
        elem = _encode_time
    else:
        elem = _encoder_for(_resolve(typ, pkg), memo)

    if not is_array:
        return elem

    def msg_array(out: bytearray, v) -> None:
        if arr_n is None:
            out += _U32.pack(len(v))
        elif len(v) != arr_n:
            raise ValueError(f"fixed array size {arr_n} != {len(v)}")
        for item in v:
            elem(out, item)
    return msg_array


_ENCODER_MEMO: dict[str, Callable] = {}


def serialize_message(full_type: str, msg: dict) -> bytes:
    out = bytearray()
    _encoder_for(full_type, _ENCODER_MEMO)(out, msg)
    return bytes(out)


# ---------------------------------------------------------------------------
# Bag container
# ---------------------------------------------------------------------------


def _pack_header(fields: dict[str, bytes]) -> bytes:
    out = bytearray()
    for name, value in fields.items():
        item = name.encode("ascii") + b"=" + value
        out += _U32.pack(len(item))
        out += item
    return bytes(out)


def _record(fields: dict[str, bytes], data: bytes) -> bytes:
    h = _pack_header(fields)
    return _U32.pack(len(h)) + h + _U32.pack(len(data)) + data


def _pack_time(t: float) -> bytes:
    sec = int(t // 1.0)
    nsec = int(round((t - sec) * 1e9))
    if nsec >= 1_000_000_000:
        sec, nsec = sec + 1, nsec - 1_000_000_000
    if sec < 0:
        raise ValueError(
            f"ROS time cannot be negative (t={t}); write_bag shifts stamps "
            "by a positive time_offset for logs that start before epoch 0"
        )
    return struct.pack("<II", sec, nsec)


class BagWriter:
    """Minimal spec-compliant rosbag 2.0 writer (chunked + indexed)."""

    def __init__(self, path: str, compression: str = "none",
                 chunk_threshold: int = 768 * 1024):
        if compression not in ("none", "bz2"):
            raise ValueError(f"unsupported bag compression {compression!r}")
        self._f = open(path, "wb")
        self._compression = compression
        self._chunk_threshold = chunk_threshold
        self._conns: dict[str, int] = {}          # topic -> conn id
        self._conn_types: dict[int, str] = {}     # conn id -> declared type
        self._conn_hdrs: list[tuple[dict, bytes]] = []
        self._conns_in_cur_chunk: set[int] = set()
        self._chunk = bytearray()
        # conn -> [(time, offset-in-chunk)] for the current chunk
        self._chunk_index: dict[int, list[tuple[float, int]]] = {}
        self._chunk_infos: list[tuple[int, float, float, dict[int, int]]] = []
        self._f.write(MAGIC)
        # placeholder file header; rewritten with real offsets on close
        self._write_file_header(0, 0, 0)

    def _write_file_header(self, index_pos: int, conn_count: int,
                           chunk_count: int) -> None:
        fields = {
            "op": bytes([_OP_BAGHDR]),
            "index_pos": _U64.pack(index_pos),
            "conn_count": _U32.pack(conn_count),
            "chunk_count": _U32.pack(chunk_count),
        }
        h = _pack_header(fields)
        pad = b" " * (4096 - len(h))
        self._f.write(_U32.pack(len(h)) + h + _U32.pack(len(pad)) + pad)

    def add_connection(self, topic: str, msg_type: str,
                       definition: str | None = None,
                       md5sum: str | None = None) -> int:
        if topic in self._conns:
            cid = self._conns[topic]
            declared = self._conn_types[cid]
            if declared != msg_type:
                raise ValueError(
                    f"topic {topic!r} already declared as {declared}; "
                    f"cannot also write {msg_type} (one type per connection)"
                )
            return cid
        cid = len(self._conns)
        self._conns[topic] = cid
        self._conn_types[cid] = msg_type
        hdr = {"op": bytes([_OP_CONN]), "conn": _U32.pack(cid),
               "topic": topic.encode()}
        data = _pack_header({
            "topic": topic.encode(),
            "type": msg_type.encode(),
            "md5sum": (md5sum or compute_md5(msg_type)).encode(),
            "message_definition": (
                definition if definition is not None else full_definition(msg_type)
            ).encode(),
        })
        self._conn_hdrs.append((hdr, data))
        return cid

    def write(self, topic: str, t: float, msg_type: str, msg: dict) -> None:
        cid = self.add_connection(topic, msg_type)
        # pack (and so validate) the timestamp BEFORE touching the chunk
        # index: a rejected time must not leave a phantom index entry that
        # corrupts the bag when close() flushes
        packed_t = _pack_time(t)
        if cid not in self._conns_in_cur_chunk:
            hdr, data = self._conn_hdrs[cid]
            self._chunk += _record(hdr, data)
            self._conns_in_cur_chunk.add(cid)
        self._chunk_index.setdefault(cid, []).append((t, len(self._chunk)))
        self._chunk += _record(
            {"op": bytes([_OP_MSG]), "conn": _U32.pack(cid),
             "time": packed_t},
            serialize_message(msg_type, msg),
        )
        if len(self._chunk) >= self._chunk_threshold:
            self._flush_chunk()

    def _flush_chunk(self) -> None:
        if not self._chunk:
            return
        raw = bytes(self._chunk)
        payload = bz2.compress(raw) if self._compression == "bz2" else raw
        chunk_pos = self._f.tell()
        self._f.write(_record(
            {"op": bytes([_OP_CHUNK]),
             "compression": self._compression.encode(),
             "size": _U32.pack(len(raw))},
            payload,
        ))
        times = [t for idx in self._chunk_index.values() for t, _ in idx]
        counts: dict[int, int] = {}
        for cid, idx in sorted(self._chunk_index.items()):
            counts[cid] = len(idx)
            data = bytearray()
            for t, off in idx:
                data += _pack_time(t) + _U32.pack(off)
            self._f.write(_record(
                {"op": bytes([_OP_INDEX]), "ver": _U32.pack(1),
                 "conn": _U32.pack(cid), "count": _U32.pack(len(idx))},
                bytes(data),
            ))
        self._chunk_infos.append((chunk_pos, min(times), max(times), counts))
        self._chunk = bytearray()
        self._chunk_index = {}
        self._conns_in_cur_chunk = set()

    def close(self) -> None:
        if self._f.closed:
            return
        self._flush_chunk()
        index_pos = self._f.tell()
        for hdr, data in self._conn_hdrs:
            self._f.write(_record(hdr, data))
        for chunk_pos, t0, t1, counts in self._chunk_infos:
            data = bytearray()
            for cid, n in counts.items():
                data += _U32.pack(cid) + _U32.pack(n)
            self._f.write(_record(
                {"op": bytes([_OP_CHUNKINFO]), "ver": _U32.pack(1),
                 "chunk_pos": _U64.pack(chunk_pos),
                 "start_time": _pack_time(t0), "end_time": _pack_time(t1),
                 "count": _U32.pack(len(counts))},
                bytes(data),
            ))
        self._f.seek(len(MAGIC))
        self._write_file_header(index_pos, len(self._conn_hdrs),
                                len(self._chunk_infos))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# ReplayLog -> reference subscription topics
# ---------------------------------------------------------------------------

# inverse of io/rosbag.py DEFAULT_TOPIC_MAP: odometry source -> (topic, type)
ODOM_TOPICS: dict[str, tuple[str, str]] = {
    "rovio": ("/rovio/odometry", "nav_msgs/Odometry"),
    "jackal": ("/JA01/odometry/filtered", "nav_msgs/Odometry"),
    "snap": ("/SQ04/snap_vislam/vislam/pose", "geometry_msgs/PoseStamped"),
    "orb": ("orb_slam/pose", "geometry_msgs/PoseStamped"),
}
CLOUD_TOPIC = "/depth_registered/points"
DETECTION_TOPIC = "/darknet_ros/bounding_boxes"
GT_TOPIC = "/vrpn_client_node/realsense/pose"


def epoch_offset(t_min: float) -> float:
    """ROS time is unsigned and t=0 means "uninitialized": logs stamped near
    (or before) zero get every stamp shifted onto a fixed 1e9-second epoch
    base; logs already past t=1 keep their stamps. Shared by every bag
    exporter so the input and viz surfaces agree on the time base."""
    return 0.0 if t_min >= 1.0 else 1e9 - min(0.0, t_min)


def _header(t: float, seq: int, frame_id: str) -> dict:
    return {"seq": seq, "stamp": t, "frame_id": frame_id}


def pose_msg(pose7: np.ndarray) -> dict:
    """pose7 -> geometry_msgs/Pose dict. Graph state is [t, w, x, y, z];
    ROS quaternions are xyzw on the wire. Shared by every bag exporter so
    the quaternion convention cannot drift between surfaces."""
    return {
        "position": {"x": pose7[0], "y": pose7[1], "z": pose7[2]},
        "orientation": {"x": pose7[4], "y": pose7[5], "z": pose7[6],
                        "w": pose7[3]},
    }


_pose_msg = pose_msg


def _odom_msg(ev: OdomEvent, seq: int) -> tuple[str, str, dict]:
    topic, msg_type = ODOM_TOPICS[ev.source]
    if msg_type == "geometry_msgs/PoseStamped":
        return topic, msg_type, {
            "header": _header(ev.t, seq, "world"),
            "pose": _pose_msg(ev.pose7),
        }
    # replay.py:100 substitutes identity covariance when the event has none,
    # so identity on the wire round-trips to identical engine behavior
    cov = np.eye(6) if ev.cov is None else np.asarray(ev.cov, np.float64)
    zero3 = {"x": 0.0, "y": 0.0, "z": 0.0}
    return topic, msg_type, {
        "header": _header(ev.t, seq, "world"),
        "child_frame_id": "base_link",
        "pose": {"pose": _pose_msg(ev.pose7), "covariance": cov.ravel()},
        "twist": {"twist": {"linear": zero3, "angular": zero3},
                  "covariance": np.zeros(36)},
    }


def _cloud_msg(ev: CloudEvent, seq: int) -> dict:
    h, w = ev.points.shape[:2]
    xyz = np.asarray(ev.points, np.float32).copy()
    xyz[~np.asarray(ev.valid, bool)] = np.nan  # reader's validity = isfinite
    step = 16  # x,y,z float32 + 4 pad bytes — the realsense layout
    grid = np.zeros((h, w, step), np.uint8)
    grid[:, :, :12] = xyz.view(np.uint8).reshape(h, w, 12)
    return {
        "header": _header(ev.t, seq, "camera"),
        "height": h,
        "width": w,
        "fields": [
            {"name": "x", "offset": 0, "datatype": 7, "count": 1},
            {"name": "y", "offset": 4, "datatype": 7, "count": 1},
            {"name": "z", "offset": 8, "datatype": 7, "count": 1},
        ],
        "is_bigendian": False,
        "point_step": step,
        "row_step": step * w,
        "data": grid.ravel(),
        "is_dense": False,
    }


def _detection_msg(ev: DetectionEvent, seq: int) -> dict:
    boxes = []
    for (x, y, bw, bh), cid, p in zip(ev.boxes, ev.class_ids, ev.probs):
        cid = int(cid)
        # non-whitelisted ids have no name; 'unknown' maps back to id -1
        # through the reader's CLASS_TO_ID gate
        name = SEMANTIC_CLASSES[cid] if 0 <= cid < len(SEMANTIC_CLASSES) else "unknown"
        boxes.append({
            "probability": float(p),
            "xmin": int(round(x)), "ymin": int(round(y)),
            "xmax": int(round(x + bw)), "ymax": int(round(y + bh)),
            "id": cid, "Class": name,
        })
    hdr = _header(ev.t, seq, "camera")
    return {"header": hdr, "image_header": hdr, "bounding_boxes": boxes}


def _depth_to_cloud(ev: DepthEvent) -> CloudEvent:
    fx, fy, cx, cy = np.asarray(ev.intrinsics, np.float64)
    z = np.asarray(ev.depth, np.float64) * ev.depth_scale
    h, w = z.shape
    u = np.arange(w)[None, :]
    v = np.arange(h)[:, None]
    xyz = np.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], -1).astype(np.float32)
    return CloudEvent(ev.t, xyz, z > 0)


def write_bag(path: str, log: ReplayLog, compression: str = "none",
              chunk_threshold: int = 768 * 1024,
              time_offset: float | None = None) -> float:
    """Serialize a ``ReplayLog`` onto the reference's subscription topics.

    ``DepthEvent`` frames are backprojected to organized XYZ clouds (the
    reference consumes PointCloud2 only). Bag receive time == event time,
    which keeps the snap route's receive-time stamping quirk a no-op on
    round-trip.

    ROS time is unsigned and t=0 means "uninitialized", so synthetic logs
    stamped near 0 (or negative) get every stamp shifted by a constant
    ``time_offset``. Default (None): 0 if the log already starts past t=1,
    else a fixed 1e9-second epoch base. The applied offset is returned.
    """
    events: list[tuple[float, int, object]] = []
    for ev in log.odom:
        events.append((ev.t, 2, ev))
    for ev in log.clouds:
        events.append((ev.t, 0, ev))
    for ev in log.depths:
        # converted lazily in the write loop — materializing every frame's
        # float32 XYZ cloud up front would hold the whole session in memory
        events.append((ev.t, 0, ev))
    for ev in log.detections:
        events.append((ev.t, 1, ev))
    for ev in log.gt:
        events.append((ev.t, 3, ev))
    # clouds/detections before odometry within a tick, like ReplayLog.events
    events.sort(key=lambda e: (e[0], e[1]))

    if time_offset is None:
        time_offset = epoch_offset(events[0][0] if events else 0.0)

    seqs: dict[str, int] = {}
    with BagWriter(path, compression, chunk_threshold) as bag:
        for t0, _, ev in events:
            t = t0 + time_offset
            if isinstance(ev, DepthEvent):
                ev = _depth_to_cloud(ev)
            ev = dataclasses.replace(ev, t=t)
            if isinstance(ev, OdomEvent):
                topic, msg_type, msg = _odom_msg(ev, seqs.get(ev.source, 0))
                seqs[ev.source] = seqs.get(ev.source, 0) + 1
            elif isinstance(ev, CloudEvent):
                topic, msg_type = CLOUD_TOPIC, "sensor_msgs/PointCloud2"
                msg = _cloud_msg(ev, seqs.get("cloud", 0))
                seqs["cloud"] = seqs.get("cloud", 0) + 1
            elif isinstance(ev, DetectionEvent):
                topic, msg_type = DETECTION_TOPIC, "darknet_ros_msgs/BoundingBoxes"
                msg = _detection_msg(ev, seqs.get("det", 0))
                seqs["det"] = seqs.get("det", 0) + 1
            elif isinstance(ev, GtEvent):
                topic, msg_type = GT_TOPIC, "geometry_msgs/PoseStamped"
                msg = {"header": _header(ev.t, seqs.get("gt", 0), "world"),
                       "pose": _pose_msg(ev.pose7)}
                seqs["gt"] = seqs.get("gt", 0) + 1
            else:  # pragma: no cover - events list is built above
                raise TypeError(f"unhandled event {type(ev).__name__}")
            bag.write(topic, t, msg_type, msg)
    return time_offset
