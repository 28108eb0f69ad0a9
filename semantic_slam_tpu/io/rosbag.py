"""Pure-python rosbag v2.0 reader — replay REAL reference datasets directly.

The reference is driven by ``rosbag play`` of recorded datasets (e.g. the
README demo ``entire_lab_3_rounds.bag``; ``launch/*.launch:5-8``). This
module reads those bags natively — no ROS installation — and converts the
exact topics the reference node subscribes to
(``src/semantic_graph_slam_ros.cpp:69-91``) into a ``ReplayLog``, so
``cli run --log session.bag`` replays a recorded ROS session through the
engine with the reference's pairing semantics.

Three layers:

1. **Bag container** (`_records`): the rosbag 2.0 on-disk format — length-
   prefixed records with header-field blocks, chunked message storage
   (``none``/``bz2`` compression; ``lz4`` if the optional module exists).
2. **Generic message decoder** (`_MsgCatalog`): every bag connection record
   carries the full message-definition text; decoders are compiled from it
   at read time, so vendored/forked schemas (e.g. darknet_ros variants)
   decode per what was actually recorded rather than a hardcoded layout.
3. **Topic router** (`read_bag`): maps the reference's subscription table to
   ReplayLog events, reproducing the callback conversions:
   nav_msgs/Odometry -> OdomEvent('rovio'/'jackal'), PoseStamped ->
   OdomEvent('snap'/'orb'), PointCloud2 -> CloudEvent (organized xyz grid),
   BoundingBoxes -> DetectionEvent (xmin/ymin + |max-min| extents, the
   darknet callback math at ``semantic_graph_slam_ros.cpp:196-205``),
   DetectedObjects -> DetectionEvent, vicon/optitrack -> GtEvent.

Stamping quirk reproduced: ``snapVIOCallback`` stamps with
``ros::Time::now()`` instead of the message stamp
(``semantic_graph_slam_ros.cpp:136``, SURVEY.md quirk 5) — the closest
replay analog is the bag RECEIVE time of the record, which is what the
'snap' route uses; every other route uses ``header.stamp``.
"""

from __future__ import annotations

import bz2
import struct
from typing import Callable, Iterator

import numpy as np

from semantic_slam_tpu.config import CLASS_TO_ID
from semantic_slam_tpu.io.replay import (
    CloudEvent,
    DetectionEvent,
    GtEvent,
    OdomEvent,
    ReplayLog,
)

MAGIC = b"#ROSBAG V2.0\n"

_OP_MSG = 0x02
_OP_BAGHDR = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNKINFO = 0x06
_OP_CONN = 0x07

_U32 = struct.Struct("<I")


def _parse_fields(buf: bytes) -> dict[str, bytes]:
    """A header block: sequence of <u32 len><name=value> fields."""
    fields: dict[str, bytes] = {}
    pos = 0
    n = len(buf)
    while pos + 4 <= n:
        (flen,) = _U32.unpack_from(buf, pos)
        pos += 4
        field = buf[pos : pos + flen]
        pos += flen
        eq = field.index(b"=")
        fields[field[:eq].decode("ascii")] = field[eq + 1 :]
    return fields


def _records(buf: bytes) -> Iterator[tuple[dict[str, bytes], bytes]]:
    """Iterate (header_fields, data) records of a record stream."""
    pos = 0
    n = len(buf)
    while pos + 4 <= n:
        (hlen,) = _U32.unpack_from(buf, pos)
        pos += 4
        header = _parse_fields(buf[pos : pos + hlen])
        pos += hlen
        (dlen,) = _U32.unpack_from(buf, pos)
        pos += 4
        data = buf[pos : pos + dlen]
        pos += dlen
        yield header, data


def _decompress(data: bytes, compression: str, size: int) -> bytes:
    if compression in ("", "none"):
        return data
    if compression == "bz2":
        return bz2.decompress(data)
    if compression == "lz4":
        try:
            import lz4.frame  # type: ignore
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError(
                "bag chunk is lz4-compressed and the lz4 module is not "
                "available; re-record with bz2/none compression"
            ) from e
        return lz4.frame.decompress(data)
    raise ValueError(f"unknown chunk compression {compression!r}")


# ---------------------------------------------------------------------------
# Generic message decoding from definition text
# ---------------------------------------------------------------------------

# (struct code, numpy dtype) per ROS primitive; byte/char are the ROS1
# aliases for int8/uint8
_PRIMITIVES: dict[str, tuple[str, str]] = {
    "bool": ("?", "u1"),
    "byte": ("b", "i1"),
    "char": ("B", "u1"),
    "int8": ("b", "i1"),
    "uint8": ("B", "u1"),
    "int16": ("h", "i2"),
    "uint16": ("H", "u2"),
    "int32": ("i", "i4"),
    "uint32": ("I", "u4"),
    "int64": ("q", "i8"),
    "uint64": ("Q", "u8"),
    "float32": ("f", "f4"),
    "float64": ("d", "f8"),
}


class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0


def _read_string(c: _Cursor) -> str:
    (n,) = _U32.unpack_from(c.buf, c.pos)
    c.pos += 4
    s = c.buf[c.pos : c.pos + n]
    c.pos += n
    return s.decode("utf-8", errors="replace")


def _read_time(c: _Cursor) -> float:
    sec, nsec = struct.unpack_from("<II", c.buf, c.pos)
    c.pos += 8
    return sec + nsec * 1e-9


def _split_msg_type(full: str) -> tuple[str, str]:
    pkg, _, name = full.rpartition("/")
    return pkg, name


class _MsgCatalog:
    """Decoders compiled from a connection's message_definition text.

    The definition concatenates the top-level type's field list with every
    dependent type's, separated by '='-bar lines + ``MSG: pkg/Type`` headers
    — exactly what rosbag stores per connection, so the decoder always
    matches the recorded wire layout.
    """

    def __init__(self, top_type: str, definition: str):
        self._defs: dict[str, list[str]] = {}
        self._decoders: dict[str, Callable[[_Cursor], dict]] = {}
        cur = top_type
        lines: list[str] = []
        for raw in definition.splitlines():
            if raw.startswith("===="):
                self._defs[cur] = lines
                cur, lines = "", []
            elif raw.startswith("MSG:"):
                cur = raw.split("MSG:", 1)[1].strip()
            else:
                lines.append(raw)
        self._defs[cur] = lines
        self.decode = self._decoder_for(top_type)

    def _resolve(self, typ: str, pkg: str) -> str:
        if typ in self._defs:
            return typ
        if typ == "Header":
            return "std_msgs/Header"
        if "/" not in typ and f"{pkg}/{typ}" in self._defs:
            return f"{pkg}/{typ}"
        return typ

    def _decoder_for(self, full_type: str) -> Callable[[_Cursor], dict]:
        if full_type in self._decoders:
            return self._decoders[full_type]
        if full_type not in self._defs:
            raise ValueError(f"bag definition missing type {full_type!r}")
        pkg, _ = _split_msg_type(full_type)

        steps: list[tuple[str, Callable[[_Cursor], object]]] = []
        # placeholder so recursive/nested references resolve
        def decode(c: _Cursor) -> dict:
            return {name: fn(c) for name, fn in steps}

        self._decoders[full_type] = decode

        for raw in self._defs[full_type]:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split(None, 1)
            if len(parts) != 2:
                continue
            typ, name = parts[0], parts[1].strip()
            if "=" in name:
                continue  # constant — no wire presence
            arr_n: int | None = None
            is_array = False
            if typ.endswith("]"):
                base, bracket = typ.split("[", 1)
                typ = base
                is_array = True
                count = bracket[:-1]
                arr_n = int(count) if count else None
            steps.append((name, self._field_decoder(typ, pkg, is_array, arr_n)))
        return decode

    def _field_decoder(
        self, typ: str, pkg: str, is_array: bool, arr_n: int | None
    ) -> Callable[[_Cursor], object]:
        if typ in _PRIMITIVES:
            code, np_dt = _PRIMITIVES[typ]
            st = struct.Struct("<" + code)
            dt = np.dtype(np_dt)
            if not is_array:
                def prim(c: _Cursor):
                    (v,) = st.unpack_from(c.buf, c.pos)
                    c.pos += st.size
                    return v
                return prim

            def prim_array(c: _Cursor):
                n = arr_n
                if n is None:
                    (n,) = _U32.unpack_from(c.buf, c.pos)
                    c.pos += 4
                out = np.frombuffer(c.buf, dt, count=n, offset=c.pos)
                c.pos += n * dt.itemsize
                return out
            return prim_array

        if typ == "string":
            elem: Callable[[_Cursor], object] = _read_string
        elif typ in ("time", "duration"):
            elem = _read_time
        else:
            elem = self._decoder_for(self._resolve(typ, pkg))

        if not is_array:
            return elem

        def msg_array(c: _Cursor):
            n = arr_n
            if n is None:
                (n,) = _U32.unpack_from(c.buf, c.pos)
                c.pos += 4
            return [elem(c) for _ in range(n)]
        return msg_array


class _Connection:
    __slots__ = ("topic", "type", "catalog")

    def __init__(self, topic: str, msg_type: str, definition: str):
        self.topic = topic
        self.type = msg_type
        self.catalog = _MsgCatalog(msg_type, definition)


def read_messages(path: str) -> Iterator[tuple[str, str, float, dict]]:
    """Yield ``(topic, msg_type, receive_time, decoded_msg)`` in bag order."""
    with open(path, "rb") as f:
        blob = f.read()
    if not blob.startswith(MAGIC):
        raise ValueError(f"{path}: not a rosbag 2.0 file")

    conns: dict[int, _Connection] = {}

    def handle(header: dict[str, bytes], data: bytes):
        op = header["op"][0]
        if op == _OP_CONN:
            cid = _U32.unpack_from(header["conn"])[0]
            fields = _parse_fields(data)
            conns[cid] = _Connection(
                header["topic"].decode(),
                fields["type"].decode(),
                fields["message_definition"].decode("utf-8", errors="replace"),
            )
        elif op == _OP_MSG:
            cid = _U32.unpack_from(header["conn"])[0]
            sec, nsec = struct.unpack("<II", header["time"])
            conn = conns[cid]
            c = _Cursor(data)
            yield_item = (
                conn.topic,
                conn.type,
                sec + nsec * 1e-9,
                conn.catalog.decode(c),
            )
            return yield_item
        return None

    for header, data in _records(blob[len(MAGIC) :]):
        op = header["op"][0]
        if op == _OP_CHUNK:
            compression = header.get("compression", b"none").decode()
            size = _U32.unpack_from(header.get("size", b"\0\0\0\0"))[0]
            inner = _decompress(data, compression, size)
            for h2, d2 in _records(inner):
                item = handle(h2, d2)
                if item is not None:
                    yield item
        elif op in (_OP_BAGHDR, _OP_INDEX, _OP_CHUNKINFO):
            continue
        else:
            item = handle(header, data)
            if item is not None:
                yield item


def bag_info(path: str) -> dict[str, tuple[str, int]]:
    """``{topic: (msg_type, message_count)}`` summary of a bag."""
    out: dict[str, tuple[str, int]] = {}
    for topic, msg_type, _, _ in read_messages(path):
        t, n = out.get(topic, (msg_type, 0))
        out[topic] = (t, n + 1)
    return out


# ---------------------------------------------------------------------------
# Topic routing — the reference node's subscription table
# ---------------------------------------------------------------------------

# semantic_graph_slam_ros.cpp:69-91: topic -> (event kind, odom source)
DEFAULT_TOPIC_MAP: dict[str, tuple[str, str | None]] = {
    "/rovio/odometry": ("odom", "rovio"),
    "/SQ04/snap_vislam/vislam/pose": ("odom", "snap"),
    "orb_slam/pose": ("odom", "orb"),
    "/orb_slam/pose": ("odom", "orb"),
    "/JA01/odometry/filtered": ("odom", "jackal"),
    "/depth_registered/points": ("cloud", None),
    "/darknet_ros/bounding_boxes": ("detections", None),
    "/image_processed/bounding_boxes": ("detections", None),
    "/vrpn_client_node/realsense/pose": ("gt", None),
    "/SQ04/vicon": ("gt", None),
}


def _pose7(pose_msg: dict) -> np.ndarray:
    p, q = pose_msg["position"], pose_msg["orientation"]
    # ROS quaternions are xyzw on the wire; graph state is [t, w, x, y, z]
    return np.array(
        [p["x"], p["y"], p["z"], q["w"], q["x"], q["y"], q["z"]], np.float64
    )


def _header_stamp(msg: dict) -> float:
    return float(msg["header"]["stamp"])


def _odom_event(msg: dict, msg_type: str, source: str, rx_time: float) -> OdomEvent:
    if "pose" in msg and isinstance(msg["pose"], dict) and "pose" in msg["pose"]:
        # nav_msgs/Odometry: PoseWithCovariance
        pose7 = _pose7(msg["pose"]["pose"])
        cov = np.asarray(msg["pose"]["covariance"], np.float64).reshape(6, 6)
    else:  # geometry_msgs/PoseStamped
        pose7 = _pose7(msg["pose"])
        cov = None
    # snapVIOCallback stamps ros::Time::now(), not the header stamp
    # (semantic_graph_slam_ros.cpp:136) — the bag receive time is the analog
    t = rx_time if source == "snap" else _header_stamp(msg)
    return OdomEvent(t, pose7, cov, source)


def _cloud_event(msg: dict) -> CloudEvent | None:
    h, w = int(msg["height"]), int(msg["width"])
    if h <= 1:
        return None  # unorganized cloud — the reference frontend needs a grid
    if msg["is_bigendian"]:
        raise ValueError("big-endian PointCloud2 is not supported")
    step = int(msg["point_step"])
    offsets = {f["name"]: (int(f["offset"]), int(f["datatype"])) for f in msg["fields"]}
    raw = np.asarray(msg["data"], np.uint8)
    # honor row_step: recorded bags may pad rows beyond width*point_step, and
    # a flat h*w*step reshape would silently shear the XYZ grid
    row_step = int(msg.get("row_step", 0)) or w * step
    grid = raw[: h * row_step].reshape(h, row_step)[:, : w * step].reshape(h, w, step)
    xyz = np.empty((h, w, 3), np.float32)
    for i, name in enumerate(("x", "y", "z")):
        off, dtype_id = offsets[name]
        if dtype_id != 7:  # sensor_msgs/PointField FLOAT32
            raise ValueError(f"PointCloud2 field {name} is not float32")
        xyz[:, :, i] = (
            grid[:, :, off : off + 4].reshape(h, w, 4).copy().view(np.float32)[..., 0]
        )
    valid = np.isfinite(xyz).all(axis=-1)
    return CloudEvent(_header_stamp(msg), xyz, valid)


def _detection_event(msg: dict) -> DetectionEvent:
    if "bounding_boxes" in msg:
        # BoundingBoxes (darknet): xmin/ymin corner, |max-min| extents
        # (detectedObjectDarknetCallback, semantic_graph_slam_ros.cpp:196-205)
        items = msg["bounding_boxes"]
        boxes = np.array(
            [
                [
                    b["xmin"],
                    b["ymin"],
                    abs(b["xmax"] - b["xmin"]),
                    abs(b["ymax"] - b["ymin"]),
                ]
                for b in items
            ],
            np.float64,
        ).reshape(-1, 4)
        names = [b["Class"] for b in items]
        probs = np.array([b["probability"] for b in items], np.float64)
    else:
        # semantic_SLAM/DetectedObjects (ObjectInfo[])
        items = msg["objects"]
        boxes = np.array(
            [[o["tl_x"], o["tl_y"], o["width"], o["height"]] for o in items],
            np.float64,
        ).reshape(-1, 4)
        names = [o["type"] for o in items]
        probs = np.array([o["prob"] for o in items], np.float64)
    # non-whitelisted classes become id -1; the frontend's class gate drops
    # them (point_cloud_segmentation.h:126-130 semantics)
    cids = np.array([CLASS_TO_ID.get(n, -1) for n in names], np.int32)
    return DetectionEvent(_header_stamp(msg), boxes, cids, probs)


def _gt_event(msg: dict) -> GtEvent | None:
    if "has_pose" in msg and not msg["has_pose"]:
        return None  # acl_msgs/ViconState without a valid pose
    pose = msg["pose"]
    if isinstance(pose, dict) and "pose" in pose:  # nav_msgs/Odometry
        pose = pose["pose"]
    return GtEvent(_header_stamp(msg), _pose7(pose))


def read_bag(
    path: str, topic_map: dict[str, tuple[str, str | None]] | None = None
) -> ReplayLog:
    """Read a recorded ROS session into a ``ReplayLog``.

    ``topic_map`` maps topic -> (kind, source) with kind in
    ``odom|cloud|detections|gt`` (source names the odometry fixup for kind
    'odom'); defaults to the reference node's subscription table. Topics not
    in the map are ignored.
    """
    tmap = DEFAULT_TOPIC_MAP if topic_map is None else topic_map
    log = ReplayLog()
    for topic, msg_type, rx_time, msg in read_messages(path):
        route = tmap.get(topic)
        if route is None:
            continue
        kind, source = route
        if kind == "odom":
            log.odom.append(_odom_event(msg, msg_type, source or "rovio", rx_time))
        elif kind == "cloud":
            ev = _cloud_event(msg)
            if ev is not None:
                log.clouds.append(ev)
        elif kind == "detections":
            log.detections.append(_detection_event(msg))
        elif kind == "gt":
            gt = _gt_event(msg)
            if gt is not None:
                log.gt.append(gt)
        else:
            raise ValueError(f"unknown event kind {kind!r} for topic {topic}")
    return log
