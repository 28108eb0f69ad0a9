"""ctypes bindings for the native runtime core (slamlog.cpp).

Builds the shared library on first use with g++ -O3 (cached next to the
source); every consumer has a pure-Python fallback, so a missing toolchain
degrades gracefully (``available()`` -> False).
"""

from __future__ import annotations

import ctypes as C
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "slamlog.cpp")
_LIB = os.path.join(_HERE, "libslamlog.so")
_lock = threading.Lock()
_lib = None
_tried = False

SOURCE_IDS = {"rovio": 0, "snap": 1, "jackal": 2, "orb": 3}
SOURCE_NAMES = {v: k for k, v in SOURCE_IDS.items()}


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        lib = C.CDLL(_LIB)
        # writer
        lib.slog_writer_create.restype = C.c_void_p
        lib.slog_writer_create.argtypes = [C.c_char_p, C.c_uint32, C.c_uint32, C.c_uint32]
        lib.slog_add_odom.argtypes = [C.c_void_p, C.c_double, C.c_uint8, C.c_void_p, C.c_void_p]
        lib.slog_add_cloud.argtypes = [C.c_void_p, C.c_double, C.c_void_p, C.c_void_p]
        lib.slog_add_detections.argtypes = [
            C.c_void_p, C.c_double, C.c_uint32, C.c_void_p, C.c_void_p, C.c_void_p,
        ]
        lib.slog_add_gt.argtypes = [C.c_void_p, C.c_double, C.c_void_p]
        lib.slog_writer_finish.argtypes = [C.c_void_p]
        lib.slog_writer_finish.restype = C.c_int
        # reader
        lib.slog_open.restype = C.c_void_p
        lib.slog_open.argtypes = [C.c_char_p]
        lib.slog_close.argtypes = [C.c_void_p]
        lib.slog_counts.argtypes = [C.c_void_p, C.c_void_p]
        lib.slog_dims.argtypes = [C.c_void_p, C.c_void_p]
        lib.slog_num_events.restype = C.c_size_t
        lib.slog_num_events.argtypes = [C.c_void_p]
        lib.slog_event.argtypes = [C.c_void_p, C.c_size_t, C.c_void_p, C.c_void_p]
        lib.slog_odom.restype = C.c_void_p
        lib.slog_odom.argtypes = [C.c_void_p, C.c_size_t]
        lib.slog_cloud_time.restype = C.c_double
        lib.slog_cloud_time.argtypes = [C.c_void_p, C.c_size_t]
        lib.slog_cloud_xyz.restype = C.c_void_p
        lib.slog_cloud_xyz.argtypes = [C.c_void_p, C.c_size_t]
        lib.slog_cloud_valid.restype = C.c_void_p
        lib.slog_cloud_valid.argtypes = [C.c_void_p, C.c_size_t]
        lib.slog_det.restype = C.c_void_p
        lib.slog_det.argtypes = [C.c_void_p, C.c_size_t]
        lib.slog_gt.restype = C.c_void_p
        lib.slog_gt.argtypes = [C.c_void_p, C.c_size_t]
        # gate
        lib.kf_gate_create.restype = C.c_void_p
        lib.kf_gate_create.argtypes = [C.c_double, C.c_double, C.c_double]
        lib.kf_gate_destroy.argtypes = [C.c_void_p]
        lib.kf_gate_update.restype = C.c_int
        lib.kf_gate_update.argtypes = [C.c_void_p, C.c_void_p, C.c_double]
        lib.kf_gate_accum.restype = C.c_double
        lib.kf_gate_accum.argtypes = [C.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------


def write_slog(path: str, log, height: int, width: int, max_det: int = 8) -> None:
    """Serialize a ReplayLog to the SLOG binary format."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    w = lib.slog_writer_create(path.encode(), height, width, max_det)
    assert w, f"cannot create {path}"
    for e in log.odom:
        pose = np.ascontiguousarray(e.pose7, np.float64)
        cov = (
            np.ascontiguousarray(e.cov, np.float64).reshape(-1)
            if e.cov is not None
            else None
        )
        lib.slog_add_odom(
            w, e.t, SOURCE_IDS.get(e.source, 0),
            pose.ctypes.data_as(C.c_void_p),
            cov.ctypes.data_as(C.c_void_p) if cov is not None else None,
        )
    for e in log.clouds:
        xyz = np.ascontiguousarray(e.points, np.float32)
        valid = np.ascontiguousarray(e.valid, np.uint8)
        assert xyz.shape[:2] == (height, width)
        lib.slog_add_cloud(
            w, e.t, xyz.ctypes.data_as(C.c_void_p), valid.ctypes.data_as(C.c_void_p)
        )
    for e in log.detections:
        boxes = np.ascontiguousarray(e.boxes, np.float32)
        cids = np.ascontiguousarray(e.class_ids, np.int32)
        probs = np.ascontiguousarray(e.probs, np.float32)
        lib.slog_add_detections(
            w, e.t, len(boxes),
            boxes.ctypes.data_as(C.c_void_p),
            cids.ctypes.data_as(C.c_void_p),
            probs.ctypes.data_as(C.c_void_p),
        )
    for e in log.gt:
        pose = np.ascontiguousarray(e.pose7, np.float64)
        lib.slog_add_gt(w, e.t, pose.ctypes.data_as(C.c_void_p))
    rc = lib.slog_writer_finish(w)
    assert rc == 0, f"slog write failed: {rc}"


class SlogReader:
    """mmap-backed reader; cloud arrays are zero-copy views into the file."""

    def __init__(self, path: str):
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self._r = lib.slog_open(path.encode())
        assert self._r, f"cannot open {path}"
        counts = np.zeros(4, np.uint64)
        lib.slog_counts(self._r, counts.ctypes.data_as(C.c_void_p))
        self.n_odom, self.n_cloud, self.n_det, self.n_gt = (int(x) for x in counts)
        dims = np.zeros(3, np.uint32)
        lib.slog_dims(self._r, dims.ctypes.data_as(C.c_void_p))
        self.height, self.width, self.max_det = (int(x) for x in dims)

    def close(self):
        if self._r:
            self._lib.slog_close(self._r)
            self._r = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def events(self):
        """Yield (kind, idx) in pre-merged delivery order.
        kind: 0 cloud, 1 detections, 2 odom, 3 gt."""
        k = C.c_uint8()
        i = C.c_uint32()
        for e in range(self._lib.slog_num_events(self._r)):
            self._lib.slog_event(self._r, e, C.byref(k), C.byref(i))
            yield int(k.value), int(i.value)

    def odom(self, i: int):
        p = self._lib.slog_odom(self._r, i)
        buf = np.frombuffer(C.string_at(p, 8 + 8 + 7 * 8 + 36 * 8), np.uint8)
        t = buf[:8].view(np.float64)[0]
        source = int(buf[8])
        pose = buf[16 : 16 + 56].view(np.float64).copy()
        cov = buf[16 + 56 :].view(np.float64).reshape(6, 6).copy()
        return float(t), SOURCE_NAMES.get(source, "rovio"), pose, cov

    def cloud(self, i: int):
        npix = self.height * self.width
        t = self._lib.slog_cloud_time(self._r, i)
        xyz_p = self._lib.slog_cloud_xyz(self._r, i)
        val_p = self._lib.slog_cloud_valid(self._r, i)
        xyz = np.frombuffer(
            (C.c_float * (npix * 3)).from_address(xyz_p), np.float32
        ).reshape(self.height, self.width, 3)
        valid = np.frombuffer(
            (C.c_uint8 * npix).from_address(val_p), np.uint8
        ).reshape(self.height, self.width)
        return float(t), xyz, valid.astype(bool)

    def detections(self, i: int):
        md = self.max_det
        rec = 8 + 8 + md * 16 + md * 4 + md * 4
        p = self._lib.slog_det(self._r, i)
        buf = np.frombuffer(C.string_at(p, rec), np.uint8)
        t = buf[:8].view(np.float64)[0]
        n = int(buf[8:12].view(np.uint32)[0])
        off = 16
        boxes = buf[off : off + md * 16].view(np.float32).reshape(md, 4)[:n].copy()
        off += md * 16
        cids = buf[off : off + md * 4].view(np.int32)[:n].copy()
        off += md * 4
        probs = buf[off : off + md * 4].view(np.float32)[:n].copy()
        return float(t), boxes, cids, probs

    def gt(self, i: int):
        p = self._lib.slog_gt(self._r, i)
        buf = np.frombuffer(C.string_at(p, 8 + 56), np.uint8)
        return float(buf[:8].view(np.float64)[0]), buf[8:].view(np.float64).copy()


class NativeKeyframeGate:
    """Drop-in for runtime.keyframe_gate.KeyframeGate backed by C++."""

    def __init__(self, delta_trans=0.5, delta_angle=0.5, delta_time=1.0):
        lib = _load()
        assert lib is not None, "native library unavailable"
        self._lib = lib
        self._g = lib.kf_gate_create(delta_trans, delta_angle, delta_time)

    def update(self, pose7, stamp: float) -> bool:
        p = np.ascontiguousarray(pose7, np.float64)
        return bool(self._lib.kf_gate_update(self._g, p.ctypes.data_as(C.c_void_p), stamp))

    @property
    def accum_distance(self) -> float:
        return float(self._lib.kf_gate_accum(self._g))

    def __del__(self):
        try:
            self._lib.kf_gate_destroy(self._g)
        except Exception:
            pass
