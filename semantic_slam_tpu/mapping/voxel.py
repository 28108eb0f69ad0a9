"""Device-side occupancy voxel mapping.

Replaces the external ``octomap_server`` node the reference launches
(``launch/ps_slam_with_snap_pose_bucket_det_lab_data_with_octomap.launch:46-58``,
resolution 0.05 m): clouds transformed by the *optimized* keyframe poses are
scattered into a dense device-resident voxel grid. The map->odom TF that the
reference publishes so octomap sees drift-corrected clouds is inherent here
— voxelization consumes the corrected poses directly.

Free-space carving (octomap's beam-miss updates) is TPU-native here: instead
of per-ray serial DDA walks, every beam is sampled at a STATIC number of
points spaced at most one voxel apart — a dense [N,S,3] tensor scattered in
one shot. Choose ``samples >= max_range / resolution`` and the sample chain
crosses every voxel the exact DDA would (up to corner-clipping ties), with
zero data-dependent control flow.

Unbounded scenes (KITTI-class trajectories) use :class:`ChunkedVoxelMap`:
the world is tiled into fixed-shape chunks materialized on first touch, all
sharing one compiled insert program — octomap's growing octree re-imagined
as static shapes + masking.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.core import frames


class VoxelGrid(NamedTuple):
    hits: jax.Array  # [X, Y, Z] int32 endpoint counts
    misses: jax.Array  # [X, Y, Z] int32 free-space (beam pass-through) counts
    origin: jax.Array  # [3] world position of voxel (0,0,0) corner
    resolution: jax.Array  # scalar, meters


def make_grid(
    dims: tuple[int, int, int] = (256, 256, 64),
    origin=(-6.4, -6.4, -1.6),
    resolution: float = 0.05,
    dtype=jnp.float32,
) -> VoxelGrid:
    return VoxelGrid(
        hits=jnp.zeros(dims, jnp.int32),
        misses=jnp.zeros(dims, jnp.int32),
        origin=jnp.asarray(origin, dtype),
        resolution=jnp.asarray(resolution, dtype),
    )


@jax.jit
def insert_world_points(grid: VoxelGrid, pts_world: jax.Array, valid: jax.Array) -> VoxelGrid:
    """Scatter endpoint hits into the grid (out-of-bounds / invalid masked)."""
    idx = jnp.floor((pts_world - grid.origin) / grid.resolution).astype(jnp.int32)
    dims = jnp.asarray(grid.hits.shape, jnp.int32)
    inb = jnp.all((idx >= 0) & (idx < dims), axis=-1) & valid
    idx = jnp.clip(idx, 0, dims - 1)
    upd = inb.astype(jnp.int32)
    return grid._replace(
        hits=grid.hits.at[idx[..., 0], idx[..., 1], idx[..., 2]].add(upd)
    )


@partial(jax.jit, static_argnames=("strict_frames",))
def insert_keyframe_cloud(
    grid: VoxelGrid,
    points_cam: jax.Array,  # [H, W, 3]
    cloud_valid: jax.Array,  # [H, W]
    robot_xyzrpy: jax.Array,  # [6] optimized keyframe pose
    cam_angle: jax.Array,
    strict_frames: bool = True,
) -> VoxelGrid:
    """Transform an organized cam-frame cloud by the corrected pose and insert.

    Uses the same cam->world chain as the landmark pipeline so the map is
    consistent with the graph (the role of publishMap2OdomTF,
    semantic_graph_slam_ros.cpp:437-452)."""
    T = frames.t_cam_world(robot_xyzrpy, cam_angle, strict=strict_frames)
    pts = points_cam.reshape(-1, 3)
    w = jnp.einsum("ij,nj->ni", T[:3, :3], pts) + robot_xyzrpy[:3][None, :]
    return insert_world_points(grid, w, cloud_valid.reshape(-1))


@partial(jax.jit, static_argnames=("samples",))
def carve_free_space(
    grid: VoxelGrid,
    sensor_origin_w: jax.Array,  # [3] beam origin in world
    pts_world: jax.Array,  # [N, 3] beam endpoints in world
    valid: jax.Array,  # [N]
    samples: int = 128,
) -> VoxelGrid:
    """Mark voxels traversed by the beams as free (octomap's miss updates).

    Each ray is sampled at ``samples`` points in (0, 1) exclusive of the
    endpoint voxel; pick ``samples >= max_range / resolution`` so consecutive
    samples are at most one voxel apart. Out-of-bounds samples and samples
    landing in the endpoint voxel are dropped.
    """
    dtype = pts_world.dtype
    dims = jnp.asarray(grid.hits.shape, jnp.int32)
    t = ((jnp.arange(samples, dtype=dtype) + 0.5) / samples)[None, :, None]
    ray = pts_world[:, None, :] - sensor_origin_w[None, None, :]
    pts = sensor_origin_w[None, None, :] + t * ray  # [N, S, 3]

    idx = jnp.floor((pts - grid.origin) / grid.resolution).astype(jnp.int32)
    end_idx = jnp.floor((pts_world - grid.origin) / grid.resolution).astype(jnp.int32)
    is_end = jnp.all(idx == end_idx[:, None, :], axis=-1)
    inb = jnp.all((idx >= 0) & (idx < dims), axis=-1)
    upd = (inb & ~is_end & valid[:, None]).astype(jnp.int32)
    idx = jnp.clip(idx, 0, dims - 1)
    return grid._replace(
        misses=grid.misses.at[
            idx[..., 0], idx[..., 1], idx[..., 2]
        ].add(upd)
    )


@partial(jax.jit, static_argnames=("strict_frames", "samples"))
def insert_keyframe_cloud_carving(
    grid: VoxelGrid,
    points_cam: jax.Array,
    cloud_valid: jax.Array,
    robot_xyzrpy: jax.Array,
    cam_angle: jax.Array,
    strict_frames: bool = True,
    samples: int = 128,
) -> VoxelGrid:
    """Endpoint hits + free-space carving for one keyframe cloud, fused."""
    T = frames.t_cam_world(robot_xyzrpy, cam_angle, strict=strict_frames)
    pts = points_cam.reshape(-1, 3)
    w = jnp.einsum("ij,nj->ni", T[:3, :3], pts) + robot_xyzrpy[:3][None, :]
    v = cloud_valid.reshape(-1)
    grid = insert_world_points(grid, w, v)
    return carve_free_space(grid, robot_xyzrpy[:3], w, v, samples=samples)


@partial(jax.jit, static_argnames=("min_hits",))
def occupied_mask(grid: VoxelGrid, min_hits: int = 2) -> jax.Array:
    return grid.hits >= min_hits


@jax.jit
def occupancy_log_odds(
    grid: VoxelGrid, l_occ: float = 0.85, l_free: float = -0.4
) -> jax.Array:
    """Per-voxel log-odds combining endpoint hits and beam misses (octomap's
    sensor model with the standard 0.85 / -0.4 weights)."""
    return grid.hits * l_occ + grid.misses * l_free


@partial(jax.jit, static_argnames=())
def occupied_mask_probabilistic(grid: VoxelGrid, thres: float = 0.85) -> jax.Array:
    """Occupied = accumulated log-odds above threshold — unlike the count
    mask, a voxel seen through by many later beams decays back to free."""
    return occupancy_log_odds(grid) >= thres


def occupied_centers(grid, min_hits: int = 2):
    """Host-side extraction of occupied voxel centers [M,3] (viz/export).

    Accepts a single :class:`VoxelGrid` or a :class:`ChunkedVoxelMap`."""
    import numpy as np

    if isinstance(grid, ChunkedVoxelMap):
        return grid.occupied_centers(min_hits)
    mask = np.asarray(occupied_mask(grid, min_hits))
    idx = np.argwhere(mask)
    res = float(grid.resolution)
    return (idx + 0.5) * res + np.asarray(grid.origin)


# ---------------------------------------------------------------------------
# unbounded scenes: chunked grids
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("strict_frames",))
def _world_points_aabb(
    points_cam: jax.Array,
    cloud_valid: jax.Array,
    robot_xyzrpy: jax.Array,
    cam_angle: jax.Array,
    strict_frames: bool = True,
):
    """Transform a cam cloud to world once; return points + valid + AABB.

    The AABB (over valid points + the sensor origin, so carving rays stay
    inside) is the ONLY thing fetched to the host — 6 floats + a count —
    to decide which chunks the scatter must visit."""
    T = frames.t_cam_world(robot_xyzrpy, cam_angle, strict=strict_frames)
    pts = points_cam.reshape(-1, 3)
    w = jnp.einsum("ij,nj->ni", T[:3, :3], pts) + robot_xyzrpy[:3][None, :]
    v = cloud_valid.reshape(-1)
    big = jnp.asarray(jnp.finfo(w.dtype).max, w.dtype)
    wv = jnp.where(v[:, None], w, big)
    lo = jnp.minimum(jnp.min(wv, axis=0), robot_xyzrpy[:3])
    wv = jnp.where(v[:, None], w, -big)
    hi = jnp.maximum(jnp.max(wv, axis=0), robot_xyzrpy[:3])
    return w, v, lo, hi, jnp.sum(v)


@partial(jax.jit, static_argnames=("max_chunks",))
def _chunk_point_counts(
    w: jax.Array,  # [N, 3] world points
    v: jax.Array,  # [N] valid
    extent: jax.Array,  # [3] chunk extent (meters)
    lo_c: jax.Array,  # [3] i32 first chunk coordinate of the AABB
    n_c: jax.Array,  # [3] i32 chunk counts per axis
    max_chunks: int,
) -> jax.Array:
    """Histogram of valid points over the AABB's chunk boxes, flattened as
    ``relx * (ny*nz) + rely * nz + relz`` — fixed [max_chunks] shape so one
    compiled program serves every insert regardless of the AABB size."""
    rel = jnp.floor(w / extent[None, :]).astype(jnp.int32) - lo_c[None, :]
    inb = jnp.all((rel >= 0) & (rel < n_c[None, :]), axis=-1) & v
    flat = rel[:, 0] * (n_c[1] * n_c[2]) + rel[:, 1] * n_c[2] + rel[:, 2]
    flat = jnp.where(inb, flat, max_chunks)  # dropped by mode="drop"
    return jnp.zeros((max_chunks,), jnp.int32).at[flat].add(
        inb.astype(jnp.int32), mode="drop"
    )


class ChunkedVoxelMap:
    """Unbounded occupancy map as a host dict of fixed-shape device chunks.

    A single dense :class:`VoxelGrid` has a fixed extent (the round-1 default
    silently dropped everything outside 12.8 x 12.8 x 3.2 m — wrong for
    KITTI-class outdoor sessions). Here the world is tiled into fixed-size
    chunks materialized on first touch; every chunk shares ONE compiled
    insert program (identical shapes, origin is a traced argument), so chunk
    count never causes recompilation. Out-of-chunk points are masked by the
    insert's own bounds check. This is the TPU analog of octomap's growing
    octree: static shapes + masking instead of pointer trees.
    """

    def __init__(
        self,
        chunk_dims: tuple[int, int, int] = (128, 128, 64),
        resolution: float = 0.05,
        carve: bool = False,
        samples: int = 128,
        strict_frames: bool = True,
        dtype=jnp.float32,
        max_chunks_per_insert: int = 64,
    ):
        self.chunk_dims = tuple(chunk_dims)
        self.resolution = float(resolution)
        self.extent = tuple(d * self.resolution for d in self.chunk_dims)
        self.carve = carve
        self.samples = int(samples)
        self.strict_frames = strict_frames
        self.dtype = dtype
        self.max_chunks_per_insert = int(max_chunks_per_insert)
        self.chunks: dict[tuple[int, int, int], VoxelGrid] = {}

    def _chunk_range(self, lo, hi):
        import numpy as np

        lo_c = np.floor(np.asarray(lo, np.float64) / self.extent).astype(int)
        hi_c = np.floor(np.asarray(hi, np.float64) / self.extent).astype(int)
        return lo_c, hi_c

    def _grid_for(self, cc: tuple[int, int, int]) -> VoxelGrid:
        g = self.chunks.get(cc)
        if g is None:
            origin = tuple(cc[i] * self.extent[i] for i in range(3))
            g = make_grid(self.chunk_dims, origin, self.resolution, self.dtype)
        return g

    def insert_keyframe_cloud(
        self,
        points_cam: jax.Array,
        cloud_valid: jax.Array,
        robot_xyzrpy: jax.Array,
        cam_angle: jax.Array,
    ) -> None:
        w, v, lo, hi, n_valid = _world_points_aabb(
            points_cam, cloud_valid, robot_xyzrpy, cam_angle,
            strict_frames=self.strict_frames,
        )
        import numpy as np

        if int(n_valid) == 0:
            return
        lo_c, hi_c = self._chunk_range(np.asarray(lo), np.asarray(hi))
        n_boxes = int(np.prod(hi_c - lo_c + 1))
        if n_boxes > self.max_chunks_per_insert:
            raise ValueError(
                f"cloud AABB spans {n_boxes} chunks (> {self.max_chunks_per_insert}); "
                "likely corrupt points — raise max_chunks_per_insert if intended"
            )
        origin_w = robot_xyzrpy[:3]
        # Pre-count points per candidate chunk (one fixed-shape program +
        # one [max_chunks] fetch): a diagonal cloud's AABB covers many
        # chunks no point lands in, and materializing each costs ~8 MB of
        # device arrays plus a full insert program. Carving can still mark
        # free space in point-empty pass-through chunks, so with carve=True
        # empty-count chunks run the carve and are kept only if it wrote.
        counts = np.asarray(
            _chunk_point_counts(
                w, v,
                jnp.asarray(self.extent, w.dtype),
                jnp.asarray(lo_c, jnp.int32),
                jnp.asarray(hi_c - lo_c + 1, jnp.int32),
                self.max_chunks_per_insert,
            )
        )
        nyz = (hi_c[1] - lo_c[1] + 1) * (hi_c[2] - lo_c[2] + 1)
        nz = hi_c[2] - lo_c[2] + 1
        for cx in range(lo_c[0], hi_c[0] + 1):
            for cy in range(lo_c[1], hi_c[1] + 1):
                for cz in range(lo_c[2], hi_c[2] + 1):
                    cc = (cx, cy, cz)
                    flat = (
                        (cx - lo_c[0]) * nyz + (cy - lo_c[1]) * nz + (cz - lo_c[2])
                    )
                    has_points = counts[flat] > 0
                    if not has_points and not self.carve:
                        continue
                    is_new = cc not in self.chunks
                    if not has_points and is_new:
                        # carve-only candidate: run the carve on a fresh
                        # chunk, keep it only if any beam actually crossed
                        g = self._grid_for(cc)
                        g = carve_free_space(
                            g, origin_w, w, v, samples=self.samples
                        )
                        if int(np.asarray(jnp.sum(g.misses))) > 0:
                            self.chunks[cc] = g
                        continue
                    g = self._grid_for(cc)
                    if has_points:
                        g = insert_world_points(g, w, v)
                    if self.carve:
                        g = carve_free_space(g, origin_w, w, v, samples=self.samples)
                    self.chunks[cc] = g

    def occupied_centers(self, min_hits: int = 2):
        import numpy as np

        parts = [occupied_centers(g, min_hits) for g in self.chunks.values()]
        parts = [p for p in parts if len(p)]
        if not parts:
            return np.zeros((0, 3))
        return np.concatenate(parts, axis=0)

    def total_hits(self) -> int:
        import numpy as np

        return int(sum(int(np.asarray(jnp.sum(g.hits))) for g in self.chunks.values()))
