"""Device-time decomposition: per-chip throughput without the tunnel RTT.

The end-to-end numbers in README are dominated by this rig's remote-TPU
tunnel (~20-100 ms per dispatch). BASELINE.md row 4 asks for keyframes/s
PER CHIP — a property of the design, not the transport. The JAX profiler
emits a real TPU device lane through the tunnel (verified: '/device:TPU:0'
with an 'XLA Modules' thread), so this script traces the actual programs
and reports ON-DEVICE time:

  * solver: device ms per LM iteration at K=512 / 2048 / 4096 (PCG cg=32);
  * engine tick: device ms for the fused detection-keyframe program
    (frontend + association + ingestion + full LM solve + sync) at
    640x480, and the implied keyframes/s per chip.

Tunnel memoization (CLAUDE.md) is defeated with wall-clock-derived seeds;
each traced call uses a graph/log never executed before.

Usage: python benchmarks/device_time_bench.py [--json] [--skip-tick]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ns + pid: concurrent/back-to-back runs must not collide on seeds and
# hit the cross-process tunnel memo (CLAUDE.md)
SEED_BASE = (time.time_ns() ^ (os.getpid() << 16)) % 2_000_000_011


# ---------------------------------------------------------------------------
# trace parsing
# ---------------------------------------------------------------------------


def _newest_trace(trace_root: str) -> str:
    files = glob.glob(
        os.path.join(trace_root, "plugins/profile/*/*.trace.json.gz")
    )
    return max(files, key=os.path.getmtime)


def device_module_durations(trace_root: str) -> dict[str, list[float]]:
    """Per XLA module: list of device-lane execution durations (ms)."""
    data = json.load(gzip.open(_newest_trace(trace_root)))
    ev = data.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e["args"].get("name", ""))
    }
    mod_tids = {
        (e["pid"], e["tid"])
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e["args"].get("name") == "XLA Modules"
        and e["pid"] in dev_pids
    }
    out: dict[str, list[float]] = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in mod_tids:
            name = e["name"].split("(")[0]  # strip program id
            out[name].append(e["dur"] / 1e3)
    return dict(out)


def device_op_durations(trace_root: str) -> dict[str, float]:
    """Per fused-kernel (XLA op) total device time (ms) from the op lane —
    the per-kernel breakdown the module lane can't give."""
    data = json.load(gzip.open(_newest_trace(trace_root)))
    ev = data.get("traceEvents", [])
    dev_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e["args"].get("name", ""))
    }
    op_tids = {
        (e["pid"], e["tid"])
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and "XLA Ops" in str(e["args"].get("name", ""))
        and e["pid"] in dev_pids
    }
    out: dict[str, float] = collections.defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            out[e["name"]] += e["dur"] / 1e3
    return dict(out)


class Tracer:
    def __init__(self, root: str):
        self.root = root
        self.n = 0
        self.last_dir = None

    def trace(self, fn):
        import jax

        d = os.path.join(self.root, f"t{self.n}")
        self.n += 1
        self.last_dir = d
        jax.profiler.start_trace(d)
        try:
            fn()
        finally:
            jax.profiler.stop_trace()
        return device_module_durations(d)


# ---------------------------------------------------------------------------
# roofline accounting
# ---------------------------------------------------------------------------

# per-chip peaks (dense MXU bf16 FLOP/s, HBM bytes/s) — public numbers from
# the TPU generations table (jax-ml.github.io/scaling-book). f32 matmul runs
# at ~1/2 the bf16 rate on the MXU; both are reported so the %-peak columns
# bound the answer from both sides.
_CHIP_PEAKS = {
    "v4": (275e12, 1.23e12),
    "v5e": (197e12, 0.82e12),
    "v5 lite": (197e12, 0.82e12),  # device_kind string for v5e chips
    "v5p": (459e12, 2.77e12),
    "v6e": (918e12, 1.64e12),
    "v6 lite": (918e12, 1.64e12),
}


def chip_peaks(device_kind: str):
    dk = device_kind.lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in dk:
            return peaks
    return None, None


def cost_numbers(jitted, *args, **kwargs):
    """XLA cost_analysis (flops, bytes accessed) for a jitted callable at
    the given example args — the numerator of MFU / roofline %s."""
    c = jitted.lower(*args, **kwargs).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def roofline_row(flops, bytes_acc, dev_ms, device_kind):
    """%-of-peak numbers for one program execution."""
    peak_flops_bf16, peak_bw = chip_peaks(device_kind)
    t = dev_ms / 1e3
    row = {
        "gflops": round(flops / 1e9, 2),
        "gbytes": round(bytes_acc / 1e9, 3),
        "arith_intensity": round(flops / max(bytes_acc, 1.0), 1),
        "achieved_tflops": round(flops / t / 1e12, 3),
        "achieved_gbps": round(bytes_acc / t / 1e9, 1),
    }
    if peak_flops_bf16:
        row["pct_peak_bf16"] = round(100 * flops / t / peak_flops_bf16, 2)
        # f32 MXU rate ~ bf16/2: upper bound on compute utilization
        row["pct_peak_f32"] = round(100 * flops / t / (peak_flops_bf16 / 2), 2)
        row["pct_peak_hbm"] = round(100 * bytes_acc / t / peak_bw, 1)
        # which wall the program is against at this shape
        row["bound"] = (
            "hbm" if row["pct_peak_hbm"] >= row["pct_peak_f32"] else "mxu"
        )
    return row


# ---------------------------------------------------------------------------
# solver section
# ---------------------------------------------------------------------------


def solver_device_times(tracer: Tracer):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_graph, _ell_rows_for
    from semantic_slam_tpu.solver import ellk_soa as soa_mod
    from semantic_slam_tpu.solver import pcg as pcg_mod

    ITERS = 8
    results = {}
    for K, L, E2 in ((512, 128, 2048), (2048, 512, 8192), (4096, 1024, 16384)):
        graphs = [
            _build_graph(
                K=K, L=L, E2=E2, dtype=jnp.float32, noise=0.05,
                seed=SEED_BASE + 13 * K + s,
            )
            for s in range(3)
        ]
        ell_rows = _ell_rows_for(K, E2)

        # headline since r4: SoA layout + VMEM-resident Pallas CG
        # (solver/ellk_soa.py; the kernel engages at K >= 1024)
        def solve(g):
            out, stats = soa_mod.lm_optimize_soa(
                g, max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
                ell_rows=ell_rows, cg_tol=0.0,
            )
            return float(out.poses[0, 0])  # force a real fetch

        solve(graphs[0])  # compile + warmup
        t0 = time.perf_counter()
        mods = tracer.trace(lambda: solve(graphs[1]))
        wall_ms = (time.perf_counter() - t0) * 1e3
        durs = mods.get("jit_lm_optimize_soa", [])
        dev_ms = sum(durs)  # one traced execution
        results[f"K{K}"] = {
            "K": K, "edges": K - 1 + E2,
            "device_ms_per_iter": round(dev_ms / ITERS, 4),
            "device_ms_total": round(dev_ms, 3),
            "wall_ms_total": round(wall_ms, 1),
        }
        # per-kernel breakdown of the MAIN trace (before the A/B overwrites
        # tracer.last_dir): top fused ops by device time
        try:
            ops = device_op_durations(tracer.last_dir)
            top = sorted(ops.items(), key=lambda kv: -kv[1])[:10]
            results[f"K{K}"]["top_ops_ms"] = {k: round(v, 3) for k, v in top}
        except Exception:
            pass
        # A/B: the r3 per-pose ELL path the SoA solver replaced
        try:
            def solve_ell(g):
                out, _ = pcg_mod.lm_optimize_pcg(
                    g, max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
                    ell_rows=ell_rows, cg_tol=0.0,
                )
                return float(out.poses[0, 0])

            solve_ell(graphs[0])
            mods_ell = tracer.trace(lambda: solve_ell(graphs[2]))
            ell_ms = sum(mods_ell.get("jit_lm_optimize_pcg", []))
            results[f"K{K}"]["r3_ell_device_ms_per_iter"] = round(
                ell_ms / ITERS, 4
            )
        except Exception as e:  # pragma: no cover
            print(f"[device] ELL A/B skipped: {e}", file=sys.stderr)
        # roofline: XLA's own flop/byte accounting over the traced program
        # vs the chip's peak — names the wall (MXU vs HBM) at each K
        try:
            flops, bytes_acc = cost_numbers(
                soa_mod.lm_optimize_soa, graphs[1],
                max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
                ell_rows=ell_rows, cg_tol=0.0,
            )
            if dev_ms > 0:
                results[f"K{K}"]["roofline"] = roofline_row(
                    flops, bytes_acc, dev_ms, jax.devices()[0].device_kind
                )
        except Exception as e:  # pragma: no cover
            print(f"[device] cost_analysis unavailable: {e}", file=sys.stderr)
        rl = results[f"K{K}"].get("roofline", {})
        print(
            f"[device] solver K={K}: {dev_ms / ITERS:.3f} ms/iter on-device "
            f"({dev_ms:.2f} ms device vs {wall_ms:.0f} ms wall incl. tunnel)"
            + (
                f" | {rl['gflops']} GF, {rl['achieved_tflops']} TF/s, "
                f"{rl.get('pct_peak_f32', '?')}% f32-peak, "
                f"{rl.get('pct_peak_hbm', '?')}% HBM "
                f"-> {rl.get('bound', '?')}-bound"
                if rl
                else ""
            ),
            file=sys.stderr, flush=True,
        )
    return results


# ---------------------------------------------------------------------------
# engine tick section
# ---------------------------------------------------------------------------


def tick_device_times(tracer: Tracer, H=480, W=640):
    """Trace a fresh-engine replay (everything already compiled by a first
    replay) and pull the fused tick programs' device durations."""
    from semantic_slam_tpu.config import (
        AssociationConfig, CapacityConfig, InformationConfig, KeyframeConfig,
        SegmentationConfig, SlamConfig, SolverConfig,
    )
    from semantic_slam_tpu.io import replay as replay_mod
    from semantic_slam_tpu.io import synthetic as synth_mod
    from semantic_slam_tpu.runtime.engine import SlamEngine

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
        solver=SolverConfig(max_iterations=16, dtype="float32"),
        capacity=CapacityConfig(
            max_keyframes=64, max_landmarks=16, max_odom_edges=64,
            max_landmark_edges=256, max_detections_per_frame=4,
        ),
    )

    def run(seed):
        log = synth_mod.make_synthetic_log(
            seed=seed, n_steps=120, sensor_every=6, drift_noise=0.008,
            H=H, W=W, loops=1.0,
        )
        eng = SlamEngine(cfg)
        replay_mod.replay(log, eng)
        return eng

    print("[device] tick: compile/warmup replay ...", file=sys.stderr, flush=True)
    run(SEED_BASE)  # compiles every tick program
    print("[device] tick: traced replay ...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    mods = tracer.trace(lambda: run(SEED_BASE + 1))
    wall_s = time.perf_counter() - t0

    out = {}
    n_kf = 0
    for name, durs in sorted(mods.items()):
        if "tick" not in name and "ingest" not in name and "optimize" not in name:
            continue
        out[name.replace("jit_", "")] = {
            "count": len(durs),
            "device_ms_median": round(sorted(durs)[len(durs) // 2], 3),
            "device_ms_total": round(sum(durs), 2),
        }
        print(
            f"[device] {name}: n={len(durs)} median "
            f"{sorted(durs)[len(durs) // 2]:.2f} ms device",
            file=sys.stderr, flush=True,
        )
        if "tick_fused" in name:
            n_kf += len(durs)
    det = out.get("_tick_fused_detect")
    if det:
        kfps = 1000.0 / det["device_ms_median"]
        out["keyframes_per_s_per_chip_device"] = round(kfps, 1)
        print(
            f"[device] detection tick: {det['device_ms_median']:.2f} ms device "
            f"-> {kfps:.0f} keyframes/s per chip (device time, {W}x{H} clouds, "
            f"full K<=64 re-solve per tick); traced replay wall {wall_s:.1f} s",
            file=sys.stderr, flush=True,
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--skip-tick", action="store_true")
    ap.add_argument("--trace-root", default="/tmp/device_time_bench")
    args = ap.parse_args()

    from semantic_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    tracer = Tracer(args.trace_root)

    results = {"solver": solver_device_times(tracer)}
    if not args.skip_tick:
        results["tick"] = tick_device_times(tracer)

    if args.json:
        print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
