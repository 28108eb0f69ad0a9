#!/usr/bin/env python
"""Headline benchmark: full-pose-graph solve time per LM iteration.

Prints ONE JSON line:
  {"metric": "graph_solve_ms_per_iter", "value": <ms>, "unit": "ms",
   "vs_baseline": <cpu_ms / tpu_ms>,
   "device_ms_per_iter": <profiler device-lane ms>,   # transport-free
   "vs_baseline_device": <cpu_ms / device_ms>}

The reference's dominant cost is g2o's full-batch LM re-optimization every
tick (graph_slam.cpp:182-219, CPU sparse CHOLMOD). Since g2o itself is not
available here, the baseline is an in-process CPU stand-in doing what g2o's
lm_var does per iteration: assemble the sparse normal equations and run a
sparse direct factorization + solve (scipy splu, double precision). The
baseline is *favored*: its per-iteration cost omits relinearization (Jacobian
blocks are precomputed once), while the TPU path relinearizes every
iteration.

Representative graph: 510 keyframes, 126 landmarks, ~2.5k edges — a long
lab session at full keyframe density (BASELINE.md "graph-solve ms/iter").
"""

import json
import os
import sys
import time

import numpy as np

K, L, E2 = 512, 128, 2048
ITERS = 16
# the tunnel's execution speed swings run to run (CLAUDE.md); min over 3
# distinct-graph repeats samples it more reliably than 2 at ~seconds cost
REPEATS = 3


def tpu_ms_per_iter():
    import jax
    import jax.numpy as jnp

    from semantic_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _build_graph
    from semantic_slam_tpu.solver import lm as lm_mod
    from semantic_slam_tpu.solver import pcg as pcg_mod

    # a DISTINCT graph per timed call: the remote TPU execution service
    # memoizes repeated (program, args) calls, which would fake a near-zero
    # time; only wholly different inputs give honest numbers. Seeds derive
    # from the wall clock because the memo persists ACROSS PROCESSES
    # (CLAUDE.md) — fixed seeds an earlier bench already ran return
    # instantly.
    # ns resolution + pid so two runs started in the same second (or
    # concurrent runs) can't collide on seeds and hit the memo
    seed_base = (time.time_ns() ^ (os.getpid() << 16)) % 2_000_000_011
    graphs = [
        _build_graph(
            K=K, L=L, E2=E2, dtype=jnp.float32, noise=0.05, seed=seed_base + s
        )
        for s in range(REPEATS + 1)
    ]

    def measure(name, f):
        out, stats = f(graphs[0])
        jax.block_until_ready(out.poses)  # compile + warmup
        iters = int(stats.iterations)
        assert iters == ITERS, f"{name}: expected {ITERS} LM iterations, got {iters}"
        times = []
        for g in graphs[1:]:
            t0 = time.perf_counter()
            out, stats = f(g)
            # block_until_ready alone has been observed to return WITHOUT a
            # real round trip through the tunnel (sub-ms "solves"); a scalar
            # fetch of the result is the only trustworthy barrier, and costs
            # nothing extra when block was real (measured)
            _ = float(out.poses[0, 0])
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3 / ITERS
        # sanity floor: a full K=512 solve is >= several ms of device time
        # (benchmarks/device_time_bench.py: 1.3 ms/iter on-device); anything
        # far below that means the timing barrier failed — refuse to report
        assert ms > 0.5, f"{name}: implausible {ms:.3f} ms/iter (broken barrier?)"
        print(
            f"[bench] {name}: {ms:.2f} ms/iter "
            f"(chi2 {float(stats.chi2_initial):.1f} -> {float(stats.chi2_final):.3g}) "
            f"on {jax.devices()[0].device_kind}",
            file=sys.stderr,
        )
        return ms

    # rel_tol=0 disables early convergence so exactly ITERS iterations run.
    # Two kernels: matrix-free block-Jacobi PCG (cg=64, converges to the same
    # chi2 as dense on this graph family) and dense Schur Cholesky; PCG is
    # measured first (it is usually the headline), and the dense pass is
    # skipped if the TPU tunnel is in a slow mode so one kernel's number
    # always lands within the driver's time budget.
    # cg=32 converges to the same chi2 as cg=64/dense on this graph family
    # (measured: 556 vs 558/587 from 1.3e8) at ~27% less wall clock. The
    # tridiag PCR preconditioner halves CG iterations but its log2(K) apply
    # levels cost more than they save single-chip — it is the multi-chip
    # option (fewer CG steps = fewer psum round trips), not the 1-chip one.
    # The ELL assembly (O(K*R) slot gathers instead of O(E*K) one-hot
    # matmuls — solver/assembly.py) is the recommended TPU path and the
    # headline; the one-hot variant stays as an in-run A/B reference.
    from __graft_entry__ import _ell_rows_for
    from semantic_slam_tpu.solver import ellk_soa as soa_mod

    ell_rows = _ell_rows_for(K, E2)
    t_start = time.perf_counter()
    # r4 headline: SoA layout + VMEM-resident Pallas CG (solver/ellk_soa.py
    # + solver/pallas_cg.py) — measured 2.3-2.5x the r3 per-pose layout at
    # fixed work on K=2048/4096
    soa = measure(
        "soa_pallas",
        lambda g: soa_mod.lm_optimize_soa(
            g, max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
            ell_rows=ell_rows, cg_tol=0.0,
        ),
    )
    best = soa
    pcg32 = measure(
        "pcg32_ell",
        lambda g: pcg_mod.lm_optimize_pcg(
            g, max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
            ell_rows=ell_rows, cg_tol=0.0,
        ),
    )
    best = min(best, pcg32)
    if time.perf_counter() - t_start < 300.0:
        pcg = measure(
            "pcg32_onehot",
            lambda g: pcg_mod.lm_optimize_pcg(
                g, max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
                cg_tol=0.0,
            ),
        )
        best = min(best, pcg)
    if time.perf_counter() - t_start < 240.0:
        try:
            dense = measure(
                "dense",
                lambda g: lm_mod.lm_optimize(g, max_iterations=ITERS, rel_tol=0.0),
            )
            best = min(best, dense)
        except Exception as e:  # pragma: no cover - environment flake
            print(f"[bench] dense pass skipped: {e}", file=sys.stderr)
    else:
        print("[bench] dense pass skipped (slow tunnel)", file=sys.stderr)

    # profiler-derived DEVICE time for the headline kernel: wall time through
    # the tunnel swings run to run (r01 vs r02: 227x vs 372x purely from
    # transport variance) — the device lane is the round-over-round-stable
    # number. One traced execution on a never-before-seen graph.
    device = None
    try:
        from benchmarks.device_time_bench import Tracer

        g_t = _build_graph(
            K=K, L=L, E2=E2, dtype=jnp.float32, noise=0.05,
            seed=(seed_base + 7919) % 2_000_000_011,
        )

        # the device lane traces the path the PRODUCT uses at this size:
        # below K=1024 the engine dispatch keeps the per-pose ELL path
        # (the Pallas kernels engage from K>=1024 — see
        # engine._soa_dispatch / pallas_cg.fits)
        def traced():
            out, _ = pcg_mod.lm_optimize_pcg(
                g_t, max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
                ell_rows=ell_rows, cg_tol=0.0,
            )
            _ = float(out.poses[0, 0])

        tracer = Tracer("/tmp/bench_trace")
        mods = tracer.trace(traced)
        durs = mods.get("jit_lm_optimize_pcg", [])
        if durs:
            device = sum(durs) / ITERS
            print(
                f"[bench] pcg32_ell device lane: {device:.3f} ms/iter",
                file=sys.stderr,
            )
    except Exception as e:  # pragma: no cover - profiler flake
        print(f"[bench] device-lane pass skipped: {e}", file=sys.stderr)

    # large-K row (VERDICT r3 item 5): the path rounds 3+ actually optimize
    # is the K=4096 fixed-work solve — the K=512 headline cannot see it
    # (ELL ~ one-hot there). One traced execution, fresh seed, same
    # fixed-work protocol (cg_tol=0: exactly 32 CG steps per iteration).
    device_k4096 = None
    try:
        K4, L4, E4 = 4096, 1024, 16384
        g_4 = _build_graph(
            K=K4, L=L4, E2=E4, dtype=jnp.float32, noise=0.05,
            seed=(seed_base + 104729) % 2_000_000_011,
        )
        rows4 = _ell_rows_for(K4, E4)

        def traced4():
            out, _ = soa_mod.lm_optimize_soa(
                g_4, max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
                ell_rows=rows4, cg_tol=0.0,
            )
            _ = float(out.poses[0, 0])

        traced4()  # compile + warmup (compilation cache makes this cheap)
        mods4 = Tracer("/tmp/bench_trace_k4096").trace(traced4)
        durs4 = mods4.get("jit_lm_optimize_soa", [])
        if durs4:
            device_k4096 = sum(durs4) / ITERS
            print(
                f"[bench] soa_pallas K=4096 device lane: "
                f"{device_k4096:.3f} ms/iter",
                file=sys.stderr,
            )
    except Exception as e:  # pragma: no cover - profiler flake
        print(f"[bench] K=4096 device-lane pass skipped: {e}", file=sys.stderr)

    # K=8192 row (r5): past the resident kernels' Mosaic envelope — the
    # grid-tiled kernel path (solver/pallas_tiled.py + soa_dist.py), the
    # product dispatch from K > 4096. Same fixed-work protocol.
    device_k8192 = None
    if time.perf_counter() - t_start < 480.0:
        try:
            from semantic_slam_tpu.solver import soa_dist as sd_mod

            K8, L8, E8 = 8192, 2048, 32768
            g_8 = _build_graph(
                K=K8, L=L8, E2=E8, dtype=jnp.float32, noise=0.05,
                seed=(seed_base + 1299709) % 2_000_000_011,
            )
            rows8 = _ell_rows_for(K8, E8)

            def traced8():
                out, _ = sd_mod.lm_optimize_soa_tiled(
                    g_8, max_iterations=ITERS, rel_tol=0.0, max_cg_iters=32,
                    ell_rows=rows8, cg_tol=0.0,
                )
                _ = float(out.poses[0, 0])

            traced8()  # compile + warmup
            mods8 = Tracer("/tmp/bench_trace_k8192").trace(traced8)
            durs8 = mods8.get("jit_lm_optimize_soa_tiled", [])
            if durs8:
                device_k8192 = sum(durs8) / ITERS
                print(
                    f"[bench] tiled K=8192 device lane: "
                    f"{device_k8192:.3f} ms/iter",
                    file=sys.stderr,
                )
        except Exception as e:  # pragma: no cover - profiler flake
            print(f"[bench] K=8192 pass skipped: {e}", file=sys.stderr)
    else:
        print("[bench] K=8192 pass skipped (slow tunnel)", file=sys.stderr)
    return best, device, device_k4096, device_k8192


def cpu_baseline_ms_per_iter():
    """g2o-style per-iteration cost: sparse assembly + direct factorization.

    Jacobian block values are precomputed (generous to the baseline); the
    timed loop does what CHOLMOD-backed lm_var does per iteration: build the
    sparse H, factorize, solve, apply the update."""
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    import jax

    # build the same graph on CPU and extract one linearization
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        import jax.numpy as jnp

        from __graft_entry__ import _build_graph
        from semantic_slam_tpu.solver import lm as lm_mod

        g = _build_graph(K=K, L=L, E2=E2, dtype=jnp.float64, noise=0.05)
        lin = lm_mod.linearize(g)
        Hpp = np.asarray(lin.Hpp)
        W = np.asarray(lin.W)
        Hll = np.asarray(lin.Hll)
        gp = np.asarray(lin.gp)
        gl = np.asarray(lin.gl)

    n_p, n_l = Hpp.shape[0], 3 * Hll.shape[0]
    lam = 1e-4

    def one_iteration():
        # sparse assembly of the full normal equations (block CSR)
        rows, cols, vals = [], [], []
        nz = np.nonzero(np.abs(Hpp) > 0)
        rows.append(nz[0])
        cols.append(nz[1])
        vals.append(Hpp[nz])
        nzw = np.nonzero(np.abs(W) > 0)
        rows.append(nzw[0])
        cols.append(nzw[1] + n_p)
        vals.append(W[nzw])
        rows.append(nzw[1] + n_p)
        cols.append(nzw[0])
        vals.append(W[nzw])
        for l in range(Hll.shape[0]):
            r = np.repeat(np.arange(3), 3) + n_p + 3 * l
            c = np.tile(np.arange(3), 3) + n_p + 3 * l
            rows.append(r)
            cols.append(c)
            vals.append(Hll[l].ravel())
        n = n_p + n_l
        H = sp.csc_matrix(
            (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
            shape=(n, n),
        )
        H = H + lam * sp.identity(n, format="csc")
        b = -np.concatenate([gp, gl])
        lu = spla.splu(H)
        dx = lu.solve(b)
        return dx

    one_iteration()  # warmup
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            one_iteration()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"[bench] cpu baseline: {best*1e3:.1f} ms for {ITERS} iters", file=sys.stderr)
    return best * 1e3 / ITERS


def main():
    tpu, device, device_k4096, device_k8192 = tpu_ms_per_iter()
    cpu = cpu_baseline_ms_per_iter()
    out = {
        "metric": "graph_solve_ms_per_iter",
        "value": round(tpu, 4),
        "unit": "ms",
        "vs_baseline": round(cpu / tpu, 3),
    }
    if device is not None:
        # transport-independent companion numbers (BENCH_r03+): device lane
        # ms/iter and the CPU-baseline multiple computed against it
        out["device_ms_per_iter"] = round(device, 4)
        out["vs_baseline_device"] = round(cpu / device, 3)
    if device_k4096 is not None:
        # fixed-work large-K row (BENCH_r04+): the size where the per-pose
        # ELL layout and kernel work of rounds 3+ actually shows — makes
        # round-over-round progress (and regressions) on the optimized
        # path visible to the driver
        out["device_ms_per_iter_k4096"] = round(device_k4096, 4)
    if device_k8192 is not None:
        # r5 row: the tiled-kernel path past the resident envelope
        out["device_ms_per_iter_k8192"] = round(device_k8192, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
