#!/usr/bin/env python
"""Compiled-TPU kernel value check (VERDICT r4 weak #5).

The interpret-mode tests (tests/test_pallas_cg.py) pin the kernels' MATH on
CPU; this script pins the COMPILED kernels on the real chip: the full SoA
LM solve with the Pallas kernels (use_pallas=True — resident linearize +
resident solve + resident chi2) against the XLA SoA path (use_pallas=False)
on the same fixed graphs, values compared.

Run as ONE process (the TPU tunnel serializes a single client — CLAUDE.md);
wired into ci.sh behind a backend==tpu check. Exit 0 on pass.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from semantic_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if jax.default_backend() != "tpu":
        print("[tpu_kernel_check] SKIP: backend is not tpu")
        return 0

    from __graft_entry__ import _build_graph, _ell_rows_for
    from semantic_slam_tpu.solver import ellk_soa as soa_mod

    # Tolerance calibration (measured, r5): the exact MATH parity is pinned
    # on CPU by tests/test_pallas_cg.py (interpret-vs-XLA dmax 8.5e-5 on
    # this very graph family at K=1024). On the chip the two paths use
    # different matmul precision classes (XLA einsums at TPU default
    # precision vs Mosaic f32 dots), and 32 f32 CG steps on a chi2~7e7
    # system amplify that to ~1e-2 relative — with the KERNEL side landing
    # at equal-or-lower chi2. So this check pins: (a) single-step chi2
    # agreement at 5e-3, (b) full-run chi2 agreement at 5e-2 with the
    # kernel not significantly worse — catching real breakage (wrong
    # slots/signs produce orders-of-magnitude garbage), not precision.
    failures = 0
    configs = [
        # (K, L, E2, robust, iters, rel_tol_chi2)
        (1024, 256, 4096, "none", 1, 5e-3),
        (1024, 256, 4096, "none", 8, 5e-2),
        (1024, 256, 4096, "huber", 8, 5e-2),
    ]
    for K, L, E2, robust, iters, tol in configs:
        g = _build_graph(K=K, L=L, E2=E2, dtype=jnp.float32, noise=0.05, seed=7)
        rows = _ell_rows_for(K, E2)
        kw = dict(
            max_iterations=iters, rel_tol=0.0, max_cg_iters=32, ell_rows=rows,
            cg_tol=0.0, robust_kind=robust, robust_delta=1.0,
        )
        ga, sa = soa_mod.lm_optimize_soa(g, use_pallas=False, **kw)
        gb, sb = soa_mod.lm_optimize_soa(g, use_pallas=True, **kw)
        ca, cb = float(sa.chi2_final), float(sb.chi2_final)
        c0 = float(sa.chi2_initial)
        rel = abs(ca - cb) / max(abs(ca), 1e-12)
        ok = (
            np.isfinite(cb)
            and rel < tol
            and cb < c0  # the kernel path actually optimizes
            and cb <= ca * (1.0 + tol)  # and is not significantly worse
        )
        print(
            f"[tpu_kernel_check] K={K} L={L} robust={robust} iters={iters}: "
            f"chi2 {c0:.4g} -> xla={ca:.6g} pallas={cb:.6g} "
            f"rel={rel:.2e} (tol {tol:g}) -> {'OK' if ok else 'FAIL'}"
        )
        if not ok:
            failures += 1

    # fixed-lag prior in-kernel (r5): marginalize a prefix, solve both paths
    from semantic_slam_tpu.solver import fixed_lag as fl

    K, L, E2 = 1024, 256, 4096
    g = _build_graph(K=K, L=L, E2=E2, dtype=jnp.float32, noise=0.05, seed=11)
    g2, prior, _ = fl.marginalize(g, fl.empty_prior(L, dtype=jnp.float32), drop=8)
    rows = _ell_rows_for(K, E2)
    kw = dict(
        max_iterations=8, rel_tol=0.0, max_cg_iters=32, ell_rows=rows,
        cg_tol=0.0, prior=prior,
    )
    ga, sa = soa_mod.lm_optimize_soa(g2, use_pallas=False, **kw)
    gb, sb = soa_mod.lm_optimize_soa(g2, use_pallas=True, **kw)
    ca, cb = float(sa.chi2_final), float(sb.chi2_final)
    c0 = float(sa.chi2_initial)
    rel = abs(ca - cb) / max(abs(ca), 1e-12)
    ok = np.isfinite(cb) and rel < 5e-2 and cb < c0 and cb <= ca * 1.05
    print(
        f"[tpu_kernel_check] K={K} prior(PB={prior.p_idx.shape[0]}): "
        f"chi2 {c0:.4g} -> xla={ca:.6g} pallas={cb:.6g} "
        f"rel={rel:.2e} -> {'OK' if ok else 'FAIL'}"
    )
    if not ok:
        failures += 1

    # tiled kernels + dist host loop (r5): single-chip grid-tiled path and
    # the sharded path through a 1-device mesh, each vs the XLA fallback
    from jax.sharding import Mesh

    from semantic_slam_tpu.solver import soa_dist as sd_mod

    K, L, E2 = 2048, 512, 8192
    g = _build_graph(K=K, L=L, E2=E2, dtype=jnp.float32, noise=0.05, seed=13)
    rows = _ell_rows_for(K, E2)
    kw = dict(
        max_iterations=8, rel_tol=0.0, max_cg_iters=32, ell_rows=rows,
        cg_tol=0.0,
    )
    ga, sa = sd_mod.lm_optimize_soa_tiled(g, use_tiled=False, **kw)
    gb, sb = sd_mod.lm_optimize_soa_tiled(g, use_tiled=True, **kw)
    mesh = Mesh(np.array(jax.devices()[:1]), ("shard",))
    gc, sc = sd_mod.sharded_lm_optimize_soa(g, mesh, use_tiled=True, **kw)
    ca, cb, cc = (
        float(sa.chi2_final), float(sb.chi2_final), float(sc.chi2_final)
    )
    c0 = float(sa.chi2_initial)
    for name, cx in (("tiled", cb), ("sharded-tiled n=1", cc)):
        rel = abs(ca - cx) / max(abs(ca), 1e-12)
        ok = np.isfinite(cx) and rel < 5e-2 and cx < c0 and cx <= ca * 1.05
        print(
            f"[tpu_kernel_check] K={K} {name}: chi2 {c0:.4g} -> "
            f"xla={ca:.6g} kernels={cx:.6g} rel={rel:.2e} -> "
            f"{'OK' if ok else 'FAIL'}"
        )
        if not ok:
            failures += 1

    print(f"[tpu_kernel_check] {'PASS' if failures == 0 else 'FAIL'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
