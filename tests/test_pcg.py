"""Matrix-free PCG solver tests: matvec/solve vs the dense Schur path,
LM convergence parity, sharded == single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.solver import lm as lm_mod
from semantic_slam_tpu.solver import pcg as pcg_mod
from tests.test_solver import build_chain_graph

IDENT = lambda x: x  # noqa: E731


class TestMatvec:
    def test_matches_dense_operator(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        lam = jnp.asarray(1e-3, jnp.float64)
        pose_free, lm_free = lm_mod._free_masks(g)
        lin = lm_mod.linearize(g)
        eb = pcg_mod.build_edge_blocks(g.poses, g.landmarks, *pcg_mod._edge_args(g), IDENT)

        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        pm = np.repeat(np.asarray(pose_free), 6).astype(float)
        lmm = np.asarray(lm_free).astype(float)

        # dense damped reduced operator
        eye3 = np.eye(3)
        A = np.asarray(lin.Hll) + float(lam) * eye3[None]
        A = A * lmm[:, None, None] + eye3[None] * (1 - lmm)[:, None, None]
        Ainv_np = np.linalg.inv(A)
        W = np.asarray(lin.W) * pm[:, None]
        W = (W.reshape(6 * K, L, 3) * lmm[None, :, None]).reshape(6 * K, 3 * L)
        WA = np.einsum("kld,lde->kle", W.reshape(6 * K, L, 3), Ainv_np).reshape(6 * K, 3 * L)
        Hred = np.asarray(lin.Hpp) + float(lam) * np.eye(6 * K) - WA @ W.T
        Hred = Hred * (pm[:, None] * pm[None, :])

        x = rng.normal(size=(K, 6)) * np.asarray(pose_free)[:, None]
        Ainv = lm_mod.inv33(jnp.asarray(A))
        got = np.asarray(
            pcg_mod.reduced_matvec(
                eb, Ainv, lam, pose_free.astype(jnp.float64), jnp.asarray(x), IDENT
            )
        )
        want = (Hred @ x.reshape(-1)).reshape(K, 6)
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_pcg_matches_dense_solve(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        lam = jnp.asarray(1e-3, jnp.float64)
        pose_free, lm_free = lm_mod._free_masks(g)
        lin = lm_mod.linearize(g)
        dp_dense, dl_dense = lm_mod.schur_solve(lin, pose_free, lm_free, lam)

        eb = pcg_mod.build_edge_blocks(g.poses, g.landmarks, *pcg_mod._edge_args(g), IDENT)
        eye3 = jnp.eye(3, dtype=jnp.float64)
        lmf = lm_free.astype(jnp.float64)
        A = eb.Hll + lam * eye3[None]
        A = A * lmf[:, None, None] + eye3[None] * (1 - lmf)[:, None, None]
        Ainv = lm_mod.inv33(A)
        gl = eb.gl * lmf[:, None]
        y = jnp.einsum("lij,lj->li", Ainv, gl)
        c = jnp.zeros_like(eb.gp).at[eb.lk].add(
            jnp.einsum("eij,ej->ei", eb.W_kl, y[eb.ll])
        )
        pf = pose_free.astype(jnp.float64)
        b = -(eb.gp - c) * pf[:, None]
        dp = pcg_mod.pcg_solve(eb, Ainv, lam, pose_free, b, IDENT, max_cg_iters=512, tol=1e-24)
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dp_dense), atol=1e-6)


class TestLMParity:
    def test_converges_like_dense(self, rng):
        g, gt_poses, _ = build_chain_graph(rng, noise=0.05)
        g_dense, s_dense = lm_mod.lm_optimize(g)
        g_pcg, s_pcg = pcg_mod.lm_optimize_pcg(g, max_cg_iters=256)
        assert float(s_pcg.chi2_final) < float(s_pcg.chi2_initial) * 0.5
        # both land in the same basin
        np.testing.assert_allclose(
            float(s_pcg.chi2_final), float(s_dense.chi2_final), rtol=0.05, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(g_pcg.poses[:6, :3]), np.asarray(g_dense.poses[:6, :3]), atol=1e-3
        )

    def test_min_edges_gate(self, rng):
        import jax.numpy as jnp

        from semantic_slam_tpu.core import geometry as geo
        from semantic_slam_tpu.graph import state as gs

        g = gs.make_graph(8, 4, 8, 8, dtype=jnp.float64)
        g, _ = gs.add_se3_node(g, geo.pose_identity(jnp.float64))
        g2, stats = pcg_mod.lm_optimize_pcg(g)
        assert int(stats.iterations) == 0


class TestSharded:
    def test_sharded_matches_single(self, rng):
        from semantic_slam_tpu.parallel.sharded import make_mesh, shard_graph_edges

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g1, s1 = pcg_mod.lm_optimize_pcg(g, max_cg_iters=256)
        mesh = make_mesh(4)
        gs_ = shard_graph_edges(g, mesh)
        g2, s2 = pcg_mod.sharded_lm_optimize_pcg(gs_, mesh, max_cg_iters=256)
        np.testing.assert_allclose(np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-7)
        np.testing.assert_allclose(
            float(s2.chi2_final), float(s1.chi2_final), rtol=1e-6, atol=1e-9
        )


class TestMatmulAssembly:
    """One-hot matmul assembly (solver/assembly.py) must match the scatter
    path exactly (up to summation order). On TPU it is the default — TPU
    scatters serialize per index and dominated the CG step before."""

    def test_pcg_matmul_matches_scatter(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        ga, sa = pcg_mod.lm_optimize_pcg(g, max_iterations=25, assembly="scatter")
        gb, sb = pcg_mod.lm_optimize_pcg(g, max_iterations=25, assembly="matmul")
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-9
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-9
        )

    def test_sharded_matmul_matches_scatter(self, rng):
        from semantic_slam_tpu.parallel.sharded import make_mesh, shard_graph_edges

        g, _, _ = build_chain_graph(rng, noise=0.05)
        mesh = make_mesh(4)
        gs_ = shard_graph_edges(g, mesh)
        ga, sa = pcg_mod.sharded_lm_optimize_pcg(gs_, mesh, assembly="scatter")
        gb, sb = pcg_mod.sharded_lm_optimize_pcg(gs_, mesh, assembly="matmul")
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-9
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-9
        )

    def test_dense_linearize_matmul_matches_scatter(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        args = (g.poses, g.landmarks, *lm_mod._edge_args(g))
        a = lm_mod.linearize_arrays(*args, assembly="scatter")
        b = lm_mod.linearize_arrays(*args, assembly="matmul")
        np.testing.assert_allclose(np.asarray(b.Hpp), np.asarray(a.Hpp), atol=1e-10)
        np.testing.assert_allclose(np.asarray(b.W), np.asarray(a.W), atol=1e-10)
        np.testing.assert_allclose(np.asarray(b.Hll), np.asarray(a.Hll), atol=1e-10)
        np.testing.assert_allclose(np.asarray(b.gp), np.asarray(a.gp), atol=1e-10)
        np.testing.assert_allclose(np.asarray(b.gl), np.asarray(a.gl), atol=1e-10)

    def test_planes_prior_matmul_matches_scatter(self, rng):
        from semantic_slam_tpu.graph import planes as planes_ext
        from semantic_slam_tpu.solver import fixed_lag as fl
        from semantic_slam_tpu.solver.plane_ba import observe_plane

        g, _, _ = build_chain_graph(rng, noise=0.05)
        pn = planes_ext.make_planes(4, 32, dtype=jnp.float64)
        pw = jnp.asarray([0.0, 0.0, 1.0, -1.2], jnp.float64)
        pn, pid = planes_ext.add_plane_node(pn, pw)
        info3 = jnp.eye(3, dtype=jnp.float64) * 25.0
        for k in range(0, min(12, int(g.num_poses)), 2):
            pn = planes_ext.add_se3_plane_edge(
                pn, k, pid, observe_plane(g.poses[k], pw), info3
            )
        L = g.landmarks.shape[0]
        g2, pn2, prior, _ = fl.marginalize_planes(
            g, pn, fl.empty_prior(L, Pl=4, dtype=jnp.float64), drop=4
        )
        ga, pa, sa = pcg_mod.lm_optimize_pcg_planes(
            g2, pn2, max_iterations=20, prior=prior, assembly="scatter"
        )
        gb, pb, sb = pcg_mod.lm_optimize_pcg_planes(
            g2, pn2, max_iterations=20, prior=prior, assembly="matmul"
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(pb.planes), np.asarray(pa.planes), atol=1e-9
        )

    def test_cross_block_mm_chunked_matches_single(self, rng):
        """E-axis chunking of the one-hot cross matmul (bounded transient)
        must be exact vs the single-shot path."""
        from semantic_slam_tpu.solver import assembly as asm

        E, n_r, n_c = 1000, 17, 13
        idx_r = jnp.asarray(rng.integers(0, n_r, E), jnp.int32)
        idx_c = jnp.asarray(rng.integers(0, n_c, E), jnp.int32)
        B = jnp.asarray(rng.normal(size=(E, 6, 3)))
        full = asm.cross_block_mm(idx_r, idx_c, B, n_r, n_c)
        chunked = asm.cross_block_mm(
            idx_r, idx_c, B, n_r, n_c, max_elems=128 * 6 * n_c * 3
        )
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(full), atol=1e-12
        )


def _walk_jaxpr(jaxpr, out_eqns):
    """Collect every equation in a (closed) jaxpr, recursing into sub-jaxprs
    (pjit/while/cond/scan/shard_map bodies)."""
    for eqn in jaxpr.eqns:
        out_eqns.append(eqn)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                _walk_jaxpr(v.jaxpr, out_eqns)
            elif hasattr(v, "eqns"):  # Jaxpr
                _walk_jaxpr(v, out_eqns)
            elif isinstance(v, (list, tuple)):
                for vv in v:
                    if hasattr(vv, "jaxpr"):
                        _walk_jaxpr(vv.jaxpr, out_eqns)
                    elif hasattr(vv, "eqns"):
                        _walk_jaxpr(vv, out_eqns)
    return out_eqns


class TestMarginalsMF:
    """Matrix-free marginal recovery (landmark_marginals_mf): the pose-chain
    elimination must match the dense Schur recovery exactly, with no
    [6K,6K] intermediate anywhere in the program (VERDICT r2 item 1)."""

    def test_matches_dense(self, rng):
        g, _, _ = build_chain_graph(rng, n_poses=10, n_lms=6, noise=0.05)
        md = np.asarray(lm_mod.landmark_marginals(g))
        pf, lf = lm_mod._free_masks(g)
        eb = pcg_mod.build_edge_blocks(
            g.poses, g.landmarks, *pcg_mod._edge_args(g), IDENT
        )
        mt = np.asarray(pcg_mod.landmark_marginals_mf(eb, pf, lf))
        L = int(g.num_landmarks)
        np.testing.assert_allclose(mt[:L], md[:L], rtol=1e-6, atol=1e-9)
        # inactive slots stay identity
        np.testing.assert_allclose(
            mt[L:], np.broadcast_to(np.eye(3), mt[L:].shape), atol=1e-12
        )

    def test_optimize_with_marginals_dense_reuse(self, rng):
        """lm_optimize(with_marginals=True) must equal the standalone
        recovery at the optimized estimate (same final linearization)."""
        g, _, _ = build_chain_graph(rng, noise=0.05)
        g2, _, marg = lm_mod.lm_optimize(g, with_marginals=True)
        md = np.asarray(lm_mod.landmark_marginals(g2))
        np.testing.assert_allclose(np.asarray(marg), md, rtol=1e-6, atol=1e-10)

    def test_optimize_pcg_with_marginals(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        g2, _, marg = pcg_mod.lm_optimize_pcg(
            g, max_cg_iters=256, with_marginals=True
        )
        md = np.asarray(lm_mod.landmark_marginals(g2))
        L = int(g.num_landmarks)
        np.testing.assert_allclose(
            np.asarray(marg)[:L], md[:L], rtol=1e-5, atol=1e-8
        )

    def test_prior_woodbury(self, rng):
        """Dense multi-pose boundary prior (off-diagonal Hp coupling) must
        fold exactly via the PB-sized Woodbury correction."""
        from semantic_slam_tpu.solver import fixed_lag as fl

        g, _, _ = build_chain_graph(rng, n_poses=12, n_lms=6, noise=0.05)
        L = g.landmarks.shape[0]
        PB = 4
        Hp = np.zeros((6 * PB, 6 * PB))
        Araw = rng.normal(size=(18, 18))
        Hp[:18, :18] = Araw @ Araw.T * 0.5 + 5 * np.eye(18)
        prior = fl.empty_prior(L, PB=PB, dtype=jnp.float64)._replace(
            p_idx=jnp.asarray([1, 2, 3, 0], jnp.int32),
            p_ref=g.poses[jnp.asarray([1, 2, 3, 0])],
            num_p=jnp.asarray(3, jnp.int32),
            Hp=jnp.asarray(Hp),
        )
        md = np.asarray(fl.landmark_marginals_prior(g, prior))
        pf, lf = lm_mod._free_masks(g)
        eb = pcg_mod.build_edge_blocks(
            g.poses, g.landmarks, *pcg_mod._edge_args(g), IDENT
        )
        eb = pcg_mod.apply_prior_blocks(eb, prior, g.poses, g.landmarks)
        mt = np.asarray(pcg_mod.landmark_marginals_mf(eb, pf, lf, prior=prior))
        La = int(g.num_landmarks)
        np.testing.assert_allclose(mt[:La], md[:La], rtol=1e-6, atol=1e-9)

    def test_sharded_with_marginals_matches_single(self, rng):
        from semantic_slam_tpu.parallel.sharded import make_mesh, shard_graph_edges

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g1, _, m1 = pcg_mod.lm_optimize_pcg(
            g, max_cg_iters=256, with_marginals=True
        )
        mesh = make_mesh(4)
        gs_ = shard_graph_edges(g, mesh)
        g2, _, m2 = pcg_mod.sharded_lm_optimize_pcg(
            gs_, mesh, max_cg_iters=256, with_marginals=True
        )
        np.testing.assert_allclose(
            np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-7
        )
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-4, atol=1e-7)

    def test_no_dense_pose_factor_in_pcg_tick(self, rng):
        """VERDICT r2 done-criterion: no [6K,6K] array anywhere in a
        maha+pcg optimize+marginals program."""
        g, _, _ = build_chain_graph(rng, noise=0.05)
        K6 = 6 * g.poses.shape[0]

        def run(g):
            return pcg_mod.lm_optimize_pcg(g, with_marginals=True)

        jaxpr = jax.make_jaxpr(run)(g)
        eqns = _walk_jaxpr(jaxpr.jaxpr, [])
        bad = []
        for eqn in eqns:
            for v in list(eqn.outvars) + list(eqn.invars):
                shape = getattr(getattr(v, "aval", None), "shape", ())
                if len(shape) >= 2 and shape[-1] == K6 and shape[-2] == K6:
                    bad.append((eqn.primitive.name, shape))
        assert not bad, f"dense [6K,6K] intermediates found: {bad}"

    def test_collective_sizes_pcg_sharded(self, rng):
        """docs/SCALING.md byte-accounting pin (VERDICT r2 item 6): every
        psum in the sharded PCG solve moves O(K + L) data — reintroducing an
        O(K^2) collective must fail this test."""
        from semantic_slam_tpu.parallel.sharded import make_mesh, shard_graph_edges

        g, _, _ = build_chain_graph(rng, noise=0.05)
        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        mesh = make_mesh(4)
        gs_ = shard_graph_edges(g, mesh)

        def run(g):
            return pcg_mod.sharded_lm_optimize_pcg(g, mesh, max_cg_iters=64)

        jaxpr = jax.make_jaxpr(run)(gs_)
        eqns = _walk_jaxpr(jaxpr.jaxpr, [])
        psums = [e for e in eqns if "psum" in e.primitive.name]
        assert psums, "no psum collectives found in the sharded program"
        # allowed per-psum payloads: [K,6] pose vecs, [L,3] landmark vecs,
        # [K,6,6] diag blocks (once per linearize), [L,3,3] Hll, scalars
        limit = max(K * 36, L * 9)
        for e in psums:
            for v in e.invars:
                sz = int(np.prod(getattr(v.aval, "shape", ()) or (1,)))
                assert sz <= limit, (
                    f"psum payload {v.aval.shape} ({sz} elems) exceeds the "
                    f"O(K+L) budget {limit} — an O(K^2) collective crept in"
                )

    def test_collective_sizes_pose_row_ell(self, rng):
        """Same O(K+L) pin for the pose-row-sharded per-pose ELL path."""
        from semantic_slam_tpu.parallel.sharded import make_mesh

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        K = g.poses.shape[0]
        L = g.landmarks.shape[0]
        mesh = make_mesh(4)

        def run(g):
            return pcg_mod.sharded_lm_optimize_pcg(
                g, mesh, max_cg_iters=64, assembly="ell", ell_rows=ell_rows
            )

        jaxpr = jax.make_jaxpr(run)(g)
        eqns = _walk_jaxpr(jaxpr.jaxpr, [])
        psums = [e for e in eqns if "psum" in e.primitive.name]
        assert psums, "no psum collectives found in the sharded ELL program"
        limit = max(K * 36, L * 9)
        for e in psums:
            for v in e.invars:
                sz = int(np.prod(getattr(v.aval, "shape", ()) or (1,)))
                assert sz <= limit, (
                    f"psum payload {v.aval.shape} ({sz} elems) exceeds the "
                    f"O(K+L) budget {limit}"
                )


def _sort_obs_edges(g):
    """Reorder a graph's observation edges into the engine's construction
    order (sorted by keyframe, real edges first) and return the matching
    static ``ell_rows`` bounds — the assembly.build_slots contract."""
    lk = np.asarray(g.lme_k)
    n = int(np.asarray(g.num_lme))
    order = np.concatenate(
        [np.argsort(lk[:n], kind="stable"), np.arange(n, lk.shape[0])]
    )
    g = g._replace(
        lme_k=jnp.asarray(lk[order]),
        lme_l=g.lme_l[order],
        lme_meas=g.lme_meas[order],
        lme_info=g.lme_info[order],
    )
    r = int(np.bincount(lk[:n]).max()) if n else 1
    return g, (1, 1, r)


class TestEllAssembly:
    """ELL slot-gather assembly (assembly.build_slots / EllLayout): O(K*R)
    segment sums for the engine's sorted, per-pose-bounded edge layout —
    must match the scatter path up to summation order, with no O(E*K)
    one-hot intermediate anywhere in the program."""

    def test_build_slots_matches_numpy(self, rng):
        from semantic_slam_tpu.solver.assembly import build_slots, slot_sum

        for _ in range(5):
            n, e_real, r = 13, 29, 5
            idx = np.sort(rng.integers(0, n, size=e_real))
            # force per-row counts <= r by dropping overflow onto row n-1
            counts = np.bincount(idx, minlength=n)
            while counts.max() > r:
                hot = int(np.argmax(counts))
                pos = np.where(idx == hot)[0][-1]
                idx = np.delete(idx, pos)
                idx = np.sort(np.append(idx, n - 1)) if counts[n - 1] < r else np.sort(np.delete(idx, 0))
                counts = np.bincount(idx, minlength=n)
            e_real = len(idx)
            pad = 7
            idx_full = np.concatenate([idx, np.zeros(pad, np.int64)])
            mask = np.arange(e_real + pad) < e_real
            vals = rng.normal(size=(e_real + pad, 3))
            slots = build_slots(
                jnp.asarray(idx_full, jnp.int32), jnp.asarray(mask), n, r
            )
            got = np.asarray(slot_sum(jnp.asarray(vals), slots))
            want = np.zeros((n, 3))
            np.add.at(want, idx, vals[:e_real])
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_count_uncovered_guard(self, rng):
        """assembly.count_uncovered: 0 for contract-satisfying graphs (the
        engine invariant), loud nonzero for violations — so a future edge
        type that breaks the sorted/bounded contract fails in tests instead
        of being silently dropped from TPU solves (ADVICE r3 #3)."""
        from semantic_slam_tpu.solver.assembly import count_uncovered

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        K = g.poses.shape[0]
        # engine-layout edges: fully covered
        assert int(count_uncovered(g.lme_k, g.lme_mask(), K, ell_rows[2])) == 0
        assert int(count_uncovered(g.odom_i, g.odom_mask(), K, 1)) == 0
        # bound violation: r too small for the per-pose count
        if ell_rows[2] > 1:
            dropped = int(
                count_uncovered(g.lme_k, g.lme_mask(), K, ell_rows[2] - 1)
            )
            assert dropped > 0
        # unsorted prefix: reversing the masked indices breaks the contract
        n = int(g.num_lme)
        rev = g.lme_k.at[:n].set(g.lme_k[:n][::-1])
        assert int(count_uncovered(rev, g.lme_mask(), K, ell_rows[2])) > 0

    def test_pcg_ell_matches_scatter(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        ga, sa = pcg_mod.lm_optimize_pcg(g, max_iterations=25, assembly="scatter")
        gb, sb = pcg_mod.lm_optimize_pcg(
            g, max_iterations=25, assembly="ell", ell_rows=ell_rows
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-9
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-9
        )

    def test_ell_without_rows_degrades_gracefully(self, rng):
        """assembly='ell' with no ell_rows must fall back to a correct path
        (resolve_assembly contract), not produce garbage."""
        g, _, _ = build_chain_graph(rng, noise=0.05)
        ga, sa = pcg_mod.lm_optimize_pcg(g, max_iterations=10, assembly="scatter")
        gb, sb = pcg_mod.lm_optimize_pcg(g, max_iterations=10, assembly="ell")
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-9
        )

    def test_sharded_ell_matches_scatter(self, rng):
        from semantic_slam_tpu.parallel.sharded import make_mesh, shard_graph_edges

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        mesh = make_mesh(4)
        gs_ = shard_graph_edges(g, mesh)
        ga, sa = pcg_mod.sharded_lm_optimize_pcg(gs_, mesh, assembly="scatter")
        gb, sb = pcg_mod.sharded_lm_optimize_pcg(
            gs_, mesh, assembly="ell", ell_rows=ell_rows
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-9
        )
        np.testing.assert_allclose(
            float(sb.chi2_final), float(sa.chi2_final), rtol=1e-9
        )

    def test_planes_prior_ell_matches_scatter(self, rng):
        from semantic_slam_tpu.graph import planes as planes_ext
        from semantic_slam_tpu.solver import fixed_lag as fl
        from semantic_slam_tpu.solver.plane_ba import observe_plane

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        pn = planes_ext.make_planes(4, 32, dtype=jnp.float64)
        pw = jnp.asarray([0.0, 0.0, 1.0, -1.2], jnp.float64)
        pn, pid = planes_ext.add_plane_node(pn, pw)
        info3 = jnp.eye(3, dtype=jnp.float64) * 25.0
        for k in range(0, min(12, int(g.num_poses)), 2):
            pn = planes_ext.add_se3_plane_edge(
                pn, k, pid, observe_plane(g.poses[k], pw), info3
            )
        L = g.landmarks.shape[0]
        g2, pn2, prior, _ = fl.marginalize_planes(
            g, pn, fl.empty_prior(L, Pl=4, dtype=jnp.float64), drop=4
        )
        ga, pa, sa = pcg_mod.lm_optimize_pcg_planes(
            g2, pn2, max_iterations=20, prior=prior, assembly="scatter"
        )
        gb, pb, sb = pcg_mod.lm_optimize_pcg_planes(
            g2, pn2, max_iterations=20, prior=prior, assembly="ell",
            ell_rows=ell_rows + (1,),
        )
        np.testing.assert_allclose(
            np.asarray(gb.poses), np.asarray(ga.poses), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(pb.planes), np.asarray(pa.planes), atol=1e-9
        )

    def test_sharded_ell_with_marginals_matches_single(self, rng):
        """r4: pose-row ELL sharding now covers with_marginals (the maha
        profiles' required recovery) — no fallback to slower layouts."""
        from semantic_slam_tpu.parallel.sharded import make_mesh

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        g1, s1, m1 = pcg_mod.lm_optimize_pcg(
            g, max_iterations=20, assembly="ell", ell_rows=ell_rows,
            with_marginals=True,
        )
        mesh = make_mesh(4)
        g2, s2, m2 = pcg_mod.sharded_lm_optimize_pcg(
            g, mesh, max_iterations=20, assembly="ell", ell_rows=ell_rows,
            with_marginals=True,
        )
        np.testing.assert_allclose(
            np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(m2), np.asarray(m1), rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(
            float(s2.chi2_final), float(s1.chi2_final), rtol=1e-8
        )

    def test_sharded_ell_with_marginals_prior(self, rng):
        """Pose-row sharded marginals with a fixed-lag prior (Woodbury fold
        inside the mesh) match the single-chip per-pose recovery."""
        from semantic_slam_tpu.parallel.sharded import make_mesh
        from semantic_slam_tpu.solver import fixed_lag as fl

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, _ = _sort_obs_edges(g)
        L = g.landmarks.shape[0]
        g2, prior, _ = fl.marginalize(g, fl.empty_prior(L, dtype=jnp.float64), drop=4)
        g2, ell_rows = _sort_obs_edges(g2)
        g1, _, m1 = pcg_mod.lm_optimize_pcg(
            g2, max_iterations=15, assembly="ell", ell_rows=ell_rows,
            prior=prior, with_marginals=True,
        )
        mesh = make_mesh(4)
        g3, _, m3 = pcg_mod.sharded_lm_optimize_pcg(
            g2, mesh, max_iterations=15, assembly="ell", ell_rows=ell_rows,
            prior=prior, with_marginals=True,
        )
        np.testing.assert_allclose(
            np.asarray(g3.poses), np.asarray(g1.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(m3), np.asarray(m1), rtol=1e-6, atol=1e-9
        )

    def _planes_fixture(self, rng):
        from semantic_slam_tpu.graph import planes as planes_ext
        from semantic_slam_tpu.solver.plane_ba import observe_plane

        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        pn = planes_ext.make_planes(4, 32, dtype=jnp.float64)
        pw = jnp.asarray([0.0, 0.0, 1.0, -1.2], jnp.float64)
        pn, pid = planes_ext.add_plane_node(pn, pw)
        info3 = jnp.eye(3, dtype=jnp.float64) * 25.0
        for k in range(0, min(12, int(g.num_poses)), 2):
            pn = planes_ext.add_se3_plane_edge(
                pn, k, pid, observe_plane(g.poses[k], pw), info3
            )
        return g, pn, ell_rows + (1,)

    def test_sharded_planes_ell_matches_single(self, rng):
        """r4: the sharded planes path runs the pose-row merged point+plane
        grid (r3 kept the slot-gather layout there)."""
        from semantic_slam_tpu.parallel.sharded import make_mesh

        g, pn, ell_rows4 = self._planes_fixture(rng)
        g1, p1, s1 = pcg_mod.lm_optimize_pcg_planes(
            g, pn, max_iterations=20, assembly="ell", ell_rows=ell_rows4
        )
        mesh = make_mesh(4)
        g2, p2, s2 = pcg_mod.sharded_lm_optimize_pcg_planes(
            g, pn, mesh, max_iterations=20, assembly="ell",
            ell_rows=ell_rows4,
        )
        np.testing.assert_allclose(
            np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(p2.planes), np.asarray(p1.planes), atol=1e-8
        )
        np.testing.assert_allclose(
            float(s2.chi2_final), float(s1.chi2_final), rtol=1e-8
        )

    def test_sharded_planes_ell_with_marginals(self, rng):
        """Maha + planes under the mesh: point-landmark marginal blocks from
        the merged pose-row grid match the single-chip recovery."""
        from semantic_slam_tpu.parallel.sharded import make_mesh

        g, pn, ell_rows4 = self._planes_fixture(rng)
        g1, p1, s1, m1 = pcg_mod.lm_optimize_pcg_planes(
            g, pn, max_iterations=15, assembly="ell", ell_rows=ell_rows4,
            with_marginals=True,
        )
        mesh = make_mesh(4)
        g2, p2, s2, m2 = pcg_mod.sharded_lm_optimize_pcg_planes(
            g, pn, mesh, max_iterations=15, assembly="ell",
            ell_rows=ell_rows4, with_marginals=True,
        )
        np.testing.assert_allclose(
            np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(m2), np.asarray(m1), rtol=1e-6, atol=1e-9
        )

    def test_sharded_planes_matmul_with_marginals(self, rng):
        """The generic (one-hot) sharded planes path also supports
        with_marginals now (fallback for K % n != 0)."""
        from semantic_slam_tpu.parallel.sharded import make_mesh

        g, pn, _ = self._planes_fixture(rng)
        g1, p1, s1, m1 = pcg_mod.lm_optimize_pcg_planes(
            g, pn, max_iterations=15, assembly="scatter", with_marginals=True
        )
        mesh = make_mesh(4)
        g2, p2, s2, m2 = pcg_mod.sharded_lm_optimize_pcg_planes(
            g, pn, mesh, max_iterations=15, assembly="scatter",
            with_marginals=True,
        )
        np.testing.assert_allclose(
            np.asarray(g2.poses), np.asarray(g1.poses), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(m2), np.asarray(m1), rtol=1e-5, atol=1e-8
        )

    def test_marginals_graph_ell_matches_default(self, rng):
        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        g, _ = pcg_mod.lm_optimize_pcg(g, max_iterations=10)
        ma = pcg_mod.landmark_marginals_graph(g, assembly="scatter")
        mb = pcg_mod.landmark_marginals_graph(
            g, assembly="ell", ell_rows=ell_rows
        )
        np.testing.assert_allclose(np.asarray(mb), np.asarray(ma), atol=1e-8)

    def test_no_onehot_intermediates_in_ell_program(self, rng):
        """The point of the ELL layout: NO [E, K]-shaped pose-side one-hot
        anywhere in the solve program (the landmark-side [E, L] one-hot is
        allowed — L is bounded by the object table, not the trajectory)."""
        g, _, _ = build_chain_graph(rng, noise=0.05)
        g, ell_rows = _sort_obs_edges(g)
        K = g.poses.shape[0]
        E1 = g.odom_i.shape[0]
        E2 = g.lme_k.shape[0]

        def run(g):
            return pcg_mod.lm_optimize_pcg(
                g, max_iterations=8, assembly="ell", ell_rows=ell_rows
            )

        jaxpr = jax.make_jaxpr(run)(g)
        eqns = _walk_jaxpr(jaxpr.jaxpr, [])
        bad = []
        for eqn in eqns:
            for v in list(eqn.outvars) + list(eqn.invars):
                shape = getattr(getattr(v, "aval", None), "shape", ())
                if len(shape) >= 2 and shape[-1] == K and shape[-2] in (E1, E2):
                    bad.append((eqn.primitive.name, shape))
        assert not bad, f"[E, K] one-hot intermediates found: {bad}"
