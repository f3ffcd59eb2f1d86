"""Coverage for less-travelled paths: white-noise-kernel MPC, kernel
hyperparameter NLL gradients, rendering, and the sweep-grid builder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.algorithms import make_solver
from ppi_tpu.envs.classic import Pendulum
from ppi_tpu.mpc import Mpc
from ppi_tpu.policies import design_moments, make_policy


class TestWhiteNoiseKernelMpc:
    def test_swing_up_with_remap_shift(self):
        """WhiteNoiseKernel's index-remap horizon shift must be consistent
        through a full receding-horizon episode."""
        env = Pendulum()
        t_seq = env.dt * jnp.arange(15)
        mean, ci, co = design_moments(env.action_low, env.action_high, 1000.0)
        fam, pol = make_policy("WhiteNoiseKernel", t_seq, 1, mean, ci, co,
                               lower=env.action_low, upper=env.action_high)
        agent = Mpc(env=env, solver=make_solver("Mppi", alpha=10.0),
                    family=fam, timesteps=50, horizon=15, n_samples=64)
        carry = agent.init(pol, jax.random.key(0))
        es = env.reset(jax.random.key(1))
        carry, es, track = agent.run_episode_scan(carry, es, collect=False)
        r = np.asarray(track["reward"])
        assert np.isfinite(r).all()
        assert r[-5:].mean() > r[:5].mean() + 3.0


class TestHyperNll:
    def test_gradient_flows_and_improves(self):
        """The marginal-likelihood objective is jax.grad-able and a step
        along the gradient improves it (the reference needed autograd +
        SciPy; reference: ppi/policies.py:696-708)."""
        fam, state = None, None
        from ppi_tpu.policies import make_policy as mk
        t = jnp.linspace(0, 1, 12)
        fam, state = mk("SquaredExponentialKernel", t, 2, jnp.zeros(2),
                        jnp.array([1.0]), 0.1 * jnp.eye(2), lengthscale=0.3)
        target = 0.3 * jax.random.normal(jax.random.key(0), (12, 2))
        nll = lambda h: fam.hyper_nll(state, h, target)
        g = jax.grad(nll)(state.hyper)
        assert np.all(np.isfinite(np.asarray(g)))
        h2 = state.hyper - 0.01 * g
        assert float(nll(h2)) < float(nll(state.hyper))


class TestRender:
    def test_planar_render_smoke(self, tmp_path):
        from ppi_tpu.envs.reacher import Reacher
        from ppi_tpu.render import render_planar
        env = Reacher()
        s = env.reset(jax.random.key(0))
        qs = []
        for i in range(6):
            s, _ = env.step(s, jnp.array([0.3, -0.2]))
            qs.append(s.physics.qpos)
        out = render_planar(env, jnp.stack(qs), tmp_path / "r.gif", stride=2,
                            xlim=(-0.6, 0.6))
        assert out.exists() and out.stat().st_size > 1000


class TestSweepGrid:
    def test_grid_builder_formats_commands(self, tmp_path, monkeypatch):
        import ppi_tpu.runners.run_sweep as rs
        captured = {}

        def fake_run_sweep(commands, **kw):
            captured["commands"] = commands
            return [{"id": i, "exit": 0} for i in range(len(commands))], 0

        monkeypatch.setattr(rs, "run_sweep", fake_run_sweep)
        import argparse
        args = argparse.Namespace(runner="opt", seeds=2, jobs=1, retries=0,
                                  dir=str(tmp_path))
        rs.main(args)
        cmds = captured["commands"]
        assert len(cmds) == 5 * 2  # 5 algorithms x 2 seeds
        assert all("--seed" in c and "NoisySphere" in c for c in cmds)


class TestGoalSuccessRunner:
    def test_vmapped_goal_sweep_tiny(self, tmp_path):
        """Sampled-goal MPC success-rate runner (VERDICT r2 next #3): two
        resets must draw two different goals, the goal must stay constant
        within each episode, and the summary must serialize."""
        from ppi_tpu.runners import goal_success as gs

        summary = gs.run("fetch-push", resets=3, warmstart=1,
                         overrides=dict(timesteps=3, horizon=5, n_samples=8))
        assert summary["resets"] == 3
        # chunked execution (chunk < resets; 3 resets / chunk 2 forces the
        # padded tail chunk through goal_success's key-broadcast pad path)
        chunked = gs.run("fetch-push", resets=3, warmstart=1, chunk=2,
                         overrides=dict(timesteps=3, horizon=5, n_samples=8))
        for a, b in zip(summary["episodes"], chunked["episodes"]):
            assert a["goal"] == b["goal"]
            np.testing.assert_allclose(a["return"], b["return"], rtol=1e-5)
        assert 0.0 <= summary["success_rate"] <= 1.0
        assert summary["goal_spread"] > 0.0  # goals actually sampled
        assert len(summary["episodes"]) == 3
        import json

        json.dumps(summary)  # JSON-serializable end to end

    def test_goal_sweep_fitted_prior_override(self, tmp_path):
        """overrides['model_selection'] builds the policy prior from a
        fitted artifact (the run_mpc --model-selection path for sweeps;
        studies/hammer_expert_prior.py): the fitted lengthscale lands in
        the serialized config and changes the episode outcomes."""
        import jax.numpy as jnp

        from ppi_tpu.model_selection import (
            default_kernels, save_model_selection, select_model)
        from ppi_tpu.runners import goal_success as gs

        # smooth synthetic "expert" windows for fetch-push's 4-d actions
        t = np.arange(400) * 0.05
        acts = 0.3 * np.stack([np.sin(0.9 * t), np.cos(0.6 * t),
                               np.sin(0.4 * t + 1.0), np.cos(1.2 * t)],
                              axis=1)
        kernels = {"SquaredExponentialKernel":
                   default_kernels(0.05)["SquaredExponentialKernel"]}
        payload = select_model(acts.astype(np.float32), 5, kernels,
                               t=0.05 * np.arange(5))
        path = tmp_path / "ms.npz"
        save_model_selection(path, payload)

        base_cfg = dict(alg="Lbps", policy="SquaredExponentialKernel",
                        delta=0.9, timesteps=3, horizon=5, n_samples=8)
        plain = gs.run("fetch-push", resets=2, warmstart=1,
                       overrides=dict(base_cfg))
        fitted = gs.run("fetch-push", resets=2, warmstart=1,
                        overrides=dict(base_cfg,
                                       model_selection=str(path)))
        fitted_ls = float(payload["SquaredExponentialKernel"]["param"][1])
        assert fitted["config"]["lengthscale"] == pytest.approx(fitted_ls)
        rets_p = [e["return"] for e in plain["episodes"]]
        rets_f = [e["return"] for e in fitted["episodes"]]
        assert rets_p != rets_f  # the prior actually changed the sweep
        # fitted-scale mode keeps the expert's absolute variance and
        # differs from the box-rescaled default
        scaled = gs.run("fetch-push", resets=2, warmstart=1,
                        overrides=dict(base_cfg,
                                       model_selection=str(path),
                                       ms_fitted_scale=True))
        assert [e["return"] for e in scaled["episodes"]] != rets_f

    def test_goal_sweep_restarts_axis(self):
        """--restarts K: every restart of a task faces the identical
        sampled scene (asserted inside run), returns differ across
        restarts (solver seed varies), and the any-of-K rate dominates
        the single-start rate."""
        from ppi_tpu.runners import goal_success as gs

        s = gs.run("fetch-push", resets=2, warmstart=1, restarts=3,
                   overrides=dict(timesteps=3, horizon=5, n_samples=8))
        assert s["restarts"] == 3
        assert s["success_rate_any"] >= s["success_rate"]
        for ep in s["episodes"]:
            assert len(ep["restart_returns"]) == 3
            assert ep["success_any"] == any(ep["restart_successes"])
            # solver seed varies across restarts of the same task
            assert len(set(ep["restart_returns"])) > 1
        import json

        json.dumps(s)


class TestMultiStartRunner:
    def test_multi_start_fixed_task_chunked_matches(self):
        """Vmapped solver restarts on ONE fixed task (the RESULTS.md
        hammer-study conclusion as a feature): chunked == all-at-once,
        task held fixed, returns vary only through the solver seed."""
        from ppi_tpu.runners import multi_start as ms

        ov = dict(timesteps=3, horizon=5, n_samples=8)
        a = ms.run("fetch-push", restarts=3, warmstart=1, overrides=ov)
        b = ms.run("fetch-push", restarts=3, warmstart=1, chunk=2,
                   overrides=ov)
        np.testing.assert_allclose(a["returns"], b["returns"], rtol=1e-5)
        assert a["restarts"] == 3 and len(a["returns"]) == 3
        assert len(set(a["returns"])) > 1  # solver seed actually varies
        assert a["success_any"] == (a["n_success"] > 0)
        import json

        json.dumps(a)
