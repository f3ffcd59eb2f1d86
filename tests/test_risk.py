"""Risk-averse plan aggregation (VERDICT r3 next #2).

Solver-side robustness for knife-edge tasks: (a) CVaR blending of per-step
plan costs (``envs.base.risk_aggregate``, ``Mpc.risk_weight``), and (b) the
hammer grasp-integrity gate (``HammerHand.knockaway_penalty``) that prices
losing the tool into the planning objective before commitment. Reference
counterpart: the mj_envs hammer-v0 task the canonical config targets
(reference: run_mpc.py:44, Makefile:20-21) — its knock-away failures are
the mechanism RESULTS.md r3 bracketed without a temperature-side fix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu.envs.base import risk_aggregate


class TestRiskAggregate:
    def test_off_equals_negative_sum(self):
        r = jax.random.normal(jax.random.key(0), (5, 12))
        np.testing.assert_allclose(risk_aggregate(r),
                                   -jnp.sum(r, axis=1), rtol=1e-6)
        np.testing.assert_allclose(
            risk_aggregate(r, risk_quantile=0.25, risk_weight=0.0),
            -jnp.sum(r, axis=1), rtol=1e-6)

    def test_quantile_one_is_continuous_with_sum(self):
        """H * CVaR_1 == sum(costs), so any weight at q=1 is the plain sum."""
        r = jax.random.normal(jax.random.key(1), (4, 10))
        np.testing.assert_allclose(
            risk_aggregate(r, risk_quantile=1.0, risk_weight=0.7),
            -jnp.sum(r, axis=1), rtol=1e-5)

    def test_cvar_penalizes_bad_tail_at_equal_sum(self):
        """Two plans with IDENTICAL total reward: the one concentrating its
        loss in a few catastrophic steps must cost more under the blend."""
        h = 20
        spread = jnp.full((h,), -1.0)                   # mild loss each step
        tail = jnp.zeros(h).at[-2:].set(-10.0)          # same sum, bad tail
        r = jnp.stack([spread, tail])
        assert float(jnp.sum(spread)) == float(jnp.sum(tail))
        costs = risk_aggregate(r, risk_quantile=0.1, risk_weight=0.5)
        assert float(costs[1]) > float(costs[0])

    def test_mask_zeroes_past_episode_steps(self):
        r = jnp.ones((3, 8))
        mask = jnp.array([1.0] * 5 + [0.0] * 3)
        np.testing.assert_allclose(risk_aggregate(r, mask),
                                   -5.0 * jnp.ones(3), rtol=1e-6)
        # risk path: masked steps contribute cost 0, never -inf/NaN
        out = risk_aggregate(-r, mask, risk_quantile=0.5, risk_weight=1.0)
        assert np.isfinite(np.asarray(out)).all()

    def test_ranking_shift_moves_the_posterior(self):
        """The blend changes which plan wins, not just the scale: with a
        large-enough weight the risky plan's cost overtakes a plan whose
        sum is slightly worse but whose tail is clean."""
        h = 30
        clean = jnp.full((h,), -1.1)                    # worse sum, no tail
        risky = jnp.full((h,), -0.5).at[-3:].set(-6.0)  # better sum, bad tail
        r = jnp.stack([clean, risky])
        assert float(jnp.sum(risky)) > float(jnp.sum(clean))  # risky wins raw
        base = risk_aggregate(r)
        assert float(base[1]) < float(base[0])
        blended = risk_aggregate(r, risk_quantile=0.1, risk_weight=0.6)
        assert float(blended[1]) > float(blended[0])    # clean wins blended

    def test_mpc_rejects_risk_with_pallas(self):
        from ppi_tpu.mpc import Mpc
        with pytest.raises(ValueError, match="per-step rewards"):
            Mpc(env=None, solver=None, family=None, timesteps=10,
                horizon=5, n_samples=8, use_pallas=True, risk_weight=0.5)


class TestKnockawayGate:
    @pytest.fixture(scope="class")
    def envs(self):
        from ppi_tpu.envs.hammer_hand import HammerHand
        return (HammerHand(engine="tensor"),
                HammerHand(engine="tensor", knockaway_penalty=0.0))

    def test_gate_inactive_inside_workspace(self, envs):
        """At the reset scene (hammer on the bench, grip x = 0.44) the gate
        term is exactly zero — the in-workspace reward is the r3 reward."""
        gated, ungated = envs
        s0 = gated.reset(jax.random.key(0))
        a = s0.physics.qpos[:len(gated.action_low)]
        _, r_gated = gated.step(s0, a)
        _, r_ungated = ungated.step(s0, a)
        np.testing.assert_allclose(float(r_gated), float(r_ungated),
                                   rtol=1e-6)

    def test_gate_prices_the_punt(self, envs):
        """A hammer displaced past the reach annulus costs penalty * excess
        per step, identically on the tensor and scalar reward paths."""
        from ppi_tpu.envs.hammer_hand import GRIP_START, HAM_X, WS_GRIP_X
        gated, ungated = envs
        s0 = gated.reset(jax.random.key(0))
        punted = s0.replace(physics=s0.physics.replace(
            qpos=s0.physics.qpos.at[HAM_X].set(0.6)))  # grip x = 1.04
        a = s0.physics.qpos[:len(gated.action_low)]
        _, r_gated = gated.step(punted, a)
        _, r_ungated = ungated.step(punted, a)
        # one step of dynamics moves the free hammer a little; bound the
        # expected gap by the gate at the pre/post positions
        excess0 = (GRIP_START[0] + 0.6) - WS_GRIP_X[1]
        gap = float(r_ungated - r_gated)
        assert gap == pytest.approx(gated.knockaway_penalty * excess0,
                                    rel=0.15)
        assert gap > 0.5 * gated.knockaway_penalty * excess0
