"""MJCF importer: XML -> ModelBuilder field mapping (VERDICT r3 next #4).

Loads the reference's WAM ball-in-a-cup scene
(/root/reference/policy_search/robot_descriptions/wam/
ball_in_cup_cylinder.xml) and asserts the imported model reproduces the
XML's masses, inertias, joint parameters and site positions. The expected
``cup_goal`` world position is hand-computed from the XML's nested
body transforms (independent of the importer's own math).
"""

import os

import numpy as np
import pytest

REF_XML = ("/root/reference/policy_search/robot_descriptions/wam/"
           "ball_in_cup_cylinder.xml")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_XML), reason="reference scene XML not present")


@pytest.fixture(scope="module")
def wam():
    from ppi_tpu.envs.physics.mjcf import load_mjcf
    return load_mjcf(REF_XML)


def test_options(wam):
    assert wam.timestep == pytest.approx(5e-4)
    np.testing.assert_allclose(wam.gravity, [0.0, 0.0, -9.81])


def test_dof_count_and_joint_names(wam):
    # 4 WAM joints + 29 string links x 2 hinges = 62 dofs; the ghost
    # freejoint bodies (ball_pred/ball_true/cup_pred) are skipped
    assert len(wam.builder._bodies) == 62
    for name in ("joints/shoulder_yaw", "joints/shoulder_pitch",
                 "joint/shoulder_roll", "joint/elbow_pitch"):
        assert name in wam.joint_id
    assert wam.joint_id["joints/shoulder_yaw"] == 0
    assert "J0_1" in wam.joint_id and "J1_29" in wam.joint_id


def test_arm_masses_and_inertia(wam):
    bodies = wam.builder._bodies
    yaw = bodies[wam.joint_id["joints/shoulder_yaw"]]
    # shoulder_yaw body: inertial mass straight from the XML (line 94)
    assert yaw["mass"] == pytest.approx(10.76768767, rel=1e-6)
    np.testing.assert_allclose(
        yaw["com"], [-0.00443422, -0.00066489, 0.03810961], atol=1e-6)
    # fullinertia = (ixx iyy izz ixy ixz iyz)
    assert yaw["inertia"][0, 0] == pytest.approx(0.13488033, rel=1e-5)
    assert yaw["inertia"][0, 1] == pytest.approx(0.00012485, rel=1e-3)
    assert yaw["inertia"][1, 2] == pytest.approx(0.00068555, rel=1e-3)

    # forearm carrier folds the jointless cup (0.132) and string anchor
    # B0 (7.4927e-05) into the forearm link (1.06513649)
    forearm = bodies[wam.joint_id["joint/elbow_pitch"]]
    assert forearm["mass"] == pytest.approx(
        1.06513649 + 0.132 + 7.4927e-05, rel=1e-5)

    # the ball (jointless, geom mass 0.021) folds into the last string link
    last = bodies[wam.joint_id["J1_29"]]
    assert last["mass"] == pytest.approx(7.4927e-05 + 0.021, rel=1e-4)


def test_joint_parameters(wam):
    bodies = wam.builder._bodies
    yaw = bodies[wam.joint_id["joints/shoulder_yaw"]]
    np.testing.assert_allclose(yaw["q_limit"], [-2.6, 2.6])
    assert yaw["friction_loss"] == pytest.approx(0.1)  # joint default
    elbow = bodies[wam.joint_id["joint/elbow_pitch"]]
    np.testing.assert_allclose(elbow["q_limit"], [-0.9, 3.14159])
    # string joints: damping 1e-4, frictionloss overridden to 0, unlimited
    s = bodies[wam.joint_id["J0_7"]]
    assert s["damping"] == pytest.approx(1e-4)
    assert s["friction_loss"] == 0.0
    assert s["limit_k"] == 0.0


def test_joint_overrides():
    from ppi_tpu.envs.physics.mjcf import load_mjcf
    m = load_mjcf(REF_XML, joint_overrides={
        "joints/shoulder_yaw": {"armature": 0.25, "damping": 1.5}})
    b = m.builder._bodies[m.joint_id["joints/shoulder_yaw"]]
    assert b["armature"] == 0.25 and b["damping"] == 1.5


def test_cup_site_world_position(wam):
    """cup_goal at q=0 == hand-computed composition of the XML transforms
    (base 0.84 + yaw 0.16 + pitch 0.184 + upper -0.505y(rot) + forearm +
    tool plate + site (0, 0.05, 0.1165)) = (0, 0.05, 2.2085)."""
    import jax.numpy as jnp
    from ppi_tpu.envs.physics import engine

    model = wam.builder.finalize()
    carrier, local = wam.sites["cup_goal"]
    kin = engine.fk(model, jnp.zeros(model.nq))
    world = np.asarray(kin["pos"][carrier]
                       + kin["rot"][carrier] @ jnp.asarray(local))
    np.testing.assert_allclose(world, [0.0, 0.05, 2.2085], atol=2e-4)
    # string anchor B0 hangs 95 mm -y of the cup goal, same height
    carrier_b, local_b = (wam.body_carrier["B0"], wam.body_pos["B0"])
    world_b = np.asarray(kin["pos"][carrier_b]
                         + kin["rot"][carrier_b] @ jnp.asarray(local_b))
    np.testing.assert_allclose(world_b, [0.0, -0.045, 2.2085], atol=2e-4)


def test_string_chain_geometry(wam):
    """Consecutive string links are 10.7 mm apart along the chain at q=0."""
    import jax.numpy as jnp
    from ppi_tpu.envs.physics import engine

    model = wam.builder.finalize()
    kin = engine.fk(model, jnp.zeros(model.nq))
    b_prev = wam.joint_id["J1_1"]
    for k in range(2, 30):
        b = wam.joint_id[f"J1_{k}"]
        d = float(jnp.linalg.norm(kin["pos"][b] - kin["pos"][b_prev]))
        assert d == pytest.approx(0.0107, abs=2e-5)
        b_prev = b


def test_geom_metadata(wam):
    ball = [g for g in wam.geoms if g.name == "ball_geom"]
    assert len(ball) == 1 and ball[0].type == "sphere"
    assert ball[0].size[0] == pytest.approx(0.02)
    caps = [g for g in wam.geoms if g.type == "capsule"
            and g.body_name.startswith("B")]
    assert len(caps) == 30  # G0..G29
