"""Analytic ray-cast 3-D renderer (VERDICT r3 missing #4).

Property-checks the closed-form ray/primitive intersections and shading on
a purpose-built two-body scene (tiny model: no physics compile cost), then
the env-level API surface. The reference's counterpart is MuJoCo offscreen
GL rendering (reference: policy_search/ball_in_a_cup.py:258-267).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ppi_tpu import render3d
from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE


class _TinyEnv:
    """Minimal env surface for render_trajectory: just `_model`."""

    def __init__(self, model):
        self._model = model


def _scene(with_plane=True, second_sphere=None):
    b = ModelBuilder()
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, 1.0), mass=1.0)
    b.add_body(parent=0, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.4, 0, 0), mass=1.0)
    s0 = b.add_sphere(0, (0, 0, 0), 0.15)
    b.add_sphere(1, (0, 0, 0), 0.10)
    if second_sphere is not None:
        b.add_sphere(0, second_sphere, 0.15)
    if with_plane:
        b.add_plane(normal=(0, 0, 1), offset=0.0)
    return _TinyEnv(b.finalize()), s0


def _cam(eye=(0.0, -2.0, 1.0), target=(0.0, 0.0, 1.0), n=96):
    return render3d.Camera(eye=eye, target=target, width=n, height=n)


def test_frames_shape_dtype_and_stride():
    env, _ = _scene()
    traj = jnp.zeros((6, 2))
    frames = render3d.render_trajectory(env, traj, camera=_cam(n=48),
                                        stride=2)
    assert frames.shape == (3, 48, 48, 3)
    assert frames.dtype == np.uint8


def test_center_pixel_hits_root_sphere_with_its_color():
    style = render3d.SceneStyle(sphere_colors={0: (1.0, 0.0, 0.0)},
                                ambient=1.0)  # flat shading: pure albedo
    env, s0 = _scene()
    frames = render3d.render_trajectory(env, jnp.zeros((1, 2)),
                                        camera=_cam(), style=style)
    c = frames[0, 48, 48]  # camera looks straight at body 0's sphere
    assert c[0] > 200 and c[1] < 80 and c[2] < 80


def test_depth_ordering_front_sphere_occludes():
    """A second sphere on the camera side of the root must win the z-test."""
    style = render3d.SceneStyle(sphere_colors={0: (1, 0, 0), 2: (0, 0, 1)},
                                ambient=1.0)
    env, _ = _scene(second_sphere=(0, -0.5, 0))  # toward the camera
    frames = render3d.render_trajectory(env, jnp.zeros((1, 2)),
                                        camera=_cam(), style=style)
    c = frames[0, 48, 48]
    assert c[2] > 200 and c[0] < 80  # blue (near), not red (far)


def test_ground_checker_two_tones_and_background():
    env, _ = _scene()
    cam = _cam(eye=(0.6, -2.0, 1.2), target=(0.0, 0.0, 0.6))
    frames = render3d.render_trajectory(env, jnp.zeros((1, 2)), camera=cam)
    img = frames[0].astype(np.int32)
    bottom = img[-12:, :, 0].ravel()       # ground rows
    assert len(np.unique(bottom)) >= 2     # checker: at least two tones
    bg = render3d.SceneStyle().background
    top = img[:4, :4]                      # sky rows
    assert np.all(np.abs(top - np.round(np.array(bg) * 255)) <= 2)


def test_link_capsule_visible_between_bodies():
    """Pixels between the two joint origins hit the link capsule (without
    it, rays there would reach the background)."""
    env, _ = _scene(with_plane=False)
    style = render3d.SceneStyle(link_radius=0.05, ambient=1.0)
    cam = _cam(eye=(0.2, -2.0, 1.0), target=(0.2, 0.0, 1.0))
    frames = render3d.render_trajectory(env, jnp.zeros((1, 2)), camera=cam,
                                        style=style)
    mid = frames[0, 48, 48].astype(np.float32) / 255.0
    np.testing.assert_allclose(mid, [0.62, 0.64, 0.68], atol=0.03)


def test_articulated_motion_moves_pixels():
    env, _ = _scene()
    traj = jnp.array([[0.0, 0.0], [1.2, 0.8]])
    frames = render3d.render_trajectory(env, traj, camera=_cam())
    assert np.mean(frames[0] != frames[1]) > 0.005


def test_shadow_darkens_ground():
    """The root sphere must cast a hard shadow: with shadows the lit-ground
    brightness range widens vs ambient-only shading."""
    env, _ = _scene()
    cam = _cam(eye=(0.0, -1.6, 1.8), target=(0.0, 0.3, 0.4))
    lit = render3d.render_trajectory(
        env, jnp.zeros((1, 2)), camera=cam,
        style=render3d.SceneStyle(light_dir=(0.0, 0.0, 1.0)))
    flat = render3d.render_trajectory(
        env, jnp.zeros((1, 2)), camera=cam,
        style=render3d.SceneStyle(light_dir=(0.0, 0.0, 1.0), ambient=1.0))
    ground_lit = lit[0, -30:, :, 0].astype(np.float32)
    ground_flat = flat[0, -30:, :, 0].astype(np.float32)
    assert ground_lit.min() < ground_flat.min() - 20


def test_dyn_body_offset_shifts_geometry():
    """dyn_pos substitutes the dynamic body's offset like make_sites_soa."""
    env, _ = _scene(with_plane=False)
    env.scalar_dyn_body = 1
    style = render3d.SceneStyle(ambient=1.0)
    cam = _cam()
    a = render3d.render_trajectory(env, jnp.zeros((1, 2)), camera=cam,
                                   style=style, dyn_pos=(0.4, 0.0, 0.0))
    b = render3d.render_trajectory(env, jnp.zeros((1, 2)), camera=cam,
                                   style=style, dyn_pos=(-0.4, 0.4, 0.2))
    assert np.mean(a != b) > 0.002


def test_save_gif_3d_writes_file(tmp_path):
    pytest.importorskip("imageio")
    env, _ = _scene()
    out = render3d.save_gif_3d(tmp_path / "scene.gif", env,
                               jnp.zeros((2, 2)), camera=_cam(n=32))
    assert out.exists() and out.stat().st_size > 200
