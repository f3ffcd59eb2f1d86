"""Mesh-level 3-D episode rendering — an analytic ray-caster in JAX.

The reference renders its scenes offscreen through MuJoCo's OpenGL pipeline
(reference: policy_search/ball_in_a_cup.py:258-267, utils.py:33-70); the
rebuild's schematic 2-D matplotlib views (``ppi_tpu.render``) verify task
behavior but not the visual output class. This module closes that gap the
TPU-native way: the scenes' actual collision/visual geometry — spheres,
link capsules, ground planes — is ray-cast analytically (closed-form
ray/sphere, ray/capsule, ray/plane intersections), Lambert-shaded with a
hard shadow ray and a checkered ground, entirely in ``jnp``. One jitted
program renders a whole frame (vmapped over pixels); a second vmap maps it
over trajectory frames, so a full episode renders on device in one
dispatch — no OpenGL, no host rasterizer, no per-frame Python.

Geometry comes straight from the physics model: every ``ArticulatedModel``
sphere geom at its FK pose, a capsule per kinematic link (parent joint
origin -> child joint origin), and the model's contact planes. Envs that
randomize scene geometry through a dynamic body (sampled boards/goals)
pass ``dyn_body``/``dyn_pos`` with the same semantics as
``engine_soa.make_sites_soa``.
"""

from dataclasses import dataclass, field
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.envs.physics.engine import fk

_BIG = 1e9
_EPS = 1e-6

# a small qualitative palette (colorblind-safe Okabe-Ito values), cycled
# over bodies so digits/links are distinguishable in the gif
_PALETTE = np.array([
    [0.35, 0.55, 0.85],
    [0.90, 0.62, 0.17],
    [0.22, 0.65, 0.45],
    [0.80, 0.45, 0.66],
    [0.55, 0.45, 0.80],
    [0.85, 0.37, 0.31],
], dtype=np.float32)


@dataclass(frozen=True)
class Camera:
    eye: tuple = (1.6, -1.4, 1.9)
    target: tuple = (0.3, 0.0, 0.9)
    up: tuple = (0.0, 0.0, 1.0)
    fov_deg: float = 40.0
    width: int = 320
    height: int = 240


@dataclass(frozen=True)
class SceneStyle:
    link_radius: float = 0.016
    light_dir: tuple = (-0.45, 0.35, 0.82)  # TOWARD the light
    ambient: float = 0.35
    background: tuple = (0.93, 0.95, 0.98)
    checker: float = 0.25  # checker tile size (m); 0 disables
    floor: float | None = None  # add a z=floor ground when the model has
    #                             no plane geom (visual only, no contact)
    sphere_colors: dict = field(default_factory=dict)  # geom idx -> rgb


def scene_arrays(model, style: SceneStyle | None = None):
    """Static (host-side) scene description: capsule topology + colors.

    Returns (link_pairs (nl, 2) body ids, sphere_colors (ns, 3),
    link_color (3,)). Capsules connect each body's joint origin to its
    parent's; zero-length links (stacked joints) are dropped.
    """
    style = style or SceneStyle()
    parents = model.parents
    offs = np.asarray(model.offset_pos)
    pairs = [(p, b) for b, p in enumerate(parents)
             if p >= 0 and np.linalg.norm(offs[b]) > 1e-4]
    sphere_body = np.asarray(model.sphere_body)
    colors = _PALETTE[sphere_body % len(_PALETTE)].copy()
    for idx, rgb in style.sphere_colors.items():
        colors[idx] = rgb
    return (np.asarray(pairs, np.int32).reshape(-1, 2), colors,
            np.array([0.62, 0.64, 0.68], np.float32))


def _ray_spheres(ro, rd, centers, radii):
    """Nearest-hit t against each sphere; (ns,) with _BIG for miss."""
    oc = ro - centers                      # (ns, 3)
    b = jnp.einsum("si,i->s", oc, rd)
    c = jnp.einsum("si,si->s", oc, oc) - radii ** 2
    h = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(h, 0.0))
    return jnp.where((h > 0) & (t > _EPS), t, _BIG)


def _ray_capsules(ro, rd, a, b, r):
    """Nearest-hit t against each capsule (iq's closed form); (nc,)."""
    ba = b - a                             # (nc, 3)
    oa = ro - a
    baba = jnp.einsum("ci,ci->c", ba, ba)
    bard = jnp.einsum("ci,i->c", ba, rd)
    baoa = jnp.einsum("ci,ci->c", ba, oa)
    rdoa = jnp.einsum("ci,i->c", oa, rd)
    oaoa = jnp.einsum("ci,ci->c", oa, oa)
    k2 = baba - bard ** 2
    k1 = baba * rdoa - baoa * bard
    k0 = baba * (oaoa - r ** 2) - baoa ** 2
    h = k1 * k1 - k2 * k0
    t_cyl = (-k1 - jnp.sqrt(jnp.maximum(h, 0.0))) / jnp.where(
        jnp.abs(k2) > _EPS, k2, _EPS)
    y = baoa + t_cyl * bard
    cyl_ok = (h > 0) & (t_cyl > _EPS) & (y > 0) & (y < baba)
    # end caps: sphere at a (y <= 0) or b (y >= baba)
    cap_c = jnp.where((y <= 0)[:, None], a, b)
    oc = ro - cap_c
    cb = jnp.einsum("ci,i->c", oc, rd)
    cc = jnp.einsum("ci,ci->c", oc, oc) - r ** 2
    ch = cb * cb - cc
    t_cap = -cb - jnp.sqrt(jnp.maximum(ch, 0.0))
    cap_ok = (ch > 0) & (t_cap > _EPS)
    t = jnp.where(cyl_ok, t_cyl, jnp.where(cap_ok, t_cap, _BIG))
    return t


def _capsule_normal(p, a, b):
    ba = b - a
    y = jnp.clip(jnp.dot(p - a, ba) / jnp.maximum(jnp.dot(ba, ba), _EPS),
                 0.0, 1.0)
    n = p - (a + y * ba)
    return n / jnp.maximum(jnp.linalg.norm(n), _EPS)


def _ray_planes(ro, rd, normals, offsets):
    denom = jnp.einsum("pi,i->p", normals, rd)
    t = (offsets - jnp.einsum("pi,i->p", normals, ro)) / jnp.where(
        jnp.abs(denom) > _EPS, denom, _EPS)
    return jnp.where((jnp.abs(denom) > _EPS) & (t > _EPS), t, _BIG)


def _closest_hit(ro, rd, geo):
    """(t, kind, idx) of the nearest primitive along the ray."""
    ts = _ray_spheres(ro, rd, geo["sc"], geo["sr"])
    tc = _ray_capsules(ro, rd, geo["ca"], geo["cb"], geo["cr"])
    tp = _ray_planes(ro, rd, geo["pn"], geo["po"])
    all_t = jnp.concatenate([ts, tc, tp])
    i = jnp.argmin(all_t)
    return all_t[i], i


def _shade(ro, rd, geo, style_consts):
    ns, nc = geo["sc"].shape[0], geo["ca"].shape[0]
    light, ambient, bg, checker = style_consts
    t, i = _closest_hit(ro, rd, geo)
    hit = t < _BIG
    p = ro + t * rd

    is_s = i < ns
    is_c = (i >= ns) & (i < ns + nc)
    si = jnp.clip(i, 0, ns - 1)
    ci = jnp.clip(i - ns, 0, max(nc - 1, 0))
    pi = jnp.clip(i - ns - nc, 0, geo["pn"].shape[0] - 1)

    n_s = (p - geo["sc"][si]) / jnp.maximum(geo["sr"][si], _EPS)
    n_c = _capsule_normal(p, geo["ca"][ci], geo["cb"][ci])
    n_p = geo["pn"][pi]
    n = jnp.where(is_s, n_s, jnp.where(is_c, n_c, n_p))
    n = n / jnp.maximum(jnp.linalg.norm(n), _EPS)

    # checkerboard on planes
    chk = jnp.where(
        checker > 0,
        0.82 + 0.13 * jnp.mod(
            jnp.floor(p[0] / jnp.maximum(checker, _EPS))
            + jnp.floor(p[1] / jnp.maximum(checker, _EPS)), 2.0),
        0.9)
    col_p = chk * jnp.ones(3)
    color = jnp.where(is_s, geo["scol"][si],
                      jnp.where(is_c, geo["ccol"], col_p))

    # hard shadow: any-hit toward the light (planes can't shadow)
    so = p + 1e-3 * n
    ts2 = _ray_spheres(so, light, geo["sc"], geo["sr"])
    tc2 = _ray_capsules(so, light, geo["ca"], geo["cb"], geo["cr"])
    in_shadow = jnp.minimum(jnp.min(ts2, initial=_BIG),
                            jnp.min(tc2, initial=_BIG)) < _BIG
    diff = jnp.maximum(jnp.dot(n, light), 0.0)
    diff = jnp.where(in_shadow, 0.15 * diff, diff)
    shade = ambient + (1.0 - ambient) * diff
    rgb = jnp.clip(color * shade, 0.0, 1.0)
    return jnp.where(hit, rgb, bg)


def _world_geo(model, qpos, link_pairs, sphere_colors, link_color,
               link_radius, dyn_body=None, dyn_pos=None, floor=None):
    """FK the model at qpos into flat world-space primitive arrays."""
    if dyn_body is not None and dyn_pos is not None:
        model = model.replace(
            offset_pos=model.offset_pos.at[dyn_body].set(dyn_pos))
    k = fk(model, qpos)
    rot, pos = k["rot"], k["pos"]
    sc = pos[model.sphere_body] + jnp.einsum(
        "sij,sj->si", rot[model.sphere_body], model.sphere_pos)
    if link_pairs.shape[0]:
        ca = pos[link_pairs[:, 0]]
        cb = pos[link_pairs[:, 1]]
    else:
        # degenerate far-away capsule: keeps every gather in _shade valid
        ca = jnp.full((1, 3), -2.0 * _BIG)
        cb = jnp.full((1, 3), -2.0 * _BIG) + 1.0
    if model.plane_normal.shape[0]:
        pn, po = model.plane_normal, model.plane_offset
    elif floor is not None:
        pn = jnp.asarray([[0.0, 0.0, 1.0]])
        po = jnp.asarray([float(floor)])
    else:
        # far-below dummy plane: its hit t (~1e12) exceeds the miss
        # sentinel so it never wins the z-test nor registers as a hit
        pn = jnp.asarray([[0.0, 0.0, 1.0]])
        po = jnp.asarray([-1000.0 * _BIG])
    return {
        "sc": sc, "sr": model.sphere_radius,
        "ca": ca, "cb": cb,
        "cr": jnp.asarray(link_radius),
        "pn": pn, "po": po,
        "scol": jnp.asarray(sphere_colors), "ccol": jnp.asarray(link_color),
    }


def _rays(camera: Camera):
    eye = np.asarray(camera.eye, np.float32)
    fwd = np.asarray(camera.target, np.float32) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(camera.up, np.float32))
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    h, w = camera.height, camera.width
    tanf = np.tan(np.radians(camera.fov_deg) / 2)
    xs = (np.arange(w) + 0.5) / w * 2 - 1
    ys = 1 - (np.arange(h) + 0.5) / h * 2
    px, py = np.meshgrid(xs * tanf * w / h, ys * tanf)
    dirs = (fwd[None, None] + px[..., None] * right[None, None]
            + py[..., None] * up[None, None])
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(eye), jnp.asarray(dirs.reshape(-1, 3).astype(
        np.float32))


@partial(jax.jit, static_argnames=("camera", "link_radius", "ambient",
                                   "checker", "dyn_body", "floor"))
def _render_traj(model, qpos_traj, dyn_pos_traj, link_pairs, sphere_colors,
                 link_color, camera, link_radius, light, ambient, bg,
                 checker, dyn_body, floor):
    # TPU default bf16 matmuls scramble the FK rotation chains (same
    # reason the physics engine binds highest precision) — a device-
    # rendered frame shows the geometry as dithered speckle without this
    with jax.default_matmul_precision("highest"):
        return _render_traj_impl(
            model, qpos_traj, dyn_pos_traj, link_pairs, sphere_colors,
            link_color, camera, link_radius, light, ambient, bg, checker,
            dyn_body, floor)


def _render_traj_impl(model, qpos_traj, dyn_pos_traj, link_pairs,
                      sphere_colors, link_color, camera, link_radius, light,
                      ambient, bg, checker, dyn_body, floor):
    ro, rds = _rays(camera)
    light_n = light / jnp.linalg.norm(light)
    consts = (light_n, ambient, bg, checker)

    def frame(qpos, dyn_pos):
        geo = _world_geo(model, qpos, link_pairs, sphere_colors, link_color,
                         link_radius,
                         dyn_body=None if dyn_body < 0 else dyn_body,
                         dyn_pos=None if dyn_body < 0 else dyn_pos,
                         floor=floor)
        img = jax.vmap(lambda rd: _shade(ro, rd, geo, consts))(rds)
        return img.reshape(camera.height, camera.width, 3)

    return jax.vmap(frame)(qpos_traj, dyn_pos_traj)


def render_trajectory(env, qpos_traj, camera: Camera | None = None,
                      style: SceneStyle | None = None, dyn_pos=None,
                      stride: int = 1):
    """Ray-cast an episode's qpos history into (T, H, W, 3) uint8 frames.

    ``env`` is any physics env exposing ``_model`` (the whole zoo);
    ``dyn_pos`` is the per-episode dynamic-body position (e.g. the sampled
    board) for envs with a ``scalar_dyn_body``.
    """
    camera = camera or Camera()
    style = style or SceneStyle()
    model = env._model
    qpos_traj = jnp.asarray(qpos_traj)[::stride]
    link_pairs, sphere_colors, link_color = scene_arrays(model, style)
    dyn_body = getattr(env, "scalar_dyn_body", None)
    if dyn_body is None or dyn_pos is None:
        dyn_body = -1
        dyn_traj = jnp.zeros((qpos_traj.shape[0], 3))
    else:
        dyn_traj = jnp.broadcast_to(jnp.asarray(dyn_pos, jnp.float32),
                                    (qpos_traj.shape[0], 3))
    imgs = _render_traj(
        model, qpos_traj, dyn_traj, jnp.asarray(link_pairs),
        sphere_colors, link_color, camera, style.link_radius,
        jnp.asarray(style.light_dir, jnp.float32), style.ambient,
        jnp.asarray(style.background, jnp.float32), style.checker,
        int(dyn_body), style.floor)
    return np.asarray(jnp.round(imgs * 255).astype(jnp.uint8))


def save_gif_3d(path, env, qpos_traj, camera: Camera | None = None,
                style: SceneStyle | None = None, dyn_pos=None,
                fps: int = 25, stride: int = 1):
    """Render + write an episode GIF; returns the written path."""
    import imageio.v2 as imageio

    frames = render_trajectory(env, qpos_traj, camera=camera, style=style,
                               dyn_pos=dyn_pos, stride=stride)
    path = Path(path)
    imageio.mimsave(path, list(frames), fps=fps, loop=0)
    return path
