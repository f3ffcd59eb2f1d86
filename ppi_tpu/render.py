"""Episode rendering to GIF / video.

Counterpart of the reference's video outputs (offscreen MuJoCo rendering to
mp4/gif; reference: run_mpc.py:75-89, utils.py:33-70,
ball_in_a_cup.py:258-267): schematic 2-D renderings of the on-device scenes
drawn with matplotlib and written with imageio — no native video pipeline
required. Each env module contributes a ``draw(ax, qpos, ...)`` closure; the
writer rasterizes frames and assembles the GIF.
"""

from pathlib import Path

import numpy as np


def _fig(xlim, ylim, figsize=(5, 5)):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=figsize)
    ax.set_xlim(*xlim)
    ax.set_ylim(*ylim)
    ax.set_aspect("equal")
    ax.axis("off")
    return fig, ax


def save_gif(path, draw_frame, n_frames: int, xlim=(-1.5, 1.5),
             ylim=(-0.2, 2.2), fps: int = 25, stride: int = 1):
    """Render ``draw_frame(ax, t)`` for t in range(0, n_frames, stride) and
    write a GIF."""
    import imageio.v2 as imageio

    frames = []
    for t in range(0, n_frames, stride):
        fig, ax = _fig(xlim, ylim)
        draw_frame(ax, t)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(buf.copy())
        import matplotlib.pyplot as plt
        plt.close(fig)
    imageio.mimsave(Path(path), frames, fps=fps, loop=0)
    return Path(path)


def save_video(path, draw_frame, n_frames: int, xlim=(-1.5, 1.5),
               ylim=(-0.2, 2.2), fps: int = 25, stride: int = 1):
    """Like ``save_gif`` but streamed through VideoRenderStream (mp4 via
    imageio-ffmpeg when present, else the pure-Python MJPEG AVI muxer) —
    the counterpart of the reference's video outputs (reference:
    utils.py:33-70, run_mpc.py:75-89)."""
    from ppi_tpu.utils.video import VideoRenderStream

    out = None
    with VideoRenderStream(Path(path), fps=fps) as stream:
        for t in range(0, n_frames, stride):
            fig, ax = _fig(xlim, ylim)
            draw_frame(ax, t)
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
            stream.append(buf.copy())
            import matplotlib.pyplot as plt
            plt.close(fig)
        out = stream.path
    return out


def _save(path, draw, n_frames, **kw):
    """Dispatch on suffix: .gif via imageio, anything else through the
    VideoRenderStream backends (.mp4 / .avi)."""
    if Path(path).suffix == ".gif":
        return save_gif(path, draw, n_frames, **kw)
    return save_video(path, draw, n_frames, **kw)


def _chain_xz(frames_fn, qpos):
    """(rot, pos) FK -> [(x, z), ...] joint-origin polyline."""
    rot, pos = frames_fn(qpos)
    pts = np.asarray(pos)
    return pts[:, 0], pts[:, 2]


def render_door(env, qpos_history, path, stride=2, frame=None):
    """Top-down schematic of the door task: arm links, door panel, latch.
    ``frame`` is the episode's sampled door-frame origin (defaults to the
    nominal scene)."""
    qpos_history = np.asarray(qpos_history)
    from ppi_tpu.envs.door import DOOR, FRAME
    from ppi_tpu.envs.physics.engine_soa import make_body_frames_soa
    frames_fn = make_body_frames_soa(env._model, dyn_body=DOOR)
    sites = env._sites_soa
    fr = np.asarray(FRAME if frame is None else frame, np.float32)

    def draw(ax, t):
        q = qpos_history[t]
        rot, pos = frames_fn(q, fr)
        pos = np.asarray(pos)
        # arm in the x-y plane (top-down)
        palm, handle = env._sites(q, fr)
        xs = list(pos[:4, 0]) + [float(palm[0])]
        ys = list(pos[:4, 1]) + [float(palm[1])]
        ax.plot(xs, ys, "o-", lw=3, color="C0")
        ax.plot([float(palm[0])], [float(palm[1])], "o", ms=10, color="C0")
        # door panel: hinge + panel capsule endpoints
        pts = np.asarray(sites(q, fr))
        hinge = pos[4, :2]
        panel_end = pts[4, :2]  # d_b sphere
        ax.plot([hinge[0], panel_end[0]], [hinge[1], panel_end[1]],
                lw=5, color="C1")
        ax.plot(*np.asarray(handle)[:2], "s", ms=8, color="C3")
        ax.set_title(f"door={q[4]:.2f} latch={q[5]:.2f}")

    return _save(path, draw, qpos_history.shape[0], xlim=(-0.3, 1.3),
                    ylim=(-0.9, 0.7), stride=stride)


def render_door_hand(env, qpos_history, path, stride=2, frame=None):
    """Top-down schematic of the hand-embodiment door task: arm links,
    three digits, door panel, handle bar (``envs.door_hand.DoorHand``).
    ``frame`` is the episode's sampled door-frame origin (defaults to the
    nominal scene)."""
    qpos_history = np.asarray(qpos_history)
    from ppi_tpu.envs.door_hand import DOOR, FRAME, LATCH
    from ppi_tpu.envs.physics.engine_soa import make_body_frames_soa
    frames_fn = make_body_frames_soa(env._model, dyn_body=DOOR)
    sites = env._sites_soa
    fr = np.asarray(FRAME if frame is None else frame, np.float32)
    # geom order fixed by _build_model: palm, (prox, tip) x 3 digits,
    # handle a/b, panel a/b
    DIGITS = ((1, 2), (3, 4), (5, 6))
    H_A, H_B, D_B = 7, 8, 10

    def draw(ax, t):
        q = qpos_history[t]
        rot, pos = frames_fn(q, fr)
        pos = np.asarray(pos)
        pts = np.asarray(sites(q, fr))
        palm = pts[env._palm_geom]
        # arm chain (top-down, x-y plane)
        xs = list(pos[:4, 0]) + [float(palm[0])]
        ys = list(pos[:4, 1]) + [float(palm[1])]
        ax.plot(xs, ys, "o-", lw=3, color="C0")
        # digits: palm -> proximal -> tip
        for prox, tip in DIGITS:
            ax.plot([palm[0], pts[prox, 0], pts[tip, 0]],
                    [palm[1], pts[prox, 1], pts[tip, 1]],
                    "o-", lw=1.5, ms=3, color="C2")
        # door panel: hinge to far panel sphere
        hinge = pos[DOOR, :2]
        ax.plot([hinge[0], pts[D_B, 0]], [hinge[1], pts[D_B, 1]],
                lw=5, color="C1")
        # handle bar
        ax.plot([pts[H_A, 0], pts[H_B, 0]], [pts[H_A, 1], pts[H_B, 1]],
                lw=3, color="C3")
        ax.set_title(f"door={q[DOOR]:.2f} latch={q[LATCH]:.2f}")

    return _save(path, draw, qpos_history.shape[0], xlim=(-0.3, 1.3),
                 ylim=(-0.9, 0.7), stride=stride)


def render_hammer_hand(env, qpos_history, path, stride=2, board=None):
    """Side view (x-z) of the grasped-hammer task: arm + fingers, the free
    hammer (handle capsule + head), nail and bench
    (``envs.hammer_hand.HammerHand``). ``board`` is the episode's sampled
    nail-board position (defaults to the nominal scene)."""
    qpos_history = np.asarray(qpos_history)
    from ppi_tpu.envs.hammer_hand import BENCH_Z, BOARD_POS, NAIL
    from ppi_tpu.envs.physics.engine_soa import make_body_frames_soa
    frames_fn = make_body_frames_soa(env._model, dyn_body=NAIL)
    sites = env._sites_soa
    bd = np.asarray(BOARD_POS if board is None else board, np.float32)
    # geom order fixed by _build_model: palm, tip_f, tip_a, grip_a,
    # grip_b, head, nail_a, nail_b
    PALM, TIP_F, TIP_A, GRIP_A, GRIP_B, HEAD = range(6)

    def draw(ax, t):
        q = qpos_history[t]
        rot, pos = frames_fn(q, bd)
        pos = np.asarray(pos)
        pts = np.asarray(sites(q, bd))
        ax.axhline(BENCH_Z, color="k", lw=1)
        # arm chain (bodies 0-3) to the palm
        xs = list(pos[:4, 0]) + [pts[PALM, 0]]
        zs = list(pos[:4, 2]) + [pts[PALM, 2]]
        ax.plot(xs, zs, "o-", lw=3, color="C0", ms=4)
        # fingers: knuckle (body origin) -> tip
        for body, tip in ((4, TIP_F), (5, TIP_A)):
            ax.plot([pos[body, 0], pts[tip, 0]],
                    [pos[body, 2], pts[tip, 2]], "o-", lw=1.5, ms=3,
                    color="C2")
        # hammer: handle from grip_a through head, head as a fat marker
        ax.plot([pts[GRIP_A, 0], pts[HEAD, 0]],
                [pts[GRIP_A, 2], pts[HEAD, 2]], lw=4, color="C1")
        ax.plot([pts[HEAD, 0]], [pts[HEAD, 2]], "s", ms=12, color="C1")
        # nail: a vertical pin on the (sampled) board sinking with depth
        depth = q[NAIL]
        ax.plot([bd[0], bd[0]], [bd[2] - 0.01, bd[2] + 0.06 - depth],
                lw=3, color="C3")
        ax.set_title(f"nail depth={depth:.3f}")

    return _save(path, draw, qpos_history.shape[0], xlim=(-0.2, 1.1),
                 ylim=(0.35, 1.25), stride=stride)


def render_planar(env, qpos_history, path, stride=2, xlim=None):
    """Side view (x-z) of a planar locomotor (cheetah/hopper)."""
    qpos_history = np.asarray(qpos_history)
    from ppi_tpu.envs.physics.engine_soa import make_body_frames_soa
    frames_fn = make_body_frames_soa(env._model)
    x_final = float(qpos_history[-1, 0])
    if xlim is None:
        xlim = (min(-1.0, x_final - 1), max(2.0, x_final + 1))

    def draw(ax, t):
        q = qpos_history[t]
        rot, pos = frames_fn(q)
        pos = np.asarray(pos)
        ax.axhline(0.0, color="k", lw=1)
        # draw each chain from torso through children by parent links
        parents = env._model.parents
        for b in range(len(parents)):
            p = parents[b]
            if p >= 0:
                ax.plot([pos[p, 0], pos[b, 0]], [pos[p, 2], pos[b, 2]],
                        "o-", lw=3, color="C0", ms=4)
        ax.set_title(f"x={q[0]:.2f}")

    return _save(path, draw, qpos_history.shape[0], xlim=xlim,
                    ylim=(-0.2, 2.0), stride=stride)


def render_ball_in_a_cup(sim, qpos_history, particles_history, path,
                         stride=4):
    """Side view (x-z) of the WAM + string + ball + cup."""
    qpos_history = np.asarray(qpos_history)
    particles_history = np.asarray(particles_history)

    def draw(ax, t):
        q = qpos_history[t]
        parts = particles_history[t]
        rot, pos = sim._frames_soa(q)
        pos = np.asarray(pos)
        ax.plot(pos[:, 0], pos[:, 2], "o-", lw=4, color="C0", ms=5)
        bottom, top, up = sim.cup_frame(q)
        bottom, top = np.asarray(bottom), np.asarray(top)
        ax.plot([pos[-1, 0], bottom[0]], [pos[-1, 2], bottom[2]], lw=3,
                color="C0")
        # cup as a U: two wall lines
        side = np.cross(np.asarray(up), [0, 1, 0])[[0, 2]]
        r = 0.0345
        for s in (-1, 1):
            ax.plot([bottom[0] + s * r * side[0], top[0] + s * r * side[0]],
                    [bottom[2] + s * r * side[1], top[2] + s * r * side[1]],
                    lw=2, color="C1")
        ax.plot([bottom[0] - r * side[0], bottom[0] + r * side[0]],
                [bottom[2] - r * side[1], bottom[2] + r * side[1]],
                lw=2, color="C1")
        ax.plot(parts[:, 0], parts[:, 2], "-", lw=1, color="gray")
        ax.plot(parts[-1, 0], parts[-1, 2], "o", ms=8, color="C3")

    return _save(path, draw, qpos_history.shape[0], xlim=(-0.6, 1.0),
                    ylim=(0.6, 2.4), stride=stride)


def trace_bic_trajectory(sim, q0, qs, qds):
    """Run a BiC trajectory recording (qpos, particles) per step — the
    rendering companion to the streaming execute_trajectory."""
    import jax
    import jax.numpy as jnp

    state = sim.reset(q0)

    def stab(s, _):
        s = sim.step(s, q0, jnp.zeros(4))
        return s, (s.arm.qpos, s.particles)

    state, _ = jax.lax.scan(stab, state, None, length=sim.stabilize_steps)

    def traj(s, setpoint):
        s = sim.step(s, setpoint[0], setpoint[1])
        return s, (s.arm.qpos, s.particles)

    state, (q_hist, p_hist) = jax.lax.scan(traj, state, (qs, qds))

    def cool(s, _):
        s = sim.step(s, qs[-1], jnp.zeros(4))
        return s, (s.arm.qpos, s.particles)

    state, (q2, p2) = jax.lax.scan(cool, state, None,
                                   length=sim.cooldown_steps)
    return (jnp.concatenate([q_hist, q2]), jnp.concatenate([p_hist, p2]),
            state)


def render_relocate(env, qpos_history, path, stride=2, target=None):
    """Side view (x-z) of the relocate task: arm, caging fingers, free ball,
    in-air target. ``target`` is the episode's sampled goal (falls back to
    the env's legacy fixed goal)."""
    qpos_history = np.asarray(qpos_history)
    from ppi_tpu.envs.physics.engine_soa import make_body_frames_soa
    from ppi_tpu.envs.relocate import BALL_RADIUS, TABLE_Z
    frames_fn = make_body_frames_soa(env._model)
    sites = env._sites_soa
    target = np.asarray(env.target if target is None else target)

    def draw(ax, t):
        q = qpos_history[t]
        rot, pos = frames_fn(q)
        pos = np.asarray(pos)
        pts = np.asarray(sites(q))
        ax.axhline(TABLE_Z, color="k", lw=1)
        # arm chain (x-z)
        palm = pts[0]
        xs = list(pos[:4, 0]) + [float(palm[0])]
        zs = list(pos[:4, 2]) + [float(palm[2])]
        ax.plot(xs, zs, "o-", lw=3, color="C0", ms=4)
        # fingers: knuckle -> fork tips
        for knuckle, tips in ((4, (1, 2)), (5, (3, 4))):
            for tip in tips:
                ax.plot([pos[knuckle, 0], pts[tip][0]],
                        [pos[knuckle, 2], pts[tip][2]], "-", lw=2,
                        color="C2")
        ball = pts[5]
        circ = np.linspace(0, 2 * np.pi, 24)
        ax.plot(ball[0] + BALL_RADIUS * np.cos(circ),
                ball[2] + BALL_RADIUS * np.sin(circ), color="C3")
        ax.plot(target[0], target[2], "*", ms=14, color="C1")
        dist = np.linalg.norm(ball - target)
        ax.set_title(f"ball-target {dist:.3f} m")

    return _save(path, draw, qpos_history.shape[0], xlim=(-0.2, 1.1),
                 ylim=(0.3, 1.4), stride=stride)


def render_pen(env, qpos_history, path, stride=2, target=None):
    """Top/side two-projection schematic of the pen task: rod, fingertips,
    target orientation ray. ``target`` is the episode's sampled goal axis
    (falls back to the env's legacy fixed axis)."""
    qpos_history = np.asarray(qpos_history)
    from ppi_tpu.envs.pen import HOLD_POS, PEN_HALF
    hold = np.asarray(HOLD_POS)
    tgt = np.asarray(env._target_axis if target is None else target)

    def draw(ax, t):
        q = qpos_history[t]
        pts = np.asarray(env._sites_soa(q))
        ea, eb = pts[0], pts[1]
        tip_a, tip_b = pts[2], pts[3]
        # side view (x-z), centred on the hold point
        ax.plot([ea[0], eb[0]], [ea[2], eb[2]], "-", lw=4, color="C0")
        ax.plot([tip_a[0]], [tip_a[2]], "o", ms=8, color="C2")
        ax.plot([tip_b[0]], [tip_b[2]], "o", ms=8, color="C2")
        ray = np.stack([hold - PEN_HALF * tgt, hold + PEN_HALF * tgt])
        ax.plot(ray[:, 0], ray[:, 2], "--", lw=2, color="C1")
        axis = (ea - eb) / (np.linalg.norm(ea - eb) + 1e-9)
        ax.set_title(f"similarity {float(axis @ tgt):.3f}")

    return _save(path, draw, qpos_history.shape[0],
                 xlim=(hold[0] - 0.2, hold[0] + 0.2),
                 ylim=(hold[2] - 0.2, hold[2] + 0.2), stride=stride)


def render_pen_hand(env, qpos_history, path, stride=2, target=None):
    """Side-view (x-z projection at the hold) schematic of the pen-hand
    task: rod, three articulated digits, target orientation ray
    (``envs.pen_hand.PenHand``). The x-z plane shows the pen's long axis
    and the goal ray; digit curl (a y-z motion about the x hinges) is
    foreshortened in this view."""
    qpos_history = np.asarray(qpos_history)
    from ppi_tpu.envs.pen import HOLD_POS, PEN_HALF
    from ppi_tpu.envs.pen_hand import DIGIT_DROP, THUMB_RISE
    hold = np.asarray(HOLD_POS)
    tgt = np.asarray(env._target_axis if target is None else target)
    from ppi_tpu.envs.physics.engine_soa import make_body_frames_soa
    frames_fn = make_body_frames_soa(env._model)
    sites = env._sites_soa
    # body order: 5 pen dofs, then (mcp, pip) x (A, B, thumb)
    DIGIT_BODIES = ((5, 6), (7, 8), (9, 10))
    MOUNT_Z = [hold[2] - DIGIT_DROP, hold[2] - DIGIT_DROP,
               hold[2] + THUMB_RISE]
    # geom order: end_a, end_b, then (prox, tip) x 3
    DIGIT_GEOMS = ((2, 3), (4, 5), (6, 7))

    def draw(ax, t):
        q = qpos_history[t]
        pts = np.asarray(sites(q))
        ea, eb = pts[0], pts[1]
        # x-z projection: rod + target ray
        ax.plot([ea[0], eb[0]], [ea[2], eb[2]], "-", lw=4, color="C0")
        ray = np.stack([hold - PEN_HALF * tgt, hold + PEN_HALF * tgt])
        ax.plot(ray[:, 0], ray[:, 2], "--", lw=2, color="C1")
        rot, pos = frames_fn(q)
        pos = np.asarray(pos)
        for (mcp, pip), (prox_g, tip_g), mz in zip(
                DIGIT_BODIES, DIGIT_GEOMS, MOUNT_Z):
            mount = pos[mcp]
            ax.plot([mount[0], pts[prox_g, 0], pts[tip_g, 0]],
                    [mount[2], pts[prox_g, 2], pts[tip_g, 2]],
                    "o-", lw=1.5, ms=3, color="C2")
        axis = (ea - eb) / (np.linalg.norm(ea - eb) + 1e-9)
        ax.set_title(f"similarity {float(axis @ tgt):.3f}")

    return _save(path, draw, qpos_history.shape[0],
                 xlim=(hold[0] - 0.22, hold[0] + 0.22),
                 ylim=(hold[2] - 0.22, hold[2] + 0.22), stride=stride)


def render_relocate_hand(env, qpos_history, path, stride=2, target=None):
    """Side view (x-z) of the relocate-hand task: arm, three digits, free
    ball, in-air target (``envs.relocate_hand.RelocateHand``)."""
    qpos_history = np.asarray(qpos_history)
    from ppi_tpu.envs.physics.engine_soa import make_body_frames_soa
    from ppi_tpu.envs.relocate import BALL_RADIUS, TABLE_Z
    frames_fn = make_body_frames_soa(env._model)
    sites = env._sites_soa
    tgt = np.asarray(env.target if target is None else target)
    # geom order: palm, (prox, tip) x 3 digits, ball
    DIGITS = ((1, 2), (3, 4), (5, 6))
    BALL = 7

    def draw(ax, t):
        q = qpos_history[t]
        rot, pos = frames_fn(q)
        pos = np.asarray(pos)
        pts = np.asarray(sites(q))
        ax.axhline(TABLE_Z, color="k", lw=1)
        palm = pts[0]
        xs = list(pos[:4, 0]) + [float(palm[0])]
        zs = list(pos[:4, 2]) + [float(palm[2])]
        ax.plot(xs, zs, "o-", lw=3, color="C0", ms=4)
        for prox, tip in DIGITS:
            ax.plot([palm[0], pts[prox, 0], pts[tip, 0]],
                    [palm[2], pts[prox, 2], pts[tip, 2]],
                    "o-", lw=1.5, ms=3, color="C2")
        ball = pts[BALL]
        circ = np.linspace(0, 2 * np.pi, 24)
        ax.plot(ball[0] + BALL_RADIUS * np.cos(circ),
                ball[2] + BALL_RADIUS * np.sin(circ), color="C3")
        ax.plot(tgt[0], tgt[2], "*", ms=14, color="C1")
        dist = np.linalg.norm(ball - tgt)
        ax.set_title(f"ball-target {dist:.3f} m")

    return _save(path, draw, qpos_history.shape[0], xlim=(-0.2, 1.1),
                 ylim=(0.3, 1.4), stride=stride)
