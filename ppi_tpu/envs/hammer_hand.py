"""Hammer-a-nail with a grasped FREE hammer — the enriched hammer-v0.

The reference's hammer-v0 has the 26-DoF Adroit hand pick up a free hammer
and drive a nail with it (reference: run_mpc.py:36-48 + the mj_envs
submodule). ``envs.hammer`` preserves the strike/nail mechanics with the
hammer welded to a 4-DoF arm; this module restores the defining mechanic:
the hammer is a *free body* (planar slide-x/slide-z/pitch composition,
``ModelBuilder.add_planar_base``) that must be held through real contact —
a two-finger cradle (palm above the handle, fore/aft fingertips beneath it,
all penalty-friction contacts, as in ``envs.relocate``) — lifted off the
bench, and swung so the head seats the friction-held nail.

Reward keeps the mj_envs hammer-v0 structure (palm-to-tool reach +
head-to-nail approach + insertion progress + seated bonuses) so curves are
comparable with the welded-hammer env.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE, SLIDE

# dof indices
(YAW, SHOULDER, ELBOW, WRIST, FING_F, FING_A,
 HAM_X, HAM_Z, HAM_P, NAIL) = range(10)

N_ACT = 6
NAIL_DEPTH = 0.06
BENCH_Z = 0.60  # table height — the proven grasp workspace of this arm
#                 class (envs.relocate uses the same z=0.60 table)
NAIL_X = 0.82
GRIP_START = (0.44, BENCH_Z + 0.045)  # hammer frame origin at rest. The
#                                       hand grips near the HEAD (palm over
#                                       the fore grip end at x=0.52 — the
#                                       innermost level-wrist hover inside
#                                       the elbow-limit reach annulus): a
#                                       short head moment arm limits impact
#                                       pitch, and the head swell doubles
#                                       as the axial stop on the fore tip
HEAD_LOCAL = (0.24, 0.0, 0.035)       # head centre in the hammer frame

_LOW = (-1.5, -1.2, -2.0, -2.0, -1.2, -0.55)
_HIGH = (1.5, 1.2, 2.0, 2.0, 0.55, 1.2)

# nominal nail-board position and the per-episode board-height span.
# mj_envs hammer-v0 randomizes the board body z each reset (reset_model
# draws it over a ~0.15 m span and the nail target rides it; the target
# position is in the observation for exactly this reason). Here the board
# sits ON the bench, so the sampled offset is upward-only: z = BENCH_Z +
# U(0, BOARD_Z_SPAN) — the legacy scene (board flush with the bench) is
# the span's lower edge.
BOARD_POS = (NAIL_X, 0.0, BENCH_Z)
BOARD_Z_SPAN = 0.15

# Tool-retention workspace for the grip point (world x of the hammer frame
# origin = GRIP_START[0] + q[HAM_X]). The arm's reach annulus at bench
# height is ~0.81 m (0.35 + 0.35 links + 0.20 palm from a base 0.40 m above
# the bench); beyond WS_GRIP_X[1] the grip section is ungraspable and the
# episode is an absorbing failure (the knock-away state of RESULTS.md r3).
WS_GRIP_X = (0.05, 0.80)


def _build_model():
    b = ModelBuilder()
    # --- arm (same class as the door/hammer arm) ---
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, 1.0), mass=2.0, damping=2.0, armature=0.1,
               q_limit=(-1.5, 1.5), limit_k=50.0)
    b.add_body(parent=YAW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=2.0, com=(0.17, 0, 0),
               damping=2.0, armature=0.1, q_limit=(-1.2, 1.2), limit_k=50.0)
    b.add_body(parent=SHOULDER, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=1.5, com=(0.17, 0, 0),
               damping=1.5, armature=0.08, q_limit=(-2.0, 2.0), limit_k=50.0)
    b.add_body(parent=ELBOW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=0.8, com=(0.08, 0, 0),
               damping=1.0, armature=0.05, q_limit=(-2.0, 2.0), limit_k=50.0)
    # --- two-finger cradle: fore/aft fingers hinge about the wrist y-axis,
    # hanging below knuckles offset along the hand's x; closing swings the
    # tips under the handle from both sides (palm above + two tips below =
    # a z/pitch cage; x is held by friction + the PD grip preload) ---
    # knuckle spacing 0.24/0.16 so the CLOSED tips sit palm +/- 0.023:
    # their surface gap (~1 cm) is narrower than the 4 cm handle, which
    # therefore cannot fall through the bottom of the cradle
    b.add_body(parent=WRIST, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.24, 0, 0), mass=0.12, com=(0.0, 0.0, -0.05),
               inertia=np.diag([8e-4, 8e-4, 8e-4]), damping=0.3,
               armature=0.02, q_limit=(_LOW[4], _HIGH[4]), limit_k=30.0)
    b.add_body(parent=WRIST, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.16, 0, 0), mass=0.12, com=(0.0, 0.0, -0.05),
               inertia=np.diag([8e-4, 8e-4, 8e-4]), damping=0.3,
               armature=0.02, q_limit=(_LOW[5], _HIGH[5]), limit_k=30.0)
    # --- free hammer: planar base (slide-x, slide-z) + pitch hinge carrying
    # the real mass; frame origin at the grip point, handle extends +x ---
    base = b.add_planar_base(offset_pos=(GRIP_START[0], 0.0, GRIP_START[1]))
    assert base == HAM_Z  # proxy slides occupy HAM_X, HAM_Z; pitch is HAM_P
    b.add_body(parent=base, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=0.45, com=(0.16, 0.0, 0.01),
               inertia=np.diag([2e-3, 3e-3, 3e-3]), damping=0.02,
               armature=1e-4)
    # --- nail: vertical slide held by dry friction (as envs.hammer); the
    # offset is the NOMINAL board position — per episode the engine
    # overrides it with the sampled state.board via dyn_body ---
    b.add_body(parent=-1, joint_type=SLIDE, axis=(0, 0, -1),
               offset_pos=BOARD_POS, mass=0.4, damping=10.0,
               armature=0.01, friction_loss=16.0,  # static hold 4x the
               # nail weight (gravity cannot seat it; only impacts do) —
               # sized so the 0.45 kg swung hammer seats it in ~15 arcs
               q_limit=(0.0, NAIL_DEPTH + 0.01), limit_k=8e3)

    # geoms
    palm = b.add_sphere(WRIST, (0.20, 0, 0), 0.028)
    tip_f = b.add_sphere(FING_F, (0.0, 0, -0.085), 0.018)
    tip_a = b.add_sphere(FING_A, (0.0, 0, -0.085), 0.018)
    # handle grip section: long enough aft of the grip origin that BOTH
    # closed fingertips (at palm +/- 0.043 along the hand) land under it
    grip_a = b.add_sphere(HAM_P, (-0.10, 0, 0), 0.020)
    grip_b = b.add_sphere(HAM_P, (0.08, 0, 0), 0.020)
    head = b.add_sphere(HAM_P, HEAD_LOCAL, 0.045)
    nail_a = b.add_sphere(NAIL, (0.0, 0, 0.060), 0.018)
    nail_b = b.add_sphere(NAIL, (0.0, 0, 0.020), 0.018)
    bench = b.add_plane(normal=(0.0, 0.0, 1.0), offset=BENCH_Z)

    # grasp contacts: palm + both tips against the handle grip capsule
    b.add_contact_sphere_segment(palm, grip_a, grip_b)
    b.add_contact_sphere_segment(tip_f, grip_a, grip_b)
    b.add_contact_sphere_segment(tip_a, grip_a, grip_b)
    # the head swell catches the fore tip / palm if the handle recoils
    # backward through the grip at impact (axial retention by shape)
    b.add_contact_sphere_sphere(head, tip_f)
    b.add_contact_sphere_sphere(head, palm)
    # strike contact + resting contacts
    b.add_contact_sphere_segment(head, nail_a, nail_b)
    for s in (grip_a, grip_b, head):
        b.add_contact_sphere_plane(s, bench)
    for s in (tip_f, tip_a, palm):
        b.add_contact_sphere_plane(s, bench)
    # stability at h = dt/substeps for the 0.45 kg hammer: k=3e3, c=20 ->
    # omega*h ~ 0.2, c*h/m ~ 0.11 (semi-implicit Euler margins)
    b.contact_stiffness = 3e3
    b.contact_damping = 20.0
    b.friction_mu = 1.5
    b.friction_vel_k = 40.0
    return b.finalize(), palm, (tip_f, tip_a), (grip_a, grip_b), head, \
        (nail_a, nail_b)


class HammerHandState(struct.PyTreeNode):
    physics: PhysicsState
    board: jax.Array  # (3,) sampled nail-board position (z randomized)
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class HammerHand:
    """hammer-v0-class task with a grasped free hammer; actions are PD
    position targets for the 4 arm + 2 finger joints."""

    action_dim: int = N_ACT
    dt: float = 0.02
    substeps: int = 8  # grasp + impact contacts need h = 2.5 ms
    kp: float = 90.0  # stiffest stable gain at h=2.5 ms (110 diverges);
    kd: float = 9.0   # gravity droop of the stretched arm is then ~7 cm,
    #                   which the hover height budgets for
    kp_finger: float = 8.0
    kd_finger: float = 0.6
    engine: str = "soa"  # "tensor" is the fast-compile CPU test engine
    fixed_scene: bool = False  # True: pin the legacy board (flush bench)
    knockaway_penalty: float = 40.0  # grasp-integrity gate: per-step cost
    # per metre the grip point strays outside WS_GRIP_X (the reachable
    # annulus). mj_envs hammer-v0 has the same role's "hammer off the
    # table" penalty; here the absorbing direction is x (planar hammer),
    # and the gate makes knock-away plans expensive BEFORE commitment —
    # a batted hammer accrues ~H x penalty inside the planning window,
    # dominating the few-unit approach gains that made such plans
    # attractive (VERDICT r3 next #2b). 0 restores the r3 reward.

    name = "hammer-v0-hand"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, palm, tips, grips, head, nails = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_palm_geom", palm)
        object.__setattr__(self, "_tip_geoms", tips)
        object.__setattr__(self, "_grip_geoms", grips)
        object.__setattr__(self, "_head_geom", head)
        object.__setattr__(self, "_nail_geoms", nails)
        if self.engine == "soa":
            # pinned to the scalar pipeline: the friction-held grasp
            # makes this the most fp-sensitive task in the zoo — the
            # numerically-equivalent stacked path re-rolls MPC success
            # from ~3/5 to 1/10 seeds (RESULTS.md round-3 engine
            # study), so the certified behavior keeps the certified
            # dynamics path. The sampled board is a runtime input
            # (dyn_body), as in envs.hammer.
            step = make_single_step_soa(model, self.dt, self.substeps,
                                        stacked=False, dyn_body=NAIL)
        else:
            from ppi_tpu.envs.physics import engine as _te

            def step(q, qd, tau, board):
                # pytree model: patch the nail body's joint-origin offset
                # with the traced board position (independent tensor-path
                # counterpart of the SoA dyn_body override)
                mm = model.replace(
                    offset_pos=model.offset_pos.at[NAIL].set(board))
                s = _te.step(mm, PhysicsState(qpos=q, qvel=qd), tau,
                             self.dt, self.substeps)
                return s.qpos, s.qvel
        object.__setattr__(self, "_step_soa", step)
        object.__setattr__(self, "_sites_soa",
                           make_sites_soa(model, dyn_body=NAIL))

    @property
    def action_low(self):
        return jnp.array(_LOW)

    @property
    def action_high(self):
        return jnp.array(_HIGH)

    def sample_board(self, key):
        """Per-episode nail-board position: z = bench + U(0, BOARD_Z_SPAN)
        (mj_envs reset semantics; the board sits on the bench)."""
        if self.fixed_scene:
            return jnp.asarray(BOARD_POS)
        dz = jax.random.uniform(key, (), minval=0.0, maxval=BOARD_Z_SPAN)
        return jnp.asarray(BOARD_POS) + jnp.array([0.0, 0.0, 1.0]) * dz

    def reset(self, key):
        # gripper hovering over the grip point, fingers open; the free
        # hammer rests on the bench (z settles onto the handle-sphere
        # contact, pitch settles head-down slightly)
        qpos = (jnp.zeros(10)
                .at[:N_ACT].set(jnp.array(self._reset_arm))
                .at[HAM_Z].set(-0.025))
        return HammerHandState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(10)),
            board=self.sample_board(key),
            t=jnp.zeros((), jnp.int32))

    # reset arm posture: palm at (0.52, 0.78) — 0.115 m above the handle
    # top, clearing the ~7 cm gravity droop — wrist link level and fingers
    # open WIDE (at their limits, so the descending tips clear the grip
    # section ends; IK'd offline with a wrist-level penalty)
    _reset_arm = (0.0, -0.381, 1.965, -1.583, -1.2, 1.2)

    def _gains(self):
        kp = jnp.array([self.kp] * 4 + [self.kp_finger] * 2)
        kd = jnp.array([self.kd] * 4 + [self.kd_finger] * 2)
        return kp, kd

    def _sites(self, qpos, board=None):
        pts = self._sites_soa(qpos, jnp.asarray(BOARD_POS)
                              if board is None else board)
        palm = pts[self._palm_geom]
        grip = 0.5 * (pts[self._grip_geoms[0]] + pts[self._grip_geoms[1]])
        head = pts[self._head_geom]
        nail = pts[self._nail_geoms[0]]
        return palm, grip, head, nail

    def step(self, state, action):
        target = jnp.clip(action, self.action_low, self.action_high)
        q, qd = state.physics.qpos, state.physics.qvel
        kp, kd = self._gains()
        tau = jnp.zeros(10).at[:N_ACT].set(
            kp * (target - q[:N_ACT]) - kd * qd[:N_ACT])
        qpos, qvel = self._step_soa(q, qd, tau, state.board)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        palm, grip, head, nail = self._sites(qpos, state.board)
        depth = qpos[NAIL]
        reach = jnp.linalg.norm(palm - grip)
        approach = jnp.linalg.norm(head - nail)
        # mj_envs hammer-v0 reward shape: tool reach + head-to-nail
        # approach + insertion progress + seated bonuses + velocity reg
        reward = (-0.5 * reach
                  - 0.3 * approach
                  + 50.0 * depth
                  - 1e-3 * jnp.sum(qvel[:N_ACT] ** 2)
                  + 2.0 * (depth > 0.5 * NAIL_DEPTH)
                  + 10.0 * (depth > 0.95 * NAIL_DEPTH))
        grip_x = GRIP_START[0] + qpos[HAM_X]
        oob = (jnp.maximum(grip_x - WS_GRIP_X[1], 0.0)
               + jnp.maximum(WS_GRIP_X[0] - grip_x, 0.0))
        reward = reward - self.knockaway_penalty * oob
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    # per-episode dynamics constants: the sampled board position overrides
    # the nail body's joint-origin offset inside the megakernel
    scalar_dyn_body = NAIL

    def scalar_dyn_consts(self, state):
        return state.board

    def scalar_torque(self, m, q, qd, act):
        kps = [self.kp] * 4 + [self.kp_finger] * 2
        kds = [self.kd] * 4 + [self.kd_finger] * 2
        tau = []
        for j in range(N_ACT):
            tgt = jnp.clip(act[j], _LOW[j], _HIGH[j])
            tau.append(kps[j] * (tgt - q[j]) - kds[j] * qd[j])
        for j in range(N_ACT, 10):
            tau.append(jnp.zeros_like(q[0]))
        return tuple(tau)

    def scalar_reward(self, m, q, qd):
        from ppi_tpu.envs.physics.engine_soa import fk_soa, geom_point_soa
        rots, poss, _, _ = fk_soa(m, q)

        def pt(g):
            return geom_point_soa(m, rots, poss, g)

        def dist(a, b):
            return jnp.sqrt((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2
                            + (a[2] - b[2]) ** 2 + 1e-12)

        palm = pt(self._palm_geom)
        ga = pt(self._grip_geoms[0])
        gb = pt(self._grip_geoms[1])
        grip = tuple(0.5 * (ga[i] + gb[i]) for i in range(3))
        head = pt(self._head_geom)
        nail = pt(self._nail_geoms[0])
        depth = q[NAIL]
        vel2 = sum(qd[j] * qd[j] for j in range(N_ACT))
        grip_x = GRIP_START[0] + q[HAM_X]
        oob = (jnp.maximum(grip_x - WS_GRIP_X[1], 0.0)
               + jnp.maximum(WS_GRIP_X[0] - grip_x, 0.0))
        return (-0.5 * dist(palm, grip)
                - 0.3 * dist(head, nail)
                + 50.0 * depth
                - 1e-3 * vel2
                + 2.0 * (depth > 0.5 * NAIL_DEPTH)
                + 10.0 * (depth > 0.95 * NAIL_DEPTH)
                - self.knockaway_penalty * oob)

    def observe(self, state):
        # mj_envs hammer-v0 exposes the nail target position because the
        # board height is randomized per episode — the nail site position
        # here already carries the sampled board (FK through state.board)
        q, qd = state.physics.qpos, state.physics.qvel
        palm, grip, head, nail = self._sites(q, state.board)
        return jnp.concatenate([
            q[:N_ACT], qd[:N_ACT], q[NAIL:NAIL + 1], qd[NAIL:NAIL + 1],
            palm, grip, head, nail, palm - grip, head - nail])

    def success(self, state):
        return state.physics.qpos[NAIL] > 0.95 * NAIL_DEPTH

    def lifted(self, state):
        """Hammer held off the bench (the grasp mechanic proof)."""
        return state.physics.qpos[HAM_Z] > 0.03


# ---------------------------------------------------------------------------
# scripted expert (feasibility oracle + render demo)
# ---------------------------------------------------------------------------

def _ik_palm(env, state, target_pt, q_init, iters=500, lr=0.02,
             level_weight=0.05):
    """Gradient IK for the palm over the 4 arm joints (fingers held);
    penalizes wrist-link tilt so the cradle stays level (FK through the
    episode's sampled board)."""
    lo = jnp.array(_LOW)
    hi = jnp.array(_HIGH)
    fing = q_init[4:]

    def obj(qa4):
        qfull = jnp.concatenate([qa4, fing, state.physics.qpos[N_ACT:]])
        p = env._sites_soa(qfull, state.board)[env._palm_geom]
        lvl = (qa4[1] + qa4[2] + qa4[3]) ** 2
        return jnp.sum((p - target_pt) ** 2) + level_weight * lvl

    g = jax.jit(jax.grad(obj))
    qa = q_init[:4]
    for _ in range(iters):
        qa = jnp.clip(qa - lr * g(qa), lo[:4], hi[:4])
    return jnp.concatenate([qa, fing])


def scripted_hammer(env, state0=None, log=None, max_swings=22, frames=None,
                    actions=None):
    """Hand-scripted tool use: descend onto the resting free hammer, cage
    the handle (aft finger first, then the fore finger wedges it against
    the backstop), lift gradually, carry toward the nail, and drive the
    nail with sweeping arc swings until seated.

    This is the feasibility oracle the env tests pin — grasp, transport
    and impact-driven nailing are all mechanically achievable through the
    penalty-contact cradle within actuation limits (the analogue of the
    reference's scripted __main__ smoke tests; ball_in_a_cup.py:664-699).
    """
    lo = jnp.array(_LOW)
    hi = jnp.array(_HIGH)
    state = env.reset(jax.random.key(0)) if state0 is None else state0

    def run_scan(s, tgt, n):
        def body(st, _):
            st, _r = env.step(st, tgt)
            return st, st.physics.qpos
        return jax.lax.scan(body, s, None, length=n)

    run_scan = jax.jit(run_scan, static_argnums=2)

    def run(s, tgt, n):
        s, qh = run_scan(s, tgt, n)
        if frames is not None:
            frames.append(np.asarray(qh))
        if actions is not None:
            # expert-demonstration log: the PD position target held for
            # these n steps (the env's action space) — feeds the offline
            # model-selection pipeline (reference: extract_mavn.py)
            actions.append(np.repeat(
                np.asarray(jnp.clip(tgt, lo, hi))[None], n, axis=0))
        return s

    def servo(s, tgt, rounds=2, n=30):
        cmd = tgt
        for _ in range(rounds):
            s = run(s, jnp.clip(cmd, lo, hi), n)
            cmd = cmd + (tgt - s.physics.qpos[:N_ACT])
        return s, cmd

    def note(msg):
        if log:
            log(msg)

    # settle, then descend the palm onto the handle top
    hold = state.physics.qpos[:N_ACT]
    state = run(state, hold, 50)
    state, cmd = servo(state, jnp.asarray(hold).at[1].add(0.30))
    note(f"descended: ham_z={float(state.physics.qpos[HAM_Z]):.3f}")

    # cage: aft backstop first, then the fore finger
    close_a = cmd.at[5].set(-0.25).at[1].add(0.10)
    state = run(state, jnp.clip(close_a, lo, hi), 30)
    close = close_a.at[4].set(0.25)
    state = run(state, jnp.clip(close, lo, hi), 50)
    note(f"caged: fingers=({float(state.physics.qpos[FING_F]):.2f},"
         f"{float(state.physics.qpos[FING_A]):.2f})")

    # gradual lift
    base = jnp.clip(close, lo, hi)
    for dlt in np.linspace(0.0, -0.5, 12):
        state = run(state, base.at[1].add(float(dlt)), 10)
    lift = base.at[1].add(-0.5)
    state = run(state, lift, 30)
    note(f"lifted: ham_z={float(state.physics.qpos[HAM_Z]):.3f}")

    # carry: IK the palm toward the (sampled) nail in TWO stages — first a
    # high waypoint well above the nail top, then a vertical descent to
    # the strike hover. The lateral leg of a single interpolation drags
    # the hammer head THROUGH a raised nail (board z is sampled; on the
    # key(0) board, dz = 0.14, the head knocked the hammer out of the
    # cradle mid-carry). The hover point is the tuned nominal offset from
    # the board (board + (-0.18, 0, +0.20) = (0.64, 0, 0.80) legacy).
    high = _ik_palm(env, state,
                    state.board + jnp.asarray([-0.18, 0.0, 0.32]),
                    jnp.clip(lift, lo, hi))
    start = jnp.clip(lift, lo, hi)
    for alpha in np.linspace(0.0, 1.0, 18):
        state = run(state, jnp.clip(start + float(alpha) * (high - start),
                                    lo, hi), 6)
    carry = _ik_palm(env, state,
                     state.board + jnp.asarray([-0.18, 0.0, 0.20]),
                     jnp.clip(high, lo, hi))
    for alpha in np.linspace(0.0, 1.0, 12):
        state = run(state, jnp.clip(high + float(alpha) * (carry - high),
                                    lo, hi), 6)
    carry_cmd = carry
    state = run(state, jnp.clip(carry_cmd, lo, hi), 30)
    note(f"carried: nail={float(state.physics.qpos[NAIL]):.4f} "
         f"ham_z={float(state.physics.qpos[HAM_Z]):.3f}")

    # arc swings until the nail seats; on stall the hover is re-IK'd
    # lower by the driven depth so the arc keeps reaching the head of an
    # already-driven nail (verified: seats the nail on the nominal board
    # AND the near-extreme key(0) board, dz = 0.142; MID boards whose
    # nail top sits exactly at the carry head height can still deflect
    # the hammer — the oracle is a nominal-scene feasibility tool, the
    # scene-DISTRIBUTION claim is MPC's, measured by runners.goal_success)
    last_depth = -1.0
    for k in range(max_swings):
        back = carry_cmd.at[1].add(-0.18).at[2].add(0.12)
        state = run(state, jnp.clip(back, lo, hi), 22)
        fwd = carry_cmd.at[1].add(0.40).at[2].add(-0.25)
        state = run(state, jnp.clip(fwd, lo, hi), 16)
        state = run(state, jnp.clip(carry_cmd, lo, hi), 20)
        depth = float(state.physics.qpos[NAIL])
        note(f"swing {k}: nail={depth:.4f}")
        if depth > 0.95 * NAIL_DEPTH:
            break
        if depth <= last_depth + 1e-4:
            carry_cmd = _ik_palm(
                env, state,
                state.board + jnp.asarray([-0.18, 0.0, 0.20 - depth]),
                jnp.clip(carry_cmd, lo, hi))
            note(f"swing {k}: re-hover (depth {depth:.4f})")
        last_depth = depth
    q = state.physics.qpos
    return state, {
        "nail": float(q[NAIL]),
        "success": bool(env.success(state)),
        "hammer_x": float(q[HAM_X]),
    }
