"""Door-opening with a FIVE-digit, 21-actuated-DoF Adroit-class hand.

The reference's door-v0 drives the 28-DoF Adroit hand (4 arm + 24 hand
DoF; reference: run_mpc.py:42 + the mj_envs submodule). The round-2/3
``envs.door_hand`` closed part of the embodiment gap with a three-digit
10-DoF hand; this module closes the rest (VERDICT r3 next #1): the same
4-DoF arm gains a 2-DoF wrist (pronation + deviation) and carries FIVE
digits — four fingers above the handle bar and an opposing thumb below —
each with an abduction (splay) joint ahead of the MCP/PIP flexion chain
(``envs.hand.add_digit3``), the reference Adroit hand's knuckle
structure. 21 actuated DoF, 23 total with the door and latch, running on
the stacked-assembly dynamics path (``engine_stacked`` — its reason to
exist; the pure scalar pipeline's compile time is O(nq^3) and infeasible
at 23 DoF).

Task mechanics, staged reward and success criterion are identical to
``envs.door`` / ``envs.door_hand`` (the mj_envs door-v0 structure: latch
bolt blocks the door until the handle is pressed past the unlock angle,
sprung-shut panel, approach + opening bonuses + velocity penalty), and
the door frame is sampled per episode over the same distribution — so
paddle vs 3-digit vs Adroit-class reward curves are directly comparable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.door_hand import FRAME, FRAME_RANGE
from ppi_tpu.envs.hand import add_digit3
from ppi_tpu.envs.physics import ModelBuilder, PhysicsState
from ppi_tpu.envs.physics.engine import HINGE

# dof indices: 4 arm, 2 wrist, 5 x (ABD, MCP, PIP), door, latch
(YAW, SHOULDER, ELBOW, WRIST, PRON, DEV,
 FF_ABD, FF_MCP, FF_PIP,
 MF_ABD, MF_MCP, MF_PIP,
 RF_ABD, RF_MCP, RF_PIP,
 LF_ABD, LF_MCP, LF_PIP,
 TH_ABD, TH_MCP, TH_PIP,
 DOOR, LATCH) = range(23)

N_ACT = 21  # every arm + wrist + digit joint is position-servoed

_FING = dict(abd=(-0.25, 0.25), mcp=(-0.3, 1.6), pip=(0.0, 1.8))
_THUMB = dict(abd=(-0.5, 0.5), mcp=(-1.6, 0.3), pip=(-1.8, 0.0))

_LOW = ((-1.5, -1.6, -2.3, -2.0, -1.0, -0.6)
        + (_FING["abd"][0], _FING["mcp"][0], _FING["pip"][0]) * 4
        + (_THUMB["abd"][0], _THUMB["mcp"][0], _THUMB["pip"][0]))
_HIGH = ((1.5, 1.6, 2.3, 2.0, 1.0, 0.6)
         + (_FING["abd"][1], _FING["mcp"][1], _FING["pip"][1]) * 4
         + (_THUMB["abd"][1], _THUMB["mcp"][1], _THUMB["pip"][1]))

# finger mounts in the hand (DEV-body) frame: digits point +x, fingers
# splayed across y above the handle plane, thumb centred below
_FINGER_Y = (0.075, 0.025, -0.025, -0.075)


def _build_model():
    b = ModelBuilder()
    # --- arm (as envs.door_hand; the wrist link is light — the hand
    # bodies carry the mass) ---
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0, 0, 1.0), mass=2.0, com=(0.0, 0, 0),
               damping=2.0, armature=0.1, q_limit=(-1.5, 1.5), limit_k=50.0)
    b.add_body(parent=YAW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0, 0, 0), mass=2.0, com=(0.17, 0, 0),
               damping=2.0, armature=0.1, q_limit=(-1.6, 1.6), limit_k=50.0)
    b.add_body(parent=SHOULDER, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=1.5, com=(0.17, 0, 0),
               damping=1.5, armature=0.08, q_limit=(-2.3, 2.3), limit_k=50.0)
    b.add_body(parent=ELBOW, joint_type=HINGE, axis=(0, 1, 0),
               offset_pos=(0.35, 0, 0), mass=0.4, com=(0.05, 0, 0),
               damping=1.0, armature=0.05, q_limit=(-2.0, 2.0), limit_k=50.0)
    # --- 2-DoF wrist: pronation about the forearm axis, then ulnar/radial
    # deviation about z; the deviation body is the palm and carries the
    # hand's mass ---
    b.add_body(parent=WRIST, joint_type=HINGE, axis=(1, 0, 0),
               offset_pos=(0.08, 0, 0), mass=0.05,
               inertia=np.diag([2e-5, 2e-5, 2e-5]), damping=0.5,
               armature=0.02, q_limit=(_LOW[PRON], _HIGH[PRON]),
               limit_k=30.0)
    b.add_body(parent=PRON, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=(0.02, 0, 0), mass=0.35, com=(0.06, 0, 0),
               inertia=np.diag([4e-4, 4e-4, 4e-4]), damping=0.5,
               armature=0.02, q_limit=(_LOW[DEV], _HIGH[DEV]), limit_k=30.0)
    # --- five digits on the deviation (palm) body ---
    for y in _FINGER_Y:
        add_digit3(b, DEV, (0.10, y, 0.03), abd_axis=(0, 0, 1),
                   curl_axis=(0, 1, 0), abd_limits=_FING["abd"],
                   mcp_limits=_FING["mcp"], pip_limits=_FING["pip"])
    add_digit3(b, DEV, (0.06, 0.0, -0.05), abd_axis=(0, 0, 1),
               curl_axis=(0, 1, 0), abd_limits=_THUMB["abd"],
               mcp_limits=_THUMB["mcp"], pip_limits=_THUMB["pip"])
    # --- door + latch (identical to envs.door_hand; the offset is the
    # NOMINAL frame — per episode the engine overrides it with the
    # sampled state.frame via dyn_body) ---
    b.add_body(parent=-1, joint_type=HINGE, axis=(0, 0, 1),
               offset_pos=FRAME, mass=3.0, com=(0.0, -0.25, 0.0),
               inertia=np.diag([0.1, 0.02, 0.1]), damping=2.0, armature=0.0,
               q_limit=(0.0, 1.8), limit_k=200.0)
    b.add_body(parent=DOOR, joint_type=HINGE, axis=(1, 0, 0),
               offset_pos=(-0.05, -0.45, 0.0), mass=0.3,
               com=(0.0, 0.08, 0.0), inertia=np.diag([2e-3, 2e-3, 2e-3]),
               damping=0.8, armature=0.01, spring_k=2.0, spring_ref=0.0,
               q_limit=(-1.6, 0.1), limit_k=30.0)

    # geoms: palm on the deviation body, proximal + tip spheres per digit
    palm = b.add_sphere(DEV, (0.08, 0, 0), 0.04)
    digit_spheres = []
    for mcp, pip in ((FF_MCP, FF_PIP), (MF_MCP, MF_PIP), (RF_MCP, RF_PIP),
                     (LF_MCP, LF_PIP), (TH_MCP, TH_PIP)):
        prox = b.add_sphere(mcp, (0.03, 0, 0), 0.015)
        tip = b.add_sphere(pip, (0.045, 0, 0), 0.013)
        digit_spheres += [prox, tip]
    h_a = b.add_sphere(LATCH, (0.0, 0.02, 0.0), 0.02)
    h_b = b.add_sphere(LATCH, (0.0, 0.16, 0.0), 0.02)
    d_a = b.add_sphere(DOOR, (0.0, -0.1, 0.0), 0.02)
    d_b = b.add_sphere(DOOR, (0.0, -0.5, 0.0), 0.02)

    # multi-point grasp: palm + all ten digit spheres vs the handle bar
    b.add_contact_sphere_segment(palm, h_a, h_b)
    for s in digit_spheres:
        b.add_contact_sphere_segment(s, h_a, h_b)
    # palm and two fingertips vs the door panel edge (sweeping it open)
    b.add_contact_sphere_segment(palm, d_a, d_b)
    b.add_contact_sphere_segment(digit_spheres[3], d_a, d_b)
    b.add_contact_sphere_segment(digit_spheres[9], d_a, d_b)
    b.contact_stiffness = 1e3
    b.contact_damping = 30.0
    b.friction_mu = 1.0
    b.friction_vel_k = 50.0
    return b.finalize(), palm, (h_a, h_b)


class DoorAdroitState(struct.PyTreeNode):
    physics: PhysicsState
    frame: jax.Array  # (3,) sampled door-frame origin (mj_envs door_body_pos)
    t: jax.Array


@dataclasses.dataclass(frozen=True)
class DoorAdroit:
    """door-v0-class task on the five-digit Adroit-class hand; actions are
    PD position targets for the 21 arm + wrist + digit joints."""

    action_dim: int = N_ACT
    dt: float = 0.02
    substeps: int = 4
    kp: float = 60.0
    kd: float = 6.0
    kp_wrist: float = 15.0
    kd_wrist: float = 1.2
    kp_hand: float = 5.0
    kd_hand: float = 0.35
    kp_abd: float = 3.0
    kd_abd: float = 0.3
    latch_unlock_angle: float = -0.6
    bolt_depth: float = 0.03
    seal_force: float = 2.5
    engine: str = "stacked"  # the 23-DoF scene REQUIRES the stacked
    #                          assembly path (scalar compile is O(nq^3));
    #                          "tensor" is the fast-compile CPU test engine
    fixed_scene: bool = False

    name = "door-v0-adroit"

    def __post_init__(self):
        from ppi_tpu.envs.physics.engine_soa import (
            make_single_step_soa, make_sites_soa)
        model, palm, handle = _build_model()
        object.__setattr__(self, "_model", model)
        object.__setattr__(self, "_palm_geom", palm)
        object.__setattr__(self, "_handle_geoms", handle)
        if self.engine == "stacked":
            step = make_single_step_soa(model, self.dt, self.substeps,
                                        stacked=True, dyn_body=DOOR)
        else:
            from ppi_tpu.envs.physics import engine as _te

            def step(q, qd, tau, frame):
                mm = model.replace(
                    offset_pos=model.offset_pos.at[DOOR].set(frame))
                s = _te.step(mm, PhysicsState(qpos=q, qvel=qd), tau,
                             self.dt, self.substeps)
                return s.qpos, s.qvel
        object.__setattr__(self, "_step_soa", step)
        object.__setattr__(self, "_sites_soa",
                           make_sites_soa(model, dyn_body=DOOR))

    @property
    def action_low(self):
        return jnp.array(_LOW)

    @property
    def action_high(self):
        return jnp.array(_HIGH)

    def sample_frame(self, key):
        """Per-episode door-frame origin (envs.door_hand.FRAME_RANGE)."""
        if self.fixed_scene:
            return jnp.asarray(FRAME)
        rng = jnp.asarray(FRAME_RANGE)
        return jnp.asarray(FRAME) + jax.random.uniform(
            key, (3,), minval=-rng, maxval=rng)

    def reset(self, key):
        digits = [0.0, 0.3, 0.4] * 4 + [0.0, -0.3, -0.4]  # curled ajar
        qpos = jnp.array([0.0, 0.6, -0.8, 0.2, 0.0, 0.0]  # arm + wrist
                         + digits
                         + [0.0, 0.0])                    # door, latch
        return DoorAdroitState(
            physics=PhysicsState(qpos=qpos, qvel=jnp.zeros(23)),
            frame=self.sample_frame(key),
            t=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _gains(self):
        digit = [self.kp_abd, self.kp_hand, self.kp_hand] * 5
        digit_d = [self.kd_abd, self.kd_hand, self.kd_hand] * 5
        kp = jnp.array([self.kp] * 4 + [self.kp_wrist] * 2 + digit)
        kd = jnp.array([self.kd] * 4 + [self.kd_wrist] * 2 + digit_d)
        return kp, kd

    def _lock_torque(self, qpos, qvel):
        # seal/strike-pin opening bias near the closed position
        # (envs.door_hand._lock_torque)
        del qvel
        seal = self.seal_force * jax.nn.sigmoid((0.35 - qpos[DOOR]) / 0.1)
        return jnp.zeros(23).at[DOOR].set(seal)

    def _bolt_project(self, q_prev, qpos, qvel):
        """Kinematic bolt constraint (envs.door_hand._bolt_project)."""
        bolted = qpos[LATCH] > self.latch_unlock_angle
        inside = q_prev < self.bolt_depth + 1e-3
        clamp = bolted & inside & (qpos[DOOR] > self.bolt_depth)
        new_q = jnp.where(clamp, self.bolt_depth, qpos[DOOR])
        new_qd = jnp.where(clamp, jnp.minimum(qvel[DOOR], 0.0), qvel[DOOR])
        return qpos.at[DOOR].set(new_q), qvel.at[DOOR].set(new_qd)

    def _sites(self, qpos, frame=None):
        pts = self._sites_soa(qpos, jnp.asarray(FRAME)
                              if frame is None else frame)
        palm = pts[self._palm_geom]
        handle = 0.5 * (pts[self._handle_geoms[0]]
                        + pts[self._handle_geoms[1]])
        return palm, handle

    def step(self, state, action):
        target = jnp.clip(action, self.action_low, self.action_high)
        q, qd = state.physics.qpos, state.physics.qvel
        kp, kd = self._gains()
        tau_act = kp * (target - q[:N_ACT]) - kd * qd[:N_ACT]
        tau = (jnp.zeros(23).at[:N_ACT].set(tau_act)
               + self._lock_torque(q, qd))
        qpos, qvel = self._step_soa(q, qd, tau, state.frame)
        qpos, qvel = self._bolt_project(q[DOOR], qpos, qvel)
        phys = PhysicsState(qpos=qpos, qvel=qvel)

        palm, handle = self._sites(phys.qpos, state.frame)
        door_pos = phys.qpos[DOOR]
        dist = jnp.linalg.norm(palm - handle)
        # identical staged reward to envs.door / envs.door_hand (mj_envs
        # door-v0 structure) so the three embodiments' curves overlay
        reward = (-0.5 * dist
                  + 2.0 * door_pos
                  - 1e-3 * jnp.sum(phys.qvel ** 2)
                  + 2.0 * (door_pos > 0.2)
                  + 8.0 * (door_pos > 1.0)
                  + 10.0 * (door_pos > 1.35))
        return state.replace(physics=phys, t=state.t + 1), reward

    # ---- scalar-SoA kernel contract (pallas_rollout) ------------------
    # Same megakernel contract as envs.door_hand, at 23 DoF: each scalar
    # below becomes one (block,) VPU vector inside the whole-rollout
    # Pallas kernel, which is the latency answer for the canonical
    # 64-sample control step (the XLA lax.scan path pays a fixed
    # per-fusion overhead x hundreds of small ops x substeps x horizon;
    # see studies/adroit_latency.py).
    scalar_dyn_body = DOOR

    def scalar_dyn_consts(self, state):
        return state.frame

    def scalar_torque(self, m, q, qd, act):
        digit = [self.kp_abd, self.kp_hand, self.kp_hand] * 5
        digit_d = [self.kd_abd, self.kd_hand, self.kd_hand] * 5
        kps = [self.kp] * 4 + [self.kp_wrist] * 2 + digit
        kds = [self.kd] * 4 + [self.kd_wrist] * 2 + digit_d
        tau = []
        for j in range(N_ACT):
            tgt = jnp.clip(act[j], _LOW[j], _HIGH[j])
            tau.append(kps[j] * (tgt - q[j]) - kds[j] * qd[j])
        seal = self.seal_force * jax.nn.sigmoid((0.35 - q[DOOR]) / 0.1)
        tau.append(seal)
        tau.append(jnp.zeros_like(q[LATCH]))
        return tuple(tau)

    def scalar_project(self, m, q_prev, q, qd):
        """Per-lane scalar form of ``_bolt_project``; ``q_prev`` is the
        pre-step joint vector (the bolt looks at the pre-step door angle)."""
        del m
        bolted = q[LATCH] > self.latch_unlock_angle
        inside = q_prev[DOOR] < self.bolt_depth + 1e-3
        clamp = bolted & inside & (q[DOOR] > self.bolt_depth)
        q = list(q)
        qd = list(qd)
        q[DOOR] = jnp.where(clamp, self.bolt_depth, q[DOOR])
        qd[DOOR] = jnp.where(clamp, jnp.minimum(qd[DOOR], 0.0), qd[DOOR])
        return tuple(q), tuple(qd)

    def scalar_reward(self, m, q, qd):
        from ppi_tpu.envs.physics.engine_soa import fk_soa, geom_point_soa
        rots, poss, _, _ = fk_soa(m, q)
        palm = geom_point_soa(m, rots, poss, self._palm_geom)
        ha = geom_point_soa(m, rots, poss, self._handle_geoms[0])
        hb = geom_point_soa(m, rots, poss, self._handle_geoms[1])
        dx = palm[0] - 0.5 * (ha[0] + hb[0])
        dy = palm[1] - 0.5 * (ha[1] + hb[1])
        dz = palm[2] - 0.5 * (ha[2] + hb[2])
        dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        door = q[DOOR]
        vel2 = sum(qd[j] * qd[j] for j in range(23))
        return (-0.5 * dist
                + 2.0 * door
                - 1e-3 * vel2
                + 2.0 * (door > 0.2)
                + 8.0 * (door > 1.0)
                + 10.0 * (door > 1.35))

    def observe(self, state):
        palm, handle = self._sites(state.physics.qpos, state.frame)
        q = state.physics.qpos
        return jnp.concatenate([
            q[:N_ACT], state.physics.qvel[:N_ACT],
            q[DOOR:DOOR + 1], q[LATCH:LATCH + 1],
            palm, handle, palm - handle, state.frame,
            jnp.array([1.0 * (q[DOOR] > 1.0)])])

    def success(self, state):
        return state.physics.qpos[DOOR] > 1.35


# ---------------------------------------------------------------------------
# scripted expert (feasibility oracle + render demo)
# ---------------------------------------------------------------------------

def _ik(env, state, target_pt, q_init, iters=300, lr=0.03):
    """Gradient IK for the palm over the 21 actuated joints (the passive
    door/latch frozen; FK through the episode's sampled frame)."""
    lo = jnp.array(_LOW)
    hi = jnp.array(_HIGH)

    def obj(qa):
        q = jnp.concatenate([qa, state.physics.qpos[N_ACT:]])
        return jnp.sum(
            (env._sites_soa(q, state.frame)[env._palm_geom]
             - target_pt) ** 2)

    g = jax.jit(jax.grad(obj))
    q = q_init
    for _ in range(iters):
        q = jnp.clip(q - lr * g(q), lo, hi)
    return q


# digit postures: (ABD, MCP, PIP) x 4 fingers + thumb
_CURL_CLEAR = jnp.array([0.0, 1.4, 1.6] * 4 + [0.0, -1.2, -1.4])


def scripted_open(env, state0=None, log=None, frames=None):
    """Hand-scripted door opening on the Adroit-class hand: servo to a
    pre-press posture above the handle bar (digits curled clear), press
    the latch past the unlock angle with the palm heel, withdraw (the
    seal spring pops the bolt-free door ajar), then sweep the panel open.
    Same strategy as ``door_hand.scripted_open`` — the feasibility oracle
    the env tests pin, and the render-demo trajectory."""
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
        return s

    def servo(s, tgt, rounds=4, n=50):
        cmd = tgt
        for _ in range(rounds):
            s = run(s, jnp.clip(cmd, lo, hi), n)
            cmd = cmd + (tgt - s.physics.qpos[:N_ACT])
        return s, cmd

    def note(msg):
        if log:
            log(msg)

    # 1) pre-press above the handle, digits curled clear
    pts = env._sites_soa(state.physics.qpos, state.frame)
    handle = 0.5 * (pts[env._handle_geoms[0]] + pts[env._handle_geoms[1]])
    pre_pt = handle + jnp.array([0.0, 0.0, 0.075])
    q = _ik(env, state, pre_pt, state.physics.qpos[:N_ACT], iters=1500)
    q = q.at[6:].set(_CURL_CLEAR)
    state, cmd = servo(state, q)
    note(f"pre-press: latch={float(state.physics.qpos[LATCH]):.3f}")

    # 2) press the latch past the unlock angle
    press = cmd
    min_latch = 0.0
    for k in range(40):
        if (float(state.physics.qpos[LATCH]) < env.latch_unlock_angle - 0.02
                or float(state.physics.qpos[DOOR]) > 0.12):
            break
        if k % 4 == 0:
            press = press.at[1].add(0.2)
        state = run(state, jnp.clip(press, lo, hi), 15)
        min_latch = min(min_latch, float(state.physics.qpos[LATCH]))
    note(f"pressed: min latch={min_latch:.3f}")

    # 3) hold while the seal spring pops the door past the bolt, withdraw
    for _ in range(20):
        if float(state.physics.qpos[DOOR]) > 0.15:
            break
        state = run(state, jnp.clip(press, lo, hi), 15)
    state = run(state, jnp.clip(press.at[1].add(-0.8), lo, hi), 200)
    note(f"ajar: door={float(state.physics.qpos[DOOR]):.3f}")

    # 4) withdraw to neutral, then sweep the panel open with the palm
    hinge = state.frame[:2]
    neutral = jnp.concatenate([
        jnp.array([0.0, 0.3, -0.6, 0.3, 0.0, 0.0]), _CURL_CLEAR])
    state, _ = servo(state, neutral, rounds=2, n=60)
    note(f"withdrawn: door={float(state.physics.qpos[DOOR]):.3f}")
    # ~0.04-0.05 rad per sweep pass through the reach annulus: 14 passes
    # cover ajar (~0.95) -> open (>1.45) with margin
    for _ in range(14):
        a = float(state.physics.qpos[DOOR])
        if a > 1.45:
            break
        r = 0.30
        while r > 0.16:
            pt = np.asarray(hinge) + r * np.array([np.sin(a), -np.cos(a)])
            if np.linalg.norm(pt) <= 0.76:
                break
            r -= 0.02
        pt = hinge + r * jnp.array([jnp.sin(a), -jnp.cos(a)])
        tan = jnp.array([jnp.cos(a), jnp.sin(a)])
        behind = jnp.array([pt[0] - 0.07 * tan[0], pt[1] - 0.07 * tan[1],
                            state.frame[2]])
        q = _ik(env, state, behind, neutral, iters=800)
        state, _ = servo(state, q, rounds=3, n=40)
        note(f"sweep: r={r:.2f} door={float(state.physics.qpos[DOOR]):.3f}")
    note(f"final: door={float(state.physics.qpos[DOOR]):.3f}")
    return state, {
        "door": float(state.physics.qpos[DOOR]),
        "success": bool(env.success(state)),
    }
