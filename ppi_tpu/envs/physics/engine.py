"""Generalized-coordinate articulated rigid-body dynamics, TPU-first.

This is the compute core that replaces the MuJoCo C engine behind the
reference's rollouts (reference: mpc/wrappers.py:88-118,
policy_search/ball_in_a_cup.py:374-388). Design choices, deliberately NOT a
port of any C physics architecture:

  * **One DoF per body** (hinge or slide); fixed assemblies are merged at
    build time. Trees up to ~32 DoF — the regime of every target task — so
    per-body work is unrolled Python at trace time and the *batch* axis
    carries the parallelism (`vmap` over 1k+ rollouts).
  * **Mass matrix in closed form** from kinematic-chain Jacobians
    (J_v, J_omega with static ancestor masks): one fused einsum, lands on
    the MXU when batched.
  * **Coriolis via autodiff of the kinetic energy**: the Lagrangian identity
    C(q, qd) qd = d(M qd)/dq · qd - ∂T/∂q is two `jvp`/`grad` calls through
    the same mass-matrix function — no hand-derived Christoffel terms, and
    XLA fuses the shared FK subexpressions.
  * **Penalty (spring-damper) contacts** between sphere geoms, capsule
    segments and planes, with friction-cone clamping; generalized contact
    torques are the `vjp` of the contact-point positions applied to the
    Cartesian forces. Smooth, branchless, stable under vmap — a diverging
    lane only poisons itself.
  * **Semi-implicit Euler** with substeps; joint limits and springs as soft
    torques.
"""

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppi_tpu.envs.physics.rotations import rodrigues

HINGE, SLIDE = 0, 1


class ArticulatedModel(struct.PyTreeNode):
    """Numeric model parameters (a pytree — differentiable / replaceable).

    Static topology lives in ``aux`` fields marked pytree_node=False so a
    model instance is directly hashable into jit caches.
    """

    # per-body arrays (nb = n bodies = n dofs)
    offset_pos: jax.Array      # (nb, 3) joint origin in parent joint frame
    offset_rot: jax.Array      # (nb, 3, 3)
    axis: jax.Array            # (nb, 3) joint axis in own joint frame
    mass: jax.Array            # (nb,)
    com: jax.Array             # (nb, 3) body com in joint frame
    inertia: jax.Array         # (nb, 3, 3) about com, in joint frame
    damping: jax.Array         # (nb,)
    friction_loss: jax.Array   # (nb,) dry (Coulomb) friction force bound
    armature: jax.Array        # (nb,) added rotor inertia on the diagonal
    spring_k: jax.Array        # (nb,) joint spring stiffness
    spring_ref: jax.Array      # (nb,) spring setpoint
    q_limit: jax.Array         # (nb, 2) soft joint limits (lo, hi)
    limit_k: jax.Array         # (nb,)
    # geoms
    sphere_body: jax.Array     # (ns,) body index of each sphere geom
    sphere_pos: jax.Array      # (ns, 3) offset in body joint frame
    sphere_radius: jax.Array   # (ns,)
    plane_normal: jax.Array    # (np_, 3)
    plane_offset: jax.Array    # (np_,) plane: n.x = offset
    # contact pairs
    pair_sphere_plane: jax.Array   # (npp, 2) [sphere_idx, plane_idx]
    pair_sphere_sphere: jax.Array  # (nss, 2) [sphere_i, sphere_j]
    # capsule segments: between two sphere geoms on the same body; a
    # sphere-vs-segment pair tests a sphere against the segment spanned by
    # two (possibly different-body) sphere geom centres
    pair_sphere_segment: jax.Array  # (nsg, 3) [sphere, seg_end_a, seg_end_b]
    gravity: jax.Array         # (3,)
    # contact material
    contact_stiffness: jax.Array   # ()
    contact_damping: jax.Array     # ()
    friction_mu: jax.Array         # ()
    friction_vel_k: jax.Array      # () tangential damping coefficient

    # --- static topology ---
    parents: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    joint_types: Tuple[int, ...] = struct.field(pytree_node=False, default=())

    @property
    def nq(self) -> int:
        return len(self.parents)


class PhysicsState(struct.PyTreeNode):
    qpos: jax.Array
    qvel: jax.Array


# ---------------------------------------------------------------------------
# kinematics
# ---------------------------------------------------------------------------

def fk(model: ArticulatedModel, q: jnp.ndarray):
    """Forward kinematics.

    Returns dict with per-body world quantities: rot (nb,3,3), joint origin
    pos (nb,3), world joint axis (nb,3), world com (nb,3).
    """
    nb = model.nq
    rots, poss, axes = [], [], []
    for b in range(nb):
        parent = model.parents[b]
        if parent < 0:
            r_p, p_p = jnp.eye(3), jnp.zeros(3)
        else:
            r_p, p_p = rots[parent], poss[parent]
        r_joint = r_p @ model.offset_rot[b]
        p_joint = p_p + r_p @ model.offset_pos[b]
        a_world = r_joint @ model.axis[b]
        if model.joint_types[b] == HINGE:
            r_b = r_joint @ rodrigues(model.axis[b], q[b])
            p_b = p_joint
        else:  # SLIDE
            r_b = r_joint
            p_b = p_joint + a_world * q[b]
        rots.append(r_b)
        poss.append(p_b)
        axes.append(a_world)
    rot = jnp.stack(rots)
    pos = jnp.stack(poss)
    axis_w = jnp.stack(axes)
    com_w = pos + jnp.einsum("bij,bj->bi", rot, model.com)
    return {"rot": rot, "pos": pos, "axis": axis_w, "com": com_w}


def _ancestor_mask(parents: Tuple[int, ...]) -> np.ndarray:
    """(nb, nq) mask[b, j] = 1 iff dof j is b itself or an ancestor of b."""
    nb = len(parents)
    mask = np.zeros((nb, nb), dtype=np.float32)
    for b in range(nb):
        j = b
        while j >= 0:
            mask[b, j] = 1.0
            j = parents[j]
    return mask


def body_jacobians(model: ArticulatedModel, kin):
    """Linear/angular Jacobians of every body com: (nb, 3, nq) each."""
    mask = jnp.asarray(_ancestor_mask(model.parents))        # (nb, nq)
    is_hinge = jnp.asarray(
        [1.0 if t == HINGE else 0.0 for t in model.joint_types])
    axis, origin, com = kin["axis"], kin["pos"], kin["com"]
    # hinge column j for body b: a_j x (com_b - o_j); slide column: a_j
    rel = com[:, None, :] - origin[None, :, :]               # (nb, nq, 3)
    hinge_cols = jnp.cross(axis[None, :, :], rel)            # (nb, nq, 3)
    slide_cols = jnp.broadcast_to(axis[None], rel.shape)
    jv = jnp.where(is_hinge[None, :, None] > 0, hinge_cols, slide_cols)
    jv = jv * mask[:, :, None]
    jw = axis[None, :, :] * (is_hinge[None, :, None] * mask[:, :, None])
    # -> (nb, 3, nq)
    return jnp.swapaxes(jv, 1, 2), jnp.swapaxes(jw, 1, 2)


def mass_matrix(model: ArticulatedModel, q: jnp.ndarray) -> jnp.ndarray:
    kin = fk(model, q)
    jv, jw = body_jacobians(model, kin)
    inertia_w = jnp.einsum("bij,bjk,blk->bil", kin["rot"], model.inertia,
                           kin["rot"])
    m = (jnp.einsum("b,bik,bil->kl", model.mass, jv, jv)
         + jnp.einsum("bik,bij,bjl->kl", jw, inertia_w, jw))
    return m + jnp.diag(model.armature)


def gravity_torque(model: ArticulatedModel, kin) -> jnp.ndarray:
    jv, _ = body_jacobians(model, kin)
    # tau_g[j] = sum_b m_b g . Jv_b[:, j]
    return jnp.einsum("b,i,bij->j", model.mass, model.gravity, jv)


# ---------------------------------------------------------------------------
# contacts
# ---------------------------------------------------------------------------

def sphere_positions(model: ArticulatedModel, q: jnp.ndarray) -> jnp.ndarray:
    kin = fk(model, q)
    body = model.sphere_body
    return (kin["pos"][body]
            + jnp.einsum("sij,sj->si", kin["rot"][body], model.sphere_pos))


def _contact_force(delta, rel_vel, normal, model):
    """Spring-damper normal force + friction-cone-clamped tangential force.

    delta: penetration depth (>0 in contact); rel_vel: velocity of the
    contacting point relative to the other surface; normal points away from
    the other surface toward the sphere.
    """
    v_n = jnp.dot(rel_vel, normal)
    fn_mag = jnp.maximum(
        model.contact_stiffness * delta - model.contact_damping * v_n, 0.0)
    fn_mag = jnp.where(delta > 0.0, fn_mag, 0.0)
    v_t = rel_vel - v_n * normal
    vt_norm = jnp.linalg.norm(v_t) + 1e-9
    ft_mag = jnp.minimum(model.friction_vel_k * vt_norm,
                         model.friction_mu * fn_mag)
    return fn_mag * normal - ft_mag * (v_t / vt_norm)


def contact_forces(model: ArticulatedModel, pts: jnp.ndarray,
                   vels: jnp.ndarray) -> jnp.ndarray:
    """Cartesian forces on every sphere geom from all declared pairs.

    pts/vels: (ns, 3). Returns (ns, 3).
    """
    forces = jnp.zeros_like(pts)

    # sphere-plane
    if model.pair_sphere_plane.shape[0] > 0:
        si = model.pair_sphere_plane[:, 0]
        pi = model.pair_sphere_plane[:, 1]
        n = model.plane_normal[pi]
        dist = jnp.einsum("ci,ci->c", pts[si], n) - model.plane_offset[pi]
        delta = model.sphere_radius[si] - dist
        f = jax.vmap(_contact_force, in_axes=(0, 0, 0, None))(
            delta, vels[si], n, model)
        forces = forces.at[si].add(f)

    # sphere-sphere
    if model.pair_sphere_sphere.shape[0] > 0:
        ai = model.pair_sphere_sphere[:, 0]
        bi = model.pair_sphere_sphere[:, 1]
        diff = pts[ai] - pts[bi]
        dist = jnp.linalg.norm(diff, axis=-1) + 1e-9
        n = diff / dist[:, None]
        delta = model.sphere_radius[ai] + model.sphere_radius[bi] - dist
        rel_v = vels[ai] - vels[bi]
        f = jax.vmap(_contact_force, in_axes=(0, 0, 0, None))(
            delta, rel_v, n, model)
        forces = forces.at[ai].add(f)
        forces = forces.at[bi].add(-f)

    # sphere vs capsule segment (segment spanned by two sphere centres)
    if model.pair_sphere_segment.shape[0] > 0:
        si = model.pair_sphere_segment[:, 0]
        ea = model.pair_sphere_segment[:, 1]
        eb = model.pair_sphere_segment[:, 2]
        a, b, p = pts[ea], pts[eb], pts[si]
        ab = b - a
        t = jnp.clip(jnp.einsum("ci,ci->c", p - a, ab)
                     / (jnp.einsum("ci,ci->c", ab, ab) + 1e-9), 0.0, 1.0)
        closest = a + t[:, None] * ab
        diff = p - closest
        dist = jnp.linalg.norm(diff, axis=-1) + 1e-9
        n = diff / dist[:, None]
        seg_r = 0.5 * (model.sphere_radius[ea] + model.sphere_radius[eb])
        delta = model.sphere_radius[si] + seg_r - dist
        v_closest = vels[ea] + t[:, None] * (vels[eb] - vels[ea])
        rel_v = vels[si] - v_closest
        f = jax.vmap(_contact_force, in_axes=(0, 0, 0, None))(
            delta, rel_v, n, model)
        forces = forces.at[si].add(f)
        # reaction split onto segment endpoints by lever ratio
        forces = forces.at[ea].add(-(1.0 - t)[:, None] * f)
        forces = forces.at[eb].add(-t[:, None] * f)

    return forces


def contact_torque(model: ArticulatedModel, q, qd) -> jnp.ndarray:
    """Generalized contact torque: vjp of geom positions applied to the
    Cartesian contact forces."""
    if model.sphere_body.shape[0] == 0:
        return jnp.zeros_like(q)
    pts, vjp_fn = jax.vjp(lambda qq: sphere_positions(model, qq), q)
    _, vels = jax.jvp(lambda qq: sphere_positions(model, qq), (q,), (qd,))
    forces = contact_forces(model, pts, vels)
    return vjp_fn(forces)[0]


# ---------------------------------------------------------------------------
# dynamics + integration
# ---------------------------------------------------------------------------

def solve_pd_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve a x = b for small positive-definite a via unrolled Gauss-Jordan
    elimination (no pivoting — safe for PD mass matrices whose diagonals the
    armature keeps healthy).

    XLA's batched LU is pathologically slow for tiny matrices on TPU (the
    6x6 solve measured ~68% of a whole physics step); this unrolls to ~5
    fused elementwise ops per column on (..., n, n+1) arrays.
    """
    n = a.shape[-1]
    aug = jnp.concatenate([a, b[..., None]], axis=-1)
    idx = jnp.arange(n)
    for k in range(n):
        row_k = aug[..., k, :] / aug[..., k, k:k + 1]
        factors = aug[..., :, k] * (idx != k)
        aug = aug - factors[..., None] * row_k[..., None, :]
        aug = aug.at[..., k, :].set(row_k)
    return aug[..., :, n]


def bias_torque(model: ArticulatedModel, q, qd) -> jnp.ndarray:
    """Coriolis/centrifugal generalized force C(q, qd) qd via the Lagrangian
    identity — two autodiff passes through mass_matrix."""
    mdotqd = jax.jvp(lambda qq: mass_matrix(model, qq) @ qd, (q,), (qd,))[1]
    dt_dq = jax.grad(lambda qq: 0.5 * qd @ mass_matrix(model, qq) @ qd)(q)
    return mdotqd - dt_dq


def passive_torque(model: ArticulatedModel, q, qd) -> jnp.ndarray:
    """Damping, joint springs and soft limit torques. Dry (Coulomb)
    friction is NOT a torque here: it is applied as a velocity-level impulse
    clamp in the integrator (exact stiction, unconditionally stable — a
    smooth tanh force chatters under explicit integration)."""
    tau = -model.damping * qd
    tau = tau - model.spring_k * (q - model.spring_ref)
    lo, hi = model.q_limit[:, 0], model.q_limit[:, 1]
    tau = tau - model.limit_k * (jnp.maximum(q - hi, 0.0)
                                 + jnp.minimum(q - lo, 0.0))
    return tau


def _position_quantities(model: ArticulatedModel, q):
    """Everything position-dependent in one function, so the full dynamics
    needs exactly one jvp (velocities + Mdot) and one vjp (all generalized
    forces) through the shared FK subgraph — XLA CSEs the primal between
    them. This replaces 6+ independent FK/autodiff evaluations per step with
    ~3 FK-equivalents (the single biggest step-rate lever on TPU, where the
    rollout cost is op-count-bound)."""
    kin = fk(model, q)
    jv, jw = body_jacobians(model, kin)
    inertia_w = jnp.einsum("bij,bjk,blk->bil", kin["rot"], model.inertia,
                           kin["rot"])
    m = (jnp.einsum("b,bik,bil->kl", model.mass, jv, jv)
         + jnp.einsum("bik,bij,bjl->kl", jw, inertia_w, jw)
         + jnp.diag(model.armature))
    body = model.sphere_body
    if body.shape[0] > 0:
        pts = (kin["pos"][body]
               + jnp.einsum("sij,sj->si", kin["rot"][body], model.sphere_pos))
    else:
        pts = jnp.zeros((0, 3))
    return m, pts, kin["com"]


def forward_dynamics(model: ArticulatedModel, q, qd, tau) -> jnp.ndarray:
    """M(q) qdd = tau + tau_passive + tau_contact + tau_gravity
                  - Mdot qd + dT/dq.

    The Coriolis term uses the Lagrangian identity C(q,qd) qd =
    Mdot qd - dT/dq; dT/dq is the vjp of M with cotangent 0.5 qd qd^T,
    gravity is the vjp of the body coms with cotangent m_b g, and the
    contact torque is the vjp of the geom points with the Cartesian contact
    forces — one combined reverse pass."""
    fn = lambda qq: _position_quantities(model, qq)
    (m, pts, coms), vjp_fn = jax.vjp(fn, q)
    _, (m_dot, pts_dot, _) = jax.jvp(fn, (q,), (qd,))

    if pts.shape[0] > 0:
        forces = contact_forces(model, pts, pts_dot)
    else:
        forces = pts
    cot_m = 0.5 * jnp.outer(qd, qd)                       # -> dT/dq
    cot_coms = model.mass[:, None] * model.gravity[None, :]  # -> -dV/dq
    (tau_q,) = vjp_fn((cot_m, forces, cot_coms))
    rhs = tau + passive_torque(model, q, qd) + tau_q - m_dot @ qd
    return solve_pd_small(m, rhs)


def step(model: ArticulatedModel, state: PhysicsState, tau,
         dt: float, substeps: int = 1) -> PhysicsState:
    """Semi-implicit Euler with substeps; one control torque held across the
    substeps (the reference's nsubsteps convention; reference:
    ball_in_a_cup.py:178-184)."""
    h = dt / substeps
    has_friction = bool(np.any(np.asarray(model.friction_loss) > 0.0))

    def sub(state, _):
        qdd = forward_dynamics(model, state.qpos, state.qvel, tau)
        qvel = state.qvel + h * qdd
        if has_friction:
            # velocity-level Coulomb friction (MuJoCo frictionloss
            # analogue): remove up to loss*h/M_jj of velocity per substep;
            # |qvel| below the cap sticks at exactly zero.
            mdiag = jnp.diagonal(mass_matrix(model, state.qpos))
            cap = model.friction_loss * h / mdiag
            qvel = qvel - jnp.clip(qvel, -cap, cap)
        qpos = state.qpos + h * qvel
        return PhysicsState(qpos=qpos, qvel=qvel), None

    state, _ = jax.lax.scan(sub, state, None, length=substeps)
    return state


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class ModelBuilder:
    """Imperative scene construction -> immutable ArticulatedModel."""

    def __post_init__(self):
        self._bodies = []
        self._spheres = []
        self._planes = []
        self._sp_pairs = []
        self._ss_pairs = []
        self._sseg_pairs = []
        self.gravity = (0.0, 0.0, -9.81)
        self.contact_stiffness = 1e4
        self.contact_damping = 30.0
        self.friction_mu = 1.0
        self.friction_vel_k = 30.0

    def add_body(self, parent: int, joint_type: int, axis, offset_pos,
                 offset_rot=None, mass=1.0, com=(0.0, 0.0, 0.0),
                 inertia=None, damping=0.1, armature=0.01, spring_k=0.0,
                 spring_ref=0.0, q_limit=(-1e6, 1e6), limit_k=0.0,
                 friction_loss=0.0) -> int:
        if offset_rot is None:
            offset_rot = np.eye(3)
        if inertia is None:
            inertia = 0.05 * mass * np.eye(3)
        self._bodies.append(dict(
            parent=parent, joint_type=joint_type,
            axis=np.asarray(axis, np.float32),
            offset_pos=np.asarray(offset_pos, np.float32),
            offset_rot=np.asarray(offset_rot, np.float32),
            mass=float(mass), com=np.asarray(com, np.float32),
            inertia=np.asarray(inertia, np.float32),
            damping=float(damping), friction_loss=float(friction_loss),
            armature=float(armature),
            spring_k=float(spring_k), spring_ref=float(spring_ref),
            q_limit=np.asarray(q_limit, np.float32),
            limit_k=float(limit_k)))
        return len(self._bodies) - 1

    def add_planar_base(self, offset_pos, mass=1e-3, axis_forward=(1, 0, 0),
                        axis_up=(0, 0, 1), axis_pitch=(0, 1, 0)) -> int:
        """Compose a planar free base (slide-forward, slide-up, pitch hinge)
        and return the hinge body id — the body real mass/geometry should be
        attached to. The two proxy slide bodies get negligible mass."""
        x = self.add_body(parent=-1, joint_type=SLIDE, axis=axis_forward,
                          offset_pos=offset_pos, mass=mass, damping=0.0,
                          armature=1e-4)
        z = self.add_body(parent=x, joint_type=SLIDE, axis=axis_up,
                          offset_pos=(0, 0, 0), mass=mass, damping=0.0,
                          armature=1e-4)
        return z  # caller adds the pitch hinge with real inertia as child

    def add_free_body_chain(self, offset_pos, mass=1e-3) -> int:
        """Compose a full 6-DoF free body as a 3-slide + 3-hinge chain and
        return the final body id (carrying the real mass/inertia when the
        caller re-specifies it as children). Proxy links are near-massless."""
        b = self.add_body(parent=-1, joint_type=SLIDE, axis=(1, 0, 0),
                          offset_pos=offset_pos, mass=mass, armature=1e-4,
                          damping=0.0)
        b = self.add_body(parent=b, joint_type=SLIDE, axis=(0, 1, 0),
                          offset_pos=(0, 0, 0), mass=mass, armature=1e-4,
                          damping=0.0)
        b = self.add_body(parent=b, joint_type=SLIDE, axis=(0, 0, 1),
                          offset_pos=(0, 0, 0), mass=mass, armature=1e-4,
                          damping=0.0)
        b = self.add_body(parent=b, joint_type=HINGE, axis=(1, 0, 0),
                          offset_pos=(0, 0, 0), mass=mass, armature=1e-4,
                          damping=0.0)
        b = self.add_body(parent=b, joint_type=HINGE, axis=(0, 1, 0),
                          offset_pos=(0, 0, 0), mass=mass, armature=1e-4,
                          damping=0.0)
        return b  # caller adds the final z-hinge with the real inertia

    def add_sphere(self, body: int, pos, radius: float) -> int:
        self._spheres.append((body, np.asarray(pos, np.float32),
                              float(radius)))
        return len(self._spheres) - 1

    def add_plane(self, normal=(0.0, 0.0, 1.0), offset=0.0) -> int:
        self._planes.append((np.asarray(normal, np.float32), float(offset)))
        return len(self._planes) - 1

    def add_contact_sphere_plane(self, sphere: int, plane: int):
        self._sp_pairs.append((sphere, plane))

    def add_contact_sphere_sphere(self, a: int, b: int):
        self._ss_pairs.append((a, b))

    def add_contact_sphere_segment(self, sphere: int, end_a: int, end_b: int):
        self._sseg_pairs.append((sphere, end_a, end_b))

    def finalize(self) -> ArticulatedModel:
        nb = len(self._bodies)
        get = lambda k: np.stack([np.asarray(b[k], np.float32)
                                  for b in self._bodies])
        spheres = self._spheres or []
        as_i = lambda rows, w: (np.asarray(rows, np.int32).reshape(-1, w)
                                if rows else np.zeros((0, w), np.int32))
        return ArticulatedModel(
            offset_pos=jnp.asarray(get("offset_pos")),
            offset_rot=jnp.asarray(get("offset_rot")),
            axis=jnp.asarray(get("axis")),
            mass=jnp.asarray(get("mass")),
            com=jnp.asarray(get("com")),
            inertia=jnp.asarray(get("inertia")),
            damping=jnp.asarray(get("damping")),
            friction_loss=jnp.asarray(get("friction_loss")),
            armature=jnp.asarray(get("armature")),
            spring_k=jnp.asarray(get("spring_k")),
            spring_ref=jnp.asarray(get("spring_ref")),
            q_limit=jnp.asarray(get("q_limit")),
            limit_k=jnp.asarray(get("limit_k")),
            sphere_body=jnp.asarray(
                np.asarray([s[0] for s in spheres], np.int32)),
            sphere_pos=jnp.asarray(
                np.stack([s[1] for s in spheres])
                if spheres else np.zeros((0, 3), np.float32)),
            sphere_radius=jnp.asarray(
                np.asarray([s[2] for s in spheres], np.float32)),
            plane_normal=jnp.asarray(
                np.stack([p[0] for p in self._planes])
                if self._planes else np.zeros((0, 3), np.float32)),
            plane_offset=jnp.asarray(
                np.asarray([p[1] for p in self._planes], np.float32)),
            pair_sphere_plane=jnp.asarray(as_i(self._sp_pairs, 2)),
            pair_sphere_sphere=jnp.asarray(as_i(self._ss_pairs, 2)),
            pair_sphere_segment=jnp.asarray(as_i(self._sseg_pairs, 3)),
            gravity=jnp.asarray(self.gravity, jnp.float32),
            contact_stiffness=jnp.asarray(self.contact_stiffness, jnp.float32),
            contact_damping=jnp.asarray(self.contact_damping, jnp.float32),
            friction_mu=jnp.asarray(self.friction_mu, jnp.float32),
            friction_vel_k=jnp.asarray(self.friction_vel_k, jnp.float32),
            parents=tuple(b["parent"] for b in self._bodies),
            joint_types=tuple(b["joint_type"] for b in self._bodies),
        )
