"""Stacked-assembly variant of the scalar-SoA dynamics — the compile-time
AND runtime fast path for high-DoF scenes.

The pure scalar-SoA pipeline (``engine_soa``) emits O(nq^2)-O(nq^3)
*individual scalar HLO ops* for the Jacobian / mass-matrix / rhs / linear
-solve assemblies (~15-20k ops per substep at 12-13 DoF).  XLA's pass
pipeline is superlinear in graph size, which is why the hand-scene graphs
compile in minutes on TPU and ~18 min on CPU (README known gap; measured
r2).  This module keeps the same dynamics but assembles everything in
stacked-array form:

  * forward kinematics + velocity/acceleration recursions run
    LEVEL-SYNCHRONOUSLY over the kinematic tree: all bodies at one tree
    depth advance in a single batched (k, 3, 3) op, so the sequential
    program length is the tree DEPTH (~9 for the Adroit-class hands),
    not the DoF count (23+) — r4 redesign; the first stacked engine kept
    the O(nq)-sequential scalar recursions and spent ~half its substep
    latency on them;
  * Jacobians: one broadcasted ``cross`` + ``where`` over a static
    (nq, nq) ancestor mask instead of nq^2 scalar crosses;
  * mass matrix: two einsums (translational + rotational) over the
    stacked Jacobians instead of the ancestor-sparse scalar double loop;
  * bias/contact generalized forces: einsums against stacked wrenches;
  * contact pairs: index-array gathers + one vectorized force law per
    pair type + scatter-adds, instead of per-pair scalar blocks;
  * linear solve: one batched Cholesky + triangular solve (the mass
    matrix is PD) instead of nq sequential Gauss-Jordan pivots.

Per-substep graph size drops from ~15k scalar ops to ~200 stacked ops, at
the cost of computing the structurally-zero Jacobian entries (the masks
make them exact zeros; the extra FLOPs are noise at nq <= 32 on a VPU
lane).  Numerics are cross-validated against ``engine_soa`` and the
tensor oracle in tests/test_physics.py (1e-4/1e-3 trajectory agreement —
the assemblies reorder f32 reductions, so bitwise equality is not the
contract; fp-knife-edge envs pin ``stacked=False`` for exactly this
reason, see envs/hammer_hand.py).

``engine_soa.make_single_step_soa`` dispatches here for nq >= 10 (where
the compile-time blowup bites); the Pallas megakernel keeps the pure
scalar form — Mosaic wants elementwise tuple programs, and its compile
times were never the problem (RESULTS.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.envs.physics.engine import HINGE, ArticulatedModel
from ppi_tpu.envs.physics.engine_soa import SoaModel


def _skew(v):
    return np.array([[0.0, -v[2], v[1]],
                     [v[2], 0.0, -v[0]],
                     [-v[1], v[0], 0.0]], np.float32)


class _StackedConsts:
    """Host-side static arrays shared by every trace of one model."""

    def __init__(self, m: SoaModel):
        nq = m.nq
        self.nq = nq
        anc = np.zeros((nq, nq), np.float32)
        for b in range(nq):
            for j in m.ancestors[b]:
                anc[b, j] = 1.0
        self.anc = anc                                    # (body, joint)
        self.hinge = np.array([t == HINGE for t in m.joint_types])
        self.hinge_f = self.hinge.astype(np.float32)
        self.mass_b = np.array(m.mass, np.float32)
        self.inertia = np.array([np.reshape(i, (3, 3)) for i in m.inertia],
                                np.float32)
        self.armature = np.array(m.armature, np.float32)
        self.damping = np.array(m.damping, np.float32)
        self.spring_k = np.array(m.spring_k, np.float32)
        self.spring_ref = np.array(m.spring_ref, np.float32)
        self.limit_k = np.array(m.limit_k, np.float32)
        self.q_lo = np.array([l for l, _ in m.q_limit], np.float32)
        self.q_hi = np.array([h for _, h in m.q_limit], np.float32)
        self.friction_loss = np.array(m.friction_loss, np.float32)
        self.gravity = np.array(m.gravity, np.float32)
        # kinematic-tree structure for the level-synchronous passes
        self.parents = np.array(m.parents, np.int32)
        self.offset_pos = np.array(m.offset_pos, np.float32)      # (nq, 3)
        self.offset_rot = np.array(
            [np.reshape(r, (3, 3)) for r in m.offset_rot], np.float32)
        self.axis = np.array(m.axis, np.float32)                  # (nq, 3)
        self.com = np.array(m.com, np.float32)                    # (nq, 3)
        K = np.stack([_skew(a) for a in self.axis])
        self.K = K                                                # (nq,3,3)
        self.K2 = np.einsum("nij,njk->nik", K, K)
        depth = np.zeros(nq, np.int32)
        for b in range(nq):
            depth[b] = 0 if m.parents[b] < 0 else depth[m.parents[b]] + 1
        self.levels = [np.nonzero(depth == d)[0].astype(np.int32)
                       for d in range(int(depth.max()) + 1)]
        # for the fused scatter-free sweep (_fk_vel_stacked): a body's
        # parent always sits exactly one level up, so parent lookups can
        # index the PREVIOUS level's compact output array instead of a
        # scattered (nq, ...) one. perm_inv undoes the level-order concat.
        self.level_parent_pos = [np.zeros(0, np.int32)]
        for d in range(1, len(self.levels)):
            prev = {int(b): i for i, b in enumerate(self.levels[d - 1])}
            self.level_parent_pos.append(np.array(
                [prev[int(m.parents[b])] for b in self.levels[d]],
                np.int32))
        self.perm_inv = np.argsort(
            np.concatenate(self.levels)).astype(np.int32)
        # spheres
        self.sphere_body = np.array(m.sphere_body, np.int32)
        self.sphere_pos = np.array(m.sphere_pos, np.float32).reshape(-1, 3)
        self.sphere_radius = np.array(m.sphere_radius, np.float32)
        self.anc_sphere = anc[self.sphere_body] if len(m.sphere_body) \
            else np.zeros((0, nq), np.float32)            # (sphere, joint)
        # contact pairs as index arrays
        self.sp = np.array(m.pair_sphere_plane, np.int32).reshape(-1, 2)
        self.ss = np.array(m.pair_sphere_sphere, np.int32).reshape(-1, 2)
        self.sseg = np.array(m.pair_sphere_segment, np.int32).reshape(-1, 3)
        self.plane_normal = np.array(m.plane_normal, np.float32).reshape(-1, 3)
        self.plane_offset = np.array(m.plane_offset, np.float32)


def _contact_force_stacked(m: SoaModel, delta, rel_vel, normal):
    """Vectorized penalty + regularized Coulomb force law; (k, 3) arrays.
    Identical math to engine_soa._contact_force_soa."""
    v_n = jnp.sum(rel_vel * normal, axis=-1, keepdims=True)
    fn = jnp.maximum(m.contact_stiffness * delta - m.contact_damping * v_n,
                     0.0)
    fn = jnp.where(delta > 0.0, fn, 0.0)
    v_t = rel_vel - v_n * normal
    vt_norm = jnp.sqrt(jnp.sum(v_t * v_t, axis=-1, keepdims=True)) + 1e-9
    ft = jnp.minimum(m.friction_vel_k * vt_norm, m.friction_mu * fn)
    return fn * normal - (ft / vt_norm) * v_t


def _fk_stacked(c: _StackedConsts, q, off_pos):
    """Level-synchronous forward kinematics.

    Each level advances ALL bodies at that tree depth with a handful of
    batched (k, 3, 3) ops, so the sequential chain is the tree depth.
    Same math as engine_soa.fk_soa (joint rotation via Rodrigues about the
    LOCAL axis, world axis through the pre-rotation joint frame)."""
    nq = c.nq
    eye = jnp.eye(3, dtype=jnp.float32)
    R = jnp.zeros((nq, 3, 3), jnp.float32)
    P = jnp.zeros((nq, 3), jnp.float32)
    A = jnp.zeros((nq, 3), jnp.float32)
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    for li, idx in enumerate(c.levels):
        k = len(idx)
        if li == 0:
            Rp = jnp.broadcast_to(eye, (k, 3, 3))
            Pp = jnp.zeros((k, 3), jnp.float32)
        else:
            par = c.parents[idx]
            Rp, Pp = R[par], P[par]
        Rj = Rp @ jnp.asarray(c.offset_rot[idx])
        Pj = Pp + jnp.einsum("kij,kj->ki", Rp, off_pos[idx])
        Aw = jnp.einsum("kij,kj->ki", Rj, jnp.asarray(c.axis[idx]))
        hf = c.hinge_f[idx]
        rod = (eye
               + sin_q[idx][:, None, None] * jnp.asarray(c.K[idx])
               + (1.0 - cos_q[idx])[:, None, None] * jnp.asarray(c.K2[idx]))
        rod = jnp.where(hf[:, None, None] > 0, rod, eye)  # slide: no spin
        Rb = Rj @ rod
        Pb = Pj + ((1.0 - hf) * q[idx])[:, None] * Aw
        R = R.at[idx].set(Rb)
        P = P.at[idx].set(Pb)
        A = A.at[idx].set(Aw)
    C = P + jnp.einsum("nij,nj->ni", R, jnp.asarray(c.com))
    return R, P, A, C


def _velocity_stacked(c: _StackedConsts, qd, P, A, C):
    """Level-synchronous velocity/acceleration recursion with qdd = 0 —
    the velocity-product (Coriolis/centrifugal) terms, identical math to
    engine_soa.velocity_kinematics_soa, batched per tree level."""
    nq = c.nq
    W = jnp.zeros((nq, 3), jnp.float32)
    Vo = jnp.zeros((nq, 3), jnp.float32)
    Al = jnp.zeros((nq, 3), jnp.float32)
    Ao = jnp.zeros((nq, 3), jnp.float32)
    for li, idx in enumerate(c.levels):
        k = len(idx)
        if li == 0:
            Wp = Vop = Alp = Aop = Pp = jnp.zeros((k, 3), jnp.float32)
        else:
            par = c.parents[idx]
            Wp, Vop, Alp, Aop, Pp = W[par], Vo[par], Al[par], Ao[par], P[par]
        rel = P[idx] - Pp
        a = A[idx]
        qdl = qd[idx][:, None]
        hf = c.hinge_f[idx][:, None]
        wXa = jnp.cross(Wp, a)
        w = Wp + hf * qdl * a
        vo = Vop + jnp.cross(Wp, rel) + (1.0 - hf) * qdl * a
        al = Alp + hf * qdl * wXa
        ao = (Aop + jnp.cross(Alp, rel) + jnp.cross(Wp, vo - Vop)
              + (1.0 - hf) * qdl * wXa)
        W = W.at[idx].set(w)
        Vo = Vo.at[idx].set(vo)
        Al = Al.at[idx].set(al)
        Ao = Ao.at[idx].set(ao)
    c_rel = C - P
    Vc = Vo + jnp.cross(W, c_rel)
    Ac = Ao + jnp.cross(Al, c_rel) + jnp.cross(W, Vc - Vo)
    return W, Vo, Al, Ac


def _fk_vel_stacked(c: _StackedConsts, q, qd, off_pos):
    """FK + velocity recursion fused into ONE scatter-free level sweep.

    Same math as ``_fk_stacked`` followed by ``_velocity_stacked``, but
    (a) both recursions advance together — the velocity terms at level d
    only need level-d FK outputs, so fusing halves the sequential chain
    (tree-depth iterations instead of 2x tree depth), and (b) per-level
    results live in compact per-level arrays with parent lookups into the
    previous level (``level_parent_pos``) instead of `.at[idx].set`
    scatters into (nq, ...) arrays — one static permutation gather at the
    end replaces ~8 scatters per level. Measured on v5e at nq=23/N=64
    this is the difference between a 0.26 ms and a sub-0.2 ms substep
    (studies/adroit_substep_breakdown.py).

    Returns (R, P, A, C, W, Vo, Al, Ac) exactly as the two-pass path.
    """
    eye = jnp.eye(3, dtype=jnp.float32)
    sin_q, cos_q = jnp.sin(q), jnp.cos(q)
    outs = []  # per level: (Rb, Pb, Aw, w, vo, al, ao)
    for li, idx in enumerate(c.levels):
        k = len(idx)
        if li == 0:
            Rp = jnp.broadcast_to(eye, (k, 3, 3))
            Pp = jnp.zeros((k, 3), jnp.float32)
            Wp = Vop = Alp = Aop = jnp.zeros((k, 3), jnp.float32)
        else:
            pp = c.level_parent_pos[li]
            prev = outs[li - 1]
            Rp, Pp = prev[0][pp], prev[1][pp]
            Wp, Vop, Alp, Aop = (prev[3][pp], prev[4][pp],
                                 prev[5][pp], prev[6][pp])
        # --- FK (as _fk_stacked) ---
        Rj = Rp @ jnp.asarray(c.offset_rot[idx])
        Pj = Pp + jnp.einsum("kij,kj->ki", Rp, off_pos[idx])
        Aw = jnp.einsum("kij,kj->ki", Rj, jnp.asarray(c.axis[idx]))
        hf = c.hinge_f[idx]
        rod = (eye
               + sin_q[idx][:, None, None] * jnp.asarray(c.K[idx])
               + (1.0 - cos_q[idx])[:, None, None] * jnp.asarray(c.K2[idx]))
        rod = jnp.where(hf[:, None, None] > 0, rod, eye)  # slide: no spin
        Rb = Rj @ rod
        Pb = Pj + ((1.0 - hf) * q[idx])[:, None] * Aw
        # --- velocity/acceleration (as _velocity_stacked) ---
        rel = Pb - Pp
        qdl = qd[idx][:, None]
        hfc = hf[:, None]
        wXa = jnp.cross(Wp, Aw)
        w = Wp + hfc * qdl * Aw
        vo = Vop + jnp.cross(Wp, rel) + (1.0 - hfc) * qdl * Aw
        al = Alp + hfc * qdl * wXa
        ao = (Aop + jnp.cross(Alp, rel) + jnp.cross(Wp, vo - Vop)
              + (1.0 - hfc) * qdl * wXa)
        outs.append((Rb, Pb, Aw, w, vo, al, ao))
    perm = c.perm_inv
    R, P, A, W, Vo, Al, Ao = (
        jnp.concatenate([o[j] for o in outs])[perm] for j in
        ((0, 1, 2, 3, 4, 5, 6)))
    C = P + jnp.einsum("nij,nj->ni", R, jnp.asarray(c.com))
    c_rel = C - P
    Vc = Vo + jnp.cross(W, c_rel)
    Ac = Ao + jnp.cross(Al, c_rel) + jnp.cross(W, Vc - Vo)
    return R, P, A, C, W, Vo, Al, Ac


def _spd_inv(A):
    """Explicit SPD inverse via recursive 2x2 Schur-complement blocking.

    log2(nq) levels of batched small matmuls — the form XLA:TPU tiles
    onto the MXU — instead of the sequential triangular loops its small
    Cholesky/solve expansion produces. Stable for the engine's mass
    matrices (cond ~ 1e2; see studies/adroit_solve_micro.py) when run
    under f32-accurate matmul precision (callers bind it).
    """
    n = A.shape[-1]
    if n <= 2:
        if n == 1:
            return 1.0 / A
        a, b = A[..., 0, 0], A[..., 0, 1]
        cc, d = A[..., 1, 0], A[..., 1, 1]
        det = a * d - b * cc
        row0 = jnp.stack([d, -b], -1)
        row1 = jnp.stack([-cc, a], -1)
        return jnp.stack([row0, row1], -2) / det[..., None, None]
    k = (n + 1) // 2
    Ai = _spd_inv(A[..., :k, :k])
    B = A[..., :k, k:]
    AiB = Ai @ B
    S = A[..., k:, k:] - jnp.swapaxes(B, -1, -2) @ AiB
    Si = _spd_inv(S)
    AiBSi = AiB @ Si
    top_left = Ai + AiBSi @ jnp.swapaxes(AiB, -1, -2)
    top = jnp.concatenate([top_left, -AiBSi], -1)
    bot = jnp.concatenate([-jnp.swapaxes(AiBSi, -1, -2), Si], -1)
    return jnp.concatenate([top, bot], -2)


def forward_dynamics_stacked(m: SoaModel, c: _StackedConsts, q, qd, tau,
                             off_pos):
    """Stacked-assembly forward dynamics for ONE sample.

    q, qd, tau: (nq,) arrays; off_pos: (nq, 3) joint-origin offsets (a
    traced row carries the per-episode scene placement). Returns
    (qdd (nq,), mass_diag (nq,)). Same dynamics as
    engine_soa.forward_dynamics_soa."""
    nq = c.nq
    R, P, A, C, W, Vo, Al, Ac = _fk_vel_stacked(c, q, qd, off_pos)

    anc = c.anc[..., None]                                # (b, j, 1)
    hinge_j = c.hinge[None, :, None]                      # (1, j, 1)
    # Jacobians: jv[b, j] = axes[j] x (com[b] - pos[j]) for hinge ancestors,
    # axes[j] for slide ancestors, 0 otherwise (engine_soa._jacobians)
    diff = C[:, None, :] - P[None, :, :]                  # (b, j, 3)
    jv = anc * jnp.where(hinge_j, jnp.cross(A[None, :, :], diff),
                         A[None, :, :])
    jw = anc * jnp.where(hinge_j, A[None, :, :], 0.0)

    # mass matrix: M = sum_b m_b jv_b jv_b^T + jw_b I_w(b) jw_b^T
    Iw = jnp.einsum("bij,bjk,blk->bil", R, jnp.asarray(c.inertia), R)
    M = (jnp.einsum("b,bkx,blx->kl", jnp.asarray(c.mass_b), jv, jv)
         + jnp.einsum("bkx,bxy,bly->kl", jw, Iw, jw))
    M = M + jnp.diag(jnp.asarray(c.armature))

    # passive torques (engine_soa.passive_torque_soa, vectorized)
    passive = -c.damping * qd - c.spring_k * (q - c.spring_ref)
    passive = passive - c.limit_k * (jnp.maximum(q - c.q_hi, 0.0)
                                     + jnp.minimum(q - c.q_lo, 0.0))

    # gravity + inertial bias wrenches -> generalized bias force
    f_bias = c.mass_b[:, None] * (c.gravity[None, :] - Ac)
    n_bias = (jnp.einsum("bxy,by->bx", Iw, Al)
              + jnp.cross(W, jnp.einsum("bxy,by->bx", Iw, W)))
    rhs = (tau + passive
           + jnp.einsum("bjx,bx->j", jv, f_bias)
           - jnp.einsum("bjx,bx->j", jw, n_bias))

    # contact points / velocities / forces
    ns = len(c.sphere_body)
    if ns:
        sb = c.sphere_body
        Rs, Ps = R[sb], P[sb]
        pts = Ps + jnp.einsum("sij,sj->si", Rs, jnp.asarray(c.sphere_pos))
        vels = Vo[sb] + jnp.cross(W[sb], pts - Ps)
        F = jnp.zeros((ns, 3))
        if len(c.sp):
            si, pi = c.sp[:, 0], c.sp[:, 1]
            n = jnp.asarray(c.plane_normal)[pi]
            dist = jnp.sum(pts[si] * n, axis=-1) - c.plane_offset[pi]
            delta = (c.sphere_radius[si] - dist)[:, None]
            f = _contact_force_stacked(m, delta, vels[si], n)
            F = F.at[si].add(f)
        if len(c.ss):
            ai, bi = c.ss[:, 0], c.ss[:, 1]
            dvec = pts[ai] - pts[bi]
            dist = jnp.sqrt(jnp.sum(dvec * dvec, -1, keepdims=True)) + 1e-9
            n = dvec / dist
            delta = (c.sphere_radius[ai] + c.sphere_radius[bi])[:, None] \
                - dist
            f = _contact_force_stacked(m, delta, vels[ai] - vels[bi], n)
            F = F.at[ai].add(f).at[bi].add(-f)
        if len(c.sseg):
            si, ea, eb = c.sseg[:, 0], c.sseg[:, 1], c.sseg[:, 2]
            a, b, p = pts[ea], pts[eb], pts[si]
            ab = b - a
            t = jnp.clip(jnp.sum((p - a) * ab, -1)
                         / (jnp.sum(ab * ab, -1) + 1e-9), 0.0, 1.0)[:, None]
            closest = a + t * ab
            dvec = p - closest
            dist = jnp.sqrt(jnp.sum(dvec * dvec, -1, keepdims=True)) + 1e-9
            n = dvec / dist
            seg_r = 0.5 * (c.sphere_radius[ea] + c.sphere_radius[eb])
            delta = (c.sphere_radius[si] + seg_r)[:, None] - dist
            v_closest = vels[ea] + t * (vels[eb] - vels[ea])
            f = _contact_force_stacked(m, delta, vels[si] - v_closest, n)
            F = F.at[si].add(f).at[ea].add(-(1.0 - t) * f).at[eb].add(-t * f)
        # generalized contact force: col[s, j] = a_j x (p_s - o_j) (hinge)
        # or a_j (slide), masked by ancestry of the sphere's body
        diff_s = pts[:, None, :] - P[None, :, :]          # (s, j, 3)
        cols = c.anc_sphere[..., None] * jnp.where(
            c.hinge[None, :, None], jnp.cross(A[None, :, :], diff_s),
            A[None, :, :])
        rhs = rhs + jnp.einsum("sjx,sx->j", cols, F)

    # one batched PD solve (the mass matrix of an articulated assembly is
    # PD; same assumption the scalar pipeline's pivot-free Gauss-Jordan
    # makes). Recursive-Schur explicit inverse instead of Cholesky:
    # XLA:TPU expands small Cholesky + triangular solves into sequential
    # scalar loops, while the Schur recursion is all batched 3-12-wide
    # matmuls the MXU eats. Measured at nq=23/N=64 on v5e
    # (studies/adroit_solve_micro.py, results/perf/adroit_solve_micro.json):
    # 0.213 ms vs 0.359 ms per solve batch AND more accurate under f32
    # matmuls (rel-2 err 9.5e-8 vs Cholesky's 2.4e-7). Requires f32-
    # accurate matmuls (make_single_step_stacked binds the substep trace);
    # bind here too so standalone calls stay correct on TPU.
    with jax.default_matmul_precision("highest"):
        qdd = (_spd_inv(M) @ rhs[..., None])[..., 0]
    return qdd, jnp.diagonal(M)


def make_single_step_stacked(model: ArticulatedModel, dt: float,
                             substeps: int = 1, dyn_body=None):
    """Drop-in for engine_soa.make_single_step_soa: (qpos (nq,), qvel
    (nq,), tau (nq,)) -> (qpos, qvel), semi-implicit Euler + exact
    velocity-level stiction, substeps under lax.scan.

    With ``dyn_body`` the returned step takes a trailing ``(3,)``
    joint-origin override for that body (the sampled scene placement —
    door frame / nail board), mirroring the scalar-SoA contract: the
    traced offset replaces that row of the stacked offset table, so FK,
    Jacobians and contacts all see the episode's scene."""
    m0 = SoaModel(model)
    c = _StackedConsts(m0)
    h = dt / substeps
    fl = jnp.asarray(c.friction_loss)
    has_friction = bool(np.any(c.friction_loss > 0.0))

    def one(qpos, qvel, tau, body_pos=None):
        off = jnp.asarray(c.offset_pos)
        if dyn_body is not None:
            assert body_pos is not None, \
                "this model was built with dyn_body: pass its position"
            off = off.at[dyn_body].set(jnp.asarray(body_pos))

        def sub(carry, _):
            q, qd = carry
            qdd, mdiag = forward_dynamics_stacked(m0, c, q, qd, tau, off)
            qd2 = qd + h * qdd
            if has_friction:
                cap = fl * h / mdiag
                qd2 = qd2 - jnp.clip(qd2, -cap, cap) * (fl > 0.0)
            q2 = q + h * qd2
            return (q2, qd2), None

        # f32-accurate matmuls: on TPU the default matmul precision is
        # bf16 on the MXU, which silently degrades the 9-level FK
        # rotation chains and the mass-matrix einsums far below the
        # engine's cross-backend 1e-4 trajectory contract (measured:
        # the same 23x23 solve is 1e-7-accurate on CPU and 1e-1 at TPU
        # default precision — studies/adroit_solve_micro.py). These
        # matrices are 3x3/23x23, so the three-pass f32 MXU cost is
        # noise; bind the whole substep trace.
        with jax.default_matmul_precision("highest"):
            (q, qd), _ = jax.lax.scan(sub, (qpos, qvel), None,
                                      length=substeps)
        return q, qd

    return one
