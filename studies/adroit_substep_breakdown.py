"""Ablation breakdown of one engine_stacked substep at the adroit scale.

The adroit control step is 100% rollout (studies/adroit_latency.py), the
rollout is 120 sequential substeps at ~0.26 ms each (batch 64, nq=23),
and scan-unroll does NOT help (u1/u4/u8 all ~32 ms per 64x30 rollout) —
so the substep's own sequential kernel chain is the latency, not the
dispatch count.

Phase-ISOLATION timing is misleading here: isolated phases materialize
their inputs/outputs through HBM every loop iteration and the parts sum
to ~2x the fused whole (first revision of this study, recorded). So this
study ABLATES pieces of forward_dynamics_stacked inside the real
semi-implicit-Euler substep loop — everything stays fused exactly as
shipped, and the deltas vs the full step attribute the latency:

  full          the shipped substep (baseline; matches the rollout rate)
  diag_solve    qdd = rhs / diag(M)   -> delta = Cholesky + cho_solve
  no_contacts   contact block skipped -> delta = contact pipeline
  no_vel        velocity recursion replaced by zeros -> delta = that loop
  fk_only       M=I, rhs=tau: FK + integration only

Usage: python studies/adroit_substep_breakdown.py [out.json]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

OUT = sys.argv[1] if len(sys.argv) > 1 else \
    "results/perf/adroit_substep_breakdown.json"
N = 64
STEPS = 120  # one H=30 x 4-substep rollout's worth


def loop_time(step):
    """Per-substep ms of `(q, qd) -> (q, qd)` under a 120-step scan."""

    @jax.jit
    def prog(q0, qd0):
        def body(carry, _):
            return step(*carry), None
        carry, _ = jax.lax.scan(body, (q0, qd0), None, length=STEPS)
        return carry

    key = jax.random.key(0)
    q0 = 0.05 * jax.random.normal(key, (N, 23))
    qd0 = jnp.zeros((N, 23))
    t0 = time.perf_counter()
    jax.block_until_ready(prog(q0, qd0))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(q0, qd0))
        best = min(best, time.perf_counter() - t0)
    return compile_s, 1e3 * best / STEPS


def main():
    from ppi_tpu.envs.door_adroit import DoorAdroit
    from ppi_tpu.envs.physics import engine_stacked as es
    from ppi_tpu.envs.physics.engine_soa import SoaModel

    env = DoorAdroit()
    model = env._model
    m0 = SoaModel(model)
    c = es._StackedConsts(m0)
    nq = c.nq
    assert nq == 23
    h = env.dt / env.substeps
    tau = 0.05 * jax.random.normal(jax.random.key(2), (N, nq))
    off = jnp.asarray(c.offset_pos)

    def dynamics(q, qd, *, solve="chol", contacts=True, vel=True,
                 massrhs=True):
        """forward_dynamics_stacked with ablation switches; one sample."""
        R, P, A, C = es._fk_stacked(c, q, off)
        if vel:
            W, Vo, Al, Ac = es._velocity_stacked(c, qd, P, A, C)
        else:
            W = Vo = Al = jnp.zeros((nq, 3), jnp.float32)
            Ac = jnp.zeros((nq, 3), jnp.float32)
        if massrhs:
            anc = c.anc[..., None]
            hinge_j = c.hinge[None, :, None]
            diff = C[:, None, :] - P[None, :, :]
            jv = anc * jnp.where(hinge_j, jnp.cross(A[None, :, :], diff),
                                 A[None, :, :])
            jw = anc * jnp.where(hinge_j, A[None, :, :], 0.0)
            Iw = jnp.einsum("bij,bjk,blk->bil", R, jnp.asarray(c.inertia),
                            R)
            M = (jnp.einsum("b,bkx,blx->kl", jnp.asarray(c.mass_b), jv, jv)
                 + jnp.einsum("bkx,bxy,bly->kl", jw, Iw, jw))
            M = M + jnp.diag(jnp.asarray(c.armature))
            passive = -c.damping * qd - c.spring_k * (q - c.spring_ref)
            passive = passive - c.limit_k * (
                jnp.maximum(q - c.q_hi, 0.0) + jnp.minimum(q - c.q_lo, 0.0))
            f_bias = c.mass_b[:, None] * (c.gravity[None, :] - Ac)
            n_bias = (jnp.einsum("bxy,by->bx", Iw, Al)
                      + jnp.cross(W, jnp.einsum("bxy,by->bx", Iw, W)))
            rhs = (passive
                   + jnp.einsum("bjx,bx->j", jv, f_bias)
                   - jnp.einsum("bjx,bx->j", jw, n_bias))
        else:
            M = jnp.eye(nq, dtype=jnp.float32)
            rhs = -0.1 * qd + 0.01 * jnp.sum(R[..., 0], axis=-1) \
                + 0.01 * jnp.sum(Ac, axis=-1)  # keep FK/vel live
        if contacts and len(c.sphere_body):
            sb = c.sphere_body
            Rs, Ps = R[sb], P[sb]
            pts = Ps + jnp.einsum("sij,sj->si", Rs,
                                  jnp.asarray(c.sphere_pos))
            vels = Vo[sb] + jnp.cross(W[sb], pts - Ps)
            F = jnp.zeros((len(sb), 3))
            if len(c.sp):
                si, pi = c.sp[:, 0], c.sp[:, 1]
                n = jnp.asarray(c.plane_normal)[pi]
                dist = jnp.sum(pts[si] * n, axis=-1) - c.plane_offset[pi]
                delta = (c.sphere_radius[si] - dist)[:, None]
                f = es._contact_force_stacked(m0, delta, vels[si], n)
                F = F.at[si].add(f)
            if len(c.ss):
                ai, bi = c.ss[:, 0], c.ss[:, 1]
                dvec = pts[ai] - pts[bi]
                dist = jnp.sqrt(jnp.sum(dvec * dvec, -1,
                                        keepdims=True)) + 1e-9
                n = dvec / dist
                delta = (c.sphere_radius[ai]
                         + c.sphere_radius[bi])[:, None] - dist
                f = es._contact_force_stacked(m0, delta,
                                              vels[ai] - vels[bi], n)
                F = F.at[ai].add(f).at[bi].add(-f)
            if len(c.sseg):
                si, ea, eb = c.sseg[:, 0], c.sseg[:, 1], c.sseg[:, 2]
                a, b, p = pts[ea], pts[eb], pts[si]
                ab = b - a
                t = jnp.clip(jnp.sum((p - a) * ab, -1)
                             / (jnp.sum(ab * ab, -1) + 1e-9),
                             0.0, 1.0)[:, None]
                closest = a + t * ab
                dvec = p - closest
                dist = jnp.sqrt(jnp.sum(dvec * dvec, -1,
                                        keepdims=True)) + 1e-9
                n = dvec / dist
                seg_r = 0.5 * (c.sphere_radius[ea] + c.sphere_radius[eb])
                delta = (c.sphere_radius[si] + seg_r)[:, None] - dist
                v_closest = vels[ea] + t * (vels[eb] - vels[ea])
                f = es._contact_force_stacked(m0, delta,
                                              vels[si] - v_closest, n)
                F = (F.at[si].add(f).at[ea].add(-(1.0 - t) * f)
                     .at[eb].add(-t * f))
            diff_s = pts[:, None, :] - P[None, :, :]
            cols = c.anc_sphere[..., None] * jnp.where(
                c.hinge[None, :, None], jnp.cross(A[None, :, :], diff_s),
                A[None, :, :])
            rhs = rhs + jnp.einsum("sjx,sx->j", cols, F)
        if solve == "chol":
            L = jnp.linalg.cholesky(M)
            qdd = jax.scipy.linalg.cho_solve((L, True), rhs)
        else:
            qdd = rhs / jnp.diagonal(M)
        return qdd

    def make_step(**kw):
        def one(q, qd):
            qdd = dynamics(q, qd, **kw)
            qd2 = qd + h * qdd
            return q + h * qd2, qd2
        return jax.vmap(one)

    rows = {}
    for label, kw in [
        ("full", {}),
        ("diag_solve", dict(solve="diag")),
        ("no_contacts", dict(contacts=False)),
        ("no_vel", dict(vel=False)),
        ("fk_only", dict(massrhs=False, contacts=False, vel=False,
                         solve="diag")),
    ]:
        cs, ms = loop_time(make_step(**kw))
        rows[label] = dict(compile_s=round(cs, 2), ms=round(ms, 4))
        print(label, rows[label], flush=True)

    full = rows["full"]["ms"]
    rows["attribution_ms"] = {
        "cholesky_solve": round(full - rows["diag_solve"]["ms"], 4),
        "contacts": round(full - rows["no_contacts"]["ms"], 4),
        "velocity_recursion": round(full - rows["no_vel"]["ms"], 4),
        "fk_plus_integrate": rows["fk_only"]["ms"],
    }
    payload = dict(backend=jax.default_backend(), nq=int(nq), n=N,
                   steps=STEPS, rows=rows)
    print(json.dumps(payload, indent=1))
    out = pathlib.Path(OUT)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=2) + "\n")


if __name__ == "__main__":
    main()
