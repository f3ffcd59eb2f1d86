"""Micro-benchmark: PD solve alternatives for the stacked engine.

The ablation study (adroit_substep_breakdown.py) attributes ~0.17 ms of
the 0.26-0.45 ms adroit substep to `jnp.linalg.cholesky` +
`cho_solve` on (64, 23, 23): XLA:TPU expands small Cholesky/triangular
solves into O(n)-iteration loops of tiny kernels, so at nq=23 the solve
is ~40% of the substep's sequential latency. Candidates, all batched
over 64 samples under a 120-step dependent scan (same harness as the
ablations):

  chol        jnp.linalg.cholesky + cho_solve           (shipped)
  lusolve     jnp.linalg.solve (LU)
  unrolled    trace-time-unrolled Cholesky + substitution (nq stages of
              one fused rank-1 update each)
  schur       trace-time recursive blocked Schur-complement explicit
              inverse (leaf 3x3 adjugate; ~15 batched-matmul stages) + matvec

Accuracy of each vs float64 reference is reported alongside (max rel
err on qdd) — a candidate only qualifies at <1e-4, the engine
cross-validation tolerance.

Usage: python studies/adroit_solve_micro.py [out.json]
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
    "results/perf/adroit_solve_micro.json"
N = 64
NQ = 23
STEPS = 120


# ---------------------------------------------------------------- solvers
def solve_chol(M, r):
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L, True), r)


def solve_lu(M, r):
    return jnp.linalg.solve(M, r[..., None])[..., 0]


def solve_unrolled(M, r):
    """Trace-time-unrolled Cholesky + fwd/back substitution (one sample;
    caller vmaps). nq column stages + 2*nq substitution stages, each a
    handful of fused elementwise ops on (nq,) rows."""
    n = M.shape[-1]
    L = jnp.zeros_like(M)
    for j in range(n):
        d = jnp.sqrt(M[j, j] - jnp.sum(L[j, :j] ** 2))
        col = (M[j:, j] - L[j:, :j] @ L[j, :j]) / d
        L = L.at[j:, j].set(col)
    y = jnp.zeros_like(r)
    for i in range(n):
        y = y.at[i].set((r[i] - L[i, :i] @ y[:i]) / L[i, i])
    x = jnp.zeros_like(r)
    for i in reversed(range(n)):
        x = x.at[i].set((y[i] - L[i + 1:, i] @ x[i + 1:]) / L[i, i])
    return x


def _inv3(A):
    """Batched 3x3 (or smaller, padded by caller) adjugate inverse."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    co = jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], -1),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], -1),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], -1),
    ], -2)
    det = a * co[..., 0, 0] + b * co[..., 1, 0] + c * co[..., 2, 0]
    return co / det[..., None, None]


def _spd_inv(A):
    """Trace-time recursive Schur-complement inverse for small SPD
    matrices; leaf <= 3 via adjugate. Batched over leading axes."""
    n = A.shape[-1]
    if n <= 3:
        if n == 3:
            return _inv3(A)
        if n == 2:
            a, b = A[..., 0, 0], A[..., 0, 1]
            c, d = A[..., 1, 0], A[..., 1, 1]
            det = a * d - b * c
            row0 = jnp.stack([d, -b], -1)
            row1 = jnp.stack([-c, a], -1)
            return jnp.stack([row0, row1], -2) / det[..., None, None]
        return 1.0 / A
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


def solve_schur(M, r):
    return (_spd_inv(M) @ r[..., None])[..., 0]


def _equilibrate(M):
    """Jacobi (diagonal) equilibration: chain mass matrices have diagonal
    entries spanning ~5 orders of magnitude (arm links ~1, fingertip
    links ~1e-4), so solving D M D y = D r with D = diag(M)^-1/2
    collapses the condition number before the f32 solve."""
    d = jax.lax.rsqrt(jnp.diagonal(M, axis1=-2, axis2=-1))
    Ms = M * d[..., :, None] * d[..., None, :]
    return Ms, d


def solve_schur_eq(M, r):
    Ms, d = _equilibrate(M)
    y = (_spd_inv(Ms) @ (d * r)[..., None])[..., 0]
    return d * y


def solve_chol_eq(M, r):
    Ms, d = _equilibrate(M)
    L = jnp.linalg.cholesky(Ms)
    return d * jax.scipy.linalg.cho_solve((L, True), d * r)


def solve_schur_hp(M, r):
    """Schur inverse with f32-accurate matmuls: the plain variant's
    ~7e-1 max error on TPU is NOT the algorithm — it is the MXU's
    default bf16 matmul precision (the same solve hits 1e-7 on CPU,
    cond(M) ~ 160). At 23x23 the three-pass f32 MXU cost is noise."""
    with jax.default_matmul_precision("highest"):
        return (_spd_inv(M) @ r[..., None])[..., 0]


# ---------------------------------------------------------------- harness
def loop_time(solver, M, r):
    @jax.jit
    def prog(rr):
        def body(x, _):
            y = solver(M, x)
            # renormalize so the carry stays bounded over 120 solves
            y = y / jnp.sqrt(jnp.mean(y * y, -1, keepdims=True) + 1e-9)
            return y, None
        x, _ = jax.lax.scan(body, rr, None, length=STEPS)
        return x

    t0 = time.perf_counter()
    jax.block_until_ready(prog(r))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(prog(r))
        best = min(best, time.perf_counter() - t0)
    return compile_s, 1e3 * best / STEPS


def main():
    # realistic mass matrices: from the adroit model at random states
    from ppi_tpu.envs.door_adroit import DoorAdroit
    from ppi_tpu.envs.physics import engine_stacked as es
    from ppi_tpu.envs.physics.engine_soa import SoaModel

    env = DoorAdroit()
    c = es._StackedConsts(SoaModel(env._model))
    off = jnp.asarray(c.offset_pos)

    def mass_of(q):
        R, P, A, C, *_ = es._fk_vel_stacked(c, q, jnp.zeros_like(q), off)
        anc = c.anc[..., None]
        hinge_j = c.hinge[None, :, None]
        diff = C[:, None, :] - P[None, :, :]
        jv = anc * jnp.where(hinge_j, jnp.cross(A[None, :, :], diff),
                             A[None, :, :])
        jw = anc * jnp.where(hinge_j, A[None, :, :], 0.0)
        Iw = jnp.einsum("bij,bjk,blk->bil", R, jnp.asarray(c.inertia), R)
        M = (jnp.einsum("b,bkx,blx->kl", jnp.asarray(c.mass_b), jv, jv)
             + jnp.einsum("bkx,bxy,bly->kl", jw, Iw, jw))
        return M + jnp.diag(jnp.asarray(c.armature))

    qs = 0.4 * jax.random.normal(jax.random.key(0), (N, NQ))
    M = jax.vmap(mass_of)(qs)
    r = jax.random.normal(jax.random.key(1), (N, NQ))

    # float64 reference for accuracy
    M64 = np.asarray(M, np.float64)
    r64 = np.asarray(r, np.float64)
    ref = np.linalg.solve(M64, r64[..., None])[..., 0]

    solvers = {
        "chol": solve_chol,
        "lusolve": solve_lu,
        "unrolled": jax.vmap(solve_unrolled),
        "schur": solve_schur,
        "schur_eq": solve_schur_eq,
        "chol_eq": solve_chol_eq,
        "schur_hp": solve_schur_hp,
    }
    rows = {}
    for name, fn in solvers.items():
        x = np.asarray(jax.jit(fn)(M, r), np.float64)
        rel = float(np.max(np.abs(x - ref)
                           / (np.abs(ref) + 1e-6)))
        cs, ms = loop_time(fn, M, r)
        rows[name] = dict(compile_s=round(cs, 2), ms=round(ms, 4),
                          max_rel_err=f"{rel:.2e}")
        print(name, rows[name], flush=True)

    payload = dict(backend=jax.default_backend(), nq=NQ, n=N,
                   steps=STEPS, rows=rows)
    print(json.dumps(payload, indent=1))
    out = pathlib.Path(OUT)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(payload, indent=2) + "\n")


if __name__ == "__main__":
    main()
