"""XPBD vs rigid-string cross-validation (VERDICT r3 next #5).

Drives the SAME scripted shoulder/elbow sine swings (a grid of amplitudes
x frequencies, the reference's __main__ smoke-test family:
ball_in_a_cup.py:664-699) through envs.ball_in_a_cup (XPBD particle
chain) and envs.ball_in_a_cup_rigid (rigid articulated chain, the XML
scene's mechanical model), and reports per-trajectory ball-path RMS
disagreement + amplitude ratios. Run on device (the 28-DoF stacked
rollouts are TPU-scale); results recorded in RESULTS.md.

Usage: python studies/rigid_string.py [n_links] [out.json]
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time

import jax
import jax.numpy as jnp
import numpy as np

from ppi_tpu.envs.ball_in_a_cup import BallInCupSim
from ppi_tpu.envs.ball_in_a_cup_rigid import N_ARM, BallInCupSimRigid
from ppi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

n_links = int(sys.argv[1]) if len(sys.argv) > 1 else 12
out_path = sys.argv[2] if len(sys.argv) > 2 else None

Q0 = jnp.array([0.0, 0.0, 0.0, 1.5707])
STEPS = 700  # 1.4 s driven phase
AMPS = (0.15, 0.25, 0.35)
FREQS = (1.0, 1.5, 2.0)

rigid = BallInCupSimRigid(n_links=n_links)
xpbd = BallInCupSim()


def swing(amp, freq, dt):
    ts = jnp.arange(STEPS) * dt
    qs = (Q0[None, :].repeat(STEPS, 0)
          .at[:, 1].add(amp * jnp.sin(2 * jnp.pi * freq * ts))
          .at[:, 3].add(-0.5 * amp * jnp.sin(2 * jnp.pi * freq * ts)))
    return qs, jnp.zeros((STEPS, 4))


def make_run(sim):
    @jax.jit
    def run(qs, qds):
        state = sim.reset(Q0)

        def body(s, sp):
            s = sim.step(s, sp[0], sp[1])
            ball = (s.particles[-1] if hasattr(s, "particles")
                    else sim.ball_pos(s.physics.qpos))
            return s, ball

        _, balls = jax.lax.scan(body, state, (qs, qds))
        return balls

    return run


run_r, run_x = make_run(rigid), make_run(xpbd)
rows = []
t0 = time.time()
for amp in AMPS:
    for freq in FREQS:
        qs, qds = swing(amp, freq, xpbd.dt)
        b_r = np.asarray(run_r(qs, qds))
        b_x = np.asarray(run_x(qs, qds))
        sl = slice(100, None)  # skip the initial transient
        rms = float(np.sqrt(np.mean(
            np.sum((b_r[sl] - b_x[sl]) ** 2, -1))))
        span_x = float(np.ptp(b_x[sl, 0]))
        span_r = float(np.ptp(b_r[sl, 0]))
        zmax_x = float(b_x[sl, 2].max())
        zmax_r = float(b_r[sl, 2].max())
        rows.append(dict(amp=amp, freq=freq, rms=round(rms, 4),
                         x_span_xpbd=round(span_x, 4),
                         x_span_rigid=round(span_r, 4),
                         z_max_xpbd=round(zmax_x, 4),
                         z_max_rigid=round(zmax_r, 4)))
        print(rows[-1])

summary = dict(n_links=n_links, steps=STEPS,
               backend=jax.default_backend(),
               elapsed_s=round(time.time() - t0, 1),
               max_rms=max(r["rms"] for r in rows), rows=rows)
print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))
if out_path:
    pathlib.Path(out_path).write_text(json.dumps(summary, indent=1) + "\n")
