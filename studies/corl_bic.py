"""CoRL'22 ball-in-a-cup numeric curve comparison (VERDICT r3 next #7).

The BiC policy search is embodiment-independent (the reference's own
simulated WAM task, re-hosted on the from-scratch engine), so its
success-vs-iteration curve is the numerically comparable path to the
paper's BiC figure (arXiv 2210.03512; README.md:7-19). The paper PDF is
unretrievable in this environment (zero egress), so the overlay anchors
on the paper's *experiment specification*, which the reference repo
records exactly: the Makefile's canonical BiC search — REPS, eps=2.0,
RBF features (20, derivative channel, bias), 40 iterations x 128 MC
samples (reference: Makefile policy-search target,
run_policy_search.py:62-74) — and the claim that the search solves the
task within that budget (the repo's headline gif is the solved task).

Deliverable: 5-seed success-rate-vs-iteration curves under the exact
reference budget, the iteration-to-first-success distribution, and the
final success rate — a numeric parity statement (results/corl_bic/):
every seed must reach 100% catch rate within the paper's 40-iteration
budget for parity to hold.

Run on TPU: python studies/corl_bic.py  (~10 min incl. compile)
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SEEDS = (0, 1, 2, 3, 4)
N_ITERS = 40
N_SAMPLES = 128
OUT = pathlib.Path("results/corl_bic")


def run_seed(seed):
    import jax
    import jax.numpy as jnp

    from ppi_tpu.algorithms import make_solver, solve
    from ppi_tpu.policies import make_policy
    from ppi_tpu.runners.run_policy_search import EPISODIC_ENVS

    env = EPISODIC_ENVS["BallInACup"]()
    # canonical prior hyperparameters (reference: run_policy_search.py:62-74)
    family, policy = make_policy(
        "RbfFeatures", env.t, env.dim_action, env.action_0,
        covariance_in=jnp.array([1e2]),
        covariance_out=jnp.diag(jnp.array([1e-3] * env.dim_action)),
        lengthscale=float(np.sqrt(3e-2)), n_features=20,
        sampler="MonteCarlo", use_derivatives=True, add_bias=True)
    if env.condition:
        policy = family.condition(policy, jnp.zeros(1), env.action_0[None, :])
    solver = make_solver("Reps", epsilon=2.0)
    _, trace = solve(solver, family, policy, env.objective(),
                     jax.random.key(seed), N_SAMPLES, N_ITERS)
    return [float(v) for v in np.asarray(trace["success_rate"])]


def main():
    from ppi_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    curves = {}
    for seed in SEEDS:
        curve = run_seed(seed)
        curves[seed] = curve
        first = next((i for i, v in enumerate(curve) if v > 0), None)
        solved = next((i for i, v in enumerate(curve) if v >= 1.0), None)
        print(f"seed {seed}: first success iter {first}, "
              f"100% catch iter {solved}, final {curve[-1]:.2f}")

    arr = np.array([curves[s] for s in SEEDS])     # (seeds, iters)
    firsts = [next((i for i, v in enumerate(c) if v > 0), None)
              for c in arr]
    solveds = [next((i for i, v in enumerate(c) if v >= 1.0), None)
               for c in arr]
    summary = {
        "config": {
            "algorithm": "Reps", "epsilon": 2.0, "policy": "RbfFeatures",
            "n_features": 20, "use_derivatives": True, "add_bias": True,
            "n_iters": N_ITERS, "n_samples": N_SAMPLES,
            "source": "reference Makefile canonical BiC search "
                      "(the paper's experiment spec)",
        },
        "seeds": list(SEEDS),
        "success_rate_curves": {str(s): curves[s] for s in SEEDS},
        "iter_first_success": firsts,
        "iter_full_success": solveds,
        "final_success_rate": [float(c[-1]) for c in arr],
        "parity": {
            "paper_budget_iters": N_ITERS,
            "all_seeds_solve_within_budget":
                all(s is not None for s in solveds),
            "statement": "every seed reaches a 100% catch rate within the "
                         "paper's 40-iteration budget"
                         if all(s is not None for s in solveds) else
                         "PARITY GAP: some seed does not solve within the "
                         "paper budget",
        },
    }
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "summary.json").write_text(json.dumps(summary, indent=1) + "\n")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        it = np.arange(N_ITERS)
        fig, ax = plt.subplots(figsize=(6, 4))
        for s, c in zip(SEEDS, arr):
            ax.plot(it, c, alpha=0.35, lw=1)
        ax.plot(it, arr.mean(0), "k-", lw=2, label="mean (5 seeds)")
        ax.fill_between(it, arr.min(0), arr.max(0), alpha=0.15,
                        color="k", label="seed range")
        ax.axvline(N_ITERS - 1, ls=":", c="r",
                   label="paper budget (40 iters)")
        ax.set_xlabel("iteration")
        ax.set_ylabel("catch success rate (128 samples)")
        ax.set_title("Ball-in-a-cup: REPS eps=2 + RBF prior\n"
                     "(reference canonical config, arXiv 2210.03512 task)")
        ax.legend(loc="lower right", fontsize=8)
        fig.tight_layout()
        fig.savefig(OUT / "overlay.png", dpi=150)
        print(f"wrote {OUT}/overlay.png")
    except ImportError:
        pass
    print(f"wrote {OUT}/summary.json")
    print(summary["parity"]["statement"])


if __name__ == "__main__":
    main()
