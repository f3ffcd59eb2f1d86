"""Experiment runner CLIs (optimization, MPC, policy search, profiling)."""
