"""PPI solver registry and optimization loops."""

from ppi_tpu.algorithms.base import (
    Batch,
    mask_costs,
    null_callback,
    solve,
    solve_scan,
)
from ppi_tpu.algorithms.solvers import (
    Ais,
    Cem,
    Essps,
    ICem,
    Lbps,
    More,
    Mppi,
    MppiBase,
    MppiUpdateCovariance,
    Reps,
)

__all__ = [
    "Ais", "Cem", "iCem", "Reps", "Lbps", "More", "Essps", "Mppi",
    "MppiUpdateCovariance", "solve", "solve_scan", "null_callback",
]

# reference-compatible names (reference: ppi/algorithms.py:19-29)
iCem = ICem

ALGORITHMS = {
    "Ais": Ais,
    "Cem": Cem,
    "iCem": ICem,
    "Reps": Reps,
    "Lbps": Lbps,
    "More": More,
    "Essps": Essps,
    "Mppi": Mppi,
    "MppiUpdateCovariance": MppiUpdateCovariance,
}


def make_solver(name: str, **kwargs):
    """Build a solver by reference-compatible name, absorbing the union of
    hyperparameters the way the reference CLIs do (reference:
    run_mpc.py:171-177) but keeping only those the solver declares."""
    import dataclasses

    cls = ALGORITHMS[name]
    fields = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in kwargs.items() if k in fields})
