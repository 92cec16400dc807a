from . import factors, solver
from .factors import FactorGraph, make_graph, add_between, add_prior

__all__ = [
    "factors",
    "solver",
    "FactorGraph",
    "make_graph",
    "add_between",
    "add_prior",
]
