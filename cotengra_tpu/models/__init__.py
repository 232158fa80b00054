from .instances import (
    Contraction,
    lattice_equation,
    perverse_equation,
    rand_equation,
    randreg_equation,
    tree_equation,
)

__all__ = [
    "Contraction",
    "lattice_equation",
    "perverse_equation",
    "rand_equation",
    "randreg_equation",
    "tree_equation",
]
