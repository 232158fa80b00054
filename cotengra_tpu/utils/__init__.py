from .eqs import (
    canonicalize_inputs,
    eq_to_inputs_output,
    find_output_from_inputs,
    hash_contraction,
    inputs_output_to_eq,
    parse_einsum_input,
    parse_eq_ellipses,
)
from .misc import (
    BadTrial,
    DiskDict,
    GumbelBatchedGenerator,
    MaxCounter,
    compute_size_by_dict,
    get_rng,
    prod,
    unique,
)
from .symbols import (
    empty_symbol_map,
    get_symbol,
    get_symbol_map,
    inds_to_eq,
)

__all__ = [
    "BadTrial",
    "canonicalize_inputs",
    "compute_size_by_dict",
    "DiskDict",
    "empty_symbol_map",
    "eq_to_inputs_output",
    "find_output_from_inputs",
    "get_rng",
    "get_symbol",
    "get_symbol_map",
    "GumbelBatchedGenerator",
    "hash_contraction",
    "inds_to_eq",
    "inputs_output_to_eq",
    "MaxCounter",
    "parse_einsum_input",
    "parse_eq_ellipses",
    "prod",
    "unique",
]
