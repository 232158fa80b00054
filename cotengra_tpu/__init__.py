"""cotengra_tpu: a TPU-native tensor-network contraction framework.

A ground-up rebuild of the capabilities of ``jcmgray/cotengra`` designed
for JAX/XLA/Pallas/pjit:

- host-side combinatorial *planning* (contraction trees, greedy / optimal /
  annealing / hyper-optimized pathfinding, dynamic slicing),
- device-side *execution* lowered directly to ``jax.lax.dot_general``
  inside a single jitted function, with slice enumeration traced (no
  per-slice retracing) and sliced sums sharded over TPU meshes via psum.
"""

__version__ = "0.1.0"

from . import utils
from .hypergraph import HyperGraph, get_hypergraph
from .interface import (
    Via,
    array_contract,
    array_contract_expression,
    array_contract_path,
    array_contract_tree,
    einsum,
    einsum_expression,
    einsum_tree,
    ncon,
    register_preset,
    list_presets,
)
from .pathfinders.base import PathOptimizer
from .pathfinders.basic import (
    GreedyOptimizer,
    OptimalOptimizer,
    RandomGreedyOptimizer,
    optimize_greedy,
    optimize_optimal,
    optimize_random_greedy_track_flops,
    optimize_simplify,
)
from .pathfinders.edgesort import EdgeSortOptimizer, optimize_edgesort
from .pathfinders.random import RandomOptimizer, optimize_random
from .presets import (
    AutoHQOptimizer,
    AutoOptimizer,
    auto_hq_optimize,
    auto_optimize,
    estimate_optimal_hardness,
    register_builtin_presets,
)
from .scoring import (
    ComboObjective,
    FlopsObjective,
    LimitObjective,
    SizeObjective,
    WriteObjective,
    get_score_fn,
)
from .slicing import SliceFinder, ContractionCosts
from .tree import (
    ContractionTree,
    SliceInfo,
    edge_path_to_linear,
    edge_path_to_ssa,
    linear_to_ssa,
    ssa_to_linear,
)
from .tree_compressed import ContractionTreeCompressed
from .tree_multi import ContractionTreeMulti
from .models.instances import (
    lattice_equation,
    make_arrays_from_eq,
    make_arrays_from_inputs,
    make_rand_size_dict_from_inputs,
    make_shapes_from_inputs,
    perverse_equation,
    rand_equation,
    rand_tree,
    randreg_equation,
    tree_equation,
)

register_builtin_presets()

from .hyper import (
    HyperCompressedOptimizer,
    HyperMultiOptimizer,
    HyperOptimizer,
    ReusableHyperCompressedOptimizer,
    ReusableHyperOptimizer,
    UniformOptimizer,
    get_hyper_space,
    list_hyper_functions,
    register_hyper_function,
    register_hyper_optlib,
)
from .hyper.driver import ReusableRandomGreedyOptimizer
from .hyper import register_hyper_presets as _register_hyper_presets

_register_hyper_presets()

# optional integrations: external TD solvers, native partitioners,
# opt_einsum preset registration - all no-ops when unavailable
from .pathfinders.external import (
    FlowCutterOptimizer,
    QuickBBOptimizer,
    optimize_flowcutter,
    optimize_quickbb,
    register_external_presets,
)
from .pathfinders.kahypar import register_kahypar_hyper_methods
from .pathfinders.igraph import register_igraph_hyper_methods
from .oe import OEPathOptimizer, register_opt_einsum_presets

register_external_presets()
register_kahypar_hyper_methods()
register_igraph_hyper_methods()

from .plot import (
    plot_contractions,
    plot_contractions_alt,
    plot_hypergraph,
    plot_scatter,
    plot_scatter_alt,
    plot_slicings,
    plot_slicings_alt,
    plot_tree,
    plot_tree_circuit,
    plot_tree_ring,
    plot_tree_span,
    plot_tree_tent,
    plot_trials,
    plot_trials_alt,
    tree_to_df,
    tree_to_networkx,
)
from .plot import _attach_plot_methods

_attach_plot_methods()

from .utils.io import (
    hash_contraction_b,
    load_instance,
    load_tree,
    save_instance,
    save_tree,
)
from .config import (
    default_implementation,
    default_options,
    get_default_implementation,
    set_default_implementation,
)
from .models.instances import networkx_graph_to_equation
from .utils.eqs import hash_contraction
from .utils.symbols import get_symbol, get_symbol_map

# reference-compatible aliases (``cotengra.__init__``)
contract = einsum
contract_expression = einsum_expression

# ready-made optimizer instances (reference ``__init__.py:201-220``)
greedy_optimize = GreedyOptimizer()
optimal_optimize = OptimalOptimizer()
optimal_outer_optimize = OptimalOptimizer(search_outer=True)


def hyper_optimize(inputs, output, size_dict, memory_limit=None, **opts):
    """One-shot hyper-optimized path (reference ``hyper.py``'s
    module-level convenience): build a fresh
    :class:`HyperOptimizer` and return the linear path."""
    if memory_limit is not None:
        opts.setdefault("slicing_opts", {"target_size": memory_limit})
    opt = HyperOptimizer(**opts)
    return opt.search(inputs, output, size_dict).get_path()


# submodule aliases mirroring the reference's flat module layout
from .pathfinders import basic as path_basic  # noqa: E402
from .pathfinders import basic as path_greedy  # noqa: E402
from .pathfinders import compressed as path_compressed_greedy  # noqa: E402
from .pathfinders import windowed_opt as path_compressed  # noqa: E402
from .pathfinders import compressed_bb as path_compressed_branchbound  # noqa: E402
from .pathfinders import igraph as path_igraph  # noqa: E402
from .pathfinders import kahypar as path_kahypar  # noqa: E402
from .pathfinders import labels as path_labels  # noqa: E402
from .hyper import optlibs as hyper_cmaes  # noqa: E402
from .hyper import optlibs as hyper_nevergrad  # noqa: E402
from .hyper import optlibs as hyper_optuna  # noqa: E402
from .hyper import optlibs as hyper_skopt  # noqa: E402
from .hyper import simplex as hyper_neldermead  # noqa: E402
from .hyper import simplex as hyper_sbplx  # noqa: E402
from .hyper import space as hyper_es  # noqa: E402
from .hyper import space as hyper_random  # noqa: E402

__all__ = [
    "array_contract",
    "array_contract_expression",
    "array_contract_path",
    "array_contract_tree",
    "AutoHQOptimizer",
    "AutoOptimizer",
    "auto_hq_optimize",
    "auto_optimize",
    "contract",
    "contract_expression",
    "edge_path_to_linear",
    "edge_path_to_ssa",
    "get_symbol",
    "get_symbol_map",
    "greedy_optimize",
    "hash_contraction",
    "hyper_optimize",
    "optimal_optimize",
    "optimal_outer_optimize",
    "plot_contractions_alt",
    "plot_scatter_alt",
    "plot_slicings_alt",
    "plot_tree_circuit",
    "plot_trials_alt",
    "ReusableRandomGreedyOptimizer",
    "load_tree",
    "save_tree",
    "ComboObjective",
    "ContractionCosts",
    "ContractionTree",
    "ContractionTreeCompressed",
    "ContractionTreeMulti",
    "HyperCompressedOptimizer",
    "HyperMultiOptimizer",
    "HyperOptimizer",
    "ReusableHyperCompressedOptimizer",
    "ReusableHyperOptimizer",
    "UniformOptimizer",
    "EdgeSortOptimizer",
    "einsum",
    "einsum_expression",
    "einsum_tree",
    "estimate_optimal_hardness",
    "FlopsObjective",
    "get_hypergraph",
    "get_score_fn",
    "GreedyOptimizer",
    "HyperGraph",
    "lattice_equation",
    "LimitObjective",
    "linear_to_ssa",
    "list_presets",
    "ncon",
    "OptimalOptimizer",
    "optimize_edgesort",
    "optimize_greedy",
    "optimize_optimal",
    "optimize_random",
    "optimize_random_greedy_track_flops",
    "optimize_simplify",
    "PathOptimizer",
    "make_arrays_from_eq",
    "make_arrays_from_inputs",
    "make_rand_size_dict_from_inputs",
    "make_shapes_from_inputs",
    "perverse_equation",
    "rand_equation",
    "rand_tree",
    "randreg_equation",
    "RandomGreedyOptimizer",
    "RandomOptimizer",
    "register_preset",
    "SizeObjective",
    "SliceFinder",
    "SliceInfo",
    "ssa_to_linear",
    "tree_equation",
    "utils",
    "Via",
    "WriteObjective",
]
