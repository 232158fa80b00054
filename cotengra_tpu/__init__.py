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
    linear_to_ssa,
    ssa_to_linear,
)
from .tree_compressed import ContractionTreeCompressed
from .tree_multi import ContractionTreeMulti
from .models.instances import (
    lattice_equation,
    perverse_equation,
    rand_equation,
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
    plot_hypergraph,
    plot_scatter,
    plot_slicings,
    plot_tree,
    plot_tree_ring,
    plot_tree_span,
    plot_tree_tent,
    plot_trials,
    tree_to_df,
    tree_to_networkx,
)
from .plot import _attach_plot_methods

_attach_plot_methods()

from .utils.io import hash_contraction_b, load_instance, save_instance
from .config import (
    default_implementation,
    default_options,
    get_default_implementation,
    set_default_implementation,
)
from .models.instances import networkx_graph_to_equation

__all__ = [
    "array_contract",
    "array_contract_expression",
    "array_contract_path",
    "array_contract_tree",
    "AutoOptimizer",
    "auto_hq_optimize",
    "auto_optimize",
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
    "perverse_equation",
    "rand_equation",
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
