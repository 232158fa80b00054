from .executor import (
    contract_core,
    contract_slice,
    contract_tree,
    gather_slices,
    gen_output_chunks,
    make_contractor,
    make_full_contractor,
    make_staged_contractor,
    slice_arrays,
)
from .grouped import (
    build_grouped_core_fn,
    make_grouped_staged_contractor,
    plan_grouped,
)
from .lowering import ContractionIR, extract_contractions
from .pairwise import (
    apply_pairwise,
    apply_single,
    einsum as pairwise_einsum,
    tensordot,
)

__all__ = [
    "apply_pairwise",
    "pairwise_einsum",
    "tensordot",
    "apply_single",
    "contract_core",
    "contract_slice",
    "contract_tree",
    "ContractionIR",
    "extract_contractions",
    "gather_slices",
    "make_contractor",
    "make_full_contractor",
    "slice_arrays",
]
