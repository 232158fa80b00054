from .mesh import (
    broadcast_tree,
    contract_sharded,
    get_default_mesh,
    get_global_mesh,
    make_sharded_contractor,
    maybe_init_distributed,
)
from .pools import (
    get_num_workers,
    parse_parallel_arg,
    set_parallel_backend,
    should_nest,
    submit,
)

__all__ = [
    "broadcast_tree",
    "contract_sharded",
    "get_default_mesh",
    "get_global_mesh",
    "get_num_workers",
    "make_sharded_contractor",
    "maybe_init_distributed",
    "parse_parallel_arg",
    "set_parallel_backend",
    "should_nest",
    "submit",
]
