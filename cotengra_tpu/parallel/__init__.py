from .pools import (
    get_num_workers,
    parse_parallel_arg,
    set_parallel_backend,
    should_nest,
    submit,
)

__all__ = [
    "get_num_workers",
    "parse_parallel_arg",
    "set_parallel_backend",
    "should_nest",
    "submit",
]
