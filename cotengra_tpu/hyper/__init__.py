"""Hyper-optimization subsystem: method registry, samplers, driver."""

import functools

from .driver import (
    HyperOptimizer,
    ReusableHyperOptimizer,
    get_hyper_space,
    list_hyper_functions,
    register_hyper_function,
    run_trial,
)
from .space import (
    EvolutionOptLib,
    HyperOptLib,
    RandomOptLib,
    get_optlib,
    register_hyper_optlib,
)

# -- built-in hyper methods ---------------------------------------------------


def _hyper_ssa_greedy(inputs, output, size_dict, **params):
    from ..pathfinders.basic import optimize_greedy

    return optimize_greedy(
        inputs, output, size_dict, use_ssa=True, **params
    )


register_hyper_function(
    "greedy",
    _hyper_ssa_greedy,
    space={
        "costmod": {"type": "FLOAT", "min": 0.1, "max": 4.0},
        "temperature": {"type": "FLOAT_EXP", "min": 0.001, "max": 1.0},
    },
)


def _hyper_ssa_edgesort(inputs, output, size_dict, **params):
    from ..pathfinders.edgesort import optimize_edgesort

    return optimize_edgesort(inputs, output, size_dict, use_ssa=True)


register_hyper_function("edgesort", _hyper_ssa_edgesort, space={})


def _hyper_ssa_labels(inputs, output, size_dict, **params):
    from ..pathfinders.labels import optimize_labels

    return optimize_labels(
        inputs, output, size_dict, use_ssa=True, **params
    )


register_hyper_function(
    "labels",
    _hyper_ssa_labels,
    space={
        "parts": {"type": "INT", "min": 2, "max": 8},
        "cutoff": {"type": "INT", "min": 8, "max": 40},
        "balance_pow": {"type": "FLOAT", "min": 0.5, "max": 4.0},
        "maxiter": {"type": "INT", "min": 8, "max": 30},
        "sub_optimize": {
            "type": "STRING",
            "options": ["greedy", "auto"],
        },
    },
)


class UniformOptimizer(HyperOptimizer):
    """Uniform random sampling over methods/params (no learning) - useful
    as a control and in tests (reference parity: ``UniformOptimizer``).
    """

    def __init__(self, **kwargs):
        kwargs.setdefault("optlib", "random")
        super().__init__(**kwargs)


# -- presets ------------------------------------------------------------------


def hyper_optimize(inputs, output, size_dict, get="tree", **opts):
    opt = HyperOptimizer(**opts)
    tree = opt.search(inputs, output, size_dict)
    if get == "tree":
        return tree
    return tree.get_path()


def register_hyper_presets():
    from ..interface import register_preset

    register_preset(
        "hyper",
        functools.partial(hyper_optimize, get="path"),
        functools.partial(hyper_optimize, get="tree"),
    )
    register_preset(
        "hyper-256",
        functools.partial(hyper_optimize, get="path", max_repeats=256),
        functools.partial(hyper_optimize, get="tree", max_repeats=256),
    )
    register_preset(
        "hyper-greedy",
        functools.partial(
            hyper_optimize, get="path", methods=["greedy"]
        ),
        functools.partial(
            hyper_optimize, get="tree", methods=["greedy"]
        ),
    )
    for name in ("hyper-labels", "hyper-kahypar", "hyper-balanced"):
        method = {
            "hyper-labels": "labels",
            "hyper-kahypar": "kahypar",
            "hyper-balanced": "kahypar-balanced",
        }[name]

        def _mk(method):
            def path_fn(inputs, output, size_dict):
                return hyper_optimize(
                    inputs, output, size_dict, get="path",
                    methods=[method],
                )

            def tree_fn(inputs, output, size_dict):
                return hyper_optimize(
                    inputs, output, size_dict, get="tree",
                    methods=[method],
                )

            return path_fn, tree_fn

        try:
            if method in list_hyper_functions():
                pf, tf = _mk(method)
                register_preset(name, pf, tf)
        except Exception:
            pass


__all__ = [
    "EvolutionOptLib",
    "get_hyper_space",
    "get_optlib",
    "hyper_optimize",
    "HyperOptimizer",
    "HyperOptLib",
    "list_hyper_functions",
    "RandomOptLib",
    "register_hyper_function",
    "register_hyper_optlib",
    "register_hyper_presets",
    "ReusableHyperOptimizer",
    "run_trial",
    "UniformOptimizer",
]
