"""Built-in optimize presets.

Mirrors the reference preset surface (``cotengra/presets.py``,
``__init__.py:266-372``): ``auto``/``auto-hq`` pick optimal DP for small
contractions (hardness cutoff ``n^2 * sqrt(k)``) and fall back to
hyper-optimized search otherwise; plus direct ``greedy``, ``optimal``,
``optimal-outer``, ``random-greedy{,-128}``, ``edgesort``, ``random``,
``simplify`` entries. ``hyper`` presets are registered by
``cotengra_tpu.hyper`` once that subsystem imports.
"""

import functools
import threading

from .interface import register_preset
from .pathfinders.basic import (
    optimize_greedy,
    optimize_optimal,
    optimize_random_greedy_track_flops,
    optimize_simplify,
)


def estimate_optimal_hardness(inputs):
    """Cheap estimate of how hard exact DP would be: ``n^2 * k^0.5`` with
    n = number of terms, k = number of distinct indices (reference
    ``presets.py:26-41``).
    """
    n = len(inputs)
    k = len({ix for term in inputs for ix in term})
    return n**2 * k**0.5


class AutoOptimizer:
    """Optimal DP if the contraction is small, otherwise a (thread-local)
    hyper-optimizer search with an early-stopping rate.
    """

    def __init__(
        self,
        optimal_cutoff=250,
        minimize="combo",
        methods=None,
        max_time="rate:1e9",
        max_repeats=128,
        **hyperoptimizer_opts,
    ):
        self.optimal_cutoff = optimal_cutoff
        self.minimize = minimize
        self.hyperoptimizer_opts = dict(
            methods=methods,
            max_time=max_time,
            max_repeats=max_repeats,
            minimize=minimize,
            reconf_opts={},
            parallel=False,
            **hyperoptimizer_opts,
        )
        self._local = threading.local()

    def _get_hyperoptimizer(self):
        try:
            return self._local.opt
        except AttributeError:
            from .hyper import HyperOptimizer

            self._local.opt = HyperOptimizer(**self.hyperoptimizer_opts)
            return self._local.opt

    def search(self, inputs, output, size_dict):
        from .tree import ContractionTree

        if estimate_optimal_hardness(inputs) < self.optimal_cutoff:
            ssa_path = optimize_optimal(
                inputs,
                output,
                size_dict,
                minimize=self.minimize,
                use_ssa=True,
            )
            return ContractionTree.from_path(
                inputs, output, size_dict, ssa_path=ssa_path
            )
        try:
            opt = self._get_hyperoptimizer()
            return opt.search(inputs, output, size_dict)
        except ImportError:
            # hyper not yet available - fall back to random-greedy
            ssa_path, _ = optimize_random_greedy_track_flops(
                inputs, output, size_dict, ntrials=32, use_ssa=True
            )
            return ContractionTree.from_path(
                inputs, output, size_dict, ssa_path=ssa_path
            )

    def __call__(self, inputs, output, size_dict):
        return self.search(inputs, output, size_dict).get_path()


class AutoHQOptimizer(AutoOptimizer):
    """Auto optimizer tuned for harder/repeated contractions: higher
    optimal cutoff and a slower stopping rate (reference
    ``presets.py:134-152``)."""

    def __init__(self, **kwargs):
        kwargs.setdefault("optimal_cutoff", 650)
        kwargs.setdefault("max_time", "rate:1e8")
        kwargs.setdefault("max_repeats", 128)
        super().__init__(**kwargs)


auto_optimize = AutoOptimizer(optimal_cutoff=250, max_time="rate:1e9")
auto_hq_optimize = AutoHQOptimizer()


def _random_greedy(inputs, output, size_dict, ntrials=32, **kwargs):
    path, _ = optimize_random_greedy_track_flops(
        inputs, output, size_dict, ntrials=ntrials, **kwargs
    )
    return path


def _tree_of(fn):
    @functools.wraps(fn)
    def tree_fn(inputs, output, size_dict):
        from .tree import ContractionTree

        return ContractionTree.from_path(
            inputs, output, size_dict, path=fn(inputs, output, size_dict)
        )

    return tree_fn


def register_builtin_presets():
    from .pathfinders.edgesort import optimize_edgesort
    from .pathfinders.random import optimize_random

    greedy_fn = functools.partial(optimize_greedy, use_ssa=False)
    register_preset(
        "greedy", greedy_fn, _tree_of(greedy_fn)
    )

    optimal_fn = functools.partial(optimize_optimal, use_ssa=False)
    register_preset(("optimal", "dp"), optimal_fn, _tree_of(optimal_fn))

    optimal_outer_fn = functools.partial(
        optimize_optimal, use_ssa=False, search_outer=True
    )
    register_preset(
        "optimal-outer", optimal_outer_fn, _tree_of(optimal_outer_fn)
    )

    rg = functools.partial(_random_greedy, ntrials=32)
    register_preset("random-greedy", rg, _tree_of(rg))
    rg128 = functools.partial(_random_greedy, ntrials=128)
    register_preset("random-greedy-128", rg128, _tree_of(rg128))

    register_preset(
        "simplify",
        functools.partial(optimize_simplify, use_ssa=False),
        _tree_of(functools.partial(optimize_simplify, use_ssa=False)),
    )

    register_preset(
        "edgesort", optimize_edgesort, _tree_of(optimize_edgesort)
    )
    register_preset("random", optimize_random, _tree_of(optimize_random))

    register_preset(
        "auto", auto_optimize, lambda *a: auto_optimize.search(*a)
    )
    register_preset(
        "auto-hq", auto_hq_optimize, lambda *a: auto_hq_optimize.search(*a)
    )
