"""Objectives: the cost model used across pathfinding, slicing, refinement
and hyper-optimization.

Behavioral parity with reference ``cotengra/scoring.py``: each exact
objective supplies five hooks used by different subsystems -

- ``__call__(trial)``        - hyper-optimizer trial score (log2 scale)
- ``cost_local_tree_node``   - subtree-reconfiguration local cost
- ``score_local``            - simulated-annealing local score
- ``score_slice_index``      - slicer index-selection score
- ``get_dynamic_programming_minimize`` - key for the optimal-DP cost fn

String specs parse like ``"flops"``, ``"size"``, ``"write"``,
``"combo"``/``"combo-64"``, ``"limit:32"`` (both ``-`` and ``:`` separators
accepted, as in reference ``scoring.py:797-877``).
"""

import functools
import math
import re

DEFAULT_COMBO_FACTOR = 64


class Objective:
    __slots__ = ()

    def __call__(self, trial):
        raise NotImplementedError

    def __repr__(self):
        params = {k: getattr(self, k) for k in getattr(self, "__slots__", ())}
        return (
            f"{self.__class__.__name__}("
            + ", ".join(f"{k}={v}" for k, v in params.items())
            + ")"
        )

    def __hash__(self):
        return hash(repr(self))

    def __eq__(self, other):
        return repr(self) == repr(other)


def ensure_basic_quantities(trial):
    """Fill ``flops``, ``write``, ``size`` into a trial dict if missing."""
    if not all(q in trial for q in ("flops", "write", "size")):
        stats = trial["tree"].contract_stats()
        trial.setdefault("flops", stats["flops"])
        trial.setdefault("write", stats["write"])
        trial.setdefault("size", stats["size"])


class ExactObjective(Objective):
    __slots__ = ()

    def cost_local_tree_node(self, tree, node):
        raise NotImplementedError

    def score_local(self, **kwargs):
        raise NotImplementedError

    def score_slice_index(self, costs, ix):
        raise NotImplementedError

    def get_dynamic_programming_minimize(self):
        raise NotImplementedError


def _agg(x, combine=sum):
    try:
        return combine(x)
    except TypeError:
        return x


class FlopsObjective(ExactObjective):
    """Minimize total operation count, with tiny secondary weight on write
    and max-size to break ties.
    """

    __slots__ = ("secondary_weight",)

    def __init__(self, secondary_weight=1e-3):
        self.secondary_weight = secondary_weight

    def cost_local_tree_node(self, tree, node):
        return tree.get_flops(node)

    def score_local(self, **kwargs):
        return math.log2(_agg(kwargs["flops"]))

    def score_slice_index(self, costs, ix):
        return math.log(
            costs.flop_reductions[ix]
            + costs.write_reductions[ix] * self.secondary_weight
            + 1
        )

    def get_dynamic_programming_minimize(self):
        return "flops"

    def __call__(self, trial):
        ensure_basic_quantities(trial)
        return (
            math.log2(trial["flops"])
            + self.secondary_weight * math.log2(trial["write"])
            + self.secondary_weight * math.log2(trial["size"])
        )


class WriteObjective(ExactObjective):
    """Minimize total memory written (sum of all intermediate sizes)."""

    __slots__ = ("secondary_weight",)

    def __init__(self, secondary_weight=1e-3):
        self.secondary_weight = secondary_weight

    def cost_local_tree_node(self, tree, node):
        return tree.get_size(node)

    def score_local(self, **kwargs):
        return math.log2(_agg(kwargs["size"]))

    def score_slice_index(self, costs, ix):
        return math.log(
            costs.flop_reductions[ix] * self.secondary_weight
            + costs.write_reductions[ix]
            + 1
        )

    def get_dynamic_programming_minimize(self):
        return "write"

    def __call__(self, trial):
        ensure_basic_quantities(trial)
        return (
            self.secondary_weight * math.log2(trial["flops"])
            + math.log2(trial["write"])
            + self.secondary_weight * math.log2(trial["size"])
        )


class SizeObjective(ExactObjective):
    """Minimize the single largest intermediate tensor."""

    __slots__ = ("secondary_weight",)

    def __init__(self, secondary_weight=1e-3):
        self.secondary_weight = secondary_weight

    def cost_local_tree_node(self, tree, node):
        return tree.get_size(node)

    def score_local(self, **kwargs):
        return math.log2(_agg(kwargs["size"], combine=max))

    def score_slice_index(self, costs, ix):
        return math.log(
            costs.flop_reductions[ix] * self.secondary_weight
            + costs.write_reductions[ix]
            + 1
        )

    def get_dynamic_programming_minimize(self):
        return "size"

    def __call__(self, trial):
        ensure_basic_quantities(trial)
        return (
            self.secondary_weight * math.log2(trial["flops"])
            + self.secondary_weight * math.log2(trial["write"])
            + math.log2(trial["size"])
        )


class ComboObjective(ExactObjective):
    """Minimize ``log2(flops + factor * write)`` - a realistic single-number
    model of time on bandwidth-limited hardware. The default ``factor=64``
    approximates the flops:bytes ratio of modern accelerators.
    """

    __slots__ = ("factor",)

    def __init__(self, factor=DEFAULT_COMBO_FACTOR):
        self.factor = factor

    def cost_local_tree_node(self, tree, node):
        return tree.get_flops(node) + self.factor * tree.get_size(node)

    def score_local(self, **kwargs):
        f = _agg(kwargs["flops"])
        w = _agg(kwargs["size"])
        return math.log2(f + self.factor * w)

    def score_slice_index(self, costs, ix):
        return math.log(
            costs.flop_reductions[ix]
            + costs.write_reductions[ix] * self.factor
            + 1
        )

    def get_dynamic_programming_minimize(self):
        return f"combo-{self.factor}"

    def __call__(self, trial):
        ensure_basic_quantities(trial)
        return math.log2(trial["flops"] + self.factor * trial["write"])


class LimitObjective(ExactObjective):
    """Minimize ``sum_i max(flops_i, factor * write_i)`` - assumes each
    contraction is either compute- or bandwidth-bound.
    """

    __slots__ = ("factor",)

    def __init__(self, factor=DEFAULT_COMBO_FACTOR):
        self.factor = factor

    def cost_local_tree_node(self, tree, node):
        return max(tree.get_flops(node), self.factor * tree.get_size(node))

    def score_local(self, **kwargs):
        f = kwargs["flops"]
        w = kwargs["size"]
        try:
            return math.log2(
                sum(max(fi, self.factor * wi) for fi, wi in zip(f, w))
            )
        except TypeError:
            return math.log2(max(f, self.factor * w))

    def score_slice_index(self, costs, ix):
        return math.log(
            costs.flop_reductions[ix]
            + costs.write_reductions[ix] * self.factor
            + 1
        )

    def get_dynamic_programming_minimize(self):
        return f"limit-{self.factor}"

    def __call__(self, trial):
        tree = trial["tree"]
        return math.log2(tree.combo_cost(factor=self.factor, combine=max))


# -- string spec parsing -----------------------------------------------------

_OBJECTIVE_RE = re.compile(
    r"^(?P<name>flops|write|size|combo|limit)"
    r"(?:[-:](?P<factor>[\d.]+))?$"
)


@functools.lru_cache(maxsize=None)
def parse_minimize(minimize):
    """Parse an objective specification (string or Objective) into an
    Objective instance.
    """
    if isinstance(minimize, Objective):
        return minimize
    if not isinstance(minimize, str):
        raise TypeError(f"Can't parse objective from {minimize!r}.")

    m = _OBJECTIVE_RE.match(minimize)
    if m is None:
        raise ValueError(f"Unknown objective specification: {minimize!r}.")
    name = m.group("name")
    factor = m.group("factor")

    if name == "flops":
        return FlopsObjective()
    if name == "write":
        return WriteObjective()
    if name == "size":
        return SizeObjective()
    if name == "combo":
        f = float(factor) if factor is not None else DEFAULT_COMBO_FACTOR
        f = int(f) if f == int(f) else f
        return ComboObjective(factor=f)
    if name == "limit":
        f = float(factor) if factor is not None else DEFAULT_COMBO_FACTOR
        f = int(f) if f == int(f) else f
        return LimitObjective(factor=f)
    raise ValueError(minimize)


def get_score_fn(minimize):
    """Alias of :func:`parse_minimize` (reference ``scoring.py:880``)."""
    return parse_minimize(minimize)
