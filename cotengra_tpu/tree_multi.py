"""Multi-contraction trees: amortized contraction of a *batch* of index
configurations over one shared tensor network (e.g. computing many
amplitudes / VMC local energies).

Certain 'variable' indices take a different (projected) value per
configuration; every node's cost is multiplied by the expected number of
distinct configurations of the variable indices it depends on, and peak
memory is estimated cache-aware (a node whose variable indices differ from
a child's is 'bright' - its child results must be cached across
configurations). Reference: ``core_multi.py``, ``scoring.py:892-963``.
"""

import math

from .scoring import get_multi_objective
from .tree import ContractionTree, node_get_single_el


class ContractionTreeMulti(ContractionTree):
    def __init__(
        self,
        inputs,
        output,
        size_dict,
        varmults=None,
        numconfigs=None,
        objective=None,
        sliced_inds=(),
    ):
        if objective is None:
            objective = get_multi_objective(
                "uniform", numconfigs if numconfigs is not None else 1
            )
        super().__init__(inputs, output, size_dict, objective="flops")
        self._objective = objective
        # variable indices are stored in sliced_inds (value None) so that
        # all leg computations automatically exclude them
        self.sliced_inds = {ix: None for ix in sliced_inds}
        self._var_inds_cache = {}
        self._mult_cache = {}
        self._bright_cache = {}

    def set_default_objective(self, objective):
        self._objective = objective

    def copy(self):
        new = super().copy()
        new._var_inds_cache = dict(self._var_inds_cache)
        new._mult_cache = dict(self._mult_cache)
        new._bright_cache = dict(self._bright_cache)
        return new

    def _forget(self, node):
        super()._forget(node)
        self._var_inds_cache.pop(node, None)
        self._mult_cache.pop(node, None)
        self._bright_cache.pop(node, None)

    # -- variable-index bookkeeping ------------------------------------------

    def get_node_var_inds(self, node):
        """The variable indices this node's subtree depends on."""
        try:
            return self._var_inds_cache[node]
        except KeyError:
            pass
        if node.bit_count() == 1:
            i = node_get_single_el(node)
            out = {
                ix: None
                for ix in self.inputs[i]
                if ix in self.sliced_inds
            }
        else:
            try:
                l, r = self.children[node]
                out = {
                    **self.get_node_var_inds(l),
                    **self.get_node_var_inds(r),
                }
            except KeyError:
                out = {
                    ix: None
                    for i in range(self.N)
                    if (node >> i) & 1
                    for ix in self.inputs[i]
                    if ix in self.sliced_inds
                }
        self._var_inds_cache[node] = out
        return out

    def get_node_is_bright(self, node):
        """A node is 'bright' if its variable indices differ from a
        child's - then child results must be cached across configs."""
        try:
            return self._bright_cache[node]
        except KeyError:
            pass
        if node.bit_count() == 1:
            i = node_get_single_el(node)
            out = any(ix in self.sliced_inds for ix in self.inputs[i])
        else:
            l, r = self.children[node]
            nv = self.get_node_var_inds(node)
            out = (nv != self.get_node_var_inds(l)) or (
                nv != self.get_node_var_inds(r)
            )
        self._bright_cache[node] = out
        return out

    def get_node_mult(self, node):
        """Expected number of recomputations of this node across
        configurations."""
        try:
            return self._mult_cache[node]
        except KeyError:
            pass
        out = self._objective.estimate_node_mult(self, node)
        self._mult_cache[node] = out
        return out

    def get_node_cache_mult(self, node, sliced_ind_ordering):
        return self._objective.estimate_node_cache_mult(
            self, node, sliced_ind_ordering
        )

    # -- cost overrides --------------------------------------------------------

    def get_flops(self, node):
        return super().get_flops(node) * self.get_node_mult(node)

    def get_cache_contrib(self, node):
        l, r = self.children[node]
        lr_peak = 0
        if self.get_node_is_bright(l):
            lr_peak += self.get_size(l)
        if self.get_node_is_bright(r):
            lr_peak += self.get_size(r) * self.get_node_mult(r)
        rl_peak = 0
        if self.get_node_is_bright(r):
            rl_peak += self.get_size(r)
        if self.get_node_is_bright(l):
            rl_peak += self.get_size(l) * self.get_node_mult(l)
        if lr_peak <= rl_peak:
            return lr_peak
        self.children[node] = (r, l)
        return rl_peak

    def peak_size(self, order=None, log=None):
        peak = sum(
            self.get_cache_contrib(p) for p in self.children
        )
        if log is not None:
            peak = math.log(max(peak, 1), log)
        return peak

    def reorder_contractions_for_peak_est(self):
        """Orient children to minimize the cache-aware peak estimate."""
        swapped = False
        for p in list(self.children):
            l, r = self.children[p]
            before = (l, r)
            self.get_cache_contrib(p)
            if self.children[p] != before:
                swapped = True
        return swapped

    def reorder_sliced_inds(self):
        """Order the variable indices by first use in the contraction."""
        ordering = {}
        for node, _, _ in self.traverse():
            ordering.update(self.get_node_var_inds(node))
        self.sliced_inds = {ix: None for ix in ordering}

    # -- exact accounting over an explicit config batch ------------------------

    def exact_multi_stats(self, configs):
        """Exactly simulate contracting ``configs`` (list of
        {var_ind: value} dicts) with caching of shared intermediates,
        returning true flops/write/peak (reference
        ``core_multi.py:167-253``).
        """
        plr = tuple(self.traverse())

        def to_key(node, config):
            sub = tuple(
                config[ix] for ix in self.get_node_var_inds(node)
            )
            return hash((node, sub))

        cons = []
        seen = set()
        for config in configs:
            cons_i = []
            for p, l, r in plr:
                pkey = to_key(p, config)
                if pkey not in seen:
                    seen.add(pkey)
                    cons_i.append(
                        {
                            "p": p,
                            "l": l,
                            "r": r,
                            "lkey": to_key(l, config),
                            "rkey": to_key(r, config),
                        }
                    )
            cons.append(cons_i)
        del seen

        deleted = set()
        for cons_i in reversed(cons):
            for con in reversed(cons_i):
                for side in ("r", "l"):
                    key = con[f"{side}key"]
                    con[f"{side}del"] = key not in deleted
                    deleted.add(key)
        del deleted

        flops = 0
        mem_current = 0
        mem_peak = 0
        mem_write = 0
        for cons_i in cons:
            p = None
            for con in cons_i:
                p = con["p"]
                flops += ContractionTree.get_flops(self, p)
                psize = self.get_size(p)
                mem_current += psize
                mem_write += psize
                mem_peak = max(mem_peak, mem_current)
                l, r = con["l"], con["r"]
                if con["ldel"] and l.bit_count() > 1:
                    mem_current -= self.get_size(l)
                if con["rdel"] and r.bit_count() > 1:
                    mem_current -= self.get_size(r)
            if p is not None:
                mem_current -= self.get_size(p)

        return {
            "flops": flops,
            "write": mem_write,
            "size": self.max_size(),
            "peak": mem_peak,
        }
