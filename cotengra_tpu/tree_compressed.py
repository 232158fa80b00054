"""Contraction trees for *compressed* (bond-truncated, chi-capped)
contraction.

``ContractionTreeCompressed`` swaps every cost method for its compressed
variant (computed by hypergraph replay with ``compress()`` steps), defaults
the traversal to *surface order* (the order of the generating path, which
is what a compressed sweep follows), and defaults the objective to
``peak-compressed`` (reference ``core.py:4251-4418``).

Exact pairwise execution of such a tree is intentionally refused - a
compressed contraction requires truncation (QR/SVD) between steps; see
``cotengra_tpu.ops.compressed`` for the TPU execution path.
"""

import functools
import math

from .scoring import parse_minimize
from .tree import ContractionTree
from .utils.misc import get_rng


class ContractionTreeCompressed(ContractionTree):
    def __init__(
        self,
        inputs,
        output,
        size_dict,
        track_childless=False,
        objective="peak-compressed",
    ):
        super().__init__(
            inputs,
            output,
            size_dict,
            track_childless=track_childless,
            objective=objective,
        )

    @classmethod
    def from_path(
        cls,
        inputs,
        output,
        size_dict,
        *,
        path=None,
        ssa_path=None,
        edge_path=None,
        autocomplete="auto",
        check=False,
        objective="peak-compressed",
        **kwargs,
    ):
        return super().from_path(
            inputs,
            output,
            size_dict,
            path=path,
            ssa_path=ssa_path,
            edge_path=edge_path,
            autocomplete=autocomplete,
            check=check,
            objective=objective,
            **kwargs,
        )

    def get_default_objective(self):
        return self._objective

    # -- swap exact cost methods for compressed ones ------------------------

    total_flops = ContractionTree.total_flops_compressed
    total_write = ContractionTree.total_write_compressed
    max_size = ContractionTree.max_size_compressed
    peak_size = ContractionTree.peak_size_compressed
    total_cost = ContractionTree.total_cost_compressed
    contraction_width = ContractionTree.contraction_width_compressed

    total_flops_exact = ContractionTree.total_flops
    total_write_exact = ContractionTree.total_write
    max_size_exact = ContractionTree.max_size
    peak_size_exact = ContractionTree.peak_size

    def total_combo_compressed(self, chi=None, order="surface_order",
                               compress_late=None, factor=None, log=None):
        if factor is None:
            factor = self.get_default_combo_factor()
        return self.total_cost_compressed(
            chi, order, compress_late, factor=factor, log=log
        )

    def contract_stats(self, force=False):
        # keep exact stats available for structural bookkeeping
        return ContractionTree.contract_stats(self, force=force)

    def describe(self, info="normal", join=" "):
        stats = self.compressed_contract_stats()
        if info == "normal":
            return join.join(
                (
                    f"log10[FLOPs]={math.log10(max(stats.flops, 1)):.2f}",
                    f"log2[SIZE]={math.log2(max(stats.max_size, 1)):.2f}",
                )
            )
        return join.join(
            (
                f"log10[FLOPS]={math.log10(max(stats.flops, 1)):.2f}",
                f"log2[SIZE]={math.log2(max(stats.max_size, 1)):.2f}",
                f"log2[PEAK]={math.log2(max(stats.peak_size, 1)):.2f}",
                f"log2[WRITE]={math.log2(max(stats.write, 1)):.2f}",
            )
        )

    def get_contractor(self, *args, **kwargs):
        raise NotImplementedError(
            "ContractionTreeCompressed models *approximate* (bond "
            "truncated) contraction costs - exact pairwise execution "
            "would be exponential. Use tree.contract_compressed(arrays, "
            "chi=...) for native approximate execution, or export the "
            "order with tree.get_path()."
        )

    def contract(self, *args, **kwargs):
        return self.get_contractor()

    def contract_core(self, *args, **kwargs):
        return self.get_contractor()

    def contract_compressed(self, arrays, chi=None, **kwargs):
        """Approximately contract ``arrays`` with chi-capped bond
        truncation (QR+SVD), natively on device. This goes beyond the
        reference, which delegates compressed execution to quimb.
        """
        from .ops.compressed import contract_compressed

        return contract_compressed(self, arrays, chi=chi, **kwargs)

    # -- refinement over contraction orders ----------------------------------

    def windowed_reconfigure(
        self,
        minimize=None,
        order_only=True,
        window_size=20,
        max_iterations=100,
        max_window_tries=1000,
        score_temperature=0.0,
        queue_temperature=1.0,
        seed=None,
        inplace=False,
        progbar=False,
        **kwargs,
    ):
        """Anneal the *surface order* of the contractions: propose local
        reorderings (adjacent transpositions that keep the order
        topologically valid) and accept by compressed-score Metropolis
        (simplified analog of reference ``core.py:4364-4416`` /
        ``path_compressed.py``).
        """
        tree = self if inplace else self.copy()
        objective = parse_minimize(
            minimize
            if minimize is not None
            else tree.get_default_objective()
        )
        rng = get_rng(seed)

        order = [
            (p, l, r) for p, l, r in tree.traverse("surface_order")
        ]
        tracker_cls = getattr(objective, "tracker_cls", None)

        def score_of(order_list):
            seq = {p: i for i, (p, _, _) in enumerate(order_list)}
            stats = tree.compressed_contract_stats(
                chi=getattr(objective, "chi", None),
                order=lambda n: seq.get(n, len(seq)),
                tracker_cls=tracker_cls,
            )
            return stats.score if tracker_cls else stats.combo_score

        current = score_of(order)
        n = len(order)

        def earliest_valid_pos(j):
            """Earliest position step j could move to: just after the
            last step producing one of its inputs."""
            pj, lj, rj = order[j]
            pos = 0
            for k in range(j):
                pk = order[k][0]
                if pk == lj or pk == rj:
                    pos = k + 1
            return pos

        for _ in range(max_iterations):
            improved = False
            # proposals: move a step earlier in the order ("eager"
            # scheduling perturbations) - adjacent swaps are almost never
            # valid on the chain-like orders compressed sweeps produce
            for _try in range(
                max(1, max_window_tries // max_iterations)
            ):
                if n < 3:
                    break
                j = rng.randrange(1, n)
                lo = max(earliest_valid_pos(j), j - window_size)
                if lo >= j:
                    continue
                i = rng.randrange(lo, j)
                candidate = order[:i] + [order[j]] + order[i:j] + order[j + 1:]
                new = score_of(candidate)
                dE = new - current
                if dE <= 0 or (
                    score_temperature > 0
                    and rng.random() < math.exp(-dE / score_temperature)
                ):
                    order = candidate
                    current = new
                    improved = dE < 0
                    break
            if not improved and score_temperature == 0:
                break

        # persist the refined order
        tree._surface_seq = {p: i for i, (p, _, _) in enumerate(order)}
        return tree

    windowed_reconfigure_ = functools.partialmethod(
        windowed_reconfigure, inplace=True
    )

    def compressed_reconfigure(
        self,
        minimize=None,
        num_restarts=4,
        max_iterations=50,
        temperatures=(0.0, 0.05, 0.2),
        seed=None,
        inplace=False,
        **kwargs,
    ):
        """Multi-restart annealed order refinement: run
        ``windowed_reconfigure`` from several temperatures and keep the
        best (serves the role of the reference's exhaustive
        branch-and-bound ``compressed_reconfigure``,
        ``core.py:3038-3066``).
        """
        rng = get_rng(seed)
        objective = parse_minimize(
            minimize
            if minimize is not None
            else self.get_default_objective()
        )
        tracker_cls = getattr(objective, "tracker_cls", None)
        chi = getattr(objective, "chi", None)

        def score(t):
            stats = t.compressed_contract_stats(
                chi=chi, tracker_cls=tracker_cls
            )
            return stats.score if tracker_cls else stats.combo_score

        best = self
        best_score = score(self)
        for r in range(num_restarts):
            temp = temperatures[r % len(temperatures)]
            cand = self.windowed_reconfigure(
                minimize=minimize,
                max_iterations=max_iterations,
                score_temperature=temp,
                seed=rng.randrange(2**32),
                inplace=False,
                **kwargs,
            )
            s = score(cand)
            if s < best_score:
                best, best_score = cand, s

        if inplace:
            if best is not self:
                self._adopt(best)
                self._surface_seq = getattr(
                    best, "_surface_seq", None
                ) or {}
            return self
        return best

    compressed_reconfigure_ = functools.partialmethod(
        compressed_reconfigure, inplace=True
    )

    def __repr__(self):
        return f"<{self.__class__.__name__}(N={self.N})>"

    def __str__(self):
        return (
            f"<{self.__class__.__name__}(N={self.N}, "
            f"{self.describe('normal', join=', ')})>"
        )
