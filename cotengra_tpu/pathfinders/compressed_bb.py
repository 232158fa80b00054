"""Exhaustive best-first / branch-and-bound search over *compressed*
contraction orders.

Unlike the window-localized refinement (:mod:`.windowed_opt`), this
explores the full space of contraction sequences of a chi-capped
contraction, with three prunes:

- **bound**: any partial sequence whose tracker score already exceeds
  the best complete score is dropped (compressed trackers accumulate
  monotonically);
- **state dedup**: two sequences reaching the same partial partition of
  the leaves are interchangeable - only the cheaper one survives;
- **ordering**: a ``local_score(step, tracker)`` priority drives the
  frontier; the default is depth-first by memory saved, while
  ``exploration_power > 0`` switches to score-vs-completeness balance.

``explore_path`` seeds the frontier with a known path (installing its
score as the initial bound), optionally *restricting* the search to the
path's own merges so only their order is optimized.

Reference parity:
``/root/reference/cotengra/experimental/path_compressed_branchbound.py:14-359``
(behavior studied; re-implemented on this package's hypergraph and
tracker protocol).
"""

import heapq
import itertools
import math

from ..hypergraph import HyperGraph
from ..scoring import parse_minimize
from ..tree import ssa_to_linear

__all__ = ("CompressedExhaustive", "CompressedTreeRefiner")


def _tracker_score(tracker):
    try:
        return tracker.score
    except NotImplementedError:
        return tracker.combo_score


class CompressedExhaustive:
    """Search all compressed contraction orders with pruning.

    Parameters
    ----------
    minimize : str or Objective
        Compressed objective (a plain exact name like ``"flops"`` is
        promoted to its ``-compressed`` variant).
    max_nodes : int, optional
        Stop (keeping the best complete path found) after this many
        search states.
    max_time : float, optional
        Wall-clock budget in seconds.
    local_score : callable ``(step, tracker) -> key``, optional
        Frontier priority; smaller explores earlier.
    exploration_power : float, optional
        With no explicit ``local_score``: 0 gives depth-first by memory
        saved; > 0 orders by ``score / (step+1)**(1/power)``.
    best_score : float, optional
        Initial upper bound.
    progbar : bool, optional
    """

    def __init__(
        self,
        minimize,
        max_nodes=float("inf"),
        max_time=None,
        local_score=None,
        exploration_power=0.0,
        best_score=None,
        progbar=False,
    ):
        if isinstance(minimize, str) and "compressed" not in minimize:
            minimize = minimize + "-compressed"
        self.objective = parse_minimize(minimize)
        chi = getattr(self.objective, "chi", "auto")
        self.chi = chi
        self.compress_late = bool(
            getattr(self.objective, "compress_late", False)
        )
        self.best_score = (
            float("inf") if best_score is None else abs(best_score)
        )
        self.best_ssa_path = None
        self.max_nodes = max_nodes
        self.max_time = max_time
        self.exploration_power = exploration_power
        self.progbar = progbar
        self.allow = None
        self._frontier = None

        if local_score is None:
            if exploration_power <= 0:

                def local_score(step, tracker):
                    # depth-first, preferring merges that free memory
                    return -step, tracker.size_change

            else:

                def local_score(step, tracker):
                    return _tracker_score(tracker) / (step + 1) ** (
                        1 / self.exploration_power
                    )

        self.local_score = local_score

    # -- state management ---------------------------------------------------

    def setup(self, inputs, output, size_dict):
        """Prepare the search space for one specific contraction."""
        if self._frontier is not None:
            return
        hg = HyperGraph(inputs, output, size_dict)
        if self.chi in (None, "auto"):
            self.chi = max(size_dict.values(), default=2) ** 2
        get = getattr(
            self.objective, "get_compressed_stats_tracker", None
        )
        if get is not None:
            tracker = get(hg)
        else:
            from ..scoring import CompressedStatsTracker

            tracker = CompressedStatsTracker(hg, self.chi)
        # node id -> frozenset of leaves merged into it
        groups = {i: frozenset((i,)) for i in hg.nodes}
        self._tick = itertools.count()
        self.root = (hg, groups, (), tracker)
        c = next(self._tick)
        self._states = {c: self.root}
        self._frontier = [(self.local_score(0, tracker), c)]
        self._preferred = []
        self._seen = {}

    def expand(
        self, i, j, hg, groups, ssa_path, tracker, preferred=False
    ):
        """Fork a state by contracting nodes ``i`` and ``j``; returns
        the new state's id, or None if pruned."""
        gi, gj = groups[i], groups[j]
        gij = gi | gj
        if self.allow is not None and gij not in self.allow:
            return None

        hg = hg.copy()
        tracker = tracker.copy()
        tracker.update_pre_step()
        if self.compress_late:
            tracker.update_pre_compress(hg, i, j)
            hg.compress(
                self.chi, hg.get_node(i) + hg.get_node(j)
            )
            tracker.update_post_compress(hg, i, j)
        tracker.update_pre_contract(hg, i, j)
        ij = hg.contract(i, j)
        tracker.update_post_contract(hg, ij)
        if not self.compress_late:
            tracker.update_pre_compress(hg, ij)
            hg.compress(self.chi, hg.get_node(ij))
            tracker.update_post_compress(hg, ij)
        tracker.update_post_step()

        score = _tracker_score(tracker)
        if score >= self.best_score:
            return None

        ngroups = groups.copy()
        del ngroups[i]
        del ngroups[j]
        ngroups[ij] = gij

        # partial-partition dedup: keep only the cheapest route into
        # any given intermediate partition of the leaves
        key = hash(frozenset(ngroups.values()))
        if score >= self._seen.get(key, float("inf")):
            return None
        self._seen[key] = score

        npath = ssa_path + ((i, j) if i < j else (j, i),)
        c = next(self._tick)
        self._states[c] = (hg, ngroups, npath, tracker)
        if preferred:
            self._preferred.append(c)
        else:
            heapq.heappush(
                self._frontier,
                (self.local_score(len(npath), tracker), c),
            )
        return c

    def explore_path(self, ssa_path, high_priority=True, restrict=False):
        """Seed the frontier with a known SSA path (must call
        :meth:`setup` first). ``restrict=True`` limits the whole search
        to this path's merges (order-only optimization)."""
        hg, groups, path, tracker = self.root
        if restrict and self.allow is None:
            self.allow = set()
        for i, j in ssa_path:
            if restrict:
                self.allow.add(groups[i] | groups[j])
            c = self.expand(
                i, j, hg, groups, path, tracker,
                preferred=high_priority,
            )
            if c is None:
                return
            hg, groups, path, tracker = self._states[c]

    # -- main loop ----------------------------------------------------------

    def run(self, inputs, output, size_dict):
        self.setup(inputs, output, size_dict)

        if self.max_time is not None:
            import time

            t0 = time.time()

        if self.progbar:
            import tqdm

            pbar = tqdm.tqdm()
        else:
            pbar = None

        try:
            while self._states and (self._preferred or self._frontier):
                if self._preferred:
                    c = self._preferred.pop()
                    if c not in self._states:
                        continue
                else:
                    _, c = heapq.heappop(self._frontier)
                    if c not in self._states:
                        continue
                hg, groups, path, tracker = self._states.pop(c)

                if hg.get_num_nodes() == 1:
                    score = _tracker_score(tracker)
                    if score < self.best_score:
                        self.best_score = score
                        self.best_ssa_path = path
                        if pbar is not None:
                            pbar.set_description(
                                f"best:{score:.3f} "
                                f"frontier:{len(self._states)}",
                                refresh=False,
                            )
                    continue

                # expand along every simple (2-node) bond
                for ix in sorted(hg.edges):
                    nodes = hg.edges[ix]
                    if len(nodes) != 2:
                        continue
                    self.expand(*nodes, hg, groups, path, tracker)

                if pbar is not None:
                    pbar.update()
                if self.best_ssa_path is not None and (
                    c > self.max_nodes
                    or (
                        self.max_time is not None
                        and time.time() - t0 >= self.max_time
                    )
                ):
                    break
        except KeyboardInterrupt:
            pass
        finally:
            if pbar is not None:
                pbar.close()

    # -- export -------------------------------------------------------------

    @property
    def ssa_path(self):
        return self.best_ssa_path

    @property
    def path(self):
        return ssa_to_linear(
            self.best_ssa_path, len(self.best_ssa_path) + 1
        )

    def search(self, inputs, output, size_dict):
        """Run and return the best ``ContractionTreeCompressed``."""
        from ..tree_compressed import ContractionTreeCompressed

        self.run(inputs, output, size_dict)
        return ContractionTreeCompressed.from_path(
            inputs, output, size_dict, ssa_path=self.ssa_path
        )

    def __call__(self, inputs, output, size_dict):
        self.run(inputs, output, size_dict)
        return self.path


class CompressedTreeRefiner:
    """Iteratively refine a population of compressed trees, spending
    doubling-then-halving time budgets where refinement keeps paying
    off (reference ``path_compressed_branchbound.py:373-481``).

    Parameters
    ----------
    trees : dict[key, ContractionTreeCompressed]
    minimize : str or Objective
    max_refine_time : int, optional
        Per-tree budget cap (seconds, doubling schedule).
    """

    def __init__(
        self,
        trees,
        minimize="peak-compressed",
        max_refine_time=8,
        progbar=False,
    ):
        self.trees = trees
        self.minimize = minimize
        self.max_refine_time = max_refine_time
        self.progbar = progbar
        self._times = dict.fromkeys(trees, 2)
        self._scores = []
        self.finished = {}
        for key, tree in trees.items():
            self._push(key, self._score(tree))

    def _score(self, tree):
        return math.log2(max(1, tree.peak_size()))

    def _push(self, key, score):
        if self._times[key] <= self.max_refine_time:
            heapq.heappush(self._scores, (-score, key))
        else:
            self.finished[key] = score

    def refine(self, num_its=None):
        if num_its is None:
            num_its = len(self.trees)
        its = range(num_its)
        if self.progbar:
            import tqdm

            its = tqdm.tqdm(its)
        for _ in its:
            if not self._scores:
                break
            nscore, key = heapq.heappop(self._scores)
            old = -nscore
            tree = self.trees[key]
            budget = self._times[key]
            tree = tree.compressed_reconfigure(
                minimize=self.minimize,
                max_time=budget,
                order_only=True,
            )
            tree = tree.compressed_reconfigure(
                minimize=self.minimize,
                max_time=budget,
                order_only=False,
            )
            new = self._score(tree)
            if new >= old:
                self._times[key] *= 2
            else:
                self.trees[key] = tree
                self._times[key] = max(2, self._times[key] // 2)
            self._push(key, new)
        return self.trees
