"""Host-side network preprocessing: absorb trivial tensors before
planning/compilation.

Rank-1 and rank-2 tensors (state vectors, single-qubit gates, projectors)
can be contracted into a neighboring tensor at negligible cost. Doing it
once on the host shrinks the network - fewer planning nodes, fewer
compiled ops, fewer kernel launches - without changing the result. This
is the standard preprocessing step real circuit simulators apply, kept
out of the reference's planning layer but essential for small-bond TNs on
accelerators.
"""

import numpy as np


def absorb_simple_tensors(
    inputs, arrays, output=(), max_rank=2, max_absorb_size=None
):
    """Contract every tensor of rank <= ``max_rank`` into a neighboring
    tensor (host-side numpy einsum), repeatedly, unless doing so would
    grow the neighbor beyond ``max_absorb_size`` elements.

    Returns ``(new_inputs, new_arrays)``. Output indices and tensors
    carrying them are handled correctly (a tensor is only absorbed along
    non-output sharing).
    """
    from ..utils.symbols import get_symbol

    inputs = [tuple(t) for t in inputs]
    arrays = [np.asarray(a) for a in arrays]
    out_set = set(output)

    # index -> positions
    def build_holders():
        holders = {}
        for p, term in enumerate(inputs):
            if term is None:
                continue
            for ix in term:
                holders.setdefault(ix, []).append(p)
        return holders

    changed = True
    while changed:
        changed = False
        holders = build_holders()
        for p, term in enumerate(inputs):
            if term is None or len(term) > max_rank:
                continue
            # find a neighbor sharing at least one index
            cands = []
            for ix in term:
                for q in holders.get(ix, ()):
                    if q != p and inputs[q] is not None:
                        cands.append(q)
            if not cands:
                continue
            # absorb into the smallest neighbor
            q = min(cands, key=lambda q: arrays[q].size)
            ta, tb = term, inputs[q]
            shared = set(ta) & set(tb)
            keep = [
                ix
                for ix in dict.fromkeys(ta + tb)
                if ix in out_set
                or ix not in shared
                or len(holders.get(ix, ())) > 2
            ]
            if max_absorb_size is not None:
                new_size = 1
                sizes = {}
                for t, arr in ((ta, arrays[p]), (tb, arrays[q])):
                    for ix, d in zip(t, arr.shape):
                        sizes[ix] = d
                for ix in keep:
                    new_size *= sizes[ix]
                if new_size > max_absorb_size:
                    continue

            # local symbol mapping for the einsum
            symmap = {}
            for ix in dict.fromkeys(ta + tb):
                symmap[ix] = get_symbol(len(symmap))
            eq = (
                "".join(symmap[ix] for ix in ta)
                + ","
                + "".join(symmap[ix] for ix in tb)
                + "->"
                + "".join(symmap[ix] for ix in keep)
            )
            arrays[q] = np.einsum(eq, arrays[p], arrays[q])
            inputs[q] = tuple(keep)
            inputs[p] = None
            arrays[p] = None
            changed = True
            holders = build_holders()

    new_inputs = [t for t in inputs if t is not None]
    new_arrays = [a for a in arrays if a is not None]
    if not new_inputs:
        # everything absorbed into nothing: shouldn't happen unless the
        # whole network was trivial - recover a scalar
        return [()], [np.asarray(1.0)]
    return new_inputs, new_arrays
