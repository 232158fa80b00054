"""Einsum equation parsing and canonicalization.

Covers the behaviors of the reference's equation utilities
(``cotengra/utils.py:1094-1600``): string eq <-> (inputs, output) conversion,
implicit outputs, ellipsis expansion, interleaved-argument einsum parsing, and
canonicalization of arbitrary hashable index labels for cache keys.

All functions work with *terms as tuples of hashable index labels*; the
string-equation forms are a thin layer on top.
"""

import itertools

from .symbols import get_symbol


def find_output_from_inputs(inputs):
    """Compute the implicit output: indices appearing exactly once across
    all inputs, in sorted order (einsum convention).
    """
    counts = {}
    for term in inputs:
        for ix in term:
            counts[ix] = counts.get(ix, 0) + 1
    return tuple(sorted((ix for ix, c in counts.items() if c == 1), key=str))


def eq_to_inputs_output(eq):
    """Convert a string equation to ``(inputs, output)`` tuples-of-tuples.

    Handles implicit output ('ab,bc') but not ellipsis (expand first with
    :func:`parse_eq_ellipses`).
    """
    if "->" in eq:
        lhs, rhs = eq.split("->")
        output = tuple(rhs)
    else:
        lhs = eq
        output = None
    inputs = tuple(tuple(term) for term in lhs.split(","))
    if output is None:
        output = find_output_from_inputs(inputs)
    return inputs, output


def inputs_output_to_eq(inputs, output):
    """Convert ``(inputs, output)`` of single-character labels back into a
    string equation. Labels must already be single characters.
    """
    lhs = ",".join("".join(term) for term in inputs)
    rhs = "".join(output)
    return f"{lhs}->{rhs}"


def parse_eq_ellipses(eq, shapes):
    """Expand any ellipses ('...') in ``eq`` given the concrete ``shapes``
    of each operand, returning a new full equation string.

    Follows numpy semantics: the ellipsis dims of all operands broadcast
    together, and if the output is implicit (or contains '...') the broadcast
    dims are prepended to the output.
    """
    if "..." not in eq:
        return eq

    if "->" in eq:
        lhs, rhs = eq.split("->")
    else:
        lhs, rhs = eq, None

    terms = lhs.split(",")
    if len(terms) != len(shapes):
        raise ValueError(
            f"Equation has {len(terms)} terms but {len(shapes)} "
            "operands were supplied."
        )

    used = set(eq) - {".", ",", "-", ">"}
    # generate fresh symbols for the broadcast dimensions
    fresh = (s for s in map(get_symbol, itertools.count()) if s not in used)

    # max number of dims any ellipsis covers
    num_broadcast = 0
    ell_ndims = []
    for term, shape in zip(terms, shapes):
        if "..." in term:
            n = len(shape) - (len(term) - 3)
            if n < 0:
                raise ValueError(
                    f"Term '{term}' has more explicit indices than operand "
                    f"dims {shape}."
                )
            ell_ndims.append(n)
            num_broadcast = max(num_broadcast, n)
        else:
            if len(term) != len(shape):
                raise ValueError(
                    f"Term '{term}' doesn't match operand shape {shape}."
                )
            ell_ndims.append(None)

    bsyms = list(itertools.islice(fresh, num_broadcast))

    new_terms = []
    for term, n in zip(terms, ell_ndims):
        if n is None:
            new_terms.append(term)
        else:
            # rightmost ellipsis dims align (broadcasting)
            sub = "".join(bsyms[num_broadcast - n:])
            new_terms.append(term.replace("...", sub))

    new_lhs = ",".join(new_terms)

    if rhs is None:
        # implicit: broadcast dims first, then once-appearing sorted
        counts = {}
        for term in new_terms:
            for ix in term:
                counts[ix] = counts.get(ix, 0) + 1
        explicit = "".join(
            sorted(
                ix
                for ix, c in counts.items()
                if c == 1 and ix not in bsyms
            )
        )
        new_rhs = "".join(bsyms) + explicit
    else:
        new_rhs = rhs.replace("...", "".join(bsyms))

    return f"{new_lhs}->{new_rhs}"


def parse_einsum_input(args, shapes=False):
    """Parse einsum arguments in either string-equation or interleaved
    format, returning ``(eq, arrays)`` with ellipses expanded.

    Parameters
    ----------
    args : tuple
        Either ``(eq, *arrays)`` or interleaved
        ``(array0, inds0, array1, inds1, ..., [out_inds])``.
    shapes : bool, optional
        If True, arrays are given as shapes directly.

    Returns
    -------
    eq : str
    arrays : tuple
    """
    if isinstance(args[0], str):
        eq, arrays = args[0], tuple(args[1:])
    else:
        # interleaved format: arrays and index sequences, with optional
        # final output index sequence
        if len(args) % 2 == 0:
            arrays = args[::2]
            inds_seq = args[1::2]
            output = None
        else:
            arrays = args[:-1:2]
            inds_seq = args[1:-1:2]
            output = args[-1]

        symmap = {}

        def tosym(ix):
            if ix is Ellipsis:
                return "..."
            if ix not in symmap:
                symmap[ix] = get_symbol(len(symmap))
            return symmap[ix]

        terms = ["".join(map(tosym, term)) for term in inds_seq]
        eq = ",".join(terms)
        if output is not None:
            eq += "->" + "".join(map(tosym, output))

    if shapes:
        shps = arrays
    else:
        shps = tuple(getattr(a, "shape", ()) for a in arrays)

    eq = eq.replace(" ", "")
    eq = parse_eq_ellipses(eq, shps)
    return eq, arrays


def canonicalize_inputs(inputs, output=None, shapes=None, size_dict=None):
    """Relabel arbitrary hashable index labels into canonical single
    characters (in order of first appearance), for use as cache keys and
    internal processing.

    Parameters
    ----------
    inputs : sequence[sequence[hashable]]
    output : sequence[hashable], optional
        If None, computed as indices appearing exactly once (sorted by str).
    shapes : sequence[tuple[int]], optional
        Shapes of the operands - used to build the canonical size_dict if
        ``size_dict`` not given directly.
    size_dict : dict[hashable, int], optional
        Sizes of the original indices.

    Returns
    -------
    canon_inputs : tuple[tuple[str]]
    canon_output : tuple[str]
    canon_size_dict : dict[str, int] or None
    symmap : dict[hashable, str]
        Mapping original label -> canonical symbol.
    """
    symmap = {}
    canon_inputs = []
    canon_size_dict = {} if (shapes is not None or size_dict is not None) else None

    for t, term in enumerate(inputs):
        canon_term = []
        for ax, ix in enumerate(term):
            try:
                sym = symmap[ix]
            except KeyError:
                sym = symmap[ix] = get_symbol(len(symmap))
            canon_term.append(sym)
            if canon_size_dict is not None:
                if shapes is not None:
                    d = shapes[t][ax]
                    prev = canon_size_dict.setdefault(sym, d)
                    if prev != d and not (prev == 1 or d == 1):
                        raise ValueError(
                            f"Index {ix} has inconsistent sizes {prev}, {d}."
                        )
                    # broadcasting: keep the larger
                    canon_size_dict[sym] = max(prev, d)
                else:
                    canon_size_dict[sym] = size_dict[ix]

    for term in inputs:
        canon_inputs.append(tuple(symmap[ix] for ix in term))

    if output is None:
        canon_output = find_output_from_inputs(canon_inputs)
    else:
        try:
            canon_output = tuple(symmap[ix] for ix in output)
        except KeyError as e:
            raise ValueError(
                f"Output index {e} does not appear in any input."
            ) from None

    return tuple(canon_inputs), canon_output, canon_size_dict, symmap


def hash_contraction(inputs, output, size_dict, **kwargs):
    """A stable content hash of a contraction specification, for caching.

    Canonicalizes labels first so that relabelled-but-identical contractions
    hit the same key (reference: ``reusable.py:25-55`` method 'a').
    """
    import hashlib
    import pickle

    canon_inputs, canon_output, canon_size_dict, _ = canonicalize_inputs(
        inputs, output, size_dict=size_dict
    )
    payload = pickle.dumps(
        (
            canon_inputs,
            canon_output,
            tuple(sorted(canon_size_dict.items())),
            tuple(sorted(kwargs.items())),
        ),
        protocol=4,
    )
    return hashlib.sha1(payload).hexdigest()
