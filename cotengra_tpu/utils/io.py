"""JSON save/load of contraction instances (reference
``utils.py:1602,1628``) and permutation-invariant contraction hashing
(reference ``reusable.py:25-55`` method 'b').
"""

import hashlib
import json
import pickle


def save_instance(filename, inputs, output, size_dict, **meta):
    """Save a contraction instance as JSON."""
    data = {
        "inputs": [list(map(str, term)) for term in inputs],
        "output": list(map(str, output)),
        "size_dict": {str(k): int(v) for k, v in size_dict.items()},
        **meta,
    }
    if hasattr(filename, "write"):
        json.dump(data, filename)
    else:
        with open(filename, "w") as f:
            json.dump(data, f)


def load_instance(filename):
    """Load a contraction instance from JSON, returning
    ``(inputs, output, size_dict)`` (plus any extra metadata dict).
    """
    if hasattr(filename, "read"):
        data = json.load(filename)
    else:
        with open(filename) as f:
            data = json.load(f)
    inputs = [tuple(term) for term in data.pop("inputs")]
    output = tuple(data.pop("output"))
    size_dict = data.pop("size_dict")
    if data:
        return inputs, output, size_dict, data
    return inputs, output, size_dict


def hash_contraction_b(inputs, output, size_dict):
    """Permutation-invariant content hash: invariant to both input order
    and index relabelling, via Weisfeiler-Lehman-style refinement of the
    term/index incidence structure.
    """
    out_set = set(output)
    # initial labels
    ix_label = {
        ix: (size_dict[ix], ix in out_set)
        for term in inputs
        for ix in term
    }
    term_labels = [
        tuple(sorted(ix_label[ix] for ix in term)) for term in inputs
    ]

    for _ in range(2):
        # refine index labels from the terms containing them
        ix_terms = {}
        for tl, term in zip(term_labels, inputs):
            for ix in term:
                ix_terms.setdefault(ix, []).append(tl)
        ix_label = {
            ix: (
                size_dict[ix],
                ix in out_set,
                tuple(sorted(map(repr, tls))),
            )
            for ix, tls in ix_terms.items()
        }
        term_labels = [
            tuple(sorted(map(repr, (ix_label[ix] for ix in term))))
            for term in inputs
        ]

    payload = pickle.dumps(
        (
            sorted(map(repr, term_labels)),
            sorted(repr(ix_label[ix]) for ix in output),
        ),
        protocol=4,
    )
    return hashlib.sha1(payload).hexdigest()
