"""Public API: ``einsum`` / ``array_contract`` drop-ins with cached,
jit-compiled expressions.

Mirrors the reference interface layer (``cotengra/interface.py``):

- ``array_contract{,_path,_tree,_expression}`` over arbitrary hashable
  index labels,
- ``einsum{,_tree,_expression}`` over string equations (incl. ellipsis and
  interleaved arguments),
- ``optimize=`` dispatch by type: preset string | PathOptimizer |
  explicit path | ContractionTree,
- two global content-hash caches: path-level and compiled-expression-level,
  so repeated contractions hit a compiled HLO cache immediately.
"""

import functools
import threading

from .tree import ContractionTree
from .utils.eqs import (
    canonicalize_inputs,
    eq_to_inputs_output,
    hash_contraction,
    parse_einsum_input,
)

_PRESETS = {}
_PRESETS_TREE = {}


def register_preset(preset, optimizer, optimizer_tree=None, register_opt_einsum=False):
    """Register a preset name (or names) -> optimizer function mapping.

    ``optimizer(inputs, output, size_dict)`` should return a path;
    ``optimizer_tree`` (optional) should return a ContractionTree directly.
    """
    if isinstance(preset, str):
        preset = (preset,)
    for p in preset:
        if optimizer is not None:
            _PRESETS[p] = optimizer
        if optimizer_tree is not None:
            _PRESETS_TREE[p] = optimizer_tree
    if register_opt_einsum:
        try:
            import opt_einsum

            for p in preset:
                opt_einsum.paths.register_path_fn(
                    p, _oe_wrap(optimizer)
                )
        except (ImportError, KeyError):
            pass


def _oe_wrap(optimizer):
    def fn(input_sets, output_set, idx_dict, memory_limit=None):
        inputs = tuple(map(tuple, input_sets))
        return optimizer(inputs, tuple(output_set), idx_dict)

    return fn


def list_presets():
    return sorted(set(_PRESETS) | set(_PRESETS_TREE))


def preset_to_optimizer(preset):
    """Resolve a preset string (stripping any ``'name:{kwargs}'`` suffix is
    not supported - use functools.partial when registering instead).
    """
    try:
        return _PRESETS[preset]
    except KeyError:
        raise KeyError(
            f"Unknown optimize preset {preset!r}, "
            f"valid presets: {list_presets()}"
        ) from None


# -- optimize dispatch ----------------------------------------------------------


def _is_path(optimize):
    return (
        isinstance(optimize, (tuple, list))
        and len(optimize) > 0
        and isinstance(optimize[0], (tuple, list))
    )


def find_tree(inputs, output, size_dict, optimize="auto", objective=None):
    """Get a ContractionTree for the given contraction, dispatching on the
    type of ``optimize``.
    """
    if isinstance(optimize, ContractionTree):
        return optimize

    if isinstance(optimize, str):
        if optimize in _PRESETS_TREE:
            return _PRESETS_TREE[optimize](inputs, output, size_dict)
        opt = preset_to_optimizer(optimize)
        result = opt(inputs, output, size_dict)
        if isinstance(result, ContractionTree):
            return result
        return ContractionTree.from_path(
            inputs, output, size_dict, path=result
        )

    if _is_path(optimize):
        return ContractionTree.from_path(
            inputs, output, size_dict, path=optimize
        )

    # a PathOptimizer-like object or plain function
    if hasattr(optimize, "search"):
        return optimize.search(inputs, output, size_dict)
    result = optimize(inputs, output, size_dict)
    if isinstance(result, ContractionTree):
        return result
    return ContractionTree.from_path(inputs, output, size_dict, path=result)


def find_path(inputs, output, size_dict, optimize="auto"):
    """Get a linear contraction path."""
    if _is_path(optimize):
        return tuple(map(tuple, optimize))
    if isinstance(optimize, ContractionTree):
        return optimize.get_path()
    if isinstance(optimize, str):
        if optimize in _PRESETS_TREE and optimize not in _PRESETS:
            return _PRESETS_TREE[optimize](
                inputs, output, size_dict
            ).get_path()
        opt = preset_to_optimizer(optimize)
        result = opt(inputs, output, size_dict)
    elif hasattr(optimize, "__call__"):
        result = optimize(inputs, output, size_dict)
    else:
        raise TypeError(f"Can't interpret optimize={optimize!r}")
    if isinstance(result, ContractionTree):
        return result.get_path()
    return tuple(map(tuple, result))


# -- caches ----------------------------------------------------------------------

_PATH_CACHE = {}
_TREE_CACHE = {}
_EXPR_CACHE = {}
_CACHE_LOCK = threading.Lock()


def clear_caches():
    with _CACHE_LOCK:
        _PATH_CACHE.clear()
        _TREE_CACHE.clear()
        _EXPR_CACHE.clear()


def _cacheable_optimize(optimize):
    return isinstance(optimize, str)


# -- array_contract family ---------------------------------------------------------


def array_contract_path(
    inputs, output=None, size_dict=None, shapes=None, optimize="auto",
    canonicalize=True, cache=True,
):
    """Find a contraction path for arbitrary hashable index labels."""
    c_inputs, c_output, c_size_dict, symmap = canonicalize_inputs(
        inputs, output, shapes=shapes, size_dict=size_dict
    )
    if cache and _cacheable_optimize(optimize):
        key = hash_contraction(
            c_inputs, c_output, c_size_dict, optimize=optimize
        )
        with _CACHE_LOCK:
            hit = _PATH_CACHE.get(key)
        if hit is not None:
            return hit
        path = find_path(c_inputs, c_output, c_size_dict, optimize)
        with _CACHE_LOCK:
            _PATH_CACHE[key] = path
        return path
    return find_path(c_inputs, c_output, c_size_dict, optimize)


def array_contract_tree(
    inputs, output=None, size_dict=None, shapes=None, optimize="auto",
    canonicalize=True, sort_contraction_indices=False,
):
    """Get a ContractionTree for arbitrary hashable index labels."""
    if canonicalize:
        c_inputs, c_output, c_size_dict, _ = canonicalize_inputs(
            inputs, output, shapes=shapes, size_dict=size_dict
        )
    else:
        c_inputs, c_output = tuple(map(tuple, inputs)), tuple(output)
        c_size_dict = size_dict
    return find_tree(c_inputs, c_output, c_size_dict, optimize)


class Via:
    """Wrap an expression with input/output device or dtype transfer
    (reference analog: ``interface.py:476`` - there it moves arrays
    between array libraries; here it places them on jax devices and/or
    casts dtypes).

    Parameters
    ----------
    fn : callable
        The expression to wrap.
    constructor : callable, optional
        Applied to each input array (default: ``jax.device_put`` to
        ``device``).
    extractor : callable, optional
        Applied to the output (e.g. ``np.asarray`` to fetch to host).
    device : jax device, optional
    dtype : dtype, optional
    """

    def __init__(
        self, fn, constructor=None, extractor=None, device=None,
        dtype=None,
    ):
        self.fn = fn
        self.device = device
        self.dtype = dtype
        self.constructor = constructor
        self.extractor = extractor

    def _put(self, x):
        if self.constructor is not None:
            return self.constructor(x)
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(x, dtype=self.dtype)
        if self.device is not None:
            x = jax.device_put(x, self.device)
        return x

    def __call__(self, *arrays, **kwargs):
        out = self.fn(*map(self._put, arrays), **kwargs)
        if self.extractor is not None:
            out = self.extractor(out)
        return out


class Expression:
    """A compiled, reusable contraction expression.

    If ``constants`` (a dict position -> array) is given, those tensors
    are closed over and baked into the compiled program - XLA folds any
    work depending only on them at compile time (the jit-native analog of
    the reference's autoray.lazy constants folding,
    ``interface.py:511-574``).
    """

    __slots__ = ("tree", "_kwargs", "_constants", "_folded", "__weakref__")

    def __init__(self, tree, constants=None, **kwargs):
        self.tree = tree
        self._kwargs = kwargs
        if constants:
            import jax.numpy as jnp

            self._constants = {
                int(pos): jnp.asarray(a) for pos, a in constants.items()
            }
        else:
            self._constants = None
        self._folded = None

    def _build_folded(self, opts):
        import jax

        from .ops.executor import make_full_contractor

        inner = make_full_contractor(self.tree, autojit=False, **opts)
        consts = self._constants
        n = self.tree.N

        def folded(*variables):
            full = []
            vi = 0
            for i in range(n):
                if i in consts:
                    full.append(consts[i])
                else:
                    full.append(variables[vi])
                    vi += 1
            return inner(*full)

        return jax.jit(folded)

    def __call__(self, *arrays, **kwargs):
        opts = {**self._kwargs, **kwargs}
        opts.pop("backend", None)  # jax is the only backend
        if self._constants is None:
            if len(arrays) != self.tree.N:
                raise ValueError(
                    f"Expression takes {self.tree.N} arrays, "
                    f"got {len(arrays)}."
                )
            return self.tree.contract(arrays, **opts)
        n_var = self.tree.N - len(self._constants)
        if len(arrays) != n_var:
            raise ValueError(
                f"Expression with {len(self._constants)} constants takes "
                f"{n_var} variable arrays, got {len(arrays)}."
            )
        if self._folded is None:
            self._folded = self._build_folded(opts)
        return self._folded(*arrays)

    def __repr__(self):
        return f"<Expression(N={self.tree.N})>"


def array_contract_expression(
    inputs,
    output=None,
    size_dict=None,
    shapes=None,
    optimize="auto",
    cache=True,
    constants=None,
    **kwargs,
):
    """Get a reusable compiled expression ``expr(*arrays)``.

    ``constants`` may be a dict ``{position: array}`` - those tensors are
    baked into the compiled program and ``expr`` then takes only the
    remaining (variable) arrays, in order.
    """
    if constants is not None and not isinstance(constants, dict):
        raise TypeError("constants must be a dict {position: array}")
    if constants:
        shapes = list(shapes) if shapes is not None else None
        if shapes is not None:
            for pos, arr in constants.items():
                shapes[pos] = getattr(arr, "shape", ())
        kwargs["constants"] = constants
        cache = False  # constants are concrete arrays - don't cache
    c_inputs, c_output, c_size_dict, _ = canonicalize_inputs(
        inputs, output, shapes=shapes, size_dict=size_dict
    )
    if cache and _cacheable_optimize(optimize):
        key = hash_contraction(
            c_inputs,
            c_output,
            c_size_dict,
            optimize=optimize,
            **{k: repr(v) for k, v in kwargs.items()},
        )
        with _CACHE_LOCK:
            hit = _EXPR_CACHE.get(key)
        if hit is not None:
            return hit
        expr = _build_expression(
            c_inputs, c_output, c_size_dict, optimize, **kwargs
        )
        with _CACHE_LOCK:
            _EXPR_CACHE[key] = expr
        return expr
    return _build_expression(
        c_inputs, c_output, c_size_dict, optimize, **kwargs
    )


def _build_expression(inputs, output, size_dict, optimize, **kwargs):
    tree = find_tree(inputs, output, size_dict, optimize)
    return Expression(tree, **kwargs)


def array_contract(
    arrays,
    inputs,
    output=None,
    optimize="auto",
    cache_expression=True,
    **kwargs,
):
    """Contract ``arrays`` described by (hashable) ``inputs`` / ``output``
    index labels.
    """
    shapes = tuple(getattr(a, "shape", ()) for a in arrays)
    expr = array_contract_expression(
        inputs,
        output,
        shapes=shapes,
        optimize=optimize,
        cache=cache_expression,
        **kwargs,
    )
    return expr(*arrays)


# -- einsum family -------------------------------------------------------------------


def einsum_tree(*args, optimize="auto", shapes=False, **kwargs):
    """Get the ContractionTree for an einsum equation (string or
    interleaved format).
    """
    eq, arrays = parse_einsum_input(args, shapes=shapes)
    inputs, output = eq_to_inputs_output(eq)
    if shapes:
        shps = arrays
    else:
        shps = tuple(getattr(a, "shape", ()) for a in arrays)
    return array_contract_tree(
        inputs, output, shapes=shps, optimize=optimize, **kwargs
    )


def einsum_expression(
    *args, optimize="auto", shapes=True, constants=None, **kwargs
):
    """Get a reusable compiled einsum expression from an equation and
    shapes.

    ``constants`` may be a sequence of positions whose entries in the
    shape arguments are actual arrays (reference convention), or a dict
    ``{position: array}``.
    """
    if constants is not None and not isinstance(constants, dict):
        # positions convention: the "shape" at each position is an array
        eq_or_arrays = list(args)
        const_dict = {}
        for pos in constants:
            const_dict[int(pos)] = eq_or_arrays[1 + int(pos)]
            eq_or_arrays[1 + int(pos)] = getattr(
                eq_or_arrays[1 + int(pos)], "shape", ()
            )
        args = tuple(eq_or_arrays)
        constants = const_dict
    eq, shps = parse_einsum_input(args, shapes=shapes)
    inputs, output = eq_to_inputs_output(eq)
    return array_contract_expression(
        inputs,
        output,
        shapes=shps,
        optimize=optimize,
        constants=constants,
        **kwargs,
    )


def einsum(*args, optimize="auto", **kwargs):
    """Drop-in ``einsum`` with hyper-optimized planning and jit-compiled
    TPU execution. Supports string equations (with ellipsis) and
    interleaved-argument format.
    """
    eq, arrays = parse_einsum_input(args)
    inputs, output = eq_to_inputs_output(eq)
    return array_contract(
        arrays, inputs, output, optimize=optimize, **kwargs
    )


def ncon(arrays, indices, optimize="auto", **kwargs):
    """ncon-style contraction: positive integer labels are contracted,
    negative labels are outputs ordered ``-1, -2, ...``.
    """
    inputs = tuple(tuple(term) for term in indices)
    neg = sorted(
        {ix for term in inputs for ix in term if isinstance(ix, int) and ix < 0},
        reverse=True,
    )
    output = tuple(neg)
    return array_contract(
        arrays, inputs, output, optimize=optimize, **kwargs
    )
