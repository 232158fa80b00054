"""The jit-compiled TPU execution engine.

Given a (possibly sliced) :class:`~cotengra_tpu.tree.ContractionTree`, builds
a single jitted function that:

1. runs the flat einsum-IR (``lowering.py``), each pairwise step a
   ``lax.dot_general`` (``pairwise.py``);
2. enumerates slices *inside* the jit - the flat slice id is decoded with
   static mixed-radix strides and inputs are sliced with
   ``lax.dynamic_index_in_dim``, so there is exactly ONE trace/compile
   regardless of the number of slices (reference risk note:
   ``SURVEY.md §7 jit cache discipline``);
3. sums inner slices with ``lax.fori_loop`` (low memory) and stacks
   output-sliced chunks with ``lax.map``, reassembling the full output;
4. optionally strips exponents per contraction step - branchless
   ``x / max|x|`` renormalization with a running log10 exponent, the
   jit-compatible equivalent of reference ``contract.py:816-829`` /
   ``core.py:125-172``.

Multi-device execution shards the inner-slice loop over a mesh - see
``cotengra_tpu.parallel.mesh``.
"""

import jax
import jax.numpy as jnp

from ..utils.misc import prod
from .lowering import SingleStep, extract_contractions
from .pairwise import apply_pairwise, apply_single


def _real_dtype(dtype):
    return jnp.finfo(dtype).dtype if jnp.issubdtype(
        dtype, jnp.complexfloating
    ) else dtype


def _strip(x):
    """Renormalize ``x`` by its absolute max, returning (mantissa,
    log10-exponent). Branchless & zero-safe for jit.
    """
    absmax = jnp.max(jnp.abs(x))
    scale = jnp.where(absmax == 0, jnp.ones_like(absmax), absmax)
    return x / scale, jnp.log10(scale).astype(_real_dtype(x.dtype))


def _add_stripped(a, b):
    """Add two (mantissa, exponent) pairs stably and branchlessly."""
    am, ae = a
    bm, be = b
    e = jnp.maximum(ae, be)
    m = am * 10.0 ** (ae - e) + bm * 10.0 ** (be - e)
    return m, e


def build_core_fn(
    ir,
    strip_exponent=False,
    precision=None,
    preferred_element_type=None,
    implementation=None,
):
    """Build the python function executing the IR on a list of (already
    sliced) arrays. Intermediates are freed as soon as dead (liveness from
    the IR) so XLA sees minimal concurrent buffers.

    ``implementation="pallas"`` routes exponent-stripped batched-matmul
    steps through the fused pallas matmul+absmax kernel (one HBM pass
    instead of two); other steps use ``lax.dot_general``.
    """
    steps = ir.steps
    last_use = ir.last_use
    final_id = ir.final_id
    use_pallas = implementation == "pallas"
    if use_pallas:
        from .pallas_bmm import _bmm_layout, pairwise_bmm_absmax

    def _try_pallas_step(x, y, step):
        """Fused matmul+absmax if the step qualifies, else None."""
        if not strip_exponent:
            return None
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            return None
        if x.size < 2**14 or y.size < 2**14:
            return None  # too small to benefit
        if _bmm_layout(step.l_legs, step.r_legs, step.out_legs) is None:
            return None
        return pairwise_bmm_absmax(
            x, y, step.l_legs, step.r_legs, step.out_legs
        )

    def core(*arrays):
        temps = dict(enumerate(arrays))
        exponent = None

        for si, step in enumerate(steps):
            if isinstance(step, SingleStep):
                out = apply_single(
                    temps[step.inp], step.in_legs, step.out_legs
                )
                if last_use.get(step.inp) == si:
                    del temps[step.inp]
            else:
                x, y = temps[step.l], temps[step.r]
                fused = (
                    _try_pallas_step(x, y, step) if use_pallas else None
                )
                if fused is not None:
                    out, absmax = fused
                    scale = jnp.where(
                        absmax == 0, jnp.ones_like(absmax), absmax
                    ).astype(_real_dtype(out.dtype))
                    out = out / scale
                    e = jnp.log10(scale)
                    exponent = e if exponent is None else exponent + e
                else:
                    out = apply_pairwise(
                        x,
                        y,
                        step.l_legs,
                        step.r_legs,
                        step.out_legs,
                        precision=precision,
                        preferred_element_type=preferred_element_type,
                    )
                    if strip_exponent:
                        out, e = _strip(out)
                        exponent = (
                            e if exponent is None else exponent + e
                        )
                if last_use.get(step.l) == si:
                    del temps[step.l]
                if last_use.get(step.r) == si:
                    del temps[step.r]
            temps[step.out] = out

        result = temps[final_id]
        if strip_exponent:
            if exponent is None:
                exponent = jnp.zeros((), _real_dtype(result.dtype))
            return result, exponent
        return result

    return core


# steps whose tensors exceed this rank route through the grouped-flat
# executor (TPU compile cost explodes with rank - see ops/grouped.py)
MAX_RANK_DIRECT = 12


def _ir_max_rank(ir):
    mx = 0
    for step in ir.steps:
        if isinstance(step, SingleStep):
            mx = max(mx, len(step.in_legs), len(step.out_legs))
        else:
            mx = max(
                mx,
                len(step.l_legs),
                len(step.r_legs),
                len(step.out_legs),
            )
    return mx


def _build_best_core(
    tree,
    ir,
    strip_exponent=False,
    precision=None,
    preferred_element_type=None,
    implementation=None,
    split_complex=None,
    plane_dtype=None,
):
    """Pick the core builder: grouped-flat for high-rank IRs (bond-2
    circuit networks), direct per-step lowering otherwise.

    ``split_complex`` (grouped path only; default auto = on for complex
    inputs) executes on stacked real/imag planes - TPU has no native
    complex arithmetic, see ``ops/grouped.py``.
    """
    if (
        implementation in (None, "auto", "grouped")
        and _ir_max_rank(ir) > MAX_RANK_DIRECT
    ) or implementation == "grouped":
        from .lowering import sliced_input_legs
        from .grouped import build_grouped_core_fn

        input_orders = [
            sliced_input_legs(tree, i) for i in range(tree.N)
        ]
        return build_grouped_core_fn(
            ir,
            strip_exponent=strip_exponent,
            precision=precision,
            preferred_element_type=preferred_element_type,
            size_dict=tree.size_dict,
            input_orders=input_orders,
            split_complex=split_complex,
            plane_dtype=plane_dtype,
        )
    return build_core_fn(
        ir,
        strip_exponent=strip_exponent,
        precision=precision,
        preferred_element_type=preferred_element_type,
        implementation=implementation,
    )


def _sliced_axes_per_input(tree):
    """For each input: the (axis, ind) pairs of sliced indices, in
    descending axis order (so successive removals keep positions valid).
    """
    out = []
    for term in tree.inputs:
        axes = [
            (ax, ix)
            for ax, ix in enumerate(term)
            if ix in tree.sliced_inds
        ]
        axes.sort(reverse=True)
        out.append(tuple(axes))
    return tuple(out)


def _slice_meta(tree):
    """{ind: (stride, size, project)} for the current slicing state."""
    from ..tree import get_slice_strides

    strides = get_slice_strides(tree.sliced_inds)
    return {
        ix: (stride, si.size, si.project)
        for (ix, si), stride in zip(tree.sliced_inds.items(), strides)
    }


def make_traced_slicer(tree):
    """A function (arrays, slice_id) -> sliced arrays, safe to call with a
    traced ``slice_id`` inside jit.
    """
    meta = _slice_meta(tree)
    per_input = _sliced_axes_per_input(tree)

    def slicer(arrays, sid):
        out = []
        for arr, axes in zip(arrays, per_input):
            for ax, ix in axes:
                stride, size, project = meta[ix]
                if project is not None:
                    arr = jax.lax.index_in_dim(
                        arr, project, axis=ax, keepdims=False
                    )
                else:
                    idx = (sid // stride) % size
                    arr = jax.lax.dynamic_index_in_dim(
                        arr, idx, axis=ax, keepdims=False
                    )
            out.append(arr)
        return out

    return slicer


def slice_arrays(tree, arrays, i):
    """Host-side: get the input arrays for (concrete) slice number ``i``."""
    key = tree.slice_key(i)
    per_input = _sliced_axes_per_input(tree)
    out = []
    for arr, axes in zip(arrays, per_input):
        for ax, ix in axes:
            arr = jnp.take(jnp.asarray(arr), key[ix], axis=ax)
        out.append(arr)
    return out


def _chunk_structure(tree):
    """(n_inner, n_chunks, chunk_dims) of the current slicing state."""
    infos = list(tree.sliced_inds.values())
    n_inner = prod(si.size for si in infos if si.inner)
    chunk_dims = tuple(si.size for si in infos if not si.inner)
    return n_inner, prod(chunk_dims), chunk_dims


def _reassemble(tree, chunks, output_legs):
    """Reshape/transpose stacked output chunks (leading axis = flat chunk
    id) into the full output in ``tree.output`` order. Projected output
    indices appear with size 1.
    """
    chunk_dims = tuple(
        si.size for si in tree.sliced_inds.values() if not si.inner
    )
    chunk_legs = tuple(
        ix for ix, si in tree.sliced_inds.items() if not si.inner
    )
    reshaped = chunks.reshape(chunk_dims + chunks.shape[1:])
    cur_legs = chunk_legs + tuple(output_legs)
    perm = tuple(cur_legs.index(ix) for ix in tree.output)
    return jnp.transpose(reshaped, perm)


def make_contractor(
    tree,
    order=None,
    strip_exponent=False,
    autojit=True,
    precision=None,
    preferred_element_type=None,
    implementation=None,
    split_complex=None,
    plane_dtype=None,
):
    """Compile the *core* (single slice) contraction of ``tree``."""
    ir = extract_contractions(tree, order=order)
    core = _build_best_core(
        tree,
        ir,
        strip_exponent=strip_exponent,
        precision=precision,
        preferred_element_type=preferred_element_type,
        implementation=implementation,
        split_complex=split_complex,
        plane_dtype=plane_dtype,
    )
    if autojit:
        core = jax.jit(core)
    return core


def make_full_contractor(
    tree,
    order=None,
    strip_exponent=False,
    autojit=True,
    precision=None,
    preferred_element_type=None,
    slice_batch=None,
    implementation=None,
    split_complex=None,
    plane_dtype=None,
):
    """Compile the FULL contraction of ``tree``: slice enumeration, inner
    sum and chunk reassembly all inside one jitted function.

    ``slice_batch=B`` contracts B inner slices at once via ``vmap`` -
    larger effective batch dims feed the MXU better when individual
    slices are small, at B-times the intermediate memory.
    """
    ir = extract_contractions(tree, order=order)
    core = _build_best_core(
        tree,
        ir,
        strip_exponent=strip_exponent,
        precision=precision,
        preferred_element_type=preferred_element_type,
        implementation=implementation,
        split_complex=split_complex,
        plane_dtype=plane_dtype,
    )

    if not tree.sliced_inds:
        fn = core
        if autojit:
            fn = jax.jit(fn)
        return fn

    slicer = make_traced_slicer(tree)
    n_inner, n_chunks, _ = _chunk_structure(tree)

    if slice_batch:
        slice_batch = min(slice_batch, n_inner)

    def fn(*arrays):
        def one(sid):
            return core(*slicer(arrays, sid))

        def chunk_batched(c):
            B = slice_batch
            nb = -(-n_inner // B)

            def body(k, acc):
                offs = k * B + jnp.arange(B)
                in_range = offs < n_inner
                # clamp invalid ids to a safe slice, zero their results
                ids = c * n_inner + jnp.where(in_range, offs, 0)
                res = jax.vmap(one)(ids)
                if strip_exponent:
                    ms, es = res
                    e = jnp.max(es)
                    ms = ms * 10.0 ** (es - e).reshape(
                        es.shape + (1,) * (ms.ndim - 1)
                    )
                    mask = in_range.reshape(
                        in_range.shape + (1,) * (ms.ndim - 1)
                    )
                    part = (jnp.sum(jnp.where(mask, ms, 0), axis=0), e)
                    return _add_stripped(acc, part)
                mask = in_range.reshape(
                    in_range.shape + (1,) * (res.ndim - 1)
                )
                return acc + jnp.sum(jnp.where(mask, res, 0), axis=0)

            shp = jax.eval_shape(one, jnp.asarray(0))
            if strip_exponent:
                init = (
                    jnp.zeros(shp[0].shape, shp[0].dtype),
                    jnp.zeros((), shp[1].dtype),
                )
            else:
                init = jnp.zeros(shp.shape, shp.dtype)
            return jax.lax.fori_loop(0, nb, body, init)

        def chunk(c):
            if slice_batch and slice_batch > 1:
                return chunk_batched(c)

            first = one(c * n_inner)
            if n_inner == 1:
                return first

            if strip_exponent:

                def body(k, acc):
                    return _add_stripped(acc, one(c * n_inner + k))

            else:

                def body(k, acc):
                    return acc + one(c * n_inner + k)

            return jax.lax.fori_loop(1, n_inner, body, first)

        if n_chunks == 1:
            return chunk(jnp.asarray(0))

        results = jax.lax.map(chunk, jnp.arange(n_chunks))
        if strip_exponent:
            ms, es = results
            e = jnp.max(es)
            scale = 10.0 ** (es - e)
            ms = ms * scale.reshape(scale.shape + (1,) * (ms.ndim - 1))
            return _reassemble(tree, ms, ir.output_legs), e
        return _reassemble(tree, results, ir.output_legs)

    if autojit:
        fn = jax.jit(fn)
    return fn


def make_staged_contractor(
    tree,
    order=None,
    num_stages=2,
    strip_exponent=False,
    autojit=True,
    precision=None,
    preferred_element_type=None,
):
    """Compile the core contraction as ``num_stages`` sequentially-run
    jitted functions instead of one.

    Very deep contractions (hundreds of dot_generals with large
    intermediates) can exceed a compiler's memory/time budget as a single
    program; staging trades a few extra dispatches for bounded per-program
    compile cost. Live intermediates crossing a stage boundary are threaded
    through as arguments.
    """
    ir = extract_contractions(tree, order=order)
    steps = ir.steps
    n_steps = len(steps)
    if n_steps == 0 or num_stages <= 1:
        return make_contractor(
            tree,
            order=order,
            strip_exponent=strip_exponent,
            autojit=autojit,
            precision=precision,
            preferred_element_type=preferred_element_type,
        )
    num_stages = min(num_stages, n_steps)
    bounds = [n_steps * i // num_stages for i in range(num_stages + 1)]

    # which step index defines each id (inputs: defined at -1)
    def_at = {i: -1 for i in range(ir.num_inputs)}
    for si, step in enumerate(steps):
        def_at[step.out] = si

    def live_at(boundary):
        """ids defined before ``boundary`` still needed at/after it."""
        out = []
        for vid, d in def_at.items():
            if d < bounds[boundary]:
                last = ir.last_use.get(vid, None)
                if vid == ir.final_id or (
                    last is not None and last >= bounds[boundary]
                ):
                    out.append(vid)
        return sorted(out)

    stage_sigs = [live_at(b) for b in range(num_stages + 1)]
    stage_sigs[0] = list(range(ir.num_inputs))
    stage_sigs[-1] = [ir.final_id]

    def make_stage(s):
        seg = steps[bounds[s]:bounds[s + 1]]
        in_ids = stage_sigs[s]
        out_ids = stage_sigs[s + 1]

        def stage(carry, exponent=None):
            temps = dict(zip(in_ids, carry))
            for step in seg:
                if isinstance(step, SingleStep):
                    out = apply_single(
                        temps[step.inp], step.in_legs, step.out_legs
                    )
                else:
                    out = apply_pairwise(
                        temps[step.l],
                        temps[step.r],
                        step.l_legs,
                        step.r_legs,
                        step.out_legs,
                        precision=precision,
                        preferred_element_type=preferred_element_type,
                    )
                    if strip_exponent:
                        out, e = _strip(out)
                        exponent = (
                            e if exponent is None else exponent + e
                        )
                temps[step.out] = out
            result = tuple(temps[vid] for vid in out_ids)
            if strip_exponent:
                if exponent is None:
                    exponent = jnp.zeros(
                        (), _real_dtype(result[0].dtype)
                    )
                return result, exponent
            return result

        return jax.jit(stage) if autojit else stage

    stages = [make_stage(s) for s in range(num_stages)]

    def fn(*arrays):
        carry = tuple(arrays)
        exponent = None
        for s, stage in enumerate(stages):
            if strip_exponent:
                carry, exponent = (
                    stage(carry)
                    if exponent is None
                    else stage(carry, exponent)
                )
            else:
                carry = stage(carry)
        (result,) = carry
        if strip_exponent:
            return result, exponent
        return result

    return fn


# -- public tree-execution entry points -----------------------------------------


def _cached_full(tree, **kwargs):
    key = ("full", tuple(sorted(kwargs.items(), key=lambda kv: kv[0])))
    try:
        return tree.contraction_cores[key]
    except KeyError:
        fn = make_full_contractor(tree, **kwargs)
        tree.contraction_cores[key] = fn
        return fn


def contract_core(tree, arrays, **kwargs):
    """Contract ``arrays`` (one slice, already sliced if applicable)."""
    fn = tree.get_contractor(**kwargs)
    return fn(*arrays)


def contract_slice(tree, arrays, i, **kwargs):
    """Slice the full input arrays for slice ``i`` and contract."""
    return contract_core(tree, slice_arrays(tree, arrays, i), **kwargs)


def contract_tree(tree, arrays, strip_exponent=False, **kwargs):
    """Contract the full (possibly sliced) tree in one jitted call."""
    from ..config import get_default

    for key in ("implementation", "slice_batch", "precision"):
        if kwargs.get(key) is None:
            v = get_default(key)
            if v is not None:
                kwargs[key] = v
    fn = _cached_full(tree, strip_exponent=strip_exponent, **kwargs)
    return fn(*arrays)


def gen_output_chunks(tree, arrays, strip_exponent=False, **kwargs):
    """Generate the output chunks of an output-sliced contraction one at
    a time, without materializing the full output (reference
    ``core.py:3884-3941``). Yields ``(chunk_key, chunk_array)`` where
    ``chunk_key`` maps each output-sliced index to its value. With
    ``strip_exponent=True`` each chunk is a ``(mantissa, exponent)``
    pair and the inner sum composes with the stripping
    (reference gather semantics, ``core.py:3856-3863``).
    """
    n_inner, n_chunks, _ = _chunk_structure(tree)
    core = tree.get_contractor(
        strip_exponent=strip_exponent, **kwargs
    )
    for c in range(n_chunks):
        acc = None
        for k in range(n_inner):
            sid = c * n_inner + k
            res = core(*slice_arrays(tree, arrays, sid))
            if acc is None:
                acc = res
            elif strip_exponent:
                acc = _add_stripped(acc, res)
            else:
                acc = acc + res
        key = {
            ix: v
            for ix, v in tree.slice_key(c * n_inner).items()
            if not tree.sliced_inds[ix].inner
        }
        yield key, acc


def gather_slices(tree, slices, strip_exponent=False):
    """Host-side gather of an iterable of per-slice results (in flat slice
    id order): sum inner slices, stack output chunks, reassemble.
    """
    n_inner, n_chunks, _ = _chunk_structure(tree)
    slices = list(slices)

    if strip_exponent:
        chunk_vals = []
        for c in range(n_chunks):
            acc = slices[c * n_inner]
            for k in range(1, n_inner):
                acc = _add_stripped(acc, slices[c * n_inner + k])
            chunk_vals.append(acc)
        es = jnp.stack([ce for _, ce in chunk_vals])
        e = jnp.max(es)
        ms = jnp.stack([m * 10.0 ** (ce - e) for m, ce in chunk_vals])
        if n_chunks == 1:
            return ms[0], e
        ir_out = tuple(
            ix for ix in tree.output if ix not in tree.sliced_inds
        )
        return _reassemble(tree, ms, ir_out), e

    chunk_vals = []
    for c in range(n_chunks):
        acc = slices[c * n_inner]
        for k in range(1, n_inner):
            acc = acc + slices[c * n_inner + k]
        chunk_vals.append(acc)
    if n_chunks == 1:
        return chunk_vals[0]
    stacked = jnp.stack(chunk_vals)
    ir_out = tuple(ix for ix in tree.output if ix not in tree.sliced_inds)
    return _reassemble(tree, stacked, ir_out)


def benchmark_tree(
    tree, arrays=None, dtype="float32", repeats=3, **kwargs
):
    """Wall-clock benchmark of the compiled contraction: seconds per run,
    estimated total flops rate (reference ``core.py:4092-4164``).
    """
    import time

    import numpy as np

    if arrays is None:
        rng = np.random.default_rng(42)
        arrays = [
            jnp.asarray(rng.normal(size=shape).astype(dtype))
            for shape in tree.get_shapes()
        ]

    fn = _cached_full(tree, **kwargs)
    # compile + warmup
    res = fn(*arrays)
    jax.block_until_ready(res)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = fn(*arrays)
        jax.block_until_ready(res)
        times.append(time.perf_counter() - t0)

    t = min(times)
    flops = tree.total_flops(dtype=dtype)
    return {
        "time": t,
        "flops": flops,
        "gflops_per_sec": flops / t / 1e9,
        "tflops_per_sec": flops / t / 1e12,
    }
