"""TPU mesh execution: sliced contraction sharded over devices.

This is the TPU-native replacement for the reference's dask/ray/MPI sliced
executors (``cotengra/parallel.py``, ``core.py:4032-4090``): the flat slice
id space is the data-parallel axis.

- *inner* (summed) slices are strided across the mesh axis and the partial
  sums combined with ``jax.lax.psum`` over ICI;
- *output-sliced* chunks are computed per-device and reassembled (each
  device currently computes its strided share of every chunk's inner sum -
  chunk-axis sharding lands with the distributed-output API);
- exponent-stripped sums renormalize with a ``pmax`` of exponents before
  the mantissa ``psum`` (the cross-device analog of reference
  ``core.py:3856-3863``).

Everything is a single ``shard_map``-wrapped jitted function: one compile,
no per-slice dispatch, collectives ride ICI.
"""

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.executor import (
    _add_stripped,
    _build_best_core,
    _chunk_structure,
    _reassemble,
    make_traced_slicer,
)
from ..ops.lowering import extract_contractions


def get_default_mesh(n_devices=None, axis_name="slices", devices=None):
    """A 1D mesh over (the first ``n_devices``) local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.array(devices), (axis_name,))


_DISTRIBUTED_INITIALIZED = False


def maybe_init_distributed(
    coordinator_address=None, num_processes=None, process_id=None
):
    """Initialize ``jax.distributed`` for a multi-host pod slice when
    a coordinator is configured, else no-op.

    This is the TPU-native analog of the reference's MPI entry
    (``core.py:4032-4090`` / ``examples/ex_mpi_*.py``): instead of
    ``mpi4py`` ranks, processes join via the JAX coordination service
    over DCN. The trigger is any of:

    - explicit arguments,
    - ``JAX_COORDINATOR_ADDRESS`` (+ optional ``JAX_NUM_PROCESSES`` /
      ``JAX_PROCESS_ID``) in the environment,
    - a TPU pod environment where ``jax.distributed.initialize()``
      can auto-detect everything (GKE/TPU-VM metadata).

    After initialization ``jax.devices()`` spans every host's chips, so
    :func:`get_global_mesh` (and all sharded contractors built on it)
    transparently covers the whole slice; XLA routes the ``psum``/
    gather collectives over ICI within a host's torus and DCN across
    hosts. Safe to call multiple times. See
    ``docs/multihost_design.md`` for the full MPI -> DCN mapping.

    Returns True if a multi-process runtime is (now) active.
    """
    global _DISTRIBUTED_INITIALIZED
    import os

    if _DISTRIBUTED_INITIALIZED:
        return jax.process_count() > 1
    addr = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if addr is None and not on_pod:
        return False
    kwargs = {}
    if addr is not None:
        kwargs["coordinator_address"] = addr
        np_ = num_processes or os.environ.get("JAX_NUM_PROCESSES")
        pid = (
            process_id
            if process_id is not None
            else os.environ.get("JAX_PROCESS_ID")
        )
        if np_ is not None:
            kwargs["num_processes"] = int(np_)
        if pid is not None:
            kwargs["process_id"] = int(pid)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        if addr is not None:
            # explicitly configured: surface the failure
            raise
        # pod-looking environment but auto-detection incomplete (e.g.
        # a single-chip tunnel setting TPU env vars): not multi-host
        import warnings

        warnings.warn(
            f"jax.distributed auto-initialization skipped: {e}"
        )
        return False
    _DISTRIBUTED_INITIALIZED = True
    return jax.process_count() > 1


def broadcast_tree(tree, root=0):
    """Make every process use process ``root``'s contraction tree.

    SPMD execution requires all processes to trace the *same* program;
    stochastic planning (hyper search, SliceFinder) can legitimately
    pick different trees/sliced indices on different hosts, which would
    silently diverge the compiled programs and corrupt the psum. The
    rank-0-plans-then-broadcasts discipline is the same as the
    reference's MPI example (``examples/ex_mpi_spmd.py``); here the
    serialized tree rides the jax coordination service. No-op (returns
    ``tree`` unchanged) in single-process runs.
    """
    if jax.process_count() <= 1:
        return tree
    import io

    import numpy as np
    from jax.experimental import multihost_utils

    from ..utils.io import load_tree, save_tree

    buf = io.StringIO()
    save_tree(buf, tree)
    payload = np.frombuffer(
        buf.getvalue().encode("utf-8"), np.uint8
    ).copy()
    is_root = jax.process_index() == root
    # broadcast_one_to_all needs same-shaped operands: length first
    n = int(
        multihost_utils.broadcast_one_to_all(
            np.int64(payload.size), is_source=is_root
        )
    )
    flat = np.zeros(n, np.uint8)
    if is_root:
        flat[:] = payload
    flat = np.asarray(
        multihost_utils.broadcast_one_to_all(flat, is_source=is_root)
    )
    if is_root:
        return tree
    data = io.StringIO(bytes(flat).decode("utf-8"))
    return load_tree(data, tree.inputs, tree.output, tree.size_dict)


def get_global_mesh(axis_name="slices"):
    """A 1D mesh over every device of every process (multi-host when
    ``jax.distributed`` is initialized - see
    :func:`maybe_init_distributed`); falls back to all local devices in
    a single-process run."""
    maybe_init_distributed()
    import numpy as np

    return Mesh(np.array(jax.devices()), (axis_name,))


def make_sharded_contractor(
    tree,
    mesh,
    axis_name="slices",
    strip_exponent=False,
    precision=None,
    preferred_element_type=None,
    autojit=True,
    shard_chunks="auto",
    reassemble=True,
):
    """Compile the full sliced contraction of ``tree`` sharded over
    ``mesh``'s ``axis_name`` dimension.

    The input arrays are replicated (they are small by construction - the
    point of slicing is that *intermediates* are big). Two distribution
    regimes over the flat slice-id space:

    - **inner-sharded** (default when there are fewer output chunks than
      devices, e.g. amplitude/scalar outputs): each device computes the
      inner partial sums for slice ids ``didx + k * n_dev`` and they are
      ``psum``-reduced over ICI.
    - **chunk-sharded** (``shard_chunks=True``, or ``"auto"`` with at
      least one chunk per device): output chunks are block-distributed
      over the mesh; each device computes its chunks' full inner sums
      locally and the stacked result carries the chunk axis in
      ``out_specs`` - no replicated compute, output memory scales
      ``1/n_dev`` (reference gather semantics ``core.py:3825-3882``,
      distributed). With ``reassemble=False`` the sharded stacked
      chunks (trimmed to ``n_chunks``) are returned directly along with
      a per-chunk exponent vector when stripping; with the default the
      full output is reassembled in the same jit (XLA inserts the
      all-gather).

    Returns a jitted function ``fn(*arrays)``.
    """
    from jax import shard_map

    ir = extract_contractions(tree)
    core = _build_best_core(
        tree,
        ir,
        strip_exponent=strip_exponent,
        precision=precision,
        preferred_element_type=preferred_element_type,
    )
    n_inner, n_chunks, _ = _chunk_structure(tree)
    n_dev = mesh.shape[axis_name]
    slicer = make_traced_slicer(tree) if tree.sliced_inds else None

    if shard_chunks == "auto":
        shard_chunks = n_chunks >= n_dev
    if shard_chunks and n_chunks > 1 and slicer is not None:
        return _make_chunk_sharded(
            tree, mesh, axis_name, core, slicer, n_inner, n_chunks,
            n_dev, strip_exponent, reassemble, autojit, ir,
        )

    # per-device trip count over the inner slice ids
    n_steps = -(-n_inner // n_dev)

    def device_fn(*arrays):
        didx = jax.lax.axis_index(axis_name)

        if slicer is None:
            # nothing sliced: all devices compute the same thing; still a
            # valid program (useful as a fallback)
            return core(*arrays)

        def one(sid):
            return core(*slicer(arrays, sid))

        def chunk(c):
            base = c * n_inner

            def masked(sid_local):
                sid = base + sid_local
                valid = sid_local < n_inner
                safe_sid = jnp.where(valid, sid, base)
                res = one(safe_sid)
                if strip_exponent:
                    m, e = res
                    return (
                        jnp.where(valid, m, jnp.zeros_like(m)),
                        jnp.where(valid, e, jnp.zeros_like(e)),
                    )
                return jnp.where(valid, res, jnp.zeros_like(res))

            acc = masked(didx)

            if n_steps > 1:
                if strip_exponent:

                    def body(k, acc):
                        return _add_stripped(acc, masked(didx + k * n_dev))

                else:

                    def body(k, acc):
                        return acc + masked(didx + k * n_dev)

                acc = jax.lax.fori_loop(1, n_steps, body, acc)

            # combine partial sums across the mesh
            if strip_exponent:
                m, e = acc
                e_max = jax.lax.pmax(e, axis_name)
                m = m * 10.0 ** (e - e_max)
                m = jax.lax.psum(m, axis_name)
                return m, e_max
            return jax.lax.psum(acc, axis_name)

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

    n_in = tree.N
    fn = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(),) * n_in,  # replicated inputs
        out_specs=(P(), P()) if strip_exponent else P(),
        check_vma=False,
    )
    if autojit:
        fn = jax.jit(fn)
    return fn


def _make_chunk_sharded(
    tree, mesh, axis_name, core, slicer, n_inner, n_chunks, n_dev,
    strip_exponent, reassemble, autojit, ir,
):
    """Chunk-sharded regime: block-distribute output chunks over the
    mesh; each device computes its chunks' inner sums locally and the
    returned stack carries the chunk axis in ``out_specs``."""
    from jax import shard_map

    # chunks per device (last device may be padded)
    n_per = -(-n_chunks // n_dev)

    def device_fn(*arrays):
        didx = jax.lax.axis_index(axis_name)

        def one(sid):
            return core(*slicer(arrays, sid))

        def chunk(k):
            c = didx * n_per + k
            valid = c < n_chunks
            base = jnp.where(valid, c, 0) * n_inner

            def body(j, acc):
                res = one(base + j)
                if strip_exponent:
                    return _add_stripped(acc, res)
                return acc + res

            acc = one(base)
            if n_inner > 1:
                acc = jax.lax.fori_loop(1, n_inner, body, acc)
            if strip_exponent:
                m, e = acc
                return (
                    jnp.where(valid, m, jnp.zeros_like(m)),
                    jnp.where(valid, e, jnp.zeros_like(e)),
                )
            return jnp.where(valid, acc, jnp.zeros_like(acc))

        # (n_per, *chunk_shape) local stack; axis 0 is the shard axis
        return jax.lax.map(chunk, jnp.arange(n_per))

    out_specs = (
        (P(axis_name), P(axis_name)) if strip_exponent else P(axis_name)
    )
    sharded = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(),) * tree.N,
        out_specs=out_specs,
        check_vma=False,
    )

    def fn(*arrays):
        res = sharded(*arrays)
        if strip_exponent:
            ms, es = res
            if not reassemble:
                # keep the chunk axis sharded: return the padded stack
                # (rows >= n_chunks are zero); callers trim host-side
                return ms, es
            ms, es = ms[:n_chunks], es[:n_chunks]
            e = jnp.max(es)
            scale = 10.0 ** (es - e)
            ms = ms * scale.reshape(
                scale.shape + (1,) * (ms.ndim - 1)
            )
            return _reassemble(tree, ms, ir.output_legs), e
        if not reassemble:
            return res
        return _reassemble(tree, res[:n_chunks], ir.output_legs)

    return jax.jit(fn) if autojit else fn


def contract_sharded(
    tree, arrays, mesh=None, axis_name="slices", **kwargs
):
    """Contract a sliced tree with the slice sum sharded over a device
    mesh. Caches the compiled function on the tree.
    """
    if mesh is None:
        mesh = get_default_mesh(axis_name=axis_name)
    key = (
        "sharded",
        id(mesh),
        axis_name,
        tuple(sorted(kwargs.items(), key=lambda kv: kv[0])),
    )
    try:
        fn = tree.contraction_cores[key]
    except KeyError:
        fn = make_sharded_contractor(
            tree, mesh, axis_name=axis_name, **kwargs
        )
        tree.contraction_cores[key] = fn
    return fn(*arrays)
