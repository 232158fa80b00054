"""ctypes bindings for the native C++ pathfinding kernels.

Compiles ``kernels.cpp`` on first use with g++ -O3 (cached as a shared
library next to the source, keyed by source hash). The Python fallbacks in
``pathfinders/basic.py`` are behaviorally identical; these kernels make the
planning hot loops (greedy search, batched random-greedy, optimal DP)
~50-200x faster, which is load-bearing for the 'auto' preset (reference
parity: the Rust ``cotengrust`` extension, SURVEY.md §2.9).
"""

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kernels.cpp")

_LIB = None
_LIB_TRIED = False
_LOCK = threading.Lock()

_MINIMIZE_CODES = {
    "flops": 0,
    "max": 1,
    "size": 2,
    "write": 3,
    "combo": 4,
    "limit": 5,
}


def _build_lib():
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha1(src).hexdigest()[:12]
    sopath = os.path.join(_HERE, f"_kernels_{tag}.so")
    if not os.path.exists(sopath):
        tmp = sopath + f".tmp{os.getpid()}"
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-std=c++17",
            "-shared",
            "-fPIC",
            _SRC,
            "-o",
            tmp,
        ]
        try:
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=240
            )
        except subprocess.CalledProcessError:
            # retry without -march=native (portability)
            cmd.remove("-march=native")
            subprocess.run(
                cmd, check=True, capture_output=True, timeout=240
            )
        os.replace(tmp, sopath)
        # clean up stale builds
        for fn in os.listdir(_HERE):
            if (
                fn.startswith("_kernels_")
                and fn.endswith(".so")
                and fn != os.path.basename(sopath)
            ):
                try:
                    os.remove(os.path.join(_HERE, fn))
                except OSError:
                    pass

    lib = ctypes.CDLL(sopath)
    i32p = ctypes.POINTER(ctypes.c_int)
    f64p = ctypes.POINTER(ctypes.c_double)

    lib.ctg_optimize_greedy.restype = ctypes.c_int
    lib.ctg_optimize_greedy.argtypes = [
        ctypes.c_int, i32p, i32p, ctypes.c_int, f64p, i32p, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, i32p,
    ]
    lib.ctg_optimize_random_greedy.restype = ctypes.c_int
    lib.ctg_optimize_random_greedy.argtypes = [
        ctypes.c_int, i32p, i32p, ctypes.c_int, f64p, i32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        i32p, f64p,
    ]
    lib.ctg_optimize_optimal.restype = ctypes.c_int
    lib.ctg_optimize_optimal.argtypes = [
        ctypes.c_int, i32p, i32p, ctypes.c_int, f64p, i32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_int, i32p,
    ]
    lib.ctg_compressed_stats.restype = ctypes.c_int
    lib.ctg_compressed_stats.argtypes = [
        ctypes.c_int, i32p, i32p, ctypes.c_int, f64p, i32p, ctypes.c_int,
        i32p, ctypes.c_int, ctypes.c_double, ctypes.c_int, f64p,
    ]
    i64p = ctypes.POINTER(ctypes.c_longlong)
    lib.ctg_partition.restype = ctypes.c_int
    lib.ctg_partition.argtypes = [
        ctypes.c_int, ctypes.c_int, i64p, i32p, f64p, f64p,
        ctypes.c_int, ctypes.c_double, ctypes.c_uint64, i32p,
    ]
    return lib


def _get_lib():
    global _LIB, _LIB_TRIED
    if _LIB is None and not _LIB_TRIED:
        with _LOCK:
            if _LIB is None and not _LIB_TRIED:
                try:
                    _LIB = _build_lib()
                except Exception:
                    _LIB = None
                _LIB_TRIED = True
    return _LIB


def is_available():
    return _get_lib() is not None


def _marshal(inputs, output, size_dict):
    indmap = {}
    flat = []
    offsets = [0]
    for term in inputs:
        for ind in term:
            ix = indmap.get(ind)
            if ix is None:
                ix = indmap[ind] = len(indmap)
            flat.append(ix)
        offsets.append(len(flat))
    sizes = np.empty(max(len(indmap), 1), dtype=np.float64)
    for ind, ix in indmap.items():
        sizes[ix] = float(size_dict[ind])
    out = np.array(
        [indmap[ind] for ind in output if ind in indmap], dtype=np.int32
    )
    return (
        np.array(offsets, dtype=np.int32),
        np.array(flat, dtype=np.int32) if flat else np.zeros(1, np.int32),
        sizes,
        out,
    )


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _decode_path(buf, nsteps):
    path = []
    for s in range(nsteps):
        i, j = int(buf[2 * s]), int(buf[2 * s + 1])
        path.append((i,) if j < 0 else (i, j))
    return path


def _seed_to_int(seed):
    if seed is None:
        return int.from_bytes(os.urandom(8), "little")
    if isinstance(seed, int):
        return seed & (2**64 - 1)
    # random.Random instance
    return seed.randrange(2**64)


def optimize_greedy(
    inputs,
    output,
    size_dict,
    costmod=1.0,
    temperature=0.0,
    max_neighbors=16,
    simplify=True,
    seed=None,
    use_ssa=False,
):
    lib = _get_lib()
    offsets, flat, sizes, out = _marshal(inputs, output, size_dict)
    n = len(inputs)
    buf = np.empty(2 * (4 * n + 16), dtype=np.int32)
    nsteps = lib.ctg_optimize_greedy(
        n, _i32p(offsets), _i32p(flat), len(sizes), _f64p(sizes),
        _i32p(out), len(out), float(costmod), float(temperature),
        int(max_neighbors), int(bool(simplify)), _seed_to_int(seed),
        _i32p(buf),
    )
    if nsteps < 0:
        raise RuntimeError("native optimize_greedy failed")
    path = _decode_path(buf, nsteps)
    if use_ssa:
        return path
    from ...tree import ssa_to_linear

    return ssa_to_linear(path, n)


def optimize_random_greedy_track_flops(
    inputs,
    output,
    size_dict,
    ntrials=1,
    costmod=(0.1, 4.0),
    temperature=(0.001, 1.0),
    max_neighbors=16,
    simplify=True,
    seed=None,
    use_ssa=False,
):
    lib = _get_lib()
    if isinstance(costmod, (int, float)):
        costmod = (costmod, costmod)
    if isinstance(temperature, (int, float)):
        temperature = (temperature, temperature)
    offsets, flat, sizes, out = _marshal(inputs, output, size_dict)
    n = len(inputs)
    buf = np.empty(2 * (4 * n + 16), dtype=np.int32)
    lf = ctypes.c_double(0.0)
    nsteps = lib.ctg_optimize_random_greedy(
        n, _i32p(offsets), _i32p(flat), len(sizes), _f64p(sizes),
        _i32p(out), len(out), int(ntrials), float(costmod[0]),
        float(costmod[1]), float(temperature[0]), float(temperature[1]),
        int(max_neighbors), int(bool(simplify)), _seed_to_int(seed),
        _i32p(buf), ctypes.byref(lf),
    )
    if nsteps < 0:
        raise RuntimeError("native optimize_random_greedy failed")
    path = _decode_path(buf, nsteps)
    if not use_ssa:
        from ...tree import ssa_to_linear

        path = ssa_to_linear(path, n)
    return path, lf.value


def compressed_stats(
    inputs, output, size_dict, order_pairs, chi, compress_late=False
):
    """Replay ``order_pairs`` (hypergraph-node id pairs; leaves are
    0..N-1, step k makes node N+k) with chi-capped compression, returning
    ``(flops, write, max_size, peak_size)``.
    """
    lib = _get_lib()
    offsets, flat, sizes, out = _marshal(inputs, output, size_dict)
    pairs = np.asarray(order_pairs, dtype=np.int32).reshape(-1)
    out4 = np.zeros(4, dtype=np.float64)
    status = lib.ctg_compressed_stats(
        len(inputs), _i32p(offsets), _i32p(flat), len(sizes),
        _f64p(sizes), _i32p(out), len(out), _i32p(pairs),
        len(pairs) // 2, float(chi), int(bool(compress_late)),
        _f64p(out4),
    )
    if status != 0:
        raise RuntimeError("native compressed_stats failed")
    return tuple(out4)


def optimize_optimal(
    inputs,
    output,
    size_dict,
    minimize="flops",
    cost_cap=2,
    search_outer=False,
    simplify=True,
    use_ssa=False,
):
    lib = _get_lib()
    name, _, fstr = str(minimize).partition("-")
    factor = float(fstr) if fstr else 64.0
    code = _MINIMIZE_CODES.get(name)
    if code is None:
        raise ValueError(f"Unknown minimize {minimize!r}")
    offsets, flat, sizes, out = _marshal(inputs, output, size_dict)
    n = len(inputs)
    buf = np.empty(2 * (4 * n + 16), dtype=np.int32)
    nsteps = lib.ctg_optimize_optimal(
        n, _i32p(offsets), _i32p(flat), len(sizes), _f64p(sizes),
        _i32p(out), len(out), code, factor, float(cost_cap),
        int(bool(search_outer)), int(bool(simplify)), _i32p(buf),
    )
    if nsteps == -2:
        # component too large for the 62-bit mask - Python big ints
        from ...pathfinders import basic

        return basic.optimize_optimal(
            inputs, output, size_dict, minimize=minimize,
            cost_cap=cost_cap, search_outer=search_outer,
            simplify=simplify, use_ssa=use_ssa, accel=False,
        )
    if nsteps < 0:
        raise RuntimeError("native optimize_optimal failed")
    path = _decode_path(buf, nsteps)
    if use_ssa:
        return path
    from ...tree import ssa_to_linear

    return ssa_to_linear(path, n)


def partition(
    eptr, pins, edge_weights, node_weights, parts, imbalance, seed
):
    """Native multilevel hypergraph partition (kernels.cpp
    ``ctg_partition``): heavy-connectivity-matching coarsening,
    greedy-grown initial bisection, 2-way hyperedge FM, recursive
    k-way. Returns an int membership array of length n_nodes, or None
    when the native library is unavailable.

    Reference slot: the kahypar C++ partitioner the reference links
    (``/root/reference/cotengra/pathfinders/path_kahypar.py:50-146``).
    """
    lib = _get_lib()
    if lib is None:
        return None
    eptr = np.ascontiguousarray(eptr, dtype=np.int64)
    pins = np.ascontiguousarray(pins, dtype=np.int32)
    ew = np.ascontiguousarray(edge_weights, dtype=np.float64)
    nw = np.ascontiguousarray(node_weights, dtype=np.float64)
    n = len(nw)
    out = np.empty(n, dtype=np.int32)
    status = lib.ctg_partition(
        n,
        len(ew),
        eptr.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        _i32p(pins),
        _f64p(ew),
        _f64p(nw),
        int(parts),
        float(imbalance),
        ctypes.c_uint64(int(seed) & (2**64 - 1)),
        _i32p(out),
    )
    if status != 0:
        raise RuntimeError("native ctg_partition failed")
    return out
