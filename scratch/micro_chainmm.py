"""Micro-prototype: MXU gate-chain kernel (W_row @ X @ V per tile) vs
the existing in-place VPU kernel.

Correctness: compare vs dense einsum on small shapes (interpret on CPU,
compiled on TPU). Throughput: a 2^27-element split-complex tensor with a
7-gate chain, honest pull-forced timing with in-jit fori_loop repeats.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(rows_in, rows_out, C_in, C_out, has_row, lane_mode,
                interpret, prec=None):
    """lane_mode: 0 none, 1 real, 2 complex (4-dot)."""

    def kernel(*refs):
        i = 0
        if has_row:
            w_ref = refs[i]; i += 1
        if lane_mode >= 1:
            vr_ref = refs[i]; i += 1
        if lane_mode == 2:
            vi_ref = refs[i]; i += 1
        x_ref = refs[i]
        o_ref = refs[i + 1]
        X = x_ref[:].reshape(rows_in, C_in)
        if has_row:
            X = jnp.dot(w_ref[:], X, preferred_element_type=jnp.float32, precision=prec)
        if lane_mode == 1:
            X = jnp.dot(X, vr_ref[:], preferred_element_type=jnp.float32, precision=prec)
        elif lane_mode == 2:
            h = rows_out // 2
            Yr, Yi = X[:h], X[h:]
            Zr = (
                jnp.dot(Yr, vr_ref[:], preferred_element_type=jnp.float32, precision=prec)
                - jnp.dot(Yi, vi_ref[:],
                          preferred_element_type=jnp.float32, precision=prec)
            )
            Zi = (
                jnp.dot(Yr, vi_ref[:], preferred_element_type=jnp.float32, precision=prec)
                + jnp.dot(Yi, vr_ref[:],
                          preferred_element_type=jnp.float32, precision=prec)
            )
            X = jnp.concatenate([Zr, Zi], axis=0)
        o_ref[:] = X.reshape(o_ref.shape).astype(o_ref.dtype)

    return kernel


def run_chainmm_proto(x, Ws, in_view, out_view, in_block, out_block,
                      grid, seg_axes_in, seg_axes_out, seg_sizes,
                      interpret=False, prec=None):
    """x: flat; Ws: dict with optional 'w', 'vr', 'vi'."""
    rows_in = 1
    for d in in_block[:-1]:
        rows_in *= d
    rows_out = 1
    for d in out_block[:-1]:
        rows_out *= d
    C_in, C_out = in_block[-1], out_block[-1]
    has_row = "w" in Ws
    lane_mode = 2 if "vi" in Ws else (1 if "vr" in Ws else 0)
    kernel = make_kernel(rows_in, rows_out, C_in, C_out, has_row,
                         lane_mode, interpret, prec=prec)

    def unravel(s, sizes):
        coords = []
        for sz in reversed(sizes):
            coords.append(s % sz)
            s = s // sz
        return tuple(reversed(coords))

    def make_index(view_len, seg_axes):
        def index(s, c):
            coords = unravel(s, seg_sizes) if seg_sizes else ()
            idx = [0] * view_len
            for ax, cv in zip(seg_axes, coords):
                idx[ax] = cv
            idx[-1] = c
            return tuple(idx)
        return index

    ops = []
    specs = []
    for k in ("w", "vr", "vi"):
        if k in Ws:
            ops.append(Ws[k])
            specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_view, x.dtype),
        grid=grid,
        in_specs=specs + [
            pl.BlockSpec(in_block, make_index(len(in_view), seg_axes_in),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            out_block, make_index(len(out_view), seg_axes_out),
            memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    return fn(*ops, x.reshape(in_view)).reshape(-1)


def test_correctness(interpret):
    """x logical (2, a, g1, s, g2, r2axes..., caxes...): apply a complex
    gate on g1 (above), one on g2 (above), one on a lane axis."""
    rng = np.random.default_rng(0)
    # order: [a=4, g1=2, s=3, g2=2, r1=8, c1=4, c2=128]  (r2=8, C=512)
    dims = dict(a=4, g1=2, s=3, g2=2, r1=8, c1=4, c2=128)
    order = ["a", "g1", "s", "g2", "r1", "c1", "c2"]
    shape = tuple(dims[k] for k in order)
    xr = rng.standard_normal(shape).astype(np.float32)
    xi = rng.standard_normal(shape).astype(np.float32)
    xc = xr + 1j * xi
    G1 = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    G2 = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    GL = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    # reference: contract g1 with G1 (k->n), g2 with G2, c1 with GL
    ref = np.einsum("agsbrcl,gG,bB,cC->aGsBrCl", xc, G1, G2, GL)

    # build the tile form: above gate dims g1, g2; seg dims a, s
    # in_view (2, a, g1, s, g2, r2=8, C=512)
    C = dims["c1"] * dims["c2"]
    in_view = (2, 4, 2, 3, 2, 8, C)
    out_view = in_view
    in_block = (2, 1, 2, 1, 2, 8, C)
    out_block = in_block
    grid = (4 * 3, 1)
    seg_sizes = (4, 3)
    seg_axes = (1, 3)

    # rows = 2 * g1 * g2 * r2 = 2*2*2*8 = 64
    # W_row = embed2x2( kron(G1, G2) x I8 )
    A = np.kron(np.kron(G1.T, G2.T), np.eye(8))  # acts k->n: rows out
    # convention: out[n] = sum_k G[k, n] x[k]  => W_row[n, k] = G[k, n]
    # A above built with .T so A[n_index, k_index] = G1[k,n]G2[k,n]
    Wr = np.block([[A.real, -A.imag], [A.imag, A.real]]).astype(
        np.float32
    )
    # V: lane op on c1 (stride 128, size 4): out[c'] = sum_c x[c] V[c,c']
    # lane space (c1, c2): V = GL kron I128 with V[(c),(c')] = GL[c1,c1']
    V = np.kron(GL, np.eye(128))
    Vr = V.real.astype(np.float32)
    Vi = V.imag.astype(np.float32)

    x_flat = jnp.asarray(
        np.concatenate([xr.reshape(-1), xi.reshape(-1)])
    )
    out = run_chainmm_proto(
        x_flat, {"w": jnp.asarray(Wr), "vr": jnp.asarray(Vr),
                 "vi": jnp.asarray(Vi)},
        in_view, out_view, in_block, out_block, grid,
        seg_axes, seg_axes, seg_sizes, interpret=interpret,
        prec=jax.lax.Precision.HIGHEST,
    )
    out = np.asarray(out)
    n = ref.size
    got = out[:n].reshape(ref.shape) + 1j * out[n:].reshape(ref.shape)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"correctness rel err: {err:.2e}")
    assert err < 1e-5, err


def bench_tpu():
    """2^27 tensor, 7-gate chain: 4 above (2x2), 3 lane (within C=1024).
    Compare against in-place pallas kernel from ops.pallas_gates."""
    numel = 2 ** 27
    C = 1024
    R2 = 8
    # view (2, g1,g2,g3,g4, seg, R2, C): seg = numel/(16*R2*C)
    seg = numel // (16 * R2 * C)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal(2 * numel).astype(np.float32)
    )
    in_view = (2, 2, 2, 2, 2, seg, R2, C)
    in_block = (2, 2, 2, 2, 2, 1, R2, C)
    grid = (seg, 1)
    rows = 2 * 16 * R2  # 256
    Wr = jnp.asarray(
        rng.standard_normal((rows, rows)).astype(np.float32)
    )
    Vr = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32))
    Vi = jnp.asarray(rng.standard_normal((C, C)).astype(np.float32))

    def one(x):
        return run_chainmm_proto(
            x, {"w": Wr, "vr": Vr, "vi": Vi},
            in_view, in_view, in_block, in_block, grid,
            (5,), (5,), (seg,), interpret=False,
        )

    @jax.jit
    def rep(x):
        def body(i, x):
            return jax.lax.optimization_barrier(one(x))
        return jax.lax.fori_loop(0, 10, body, x)

    r = rep(x)
    v = np.asarray(r[:4])
    assert np.all(np.isfinite(v)), v
    t0 = time.time()
    r = rep(x)
    v = np.asarray(r[:4])
    dt = (time.time() - t0) / 10
    assert np.all(np.isfinite(v))
    gb = 2 * numel * 4 * 2 / 1e9
    # useful complex flops if this were a 7-gate chain of 2x2s:
    useful = 8 * numel * 4 * 7
    print(f"chainmm: {dt*1e3:.2f} ms/pass, {gb/dt:.0f} GB/s eff, "
          f"useful {useful/dt/1e12:.2f} TFLOP/s")
    # MXU flops actually performed:
    mxu = 2 * rows * rows * numel // (16 * R2) + 4 * 2 * C * C * (
        numel // C // 2
    )
    print(f"  mxu flops/pass {mxu:.2e} -> {mxu/dt/1e12:.1f} TFLOP/s")


def bench_inplace():
    """The existing in-place kernel on an equivalent 7-gate chain."""
    from cotengra_tpu.ops.pallas_gates import (
        build_chain_spec, run_chain,
    )

    numel = 2 ** 27
    n_ax = 27
    order = tuple(f"x{i}" for i in range(n_ax))
    sizes = {f"x{i}": 2 for i in range(n_ax)}
    # 7 gates: 4 above, 3 in lane region (last 10 axes = C=1024+)
    gates = []
    for i in range(4):
        gates.append(((f"x{i}",), (f"y{i}",)))
        sizes[f"y{i}"] = 2
    for i in range(3):
        gates.append(((f"x{20 + i}",), (f"z{i}",)))
        sizes[f"z{i}"] = 2
    spec, out_order, c_orders = build_chain_spec(order, sizes, gates)
    if spec is None:
        print("inplace spec failed:", out_order)
        return
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(2 * numel).astype(np.float32))
    ys = [
        jnp.asarray(rng.standard_normal((2, 2, 2)).astype(np.float32))
        for _ in range(7)
    ]

    @jax.jit
    def rep(x):
        def body(i, x):
            return jax.lax.optimization_barrier(
                run_chain(spec, x, ys)
            )
        return jax.lax.fori_loop(0, 10, body, x)

    r = rep(x)
    v = np.asarray(r[:4])
    assert np.all(np.isfinite(v))
    t0 = time.time()
    r = rep(x)
    v = np.asarray(r[:4])
    dt = (time.time() - t0) / 10
    gb = 2 * numel * 4 * 2 / 1e9
    useful = 8 * numel * 4 * 7
    print(f"inplace: {dt*1e3:.2f} ms/pass, {gb/dt:.0f} GB/s eff, "
          f"useful {useful/dt/1e12:.2f} TFLOP/s")


def bench_copy():
    """Raw achievable HBM copy bandwidth reference."""
    numel = 2 ** 27
    x = jnp.asarray(
        np.random.default_rng(3)
        .standard_normal(2 * numel)
        .astype(np.float32)
    )

    @jax.jit
    def rep(x):
        def body(i, x):
            return jax.lax.optimization_barrier(x * 1.000001)
        return jax.lax.fori_loop(0, 10, body, x)

    r = rep(x)
    np.asarray(r[:4])
    t0 = time.time()
    r = rep(x)
    np.asarray(r[:4])
    dt = (time.time() - t0) / 10
    gb = 2 * numel * 4 * 2 / 1e9
    print(f"copy(scale): {dt*1e3:.2f} ms/pass, {gb/dt:.0f} GB/s")


if __name__ == "__main__":
    on_cpu = jax.default_backend() == "cpu"
    test_correctness(interpret=on_cpu)
    if not on_cpu:
        bench_copy()
        bench_tpu()
        bench_inplace()
