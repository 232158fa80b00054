"""Microbench: complex64 ops vs split-f32 equivalents on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("device:", dev)


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


rng = np.random.default_rng(0)
M = 2**22

for K, N in [(2, 2), (4, 4), (8, 8), (128, 128)]:
    xc = jnp.asarray(
        rng.normal(size=(K, M)).astype(np.float32)
        + 1j * rng.normal(size=(K, M)).astype(np.float32)
    )
    yc = jnp.asarray(
        rng.normal(size=(N, K)).astype(np.float32)
        + 1j * rng.normal(size=(N, K)).astype(np.float32)
    )

    @jax.jit
    def mm_c(y, x):
        return jax.lax.dot_general(y, x, (((1,), (0,)), ((), ())))

    t_c = timeit(mm_c, yc, xc)

    # split: X = (2K, M) stacked planes, Y' = [[yr,-yi],[yi,yr]] (2N,2K)
    xs = jnp.concatenate([xc.real, xc.imag], axis=0)
    yr, yi = yc.real, yc.imag
    ys = jnp.block([[yr, -yi], [yi, yr]])

    @jax.jit
    def mm_s(y, x):
        return jax.lax.dot_general(y, x, (((1,), (0,)), ((), ())))

    t_s = timeit(mm_s, ys, xs)
    flops = 8 * N * K * M  # complex mult-add = 8 real flops
    print(
        f"mm K={K:4d} N={N:4d} M=2^22: complex64 {t_c*1e3:7.3f} ms "
        f"({flops/t_c/1e12:6.2f} TF/s) | split-f32 {t_s*1e3:7.3f} ms "
        f"({flops/t_s/1e12:6.2f} TF/s)  speedup {t_c/t_s:5.2f}x"
    )

# bandwidth: elementwise scale on same byte count
xc = jnp.asarray(
    rng.normal(size=(2**23,)).astype(np.float32)
    + 1j * rng.normal(size=(2**23,)).astype(np.float32)
)
xf = jnp.asarray(rng.normal(size=(2**24,)).astype(np.float32))


@jax.jit
def scale_c(x):
    return x * 1.0001


@jax.jit
def scale_f(x):
    return x * 1.0001


t_c = timeit(scale_c, xc)
t_f = timeit(scale_f, xf)
by = 2**23 * 8 * 2  # read+write
print(
    f"elementwise 64MB: complex64 {t_c*1e3:.3f} ms ({by/t_c/1e9:.0f} GB/s)"
    f" | f32 {t_f*1e3:.3f} ms ({by/t_f/1e9:.0f} GB/s)"
)

# mac-mode analog: K=2 unrolled MACs, complex vs split
K = 2
xc = jnp.asarray(
    rng.normal(size=(K * M,)).astype(np.float32)
    + 1j * rng.normal(size=(K * M,)).astype(np.float32)
)
yc = jnp.asarray(
    rng.normal(size=(K, 2)).astype(np.float32)
    + 1j * rng.normal(size=(K, 2)).astype(np.float32)
)


@jax.jit
def mac_c(x, y):
    cols = []
    for n in range(2):
        acc = None
        for k in range(K):
            xk = jax.lax.dynamic_slice(x, (k * M,), (M,))
            term = xk * y[k, n]
            acc = term if acc is None else acc + term
        cols.append(acc)
    return jnp.concatenate(cols)


xs = jnp.concatenate([xc.real, xc.imag]).reshape(2, K * M)
ys = jnp.stack([yc.real, yc.imag])


@jax.jit
def mac_s(x, y):
    cols = []
    for n in range(2):
        accr = acci = None
        for k in range(K):
            xr = jax.lax.dynamic_slice(x, (0, k * M), (1, M))[0]
            xi = jax.lax.dynamic_slice(x, (1, k * M), (1, M))[0]
            tr = xr * y[0, k, n] - xi * y[1, k, n]
            ti = xr * y[1, k, n] + xi * y[0, k, n]
            accr = tr if accr is None else accr + tr
            acci = ti if acci is None else acci + ti
        cols.append(jnp.stack([accr, acci]))
    return jnp.concatenate(cols, axis=1)


t_c = timeit(mac_c, xc, yc)
t_s = timeit(mac_s, xs, ys)
print(f"mac K=2 N=2 M=2^22: complex64 {t_c*1e3:.3f} ms | split {t_s*1e3:.3f} ms  speedup {t_c/t_s:.2f}x")
