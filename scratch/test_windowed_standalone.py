"""Standalone correctness: plan_window_chain + exec_window vs numpy."""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from cotengra_tpu.ops.grouped import _block_plan
from cotengra_tpu.ops.windowed import exec_window, plan_window_chain


def run_case(n_ax, gate_specs, seed=0, verbose=True):
    """gate_specs: list of (c_positions, n_new_axes). c_positions index
    the ORIGINAL axes (all size 2)."""
    rng = np.random.default_rng(seed)
    order0 = tuple(f"x{i}" for i in range(n_ax))
    sizes = {a: 2 for a in order0}
    shape = tuple(sizes[a] for a in order0)
    xc = (
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    )

    gates = []
    ys = {}
    ref = xc
    ref_order = list(order0)
    for gi, (c_axes, n_names) in enumerate(gate_specs):
        c_legs = tuple(c_axes)
        ny_legs = tuple(n_names)
        for nm in ny_legs:
            sizes[nm] = 2
        K = 2 ** len(c_legs)
        N = 2 ** len(ny_legs)
        yc = (
            rng.standard_normal((K, N))
            + 1j * rng.standard_normal((K, N))
        )
        y_order = c_legs + ny_legs  # already aligned
        y_plan = _block_plan(
            y_order, c_legs + ny_legs,
            sizes,
        )
        y_id = 100 + gi
        ys[y_id] = yc.reshape(
            tuple(sizes[a] for a in y_order)
        )
        gates.append((y_id, y_plan, c_legs, ny_legs, 200 + gi))
        # numpy reference: contract c_legs with y
        pos = [ref_order.index(a) for a in c_legs]
        yt = yc.reshape(
            tuple(sizes[a] for a in c_legs)
            + tuple(sizes[a] for a in ny_legs)
        )
        ref = np.tensordot(
            ref, yt, axes=(pos, list(range(len(c_legs))))
        )
        ref_order = [
            a for a in ref_order if a not in set(c_legs)
        ] + list(ny_legs)

    recs, why = plan_window_chain(order0, sizes, gates)
    assert recs is not None, why
    recs[0].x_id = 0

    # execute
    def to_planes(a):
        a = np.asarray(a)
        return jnp.asarray(
            np.concatenate(
                [a.real.reshape(-1), a.imag.reshape(-1)]
            ).astype(np.float64)
        )

    temps = {0: to_planes(xc)}
    for y_id, y in ys.items():
        temps[y_id] = to_planes(y)
    shapes = {}
    forms = []
    for rec in recs:
        out = exec_window(rec, temps, shapes, None, jnp.float64)
        temps[rec.out_id] = out
        forms.append(
            (rec.form, rec.A1, rec.S_in, rec.A2, rec.S_out,
             len(rec.gates))
        )
    final = recs[-1]
    flat = np.asarray(temps[final.out_id])
    n = flat.size // 2
    got = flat[:n].reshape(final.out_shape) + 1j * flat[n:].reshape(
        final.out_shape
    )
    # reorder ref to final.out_order
    perm = [ref_order.index(a) for a in final.out_order]
    refT = np.transpose(ref, perm)
    err = np.abs(got - refT).max() / max(np.abs(refT).max(), 1e-300)
    if verbose:
        print(f"  forms={forms}")
        print(f"  rel err = {err:.2e}")
    assert err < 1e-10, err
    return forms


if __name__ == "__main__":
    print("case 1: gates near tail (suffix window expected)")
    run_case(18, [(("x16",), ("a",)), (("x17",), ("b",))])
    print("case 2: gates near front (prefix)")
    run_case(18, [(("x0",), ("a",)), (("x1", "x2"), ("b", "c"))])
    print("case 3: gates mid (interior or extended)")
    run_case(18, [(("x8",), ("a",)), (("x9",), ("b",))])
    print("case 4: mixed spread -> multiple clusters")
    run_case(18, [
        (("x1",), ("a",)),
        (("x2", "x3"), ("b", "c")),
        (("x15",), ("d",)),
        (("x16", "x17"), ("e", "f")),
        (("b",), ("g",)),          # re-hit a created axis
    ])
    print("case 5: 2-axis gate spanning separated axes")
    run_case(18, [(("x5", "x8"), ("a", "b"))])
    print("case 6: chain re-hitting same region repeatedly")
    run_case(18, [
        (("x10",), ("a",)),
        (("a", "x11"), ("b", "c")),
        (("c", "x12"), ("d", "e")),
    ])
    print("OK")
