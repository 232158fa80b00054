"""Approximate (compressed) contraction of a 2D lattice network with a
capped bond dimension chi - planned with the compressed hyper-optimizer
and EXECUTED natively with QR+SVD truncation (the reference delegates
this step to quimb).
"""

import numpy as np

import cotengra_tpu as ctg

# an 8x8 PEPS-norm-like lattice with bond dimension 4
inputs, output, shapes, size_dict = ctg.lattice_equation(
    [8, 8], d_min=4
)
rng = np.random.default_rng(0)
# weakly-correlated tensors so truncation is controlled
arrays = [np.ones(s) + 0.05 * rng.normal(size=s) for s in shapes]

# plan an order that minimizes the compressed peak size at chi=16
opt = ctg.HyperCompressedOptimizer(chi=16, max_repeats=16, seed=0)
tree = opt.search(inputs, output, size_dict)
print("planned:  ", tree.describe("full"))

# refine: window-localized branch-and-bound over the contraction chain,
# then annealed associativity rewrites
tree = tree.windowed_reconfigure(
    window_size=12, max_iterations=60, seed=0
)
print("windowed: ", tree.describe("full"))
tree = tree.simulated_anneal(tsteps=20, numiter=8, seed=0)
print("annealed: ", tree.describe("full"))

# execute approximately at increasing chi - converges to exact.
# strip_exponent keeps the huge lattice norm in range: the result is
# (mantissa, log10 exponent)
for chi in (4, 8, 16, 64, 10**9):
    m, e = tree.contract_compressed(
        arrays, chi=chi, strip_exponent=True
    )
    print(
        f"chi={chi:>10}: {float(np.asarray(m)):+.6f} x 10^"
        f"{float(np.asarray(e)):.3f}"
    )
