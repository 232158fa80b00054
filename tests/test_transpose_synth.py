"""Multi-pass tile-friendly transpose synthesis (ops/transpose_synth).

Every synthesized pass sequence must (a) compose to the requested
permutation, (b) keep wide trailing units (lane padding <= 4x, exact
at tier 128) on both sides of every pass, and (c) produce bit-identical
results to a direct numpy transpose when applied through the
grouped-executor lowering. Synthesis is allowed to give up only on
small arrays (below the production ``_MULTIPASS_MIN`` gate, where the
one-hot-matmul path handles the transpose instead).
"""

import numpy as np

from cotengra_tpu.ops.transpose_synth import (
    padf,
    passes_cost,
    single_pass_pad_factor,
    synthesize_passes,
)

# tier-32 relaxation bound: no pass may lane-pad by more than 128/32
MAX_PASS_PAD = 4.0


def apply_passes_np(x, block_dims, passes):
    """Reference application of a pass list on a flat numpy array."""
    flat = x.reshape(-1)
    for dims, perm in passes:
        flat = (
            flat.reshape(dims).transpose(perm).reshape(-1)
        )
    return flat


def check(block_dims, perm, max_passes=5):
    passes = synthesize_passes(block_dims, perm)
    assert passes is not None, (block_dims, perm)
    assert len(passes) <= max_passes
    n = int(np.prod(block_dims))
    x = np.arange(n, dtype=np.int64)
    want = x.reshape(block_dims).transpose(perm).reshape(-1)
    got = apply_passes_np(x, block_dims, passes)
    np.testing.assert_array_equal(got, want)
    # legality of every pass: bounded lane padding on both sides
    for dims, p in passes:
        assert padf(dims[-1]) <= MAX_PASS_PAD, (dims, p)
        assert padf(dims[p[-1]]) <= MAX_PASS_PAD, (dims, p)
    return passes


def test_single_pass_when_trailing_big():
    # trailing dim stays, big and 128-divisible -> one fused copy
    passes = check((4, 8, 2, 1024), (1, 0, 2, 3), max_passes=1)
    assert len(passes) == 1


def test_combo_plan_shapes():
    """The round-4 combo-plan realigns that OOMed the memory planner
    (16 GB for a 256 MB view, bench_r4_combo logs)."""
    # step 169: K-to-front riffle of an 11-dim stored order ending in 2
    check(
        (4, 2, 4, 2, 16, 4, 512, 8, 2),
        (1, 3, 5, 7, 0, 2, 4, 6, 8),
    )
    # step 172
    check(
        (2, 2, 8, 2, 4, 4, 64, 4, 32, 2, 2),
        (1, 3, 5, 7, 9, 0, 2, 4, 6, 8, 10),
    )
    # step 170/171 variants
    check(
        (4, 2, 32, 2, 256, 8, 4, 4, 2),
        (1, 3, 5, 7, 0, 2, 4, 6, 8),
    )
    check(
        (2, 2, 4, 8, 8192, 4, 2, 2, 2),
        (1, 3, 5, 7, 0, 2, 4, 6, 8),
    )


def test_official_plan_shapes():
    """The official m=10 plan's scattered-dot pairs (padded temps)."""
    check(
        (4, 4, 4, 2, 256, 2, 4, 4, 2, 2, 16),
        (1, 3, 5, 7, 9, 0, 2, 4, 6, 8, 10),
    )
    check(
        (2, 2, 2, 2, 2, 1024, 4, 4, 2),
        (1, 3, 5, 7, 0, 2, 4, 6, 8),
    )


def test_anchor_scheme_shapes():
    """Thin shapes whose only legal units sit inside U and Z - the
    anchor scheme's territory (big atoms act as movable tail anchors).
    """
    check((128, 1024, 2), (1, 0, 2), max_passes=3)
    check((256, 256, 2, 2), (1, 0, 2, 3))
    check((8, 512, 32, 2), (2, 1, 3, 0))
    check((512, 512, 2, 2), (3, 1, 0, 2))


def test_random_bit_permutations():
    rng = np.random.default_rng(0)
    for trial in range(250):
        nbits = int(rng.integers(12, 26))
        # random factorization into dims of 1-10 bits
        dims = []
        left = nbits
        while left:
            b = int(rng.integers(1, min(10, left) + 1))
            dims.append(2**b)
            left -= b
        perm = tuple(rng.permutation(len(dims)).tolist())
        block_dims = tuple(dims)
        passes = synthesize_passes(block_dims, perm)
        total = int(np.prod(block_dims))
        if passes is None:
            # allowed only below the production multipass gate
            # (32 MB = 2**22 8-byte elements; observed failures all
            # have total < 2**20)
            assert total < 2**20, (block_dims, perm)
            continue
        assert len(passes) <= 5
        if total <= 2**20:
            x = np.arange(total, dtype=np.int64)
            want = x.reshape(block_dims).transpose(perm).reshape(-1)
            got = apply_passes_np(x, block_dims, passes)
            np.testing.assert_array_equal(got, want)
        for dims_i, p in passes:
            assert padf(dims_i[-1]) <= MAX_PASS_PAD
            assert padf(dims_i[p[-1]]) <= MAX_PASS_PAD


def test_mixed_radix():
    # non power-of-two dims: 3s and 5s mixed with 2s
    check((3, 2, 4, 5, 2, 384), (3, 1, 0, 4, 2, 5), max_passes=4)


def test_pad_factor():
    # identity-trailing big dims: exact both sides
    assert single_pass_pad_factor((4, 2048, 1024), (1, 0, 2)) == 1.0
    # output ends with the size-2 dim -> 64x lane padding
    assert single_pass_pad_factor((1024, 2), (1, 0)) == 64.0
    # input trailing dim 2 -> 64x even though output trailing is big
    assert single_pass_pad_factor((1024, 2), (0, 1)) == 64.0
    assert single_pass_pad_factor((2, 16, 1024), (2, 1, 0)) == 64.0


def test_passes_cost_prefers_exact():
    """The returned plan's estimated traffic must beat the single
    copy's for the catastrophic shapes."""
    bd = (4, 2, 4, 2, 16, 4, 512, 8, 2)
    perm = (1, 3, 5, 7, 0, 2, 4, 6, 8)
    passes = synthesize_passes(bd, perm)
    single = padf(bd[-1]) + padf(bd[perm[-1]])
    assert passes_cost(passes) < single


def test_grouped_apply_matches_numpy():
    """End-to-end through the grouped-executor lowering on CPU."""
    import jax

    from cotengra_tpu.ops import grouped as G

    block_dims = (4, 2, 4, 2, 16, 4, 512, 8, 2)
    perm = (1, 3, 5, 7, 0, 2, 4, 6, 8)
    n = int(np.prod(block_dims))
    x = np.random.default_rng(1).normal(size=2 * n).astype(np.float32)
    want = np.concatenate(
        [
            x[:n].reshape(block_dims).transpose(perm).reshape(-1),
            x[n:].reshape(block_dims).transpose(perm).reshape(-1),
        ]
    )
    # force the multipass path (low threshold)
    old_min, old_mp = G._MULTIPASS_MIN, G._MULTIPASS
    G._MULTIPASS_MIN, G._MULTIPASS = 0, True
    try:
        passes = G._multipass_plan(x.nbytes, block_dims, perm)
        assert passes is not None and len(passes) >= 2
        got = np.asarray(
            jax.jit(
                lambda f: G._apply_block_plan_split(
                    f, (block_dims, perm)
                )
            )(x)
        )
    finally:
        G._MULTIPASS_MIN, G._MULTIPASS = old_min, old_mp
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
