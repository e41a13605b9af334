"""Grid-snap op vs the brute-force oracle (CUDA scan semantics,
ant_quantization/quant/quant_kernel.cu:29-36)."""

import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.ops.snap import (snap, snap_bruteforce, snap_codes,
                                           snap_concat)


def _grids():
    for mode in ("int", "pot", "float", "flint", "apot"):
        for signed in (True, False):
            yield cb.ant_grid(mode, 4, signed)
    yield cb.olive_int_values(4, True)
    yield cb.olive_flint_values(4, True)


def test_snap_matches_bruteforce_random(rng):
    x = jnp.asarray(rng.normal(size=4096).astype(np.float32) * 8)
    for grid in _grids():
        g = jnp.asarray(grid)
        deq, codes = snap(x, g)
        deq_bf, _ = snap_bruteforce(x, g)
        np.testing.assert_array_equal(np.asarray(deq), np.asarray(deq_bf))
        np.testing.assert_array_equal(np.asarray(g)[np.asarray(codes)],
                                      np.asarray(deq))


def test_tie_snaps_to_larger():
    grid = jnp.array([0.0, 1.0, 2.0, 4.0], dtype=jnp.float32)
    x = jnp.array([0.5, 1.5, 3.0, -10.0, 10.0], dtype=jnp.float32)
    deq, _ = snap(x, grid)
    np.testing.assert_array_equal(deq, [1.0, 2.0, 4.0, 0.0, 4.0])


def test_snap_exact_grid_points():
    grid = jnp.asarray(cb.ant_grid("flint", 4, True))
    deq, _ = snap(grid, grid)
    np.testing.assert_array_equal(deq, grid)


def test_snap_concat_matches_cuda_concat_order(rng):
    """OliVe concatenates normals+outliers unsorted; ties must resolve
    toward the later (outlier) entry, e.g. -40 -> -48, not -32."""
    normals = jnp.asarray(cb.olive_flint_values(4, True))
    outliers = jnp.asarray(cb.olive_outlier_values(4, True))
    full = jnp.concatenate([normals, outliers])
    x = jnp.asarray(rng.normal(size=8192).astype(np.float32) * 64)
    # include exact midpoints on both sides
    x = jnp.concatenate([x, jnp.array([40.0, -40.0, 32.0, -32.0, 400.0])])
    deq, _ = snap_concat(x, full)
    deq_bf, _ = snap_bruteforce(x, full)
    np.testing.assert_array_equal(np.asarray(deq), np.asarray(deq_bf))
    # explicit tie checks: +40 ties 32/48 -> 48 (later); -40 ties -32/-48 -> -48
    np.testing.assert_array_equal(np.asarray(deq[-5:]),
                                  [48.0, -48.0, 32.0, -32.0, 384.0])


def test_snap_codes_shape_and_dtype(rng):
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    grid = jnp.asarray(cb.ant_grid("int", 4, True))
    codes = snap_codes(x, grid)
    assert codes.shape == (8, 16)
    assert codes.dtype in (jnp.int32, jnp.int64)
    assert int(codes.min()) >= 0 and int(codes.max()) < 16


def test_snap_uniform_matches_generic():
    """O(1) uniform-grid snap == the generic midpoint snap on uniform
    grids (the >6-bit int codebooks), including padded storage."""
    import numpy as np

    from ant_quantization_tpu.ops.snap import snap, snap_uniform

    rng = np.random.default_rng(0)
    for G in (16, 256):
        g0, step = -3.0, 0.0471
        grid = jnp.asarray(g0 + step * np.arange(G), jnp.float32)
        x = jnp.asarray(rng.normal(size=(1000,)) * 8, jnp.float32)
        want_q, want_c = snap(x, grid)
        got_q, got_c = snap_uniform(x, grid)
        np.testing.assert_array_equal(np.asarray(got_c), np.asarray(want_c))
        np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                                   rtol=1e-6, atol=1e-6)
    # padded storage: real size 16, padded to 64 by repeating the max
    grid16 = np.float32(-3.0) + np.float32(0.5) * np.arange(16,
                                                            dtype=np.float32)
    padded = jnp.asarray(np.pad(grid16, (0, 48), mode="edge"))
    x = jnp.asarray(rng.normal(size=(500,)) * 6, jnp.float32)
    want_q, _ = snap(x, jnp.asarray(grid16))
    got_q, _ = snap_uniform(x, padded, size=16)
    np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                               rtol=1e-6, atol=1e-6)


def test_snap_uniform_padded_dynamic_size():
    """ADVICE r3 (high): without an explicit ``size``, snap_uniform must
    derive the real entry count from the padded grid itself. The olive
    signed int 8-bit grid has 255 entries (not 256): 0.0 must quantize
    to exactly 0.0, not to half a step."""
    import numpy as np

    from ant_quantization_tpu.numerics import codebooks as cb
    from ant_quantization_tpu.calibrate.spec import pad_grid
    from ant_quantization_tpu.ops.snap import snap, snap_uniform

    rng = np.random.default_rng(1)
    for bit, signed in ((8, True), (7, True), (7, False), (8, False)):
        real = cb.olive_int_values(bit, signed).astype(np.float32)
        padded = jnp.asarray(pad_grid(real))
        assert padded.shape[0] == 256
        x = jnp.asarray(np.concatenate(
            [rng.normal(size=500) * np.max(np.abs(real)),
             [0.0, real[0], real[-1]]]), jnp.float32)
        want_q, _ = snap(x, jnp.asarray(real))
        got_q, _ = snap_uniform(x, padded)
        np.testing.assert_allclose(np.asarray(got_q), np.asarray(want_q),
                                   rtol=1e-5, atol=1e-5)
        if signed:   # 0 is a grid point of the signed int grids
            assert float(got_q[-3]) == 0.0


def test_snap_value_matches_snap():
    """Direct value select-tree == codes-then-dequant, unrolled and
    scan paths, including midpoint ties."""
    import numpy as np

    from ant_quantization_tpu.numerics import codebooks as cb
    from ant_quantization_tpu.ops.snap import snap, snap_value

    rng = np.random.default_rng(3)
    for grid in (cb.ant_grid("flint", 4, True),
                 cb.ant_grid("pot", 6, False),
                 cb.ant_grid("int", 8, True)):       # 255 entries: scan
        g = jnp.asarray(grid)
        x = jnp.asarray(rng.normal(size=(500,)) * 12, jnp.float32)
        mids = (grid[1:] + grid[:-1]) / 2            # exact ties too
        x = jnp.concatenate([x, jnp.asarray(mids, jnp.float32)])
        want, _ = snap(x, g)
        got = snap_value(x, g)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_snap_concat_value_matches_snap_concat():
    import numpy as np

    from ant_quantization_tpu.numerics import codebooks as cb
    from ant_quantization_tpu.ops.snap import snap_concat, snap_concat_value

    rng = np.random.default_rng(4)
    grid = np.concatenate([cb.olive_grid("flint", 4, True),
                           cb.olive_outlier_values(4, True)])
    g = jnp.asarray(grid, jnp.float32)
    sg = np.sort(grid)
    x = jnp.asarray(np.concatenate(
        [rng.normal(size=400) * 100, (sg[1:] + sg[:-1]) / 2]), jnp.float32)
    want, _ = snap_concat(x, g)
    got = snap_concat_value(x, g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
