"""OVP victim masking vs a numpy transcription of the reference's
roll-based construction (olive quant_modules.py:311-320)."""

import jax.numpy as jnp
import numpy as np

from ant_quantization_tpu.numerics import codebooks as cb
from ant_quantization_tpu.ops.ovp import apply_ovp, victim_mask
from ant_quantization_tpu.ops.snap import snap_concat


def _reference_victims(mask_flat: np.ndarray) -> np.ndarray:
    """torch.roll semantics on the flat mask."""
    victim_odd = np.roll(mask_flat, 1)
    victim_odd[::2] = False
    victim_even = np.roll(mask_flat & ~victim_odd, -1)
    victim_even[1::2] = False
    return victim_even | victim_odd


def test_victim_mask_matches_reference_roll(rng):
    mask = rng.random(4096) < 0.1
    mine = np.asarray(victim_mask(jnp.asarray(mask), pair_axis=-1))
    np.testing.assert_array_equal(mine, _reference_victims(mask))


def test_victim_mask_dense_outliers(rng):
    # stress: half the entries outliers — both-outlier pairs must keep the
    # even element and zero the odd one.
    mask = rng.random(1024) < 0.5
    mine = np.asarray(victim_mask(jnp.asarray(mask), pair_axis=-1))
    np.testing.assert_array_equal(mine, _reference_victims(mask))


def test_pair_semantics():
    # pairs: (out, -) -> odd victim; (-, out) -> even victim; (out, out) ->
    # odd victim only; (-, -) -> none.
    mask = jnp.array([True, False, False, True, True, True, False, False])
    v = victim_mask(mask)
    np.testing.assert_array_equal(
        np.asarray(v),
        [False, True, True, False, False, True, False, False])


def test_apply_ovp_zeroes_victims():
    normals = jnp.asarray(cb.olive_flint_values(4, True))
    outliers = jnp.asarray(cb.olive_outlier_values(4, True))
    full = jnp.concatenate([normals, outliers])
    x = jnp.array([100.0, 3.0, 5.0, 200.0, 50.0, 60.0, 1.0, 2.0])
    q, _ = snap_concat(x, full)
    out = apply_ovp(q)
    # outlier at even 0 kills index 1; outlier at odd 3 kills index 2;
    # outliers at 4 (even) kill 5; plain values survive.
    assert float(out[0]) > 32 and float(out[1]) == 0.0
    assert float(out[2]) == 0.0 and float(out[3]) > 32
    assert float(out[4]) > 32 and float(out[5]) == 0.0
    assert float(out[6]) != 0.0 and float(out[7]) != 0.0


def test_victim_mask_axis0(rng):
    mask = rng.random((64, 8)) < 0.2
    # pairing along axis 0 == pairing along the flat order of the transpose
    v0 = np.asarray(victim_mask(jnp.asarray(mask), pair_axis=0))
    vT = np.asarray(victim_mask(jnp.asarray(mask.T), pair_axis=-1)).T
    np.testing.assert_array_equal(v0, vT)
