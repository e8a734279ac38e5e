import numpy as np
import jax.numpy as jnp

from rustic_tpu.ops import rng


def test_lds_range_and_determinism():
    n = jnp.arange(4096, dtype=jnp.uint32)
    for dim in [0, 1, 5, 31, 33]:
        v = np.asarray(rng.lds(n, dim, jnp.uint32(12345)))
        assert v.min() >= 0.0 and v.max() < 1.0
        v2 = np.asarray(rng.lds(n, dim, jnp.uint32(12345)))
        np.testing.assert_array_equal(v, v2)


def test_lds_dimension_wraps_mod_32():
    n = jnp.arange(64, dtype=jnp.uint32)
    a = np.asarray(rng.lds(n, 1, jnp.uint32(7)))
    b = np.asarray(rng.lds(n, 33, jnp.uint32(7)))
    np.testing.assert_array_equal(a, b)


def test_lds_equidistribution():
    # An additive-recurrence sequence should cover [0,1) uniformly.
    n = jnp.arange(1 << 14, dtype=jnp.uint32)
    v = np.asarray(rng.lds(n, 3, jnp.uint32(0)))
    hist, _ = np.histogram(v, bins=16, range=(0, 1))
    assert hist.min() > 0.8 * (len(v) / 16)
    assert abs(v.mean() - 0.5) < 0.01


def test_pcg_hash_matches_numpy_twin():
    x = np.arange(1000, dtype=np.uint32) * np.uint32(2654435761)
    a = np.asarray(rng.pcg_hash(jnp.asarray(x)))
    b = rng.pcg_hash_np(x)
    np.testing.assert_array_equal(a, b)


def test_pcg_hash_spreads():
    h = rng.pcg_hash_np(np.arange(1 << 14, dtype=np.uint32))
    assert len(np.unique(h)) > (1 << 14) * 0.999
    assert abs(h.astype(np.float64).mean() / 2**32 - 0.5) < 0.01
