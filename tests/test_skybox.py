import numpy as np
import jax.numpy as jnp

from rustic_tpu.ops.skybox import image_sky, procedural_sky


def _sun():
    d = np.array([0.5, 1.3, 1.0])
    d = d / np.linalg.norm(d)
    return jnp.asarray([*d, 15.0], jnp.float32)


def test_procedural_sky_finite_nonnegative():
    n = 256
    rng = np.random.default_rng(0)
    rd = rng.normal(0, 1, (n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    ro = np.zeros((n, 3), np.float32)
    out = np.asarray(procedural_sky(_sun(), jnp.asarray(ro), jnp.asarray(rd)))
    assert np.isfinite(out).all()
    assert (out >= 0.0).all()


def test_procedural_sky_brighter_toward_sun():
    sun = _sun()
    toward = np.asarray(sun[:3])[None, :].astype(np.float32)
    away = -toward
    ro = np.zeros((1, 3), np.float32)
    bright = np.asarray(procedural_sky(sun, jnp.asarray(ro), jnp.asarray(toward))).sum()
    dark = np.asarray(procedural_sky(sun, jnp.asarray(ro), jnp.asarray(away))).sum()
    assert bright > dark


def test_image_sky_intensity_normalization():
    """Uniform skybox image -> radiance = pixel * intensity/15
    (reference: kernels/src/lib.rs:76)."""
    img = jnp.full((8, 16, 4), 2.0)
    rd = jnp.asarray(np.random.default_rng(1).normal(0, 1, (64, 3)).astype(np.float32))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    out = np.asarray(image_sky(img, _sun(), rd))
    np.testing.assert_allclose(out, 2.0 * (15.0 / 15.0), atol=1e-4)


def test_image_sky_equirect_poles():
    """Looking straight up/down lands on the first/last image rows."""
    img = jnp.zeros((8, 16, 4)).at[0].set(1.0)  # v=0 row bright
    up = jnp.asarray([[0.0, 1.0, 0.0]])
    down = jnp.asarray([[0.0, -1.0, 0.0]])
    sun = _sun()
    # v = 1 - (0.5 + asin(y)/pi): up -> v=0, down -> v=1
    assert np.asarray(image_sky(img, sun, up))[0, 0] > 0.5
    assert np.asarray(image_sky(img, sun, down))[0, 0] < 0.5
