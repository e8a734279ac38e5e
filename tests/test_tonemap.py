import numpy as np
import jax.numpy as jnp
import pytest

from rustic_tpu.config import Tonemapping
from rustic_tpu.ops.tonemap import apply_tonemap


@pytest.mark.parametrize("op", list(Tonemapping))
def test_black_stays_black(op):
    out = np.asarray(apply_tonemap(jnp.zeros((4, 3)), op))
    np.testing.assert_allclose(out, 0.0, atol=1e-3)


@pytest.mark.parametrize(
    "op",
    [
        Tonemapping.REINHARD,
        Tonemapping.ACES_NARKOWICZ,
        Tonemapping.NEUTRAL,
        Tonemapping.UNCHARTED2,
    ],
)
def test_monotone_and_bounded(op):
    x = jnp.linspace(0.0, 20.0, 256)[:, None].repeat(3, axis=1)
    y = np.asarray(apply_tonemap(x, op, gamma_encode=False))[:, 0]
    assert np.all(np.diff(y) >= -1e-5)
    assert y.max() < 1.5


def test_none_is_identity_before_gamma():
    x = jnp.asarray([[0.25, 0.5, 1.0]])
    y = np.asarray(apply_tonemap(x, Tonemapping.NONE, gamma_encode=False))
    np.testing.assert_allclose(y, np.asarray(x), atol=1e-7)


def test_gamma_encode():
    x = jnp.asarray([[0.5, 0.5, 0.5]])
    y = np.asarray(apply_tonemap(x, Tonemapping.NONE))
    np.testing.assert_allclose(y, 0.5 ** (1 / 2.2), atol=1e-5)


def test_aces_hill_neutral_for_gray():
    x = jnp.full((1, 3), 0.18)
    y = np.asarray(apply_tonemap(x, Tonemapping.ACES_HILL, gamma_encode=False))
    assert np.abs(y - y.mean()).max() < 0.01  # stays near-achromatic


def test_aces_narkowicz_pre_exposure():
    """The default ACES applies x0.6 pre-exposure (render.wgsl:136);
    the overexposed variant is the bare curve (:139-140)."""
    import jax.numpy as jnp

    from rustic_tpu.config import Tonemapping

    x = jnp.full((1, 3), 1.0)
    default = np.asarray(
        apply_tonemap(x, Tonemapping.ACES_NARKOWICZ, gamma_encode=False)
    )
    over = np.asarray(
        apply_tonemap(
            x, Tonemapping.ACES_NARKOWICZ_OVEREXPOSED, gamma_encode=False
        )
    )
    assert (default < over).all()
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    v = 0.6
    expect = (v * (a * v + b)) / (v * (c * v + d) + e)
    np.testing.assert_allclose(default, expect, rtol=1e-6)
