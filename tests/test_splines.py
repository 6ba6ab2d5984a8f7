import jax
import jax.numpy as jnp
import numpy as np

from wetts_tpu.ops import piecewise_rational_quadratic_transform


def _params(rng, shape, num_bins):
    return (
        jnp.asarray(rng.standard_normal(shape + (num_bins,)).astype(np.float32)),
        jnp.asarray(rng.standard_normal(shape + (num_bins,)).astype(np.float32)),
        jnp.asarray(rng.standard_normal(shape + (num_bins - 1,)).astype(np.float32)),
    )


def test_spline_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-4.5, 4.5, size=(64,)).astype(np.float32))
    w, h, d = _params(rng, (64,), 10)
    y, ld = piecewise_rational_quadratic_transform(
        x, w, h, d, inverse=False, tails="linear", tail_bound=5.0)
    x2, ld_inv = piecewise_rational_quadratic_transform(
        y, w, h, d, inverse=True, tails="linear", tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-4)


def test_spline_identity_outside_tails():
    rng = np.random.default_rng(1)
    x = jnp.asarray(np.array([-7.0, 6.0, 100.0], dtype=np.float32))
    w, h, d = _params(rng, (3,), 8)
    y, ld = piecewise_rational_quadratic_transform(
        x, w, h, d, inverse=False, tails="linear", tail_bound=5.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ld), np.zeros(3))


def test_spline_logdet_matches_numerical_derivative():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-4.0, 4.0, size=(32,)).astype(np.float32))
    w, h, d = _params(rng, (32,), 6)

    def f(xv):
        y, _ = piecewise_rational_quadratic_transform(
            xv, w, h, d, inverse=False, tails="linear", tail_bound=5.0)
        return y

    _, ld = piecewise_rational_quadratic_transform(
        x, w, h, d, inverse=False, tails="linear", tail_bound=5.0)
    deriv = jax.vmap(jax.grad(lambda s, i: f(x.at[i].set(s))[i]), in_axes=(0, 0))(
        x, jnp.arange(32))
    np.testing.assert_allclose(np.asarray(ld), np.log(np.asarray(deriv)), atol=1e-4)


def test_spline_monotonic():
    rng = np.random.default_rng(3)
    xs = jnp.linspace(-4.9, 4.9, 200)
    w, h, d = _params(rng, (1,), 12)
    w = jnp.broadcast_to(w, (200, 12))
    h = jnp.broadcast_to(h, (200, 12))
    d = jnp.broadcast_to(d, (200, 11))
    y, _ = piecewise_rational_quadratic_transform(
        xs, w, h, d, inverse=False, tails="linear", tail_bound=5.0)
    assert (np.diff(np.asarray(y)) > 0).all()
