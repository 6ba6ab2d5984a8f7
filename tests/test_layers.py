"""Conv primitives vs torch oracles (weight transfer both directions)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from wetts_tpu.models.layers import Conv1d, ConvTranspose1d, Conv2dTorch


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 8)).astype(np.float32)
    m = Conv1d(features=16, kernel_size=5, padding=2, dilation=2)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    k = np.asarray(params["params"]["kernel"])  # [K, I, O]
    b = np.asarray(params["params"]["bias"])
    tconv = torch.nn.Conv1d(8, 16, 5, padding=4, dilation=2)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(k.transpose(2, 1, 0)))  # [O, I, K]
        tconv.bias.copy_(torch.from_numpy(b))
    want = tconv(torch.from_numpy(x.transpose(0, 2, 1)))[..., :]  # [B, O, T']
    # torch padding=4 with dilation=2 == our padding (we passed 2*2=4? no):
    # recompute with identical padding:
    tconv2 = torch.nn.Conv1d(8, 16, 5, padding=2, dilation=2)
    with torch.no_grad():
        tconv2.weight.copy_(torch.from_numpy(k.transpose(2, 1, 0)))
        tconv2.bias.copy_(torch.from_numpy(b))
    want = tconv2(torch.from_numpy(x.transpose(0, 2, 1)))
    got = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy().transpose(0, 2, 1), atol=1e-5)


def test_grouped_conv1d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 12)).astype(np.float32)
    m = Conv1d(features=12, kernel_size=3, padding=1, groups=12)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))
    k = np.asarray(params["params"]["kernel"])  # [K, 1, O]
    b = np.asarray(params["params"]["bias"])
    tconv = torch.nn.Conv1d(12, 12, 3, padding=1, groups=12)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(k.transpose(2, 1, 0)))
        tconv.bias.copy_(torch.from_numpy(b))
    want = tconv(torch.from_numpy(x.transpose(0, 2, 1)))
    got = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy().transpose(0, 2, 1), atol=1e-5)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 10, 6)).astype(np.float32)
    for k_size, stride in [(16, 8), (4, 2), (8, 4)]:
        pad = (k_size - stride) // 2
        m = ConvTranspose1d(features=4, kernel_size=k_size, stride=stride,
                            padding=pad)
        params = m.init(jax.random.PRNGKey(2), jnp.asarray(x))
        w = np.asarray(params["params"]["kernel"])  # [I, O, K] torch layout
        b = np.asarray(params["params"]["bias"])
        tconv = torch.nn.ConvTranspose1d(6, 4, k_size, stride, padding=pad)
        with torch.no_grad():
            tconv.weight.copy_(torch.from_numpy(w))
            tconv.bias.copy_(torch.from_numpy(b))
        want = tconv(torch.from_numpy(x.transpose(0, 2, 1)))
        got = m.apply(params, jnp.asarray(x))
        assert got.shape[1] == x.shape[1] * stride
        np.testing.assert_allclose(
            np.asarray(got), want.detach().numpy().transpose(0, 2, 1),
            atol=1e-5)


def test_weight_norm_conv_matches_plain_at_init():
    # g is initialized to ||v||, so the weight-normed conv must equal the
    # plain conv built from the same kernel (torch.weight_norm invariant).
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 30, 8)).astype(np.float32))
    m = Conv1d(features=16, kernel_size=3, padding=1, weight_norm=True)
    params = m.init(jax.random.PRNGKey(3), x)
    v = params["params"]["v"]
    g = params["params"]["g"]
    norm = np.sqrt(np.asarray((v * v).sum(axis=(0, 1))))
    np.testing.assert_allclose(np.asarray(g), norm, rtol=1e-6)
    got = m.apply(params, x)
    plain = Conv1d(features=16, kernel_size=3, padding=1)
    plain_params = {"params": {"kernel": v, "bias": params["params"]["bias"]}}
    want = plain.apply(plain_params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 12, 9, 3)).astype(np.float32)  # NHWC
    m = Conv2dTorch(features=8, kernel_size=(5, 1), stride=(3, 1),
                    padding=(2, 0))
    params = m.init(jax.random.PRNGKey(4), jnp.asarray(x))
    k = np.asarray(params["params"]["kernel"])  # HWIO
    b = np.asarray(params["params"]["bias"])
    tconv = torch.nn.Conv2d(3, 8, (5, 1), (3, 1), padding=(2, 0))
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(k.transpose(3, 2, 0, 1)))  # OIHW
        tconv.bias.copy_(torch.from_numpy(b))
    want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = m.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want.detach().numpy().transpose(0, 2, 3, 1),
        atol=1e-5)
