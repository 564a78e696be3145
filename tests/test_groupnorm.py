"""Fused GroupNorm(+SiLU): parity vs flax nn.GroupNorm and autodiff."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.ops.groupnorm import group_norm_act


def _ref(x, scale, bias, groups, eps, silu):
    """f32 reference: flax GroupNorm (+silu)."""
    gn = nn.GroupNorm(num_groups=groups, epsilon=eps)
    y = gn.apply(
        {"params": {"scale": scale, "bias": bias}}, x.astype(jnp.float32)
    )
    if silu:
        y = nn.silu(y)
    return y


@pytest.mark.parametrize("silu", [False, True])
@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 32), 8),      # conv activation, Cg=4
    ((3, 16, 24), 6),        # odd rows (pure-XLA fallback path)
    ((2, 4, 4, 320), 32),    # SD channel count, Cg=10
])
def test_forward_matches_flax(shape, groups, silu):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32) * 2.0 + 0.5
    c = shape[-1]
    scale = jnp.asarray(rng.randn(c), jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)
    got = group_norm_act(x, scale, bias, groups, 1e-5, silu)
    want = _ref(x, scale, bias, groups, 1e-5, silu)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("silu", [False, True])
def test_gradients_match_flax(silu):
    rng = np.random.RandomState(1)
    shape, groups = (2, 4, 4, 32), 8
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    scale = jnp.asarray(rng.randn(32), jnp.float32)
    bias = jnp.asarray(rng.randn(32), jnp.float32)
    cot = jnp.asarray(rng.randn(*shape), jnp.float32)

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_act(x, s, b, groups, 1e-5, silu) * cot)

    def loss_ref(x, s, b):
        return jnp.sum(_ref(x, s, b, groups, 1e-5, silu) * cot)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(a, b_, atol=3e-5, rtol=3e-5)


def test_bf16_input_keeps_f32_stats():
    rng = np.random.RandomState(2)
    x32 = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32) * 3.0
    x16 = x32.astype(jnp.bfloat16)
    scale = jnp.ones((64,), jnp.bfloat16)
    bias = jnp.zeros((64,), jnp.bfloat16)
    y = group_norm_act(x16, scale, bias, 8, 1e-5, False)
    assert y.dtype == jnp.bfloat16
    want = _ref(x16.astype(jnp.float32), scale.astype(jnp.float32),
                bias.astype(jnp.float32), 8, 1e-5, False)
    np.testing.assert_allclose(
        y.astype(jnp.float32), want, atol=0.05, rtol=0.05
    )


def test_odd_rows_use_xla_fallback(monkeypatch):
    """Row counts with no >=8 power-of-two divisor (e.g. 15x15 maps)
    must take the pure-XLA stats path, not a block_rows=1 Pallas grid."""
    from humangaussian_tpu.ops import groupnorm as gn_mod

    assert gn_mod._pick_block_rows(225, 64) == 0
    monkeypatch.setattr(gn_mod, "FORCE_PALLAS_INTERPRET", True)
    calls = []
    orig = gn_mod._fwd_stats
    monkeypatch.setattr(
        gn_mod, "_fwd_stats", lambda *a: calls.append(1) or orig(*a)
    )
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 15, 15, 32), jnp.float32)
    s = jnp.ones((32,), jnp.float32)
    b = jnp.zeros((32,), jnp.float32)
    got = group_norm_act(x, s, b, 8, 1e-5, False)
    want = _ref(x, s, b, 8, 1e-5, False)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    assert calls == []  # Pallas stats kernel not used


@pytest.mark.parametrize("silu", [False, True])
def test_pallas_kernels_interpret(monkeypatch, silu):
    """Exercise the Pallas stats kernels (interpret mode off-TPU)."""
    from humangaussian_tpu.ops import groupnorm as gn_mod

    monkeypatch.setattr(gn_mod, "FORCE_PALLAS_INTERPRET", True)
    rng = np.random.RandomState(3)
    shape, groups = (2, 256, 64), 8  # rows divisible by the block size
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    scale = jnp.asarray(rng.randn(64), jnp.float32)
    bias = jnp.asarray(rng.randn(64), jnp.float32)
    cot = jnp.asarray(rng.randn(*shape), jnp.float32)

    got = group_norm_act(x, scale, bias, groups, 1e-5, silu)
    want = _ref(x, scale, bias, groups, 1e-5, silu)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_act(x, s, b, groups, 1e-5, silu) * cot)

    def loss_ref(x, s, b):
        return jnp.sum(_ref(x, s, b, groups, 1e-5, silu) * cot)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(a, b_, atol=3e-5, rtol=3e-5)


def test_grad_flows_bf16():
    x = jnp.linspace(-2, 2, 2 * 4 * 4 * 16).reshape(2, 4, 4, 16)
    x = x.astype(jnp.bfloat16)
    s = jnp.ones((16,), jnp.bfloat16)
    b = jnp.zeros((16,), jnp.bfloat16)
    g = jax.grad(
        lambda x: jnp.sum(
            group_norm_act(x, s, b, 4, 1e-5, True).astype(jnp.float32)
        )
    )(x)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
