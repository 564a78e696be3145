"""Parity tests for the tuned Pallas self-attention (ops/attention.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.ops.attention import self_attention


def _naive(q, k, v):
    b, s, h, d = q.shape
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(d))
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("b,s,h,d", [(2, 256, 5, 64), (1, 512, 2, 64),
                                     (3, 64, 4, 32), (2, 1024, 1, 64)])
def test_matches_naive(b, s, h, d):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h, d), jnp.float32)
               for kk in keys)
    out = self_attention(q, k, v)
    ref = _naive(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_bf16_close():
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (2, 256, 5, 64), jnp.bfloat16)
               for kk in keys)
    out = self_attention(q, k, v).astype(jnp.float32)
    ref = _naive(q.astype(jnp.float32), k.astype(jnp.float32),
                 v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_grads_match_naive():
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (1, 256, 2, 64), jnp.float32)
               for kk in keys)

    def loss_mine(q, k, v):
        return jnp.sum(jnp.sin(self_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_naive(q, k, v)))

    gm = jax.grad(loss_mine, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4)


def test_jit_and_vmap_compose():
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = (jax.random.normal(kk, (2, 256, 2, 64), jnp.float32)
               for kk in keys)
    out = jax.jit(self_attention)(q, k, v)
    ref = _naive(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
