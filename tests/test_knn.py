import numpy as np
import jax.numpy as jnp

from humangaussian_tpu.ops.knn import mean_3nn_sq_dist, mean_3nn_sq_dist_host


def brute_force(points, k=3):
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    part = np.sort(d2, axis=1)[:, :k]
    return part.mean(axis=1)


def sphere_cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v += rng.normal(scale=0.01, size=v.shape)
    return v.astype(np.float32)


def test_host_exact():
    v = sphere_cloud(2000)
    ours = np.asarray(mean_3nn_sq_dist_host(v))
    ref = brute_force(v)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_device_approx_surface():
    """The windowed on-device variant: documented-approximate; bulk of
    points exact, tail bounded in aggregate effect."""
    v = sphere_cloud(2000)
    ours = np.asarray(mean_3nn_sq_dist(jnp.asarray(v), window=64))
    ref = brute_force(v)
    rel = np.abs(ours - ref) / np.maximum(ref, 1e-12)
    assert np.quantile(rel, 0.75) < 1e-4
    assert np.median(rel) < 1e-5
    # errors only overestimate (missed neighbor -> larger distance)
    assert (ours + 1e-6 >= ref).mean() > 0.999


def test_device_approx_uniform():
    rng = np.random.default_rng(1)
    v = rng.uniform(size=(1500, 3)).astype(np.float32)
    ours = np.asarray(mean_3nn_sq_dist(jnp.asarray(v), window=96))
    ref = brute_force(v)
    rel = np.abs(ours - ref) / np.maximum(ref, 1e-12)
    assert np.median(rel) < 1e-5
    assert np.quantile(rel, 0.75) < 1e-3
    assert (ours + 1e-6 >= ref).mean() > 0.999
