import numpy as np
import jax
import jax.numpy as jnp
import pytest

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.core.scene import inverse_sigmoid
from humangaussian_tpu.core.sh import rgb_to_sh
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians
from humangaussian_tpu.ops.rasterize_ref import rasterize_reference

CFG = RasterizeConfig()


def make_camera(h=64, w=64, dist=3.0, fovy=0.8):
    c2w = look_at_c2w(
        jnp.array([0.0, 0.0, dist]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    return camera_from_c2w(c2w, fovy, h, w)


def make_scene(means, rgbs, opacity=0.9, scale=0.1, capacity=None):
    n = means.shape[0]
    capacity = capacity or n
    pad = capacity - n

    def p(x, fill=0.0):
        return jnp.concatenate(
            [jnp.asarray(x, jnp.float32), jnp.full((pad,) + x.shape[1:], fill)], 0
        )

    means = p(np.asarray(means, np.float32))
    scales = jnp.full((capacity, 3), scale, jnp.float32)
    quats = jnp.concatenate(
        [jnp.ones((capacity, 1)), jnp.zeros((capacity, 3))], axis=1
    )
    features = rgb_to_sh(p(np.asarray(rgbs, np.float32)))[:, None, :]
    opacities = jnp.full((capacity, 1), opacity, jnp.float32)
    alive = jnp.arange(capacity) < n
    return means, scales, quats, features, opacities, alive


def test_empty_scene_is_background():
    cam = make_camera()
    m, s, q, f, o, alive = make_scene(np.zeros((1, 3)), np.ones((1, 3)))
    alive = jnp.zeros_like(alive)
    bg = jnp.array([0.2, 0.4, 0.6])
    out = rasterize_reference(m, s, q, f, o, alive, cam, bg)
    np.testing.assert_allclose(out["image"], np.broadcast_to(bg, (64, 64, 3)), atol=1e-6)
    np.testing.assert_allclose(out["alpha"], 0.0, atol=1e-7)


def test_single_gaussian_center_alpha():
    cam = make_camera()
    opacity = 0.8
    m, s, q, f, o, alive = make_scene(
        np.zeros((1, 3)), np.array([[1.0, 0.0, 0.0]]), opacity=opacity, scale=0.2
    )
    bg = jnp.zeros(3)
    out = rasterize_reference(m, s, q, f, o, alive, cam, bg)
    # at the exact center pixel, alpha ~= opacity (power ~ 0)
    h, w = 64, 64
    cx, cy = w // 2, h // 2
    assert abs(float(out["alpha"][cy, cx]) - opacity) < 0.02
    # red channel dominates
    assert float(out["image"][cy, cx, 0]) > 0.7
    assert float(out["image"][cy, cx, 1]) < 0.05
    # depth at center approx camera distance
    assert abs(float(out["depth"][cy, cx]) / out["alpha"][cy, cx] - 3.0) < 0.05


def test_front_occludes_back():
    cam = make_camera()
    m, s, q, f, o, alive = make_scene(
        np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]]),  # +z closer to cam at z=3
        np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        opacity=0.99,
        scale=0.3,
    )
    out = rasterize_reference(m, s, q, f, o, alive, cam, jnp.zeros(3))
    cx = cy = 32
    assert float(out["image"][cy, cx, 0]) > 0.9  # red front wins
    assert float(out["image"][cy, cx, 1]) < 0.1

    # flip order in storage: result must be identical (depth sort decides)
    perm = jnp.array([1, 0])
    out2 = rasterize_reference(
        m[perm], s[perm], q[perm], f[perm], o[perm], alive[perm], cam, jnp.zeros(3)
    )
    np.testing.assert_allclose(out["image"], out2["image"], atol=1e-6)


def test_alpha_saturation_early_stop():
    # many opaque layers: T decays below 1e-4, later layers contribute nothing
    n = 12
    zs = np.linspace(1.0, -1.0, n)
    means = np.stack([np.zeros(n), np.zeros(n), zs], axis=1)
    rgbs = np.tile(np.array([[0.0, 0.0, 1.0]]), (n, 1))
    rgbs[-1] = [1.0, 0.0, 0.0]  # farthest is red; must be invisible
    m, s, q, f, o, alive = make_scene(means, rgbs, opacity=0.95, scale=0.4)
    out = rasterize_reference(m, s, q, f, o, alive, cam := make_camera(), jnp.zeros(3))
    assert float(out["image"][32, 32, 0]) < 1e-4
    assert float(out["alpha"][32, 32]) > 0.999


def test_radii_and_visibility():
    cam = make_camera()
    means = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, 10.0]])  # second behind camera
    m, s, q, f, o, alive = make_scene(means, np.ones((2, 3)))
    prims = project_gaussians(m, jnp.exp(jnp.log(s)), q, f, o, alive, cam, 0, CFG)
    assert int(prims.radii[0]) > 0
    assert int(prims.radii[1]) == 0
    assert bool(prims.visible[0]) and not bool(prims.visible[1])


def test_gradients_finite_diff():
    cam = make_camera(h=32, w=32)
    m, s, q, f, o, alive = make_scene(
        np.array([[0.1, -0.05, 0.0], [-0.2, 0.1, 0.5]]),
        np.array([[0.8, 0.2, 0.1], [0.1, 0.7, 0.9]]),
        opacity=0.6,
        scale=0.25,
    )
    bg = jnp.array([0.1, 0.1, 0.1])
    target = jnp.ones((32, 32, 3)) * 0.5

    def loss(means, log_scales, opal):
        out = rasterize_reference(
            means, jnp.exp(log_scales), q, f, jax.nn.sigmoid(opal), alive, cam, bg
        )
        return jnp.mean((out["image"] - target) ** 2) + 0.1 * jnp.mean(out["depth"])

    ls = jnp.log(s)
    opal = inverse_sigmoid(o)
    g = jax.grad(loss, argnums=(0, 1, 2))(m, ls, opal)
    assert all(np.all(np.isfinite(x)) for x in g)

    # finite differences on a few coordinates
    eps = 3e-3
    rng = np.random.default_rng(0)
    for argi, x in ((0, m), (1, ls), (2, opal)):
        flat = np.asarray(x).ravel()
        for _ in range(3):
            i = rng.integers(len(flat))
            e = np.zeros_like(flat)
            e[i] = eps
            d = jnp.asarray(e.reshape(x.shape))
            args = [m, ls, opal]
            args_p = list(args)
            args_p[argi] = args[argi] + d
            args_m = list(args)
            args_m[argi] = args[argi] - d
            fd = (loss(*args_p) - loss(*args_m)) / (2 * eps)
            an = float(np.asarray(g[argi]).ravel()[i])
            assert abs(fd - an) < 5e-2 * max(1.0, abs(fd)), (argi, i, fd, an)


def test_means2d_offset_grad_tap():
    """The screen-space gradient tap used for densification stats."""
    cam = make_camera(h=32, w=32)
    m, s, q, f, o, alive = make_scene(
        np.array([[0.0, 0.0, 0.0]]), np.array([[1.0, 1.0, 1.0]]), scale=0.3
    )
    offset = jnp.zeros((1, 2))

    def loss(off):
        out = rasterize_reference(
            m, s, q, f, o, alive, cam, jnp.zeros(3), means2d_offset=off
        )
        # asymmetric target pulls the gaussian sideways in screen space
        w_ramp = jnp.linspace(0.0, 1.0, 32)[None, :, None]
        return jnp.mean((out["image"] - w_ramp) ** 2)

    g = jax.grad(loss)(offset)
    assert np.all(np.isfinite(g))
    assert float(jnp.abs(g).sum()) > 1e-8
