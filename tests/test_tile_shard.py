"""Tile-axis (ray) sequence parallelism: sharded compositing == single."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.dist.parallel import make_mesh
from test_rasterize_tiled import BG, CFG, make_camera, make_scene, run
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 emulated devices")
    return make_mesh(4, axis="tile")


class TestTileSharding:
    def test_forward_matches_unsharded(self, mesh):
        params = make_scene(n=250, seed=3)
        cam = make_camera(h=64, w=64)
        ref = run(rasterize_tiled, params, cam, BG, tile_capacity=512)
        out = run(
            rasterize_tiled, params, cam, BG, tile_capacity=512,
            tile_shard=(mesh, "tile"),
        )
        np.testing.assert_allclose(out["image"], ref["image"], atol=1e-6)
        np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-5)
        np.testing.assert_allclose(out["alpha"], ref["alpha"], atol=1e-6)

    def test_gradients_match_unsharded(self, mesh):
        params = make_scene(n=150, seed=4)
        cam = make_camera(h=64, w=64)

        def loss(fn, means, **kw):
            out = run(fn, (means,) + params[1:], cam, BG, tile_capacity=256, **kw)
            return jnp.sum(out["image"]) + jnp.sum(out["alpha"])

        g_ref = jax.grad(lambda m: loss(rasterize_tiled, m))(params[0])
        g_sp = jax.grad(
            lambda m: loss(rasterize_tiled, m, tile_shard=(mesh, "tile"))
        )(params[0])
        np.testing.assert_allclose(
            np.asarray(g_sp), np.asarray(g_ref), atol=2e-6
        )
