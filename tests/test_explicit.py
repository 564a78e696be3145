"""Tests for explicit geometries + mesh rasterization (nerf/explicit.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.nerf.explicit import (
    CustomMesh,
    CustomMeshConfig,
    NVDiffRasterizer,
    PatchRenderer,
    TetrahedraSDFGrid,
    TetSDFGridConfig,
    face_normals,
    marching_tets,
    rasterize_mesh,
    tet_grid,
)
from humangaussian_tpu.nerf.encoding import HashGridConfig


def _perspective_mvp(eye_z=3.0):
    """Row-vector clip transform from the repo's own camera stack:
    camera at +z looking at the origin."""
    from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w

    c2w = look_at_c2w(jnp.array([0.0, 0.0, eye_z]), jnp.zeros(3),
                      jnp.array([0.0, 1.0, 0.0]))
    cam = camera_from_c2w(c2w, 0.8, 32, 32)
    return cam.full_proj


class TestMarchingTets:
    def test_grid_shapes(self):
        v, t = tet_grid(4)
        assert v.shape == (125, 3)
        assert t.shape == (6 * 64, 4)
        assert t.min() >= 0 and t.max() < 125

    def test_sphere_surface(self):
        v, t = tet_grid(12)
        world = jnp.asarray(v * 2.0 - 1.0)
        sdf = jnp.linalg.norm(world, axis=-1) - 0.5
        tris, mask = marching_tets(world, sdf, jnp.asarray(t))
        assert tris.shape[0] == mask.shape[0] == 2 * t.shape[0]
        live = np.asarray(tris[mask])
        assert live.shape[0] > 100
        r = np.linalg.norm(live.reshape(-1, 3), axis=-1)
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.05)
        assert np.abs(r - 0.5).max() < 0.15

    def test_sdf_gradient_flows(self):
        v, t = tet_grid(6)
        world = jnp.asarray(v * 2.0 - 1.0)

        def loss(sdf):
            tris, mask = marching_tets(world, sdf, jnp.asarray(t))
            return jnp.sum(tris * mask[:, None, None])

        sdf0 = jnp.linalg.norm(world, axis=-1) - 0.5
        g = jax.grad(loss)(sdf0)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_tet_sdf_grid_module(self):
        geo = TetrahedraSDFGrid(TetSDFGridConfig(
            isosurface_resolution=8,
            hash_cfg=HashGridConfig(n_levels=2, log2_hashmap_size=10,
                                    base_resolution=4),
        ))
        params = geo.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
        tris, mask = geo.apply(params, method="isosurface")
        live = np.asarray(tris[mask]).reshape(-1, 3)
        r = np.linalg.norm(live, axis=-1)
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.1)
        out = geo.apply(params, jnp.zeros((5, 3)))
        assert out["features"].shape == (5, 3)


class TestRasterizeMesh:
    def test_single_triangle_coverage(self):
        tris = jnp.asarray(
            [[[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]]]
        )
        mvp = _perspective_mvp()
        out = rasterize_mesh(tris, jnp.ones((1,), bool), mvp, 32, 32)
        m = np.asarray(out["mask"])
        assert m[16, 16]
        assert not m[1, 1] and not m[1, 30]
        assert 0.05 < m.mean() < 0.5

    def test_depth_order(self):
        # near triangle (z=+0.5, closer to the +z camera) wins over far
        tris = jnp.asarray([
            [[-1, -1, -0.5], [1, -1, -0.5], [0, 1, -0.5]],
            [[-1, -1, 0.5], [1, -1, 0.5], [0, 1, 0.5]],
        ], jnp.float32)
        attrs = jnp.asarray([
            [[1.0, 0, 0]] * 3,
            [[0, 1.0, 0]] * 3,
        ], jnp.float32)
        out = rasterize_mesh(tris, jnp.ones((2,), bool), _perspective_mvp(),
                             16, 16, attrs=attrs)
        center = np.asarray(out["attr"])[8, 8]
        assert center[1] > 0.9 and center[0] < 0.1

    def test_attr_gradients(self):
        tris = jnp.asarray(
            [[[-0.6, -0.6, 0.0], [0.6, -0.6, 0.0], [0.0, 0.6, 0.0]]]
        )

        def loss(a):
            out = rasterize_mesh(tris, jnp.ones((1,), bool),
                                 _perspective_mvp(), 16, 16, attrs=a)
            return jnp.sum(out["attr"] ** 2)

        g = jax.grad(loss)(jnp.ones((1, 3, 3)))
        assert np.abs(np.asarray(g)).sum() > 0


class TestRenderers:
    def test_nvdiff_rasterizer_end_to_end(self):
        from humangaussian_tpu.nerf.background import SolidColorBackground
        from humangaussian_tpu.nerf.material import NoMaterial

        geo = TetrahedraSDFGrid(TetSDFGridConfig(
            isosurface_resolution=8,
            hash_cfg=HashGridConfig(n_levels=2, log2_hashmap_size=10,
                                    base_resolution=4),
        ))
        r = NVDiffRasterizer(
            geo, NoMaterial(), SolidColorBackground(color=(0.0, 0.0, 0.0)),
            height=24, width=24,
        )
        params = r.init_params(jax.random.PRNGKey(0))
        out = r.render(params, _perspective_mvp())
        assert out["comp_rgb"].shape == (24, 24, 3)
        op = np.asarray(out["opacity"])[..., 0]
        assert op[12, 12] > 0.5  # sphere covers the center
        assert op[0, 0] < 0.5
        assert np.isfinite(np.asarray(out["comp_rgb"])).all()

    def test_patch_renderer(self):
        from humangaussian_tpu.nerf.background import SolidColorBackground
        from humangaussian_tpu.nerf.geometry import (
            ImplicitVolume,
            ImplicitVolumeConfig,
        )
        from humangaussian_tpu.nerf.material import NoMaterial
        from humangaussian_tpu.nerf.renderer import (
            NerfVolumeRenderer,
            RendererConfig,
        )

        base = NerfVolumeRenderer(
            ImplicitVolume(ImplicitVolumeConfig(
                hash_cfg=HashGridConfig(n_levels=2, log2_hashmap_size=10,
                                        base_resolution=4))),
            NoMaterial(),
            SolidColorBackground(),
            RendererConfig(num_samples_per_ray=16, randomized=False),
        )
        pr = PatchRenderer(base, patch_size=8, global_downsample=4)
        params = pr.init_params(jax.random.PRNGKey(0))
        c2w = jnp.eye(4).at[2, 3].set(3.0)
        out = pr.render_image(params, c2w, 0.8, 32, 32,
                              rng=jax.random.PRNGKey(1))
        assert out["global"]["comp_rgb"].shape == (8, 8, 3)
        assert out["patch"]["comp_rgb"].shape == (8, 8, 3)

    def test_custom_mesh(self):
        verts = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                            jnp.float32)
        faces = jnp.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]],
                            jnp.int32)
        geo = CustomMesh(verts, faces, CustomMeshConfig(
            hash_cfg=HashGridConfig(n_levels=2, log2_hashmap_size=10,
                                    base_resolution=4)))
        params = geo.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
        tris, mask = geo.apply(params, method="isosurface")
        assert tris.shape == (4, 3, 3)
        assert bool(mask.all())
        feats = geo.apply(params, jnp.zeros((6, 3)))["features"]
        assert feats.shape == (6, 3)

    def test_registry_names(self):
        from humangaussian_tpu import registry

        for name in ("custom-mesh", "tetrahedra-sdf-grid",
                     "nvdiff-rasterizer", "patch-renderer",
                     "sd-latent-adapter-material",
                     "hybrid-rgb-latent-material",
                     "dummy-prompt-processor",
                     "stable-diffusion-controlnet-guidance"):
            assert registry.find(name) is not None


class TestNewMaterials:
    def test_sd_latent_adapter(self):
        from humangaussian_tpu.nerf.material import SDLatentAdapterMaterial

        m = SDLatentAdapterMaterial()
        x = jax.random.normal(jax.random.PRNGKey(0), (5, 4))
        p = m.init(jax.random.PRNGKey(1), x)
        col = m.apply(p, x)
        assert col.shape == (5, 3)
        assert ((np.asarray(col) >= 0) & (np.asarray(col) <= 1)).all()

    def test_hybrid_rgb_latent(self):
        from humangaussian_tpu.nerf.material import HybridRGBLatentMaterial

        m = HybridRGBLatentMaterial(n_output_dims=7)
        x = jax.random.normal(jax.random.PRNGKey(0), (5, 7))
        p = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(p, x)
        assert out.shape == (5, 7)
        rgb = np.asarray(out[..., :3])
        assert ((rgb >= 0) & (rgb <= 1)).all()
        np.testing.assert_allclose(np.asarray(out[..., 3:]),
                                   np.asarray(x[..., 3:]), rtol=1e-6)


class TestDummyPrompt:
    def test_deterministic_embeddings(self):
        from humangaussian_tpu.guidance.prompt import (
            DummyPromptProcessor,
            PromptProcessorConfig,
        )

        cfg = PromptProcessorConfig(prompt="a test", use_cache=False,
                                    model_path="")
        pp = DummyPromptProcessor(cfg)
        out1 = pp()
        out2 = DummyPromptProcessor(cfg)()
        np.testing.assert_allclose(np.asarray(out1.text),
                                   np.asarray(out2.text))
        assert out1.text.shape == (77, 1024)
        assert not np.allclose(np.asarray(out1.text),
                               np.asarray(out1.uncond))
