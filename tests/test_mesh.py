"""Mesh extraction: density field correctness + marching-tets surface."""
import numpy as np
import jax.numpy as jnp

from humangaussian_tpu.core.scene import scene_from_points
from humangaussian_tpu.mesh import (
    extract_density_field,
    extract_mesh,
    gaussian_3d_coeff,
    marching_tetrahedra,
)


class TestGaussianCoeff:
    def test_identity_cov_is_isotropic(self):
        cov6 = jnp.array([1.0, 0.0, 0.0, 1.0, 0.0, 1.0])
        offs = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        w = np.asarray(gaussian_3d_coeff(offs, jnp.broadcast_to(cov6, (3, 6))))
        assert w[0] == 1.0
        np.testing.assert_allclose(w[1], np.exp(-0.5), atol=1e-6)
        np.testing.assert_allclose(w[1], w[2], atol=1e-6)


class TestMarchingTets:
    def test_sphere_surface(self):
        res = 24
        g = np.linspace(-1, 1, res)
        xx, yy, zz = np.meshgrid(g, g, g, indexing="ij")
        field = 1.0 - np.sqrt(xx**2 + yy**2 + zz**2)  # iso at radius
        verts, tris = marching_tetrahedra(field, 0.5)  # sphere r=0.5
        assert verts.shape[0] > 100 and tris.shape[0] > 100
        # vertices lie on the r=0.5 sphere (in grid coords -> normalize)
        world = verts / (res - 1) * 2 - 1
        r = np.linalg.norm(world, axis=1)
        assert np.abs(r - 0.5).max() < 0.15  # grid-resolution tolerance
        assert tris.max() < verts.shape[0]

    def test_empty_field(self):
        verts, tris = marching_tetrahedra(np.zeros((8, 8, 8), np.float32), 0.5)
        assert verts.shape[0] == 0 and tris.shape[0] == 0


class TestExtractMesh:
    def make_blob_scene(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(300, 3).astype(np.float32) * 0.05  # tight blob
        scene = scene_from_points(
            jnp.asarray(pts), jnp.full((300, 3), 0.5), capacity=512,
            init_opacity=0.9,
        )
        # enlarge scales so the blob is solid
        return scene._replace(
            log_scales=jnp.where(
                scene.alive[:, None], np.log(0.03), scene.log_scales
            )
        )

    def test_field_peaks_at_center(self):
        scene = self.make_blob_scene()
        field, center, scale = extract_density_field(
            scene, resolution=32, num_blocks=4
        )
        assert field.shape == (32, 32, 32)
        mid = field[12:20, 12:20, 12:20].max()
        edge = field[:2].max()
        assert mid > 10 * max(edge, 1e-6)

    def test_extract_mesh_closed_blob(self):
        scene = self.make_blob_scene()
        verts, tris = extract_mesh(scene, density_thresh=0.5, resolution=32)
        assert verts.shape[0] > 50
        # mesh sits around the blob (world coords near origin)
        assert np.abs(verts).max() < 0.5
