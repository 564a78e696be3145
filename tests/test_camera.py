import numpy as np
import jax.numpy as jnp
import pytest

from humangaussian_tpu.core.camera import (
    camera_from_c2w,
    look_at_c2w,
    perspective_projection,
    fov_to_focal,
    focal_to_fov,
)


def _sample_c2w():
    eye = jnp.array([1.5, 0.8, 2.0])
    return look_at_c2w(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))


def test_fov_focal_roundtrip():
    fov = 0.8
    np.testing.assert_allclose(
        focal_to_fov(fov_to_focal(fov, 512), 512), fov, rtol=1e-6
    )


def test_lookat_orthonormal():
    c2w = _sample_c2w()
    r = np.asarray(c2w[:3, :3])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    # OpenGL: -z column points from eye toward target
    fwd = -r[:, 2]
    expect = -np.asarray(c2w[:3, 3])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(fwd, expect, atol=1e-6)


def test_camera_center_matches_eye():
    c2w = _sample_c2w()
    cam = camera_from_c2w(c2w, fovy=0.7, height=64, width=64)
    np.testing.assert_allclose(cam.campos, c2w[:3, 3], atol=1e-5)


def test_projection_maps_znear_zfar():
    znear, zfar = 0.01, 100.0
    p = perspective_projection(znear, zfar, 0.8, 0.8)
    for z, expect in ((znear, 0.0), (zfar, 1.0)):
        v = p @ jnp.array([0.0, 0.0, z, 1.0])
        np.testing.assert_allclose(v[2] / v[3], expect, atol=1e-5)


def test_point_projects_to_center():
    c2w = _sample_c2w()
    cam = camera_from_c2w(c2w, fovy=0.7, height=128, width=128)
    # world origin is on the optical axis -> NDC (0, 0)
    hom = jnp.array([0.0, 0.0, 0.0, 1.0]) @ cam.full_proj
    ndc = hom[:2] / hom[3]
    np.testing.assert_allclose(ndc, np.zeros(2), atol=1e-5)


def test_against_reference_camera():
    torch = pytest.importorskip("torch")
    import importlib.util, pathlib, sys

    base = pathlib.Path("/root/reference")
    if not (base / "gaussiansplatting/scene/cameras.py").exists():
        pytest.skip("reference not mounted")
    sys.path.insert(0, str(base))
    try:
        from gaussiansplatting.scene import cameras as ref_cams  # noqa
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot import reference: {e}")
    finally:
        sys.path.pop(0)

    c2w = np.asarray(_sample_c2w(), np.float32)
    fovy = 0.7

    # reference Camera moves tensors to CUDA; replicate its math on CPU
    w2c = torch.inverse(torch.from_numpy(c2w))
    w2c[1:3, :3] *= -1
    w2c[:3, 3] *= -1
    view_ref = w2c.transpose(0, 1)
    import math

    fovx = 2 * math.atan(128 / (2 * (128 / (2 * math.tan(fovy / 2)))))
    sys.path.insert(0, str(base))
    from gaussiansplatting.utils.graphics_utils import getProjectionMatrix

    sys.path.pop(0)
    proj_ref = getProjectionMatrix(0.01, 100.0, fovx, fovy).transpose(0, 1)
    full_ref = view_ref @ proj_ref

    cam = camera_from_c2w(jnp.asarray(c2w), fovy, 128, 128)
    np.testing.assert_allclose(cam.view, view_ref.numpy(), atol=1e-5)
    np.testing.assert_allclose(cam.full_proj, full_ref.numpy(), atol=1e-5)
