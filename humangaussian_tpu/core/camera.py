"""Camera model and projection math.

Convention notes (kept identical to the reference so renders are
comparable bit-for-bit):

- The data layer produces OpenGL-style camera-to-world matrices (x right,
  y up, z backward). The splatting stack uses COLMAP-style (y down,
  z forward); the conversion flips rows 1:2 of the world-to-camera
  rotation and negates the translation (reference
  gaussiansplatting/scene/cameras.py:25-29).
- Matrices are stored TRANSPOSED (row-vector convention): a point
  transforms as `[p, 1] @ M`. `view` is w2c^T, `full_proj` is
  w2c^T @ P^T (reference cameras.py:50-53).
- The perspective matrix maps z to [0, 1] with z_sign=+1 (reference
  gaussiansplatting/utils/graphics_utils.py:73-93).
- FoVx is derived from FoVy through the focal length at the image height
  (reference cameras.py:22).

Everything here is pure JAX and shape-static; a `Camera` is a pytree whose
array leaves can be vmapped/sharded over a batch of cameras while H/W stay
static.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp


def fov_to_focal(fov, pixels):
    """Field of view (radians) -> focal length in pixels."""
    return pixels / (2.0 * jnp.tan(fov / 2.0))


def focal_to_fov(focal, pixels):
    """Focal length in pixels -> field of view (radians)."""
    return 2.0 * jnp.arctan(pixels / (2.0 * focal))


def perspective_projection(znear, zfar, fovx, fovy) -> jnp.ndarray:
    """OpenGL-like perspective matrix with z in [0,1], z_sign=+1.

    Matches reference graphics_utils.py:73-93 (column-vector form; callers
    transpose for the row-vector convention).
    """
    tan_half_fovy = jnp.tan(fovy / 2.0)
    tan_half_fovx = jnp.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    p = jnp.array(
        [
            [znear / right, 0.0, 0.0, 0.0],
            [0.0, znear / top, 0.0, 0.0],
            [0.0, 0.0, zfar / (zfar - znear), -(zfar * znear) / (zfar - znear)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=jnp.float32,
    )
    return p


@flax.struct.dataclass
class Camera:
    """A single pinhole camera for splatting (pytree; H/W static ints so
    jit specializes on resolution, never on pose).

    Fields mirror the reference `GaussianRasterizationSettings`
    (gaussian_renderer/__init__.py:36-49) plus what the `Camera` class
    carries (cameras.py:17-54).
    """

    view: jnp.ndarray  # [4,4] world->camera, TRANSPOSED (row-vector conv.)
    full_proj: jnp.ndarray  # [4,4] view @ proj, TRANSPOSED
    campos: jnp.ndarray  # [3] camera center in world space
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar
    height: int = flax.struct.field(pytree_node=False)
    width: int = flax.struct.field(pytree_node=False)

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


def camera_from_c2w(
    c2w: jnp.ndarray,
    fovy,
    height: int,
    width: int,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Build a Camera from an OpenGL c2w matrix + vertical FoV.

    Reproduces reference cameras.py:17-54: invert, flip rows 1:3 of the
    rotation and negate translation (OpenGL -> COLMAP), transpose, multiply
    with the transposed projection.
    """
    fovy = jnp.asarray(fovy, jnp.float32)
    focal = fov_to_focal(fovy, height)
    fovx = focal_to_fov(focal, width)

    w2c = jnp.linalg.inv(c2w.astype(jnp.float32))
    w2c = w2c.at[1:3, :3].multiply(-1.0)
    w2c = w2c.at[:3, 3].multiply(-1.0)

    view = w2c.T
    proj = perspective_projection(znear, zfar, fovx, fovy).T
    full_proj = view @ proj
    # camera center = last row of view^-1 (reference cameras.py:53)
    campos = jnp.linalg.inv(view)[3, :3]
    return Camera(
        view=view,
        full_proj=full_proj,
        campos=campos,
        tan_fovx=jnp.tan(fovx / 2.0),
        tan_fovy=jnp.tan(fovy / 2.0),
        height=height,
        width=width,
    )


def look_at_c2w(eye: jnp.ndarray, target: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """OpenGL camera-to-world from eye/target/up (z points backward)."""
    eye = jnp.asarray(eye, jnp.float32)
    fwd = target - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(right, fwd)
    c2w = jnp.eye(4, dtype=jnp.float32)
    c2w = c2w.at[:3, 0].set(right)
    c2w = c2w.at[:3, 1].set(true_up)
    c2w = c2w.at[:3, 2].set(-fwd)
    c2w = c2w.at[:3, 3].set(eye)
    return c2w
