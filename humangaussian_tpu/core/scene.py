"""GaussianScene: the fixed-capacity, recompile-free Gaussian parameter store.

TPU-first re-design of the reference `GaussianModel`
(gaussiansplatting/scene/gaussian_model.py:26-147): instead of reallocating
parameter tensors on every densify/prune (which would force an XLA
recompile per step), the scene is a pytree of PADDED arrays of static
capacity plus an `alive` mask and a live `count`. Clone/split/prune are
masked scatters into dead slots (see humangaussian_tpu.densify); every
downstream consumer (rasterizer, optimizer, losses) respects the mask, so
one compiled program serves the whole densification schedule.

Raw parameters and activations mirror the reference exactly:
  means           [C,3]  world positions
  log_scales      [C,3]  exp -> scales            (gaussian_model.py:28,96)
  quats           [C,4]  (w,x,y,z), normalize -> rotation  (:41,114)
  sh_dc           [C,3]  SH degree-0 color coefficients    (:131-134)
  sh_rest         [C,K-1,3] higher SH coefficients
  opacity_logits  [C,1]  sigmoid -> opacity       (:38,107)
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from humangaussian_tpu.core.sh import num_sh_coeffs, rgb_to_sh


def inverse_sigmoid(x):
    """logit; reference gaussiansplatting/utils/general_utils.py:18."""
    return jnp.log(x / (1.0 - x))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (w,x,y,z) [..,4] -> rotation matrix [..,3,3].

    Same formula as reference general_utils.py:78-98 (build_rotation).
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack(
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                axis=-1,
            ),
            jnp.stack(
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def covariance_from_scaling_rotation(
    scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """3D covariance Sigma = R S S^T R^T, returned as full [..,3,3].

    (The reference strips to a lower-tri 6-vector for the CUDA ABI,
    gaussian_model.py:31-36; we keep the matrix — XLA fuses it away.)
    """
    r = quat_to_rotmat(quats)
    m = r * (scales * scale_modifier)[..., None, :]  # R @ diag(s)
    return m @ jnp.swapaxes(m, -1, -2)


class GaussianScene(NamedTuple):
    """Padded Gaussian scene pytree. `capacity` == means.shape[0] (static)."""

    means: jnp.ndarray  # [C,3] f32
    log_scales: jnp.ndarray  # [C,3] f32
    quats: jnp.ndarray  # [C,4] f32 (w,x,y,z)
    sh_dc: jnp.ndarray  # [C,3] f32
    sh_rest: jnp.ndarray  # [C,K-1,3] f32 (K-1 may be 0)
    opacity_logits: jnp.ndarray  # [C,1] f32
    alive: jnp.ndarray  # [C] bool

    # ---- static info -------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.sh_rest.shape[1]
        deg = int(round(k**0.5)) - 1
        return deg

    # ---- activations (reference gaussian_model.py:95-115) ------------
    @property
    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)

    @property
    def rotations(self) -> jnp.ndarray:
        return self.quats / (
            jnp.linalg.norm(self.quats, axis=-1, keepdims=True) + 1e-12
        )

    @property
    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity_logits)

    @property
    def features(self) -> jnp.ndarray:
        """[C,K,3] full SH coefficient stack (dc first), like get_features."""
        return jnp.concatenate([self.sh_dc[:, None, :], self.sh_rest], axis=1)

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    def params(self) -> dict:
        """The optimizable leaves (excludes the alive mask)."""
        return {
            "means": self.means,
            "log_scales": self.log_scales,
            "quats": self.quats,
            "sh_dc": self.sh_dc,
            "sh_rest": self.sh_rest,
            "opacity_logits": self.opacity_logits,
        }

    def replace_params(self, p: dict) -> "GaussianScene":
        return self._replace(**p)


def empty_scene(capacity: int, sh_degree: int = 0) -> GaussianScene:
    k = num_sh_coeffs(sh_degree)
    return GaussianScene(
        means=jnp.zeros((capacity, 3), jnp.float32),
        log_scales=jnp.full((capacity, 3), -10.0, jnp.float32),
        quats=jnp.concatenate(
            [jnp.ones((capacity, 1)), jnp.zeros((capacity, 3))], axis=1
        ).astype(jnp.float32),
        sh_dc=jnp.zeros((capacity, 3), jnp.float32),
        sh_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
        opacity_logits=jnp.full((capacity, 1), -10.0, jnp.float32),
        alive=jnp.zeros((capacity,), bool),
    )


def scene_from_points(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    capacity: int,
    sh_degree: int = 0,
    mean_sq_dist: jnp.ndarray | None = None,
    init_opacity: float = 0.1,
) -> GaussianScene:
    """Initialize from a point cloud, reference create_from_pcd semantics
    (gaussian_model.py:124-147): dc color = RGB2SH(rgb); isotropic
    log-scale = log(sqrt(mean squared 3-NN distance)) (clamped 1e-7);
    identity quats; opacity logit = logit(0.1).

    `mean_sq_dist` is the [N] mean squared distance to the 3 nearest
    neighbors (see humangaussian_tpu.ops.knn.mean_3nn_sq_dist). If None, a
    heuristic constant is used.
    """
    n = points.shape[0]
    if n > capacity:
        raise ValueError(f"{n} points exceed capacity {capacity}")
    scene = empty_scene(capacity, sh_degree)
    if mean_sq_dist is None:
        mean_sq_dist = jnp.full((n,), 1e-4, jnp.float32)
    log_scale = jnp.log(jnp.sqrt(jnp.maximum(mean_sq_dist, 1e-7)))
    pad = capacity - n

    def padded(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    return scene._replace(
        means=padded(points.astype(jnp.float32)),
        log_scales=padded(jnp.repeat(log_scale[:, None], 3, axis=1), -10.0),
        sh_dc=padded(rgb_to_sh(colors.astype(jnp.float32))),
        opacity_logits=padded(
            jnp.full((n, 1), inverse_sigmoid(jnp.float32(init_opacity))), -10.0
        ),
        alive=jnp.arange(capacity) < n,
    )
