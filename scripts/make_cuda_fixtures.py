"""Generate rasterizer parity fixtures in the CUDA golden-dump schema.

BASELINE.md's first metric is "renders + pixel-grads allclose vs the
CUDA diff-gaussian-rasterization reference". In this zero-egress
environment no CUDA dumps exist, so this script produces STAND-IN
fixtures from the pure-JAX oracle (ops/rasterize_ref.py, the repo's
CUDA-semantics source of truth, f32 like the CUDA kernel itself); a
real dump recorded with the companion snippet below drops into the
same files and the same test
(tests/test_cuda_fixtures.py) with no code changes.

## Fixture schema (npz, one file per scene/camera)

inputs:
  means      [N,3] f32   world-space centers
  scales     [N,3] f32   LINEAR scales (reference get_scaling = exp(_scaling))
  quats      [N,4] f32   unnormalized wxyz (reference normalizes)
  sh         [N,K,3] f32 SH coefficients, K=(sh_degree+1)^2, DC first
  opacities  [N]   f32   LINEAR opacity (reference get_opacity = sigmoid)
  c2w        [4,4] f32   OpenGL camera-to-world (reference GaussianDreamer
                         convention before the cameras.py flip)
  fovy, height, width, sh_degree, scale_modifier  scalars
  background [3]   f32

output cotangents (what the capture backpropagated):
  g_image    [H,W,3] f32
  g_depth    [H,W]   f32
  g_alpha    [H,W]   f32

expected outputs (from the capture):
  image [H,W,3], depth [H,W], alpha [H,W], radii [N] i32
  d_means [N,3], d_scales [N,3], d_quats [N,4], d_sh [N,K,3],
  d_opacities [N], d_means2d [N,2]   (the densification grad tap)

meta:
  source     "oracle-f32" | "cuda-<version>"

## Recording a real CUDA dump (run on a CUDA box with the reference env)

    from diff_gaussian_rasterization import GaussianRasterizer, ...
    # build raster_settings exactly as gaussian_renderer/__init__.py:36-49
    # forward with retain_grad on means2D, backward from
    # (image*g_image).sum() + (depth*g_depth).sum() + (alpha*g_alpha).sum()
    # then np.savez the schema above with source="cuda-ashawkey".
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

# force the true CPU backend: the environment's sitecustomize registers
# an axon TPU backend that overrides JAX_PLATFORMS (see tests/conftest.py)
# — fixtures must come from the high-precision XLA:CPU oracle, not the
# TPU VPU (whose Mosaic log approximations carry ~2.7e-4 rel error)
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_ref import rasterize_reference

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "cuda")


def make(name, n, h, w, seed, sh_degree=0, dist=3.0, fovy=0.8):
    rng = np.random.RandomState(seed)
    k = (sh_degree + 1) ** 2
    means = (rng.randn(n, 3) * 0.5).astype(np.float32)
    # bounded log-scale spread: keeps every splat well inside the
    # max_radius_px clamp (inactive => true CUDA rect semantics) and
    # keeps the 2D covariance well-conditioned — a near-degenerate
    # radius-capped giant's conic moves at the 1e-3 level under
    # different (all-correct) f32 FMA contractions, which is input
    # conditioning, not implementation disagreement (round-4 hunt)
    scales = np.exp(np.clip(rng.randn(n, 3) * 0.5, -1.0, 1.0)
                    - 3.6).astype(np.float32)
    quats = rng.randn(n, 4).astype(np.float32)
    sh = (rng.randn(n, k, 3) * 0.3).astype(np.float32)
    opas = (1.0 / (1.0 + np.exp(-rng.randn(n)))).astype(np.float32)
    eye = np.array([0.3, 0.2, dist], np.float32)
    c2w = np.asarray(look_at_c2w(jnp.asarray(eye), jnp.zeros(3),
                                 jnp.array([0.0, 1.0, 0.0])), np.float32)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    g_image = (rng.rand(h, w, 3) - 0.3).astype(np.float32)
    g_depth = (rng.rand(h, w) * 1e-2).astype(np.float32)
    g_alpha = (rng.rand(h, w) - 0.5).astype(np.float32)

    dt = jnp.float32  # f32 end to end, like the CUDA kernel itself
    cam = camera_from_c2w(jnp.asarray(c2w), float(fovy), h, w)
    cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=16)
    alive = jnp.ones((n,), bool)

    def render(p):
        return rasterize_reference(
            p["means"], p["scales"], p["quats"], p["sh"], p["opacities"],
            alive, cam, jnp.asarray(bg, dt), sh_degree, cfg,
            means2d_offset=p["means2d_offset"],
        )

    params = dict(
        means=jnp.asarray(means, dt), scales=jnp.asarray(scales, dt),
        quats=jnp.asarray(quats, dt), sh=jnp.asarray(sh, dt),
        opacities=jnp.asarray(opas, dt),
        means2d_offset=jnp.zeros((n, 2), dt),
    )

    def loss(p):
        o = render(p)
        return (jnp.sum(o["image"] * g_image) + jnp.sum(o["depth"] * g_depth)
                + jnp.sum(o["alpha"] * g_alpha))

    out = render(params)
    grads = jax.grad(loss)(params)
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(
        path,
        means=means, scales=scales, quats=quats, sh=sh, opacities=opas,
        c2w=c2w, fovy=np.float32(fovy), height=np.int32(h), width=np.int32(w),
        sh_degree=np.int32(sh_degree), scale_modifier=np.float32(1.0),
        background=bg, g_image=g_image, g_depth=g_depth, g_alpha=g_alpha,
        image=np.asarray(out["image"], np.float32),
        depth=np.asarray(out["depth"], np.float32),
        alpha=np.asarray(out["alpha"], np.float32),
        radii=np.asarray(out["radii"], np.int32),
        d_means=np.asarray(grads["means"], np.float32),
        d_scales=np.asarray(grads["scales"], np.float32),
        d_quats=np.asarray(grads["quats"], np.float32),
        d_sh=np.asarray(grads["sh"], np.float32),
        d_opacities=np.asarray(grads["opacities"], np.float32),
        d_means2d=np.asarray(grads["means2d_offset"], np.float32),
        source="oracle-f32",
    )
    print(f"wrote {path} ({os.path.getsize(path)//1024} KB)")


if __name__ == "__main__":
    make("scene_sparse_128", n=400, h=128, w=128, seed=0)
    make("scene_dense_96", n=1500, h=96, w=96, seed=1)
    make("scene_sh2_64", n=300, h=64, w=64, seed=2, sh_degree=2)
