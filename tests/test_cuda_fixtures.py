"""Replay recorded rasterizer golden dumps through rasterize_tiled.

BASELINE.md metric #1 is "renders + pixel-grads allclose vs the CUDA
diff-gaussian-rasterization reference". The fixture schema
(scripts/make_cuda_fixtures.py docstring) matches what a capture run on
a CUDA box would record; the committed fixtures are stand-ins generated
from the x64 oracle (source="oracle-f32", f32 end to end like the
CUDA kernel itself). First contact with a real
CUDA dump is drop-in: put the npz in tests/fixtures/cuda/ and this test
picks it up.

Tolerances (NUMERICS.md): forward image/alpha 2e-6 absolute, depth
2e-5; gradients 2e-4 of each tensor's max-|grad| scale (see GRAD_RTOL
note below).
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from humangaussian_tpu.core.camera import camera_from_c2w
from humangaussian_tpu.ops.projection import RasterizeConfig
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "cuda")
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.npz")))

FWD_ATOL = {"image": 2e-6, "alpha": 2e-6, "depth": 2e-5}
GRAD_RTOL = 2e-4  # of max-|grad| scale per tensor (NUMERICS.md: the
# worst chunk-boundary reassociation tail measured on oracle-generated
# scenes is ~1.1e-4; CUDA atomicAdd nondeterminism sits at the same
# scale. A second inherent tail: tile-rect ceil() boundaries flip under
# different-but-correct f32 FMA contractions, toggling pairs whose
# alpha sits at the 1/255 gate — their gradient contributions land at
# the 1e-4-of-max level too.)


@pytest.mark.parametrize(
    "path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES]
)
def test_fixture_replay(path):
    fx = np.load(path, allow_pickle=False)
    n = fx["means"].shape[0]
    h, w = int(fx["height"]), int(fx["width"])
    cam = camera_from_c2w(jnp.asarray(fx["c2w"]), float(fx["fovy"]), h, w)
    cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=16)
    alive = jnp.ones((n,), bool)
    g_image = jnp.asarray(fx["g_image"])
    g_depth = jnp.asarray(fx["g_depth"])
    g_alpha = jnp.asarray(fx["g_alpha"])

    params = dict(
        means=jnp.asarray(fx["means"]),
        scales=jnp.asarray(fx["scales"]),
        quats=jnp.asarray(fx["quats"]),
        sh=jnp.asarray(fx["sh"]),
        opacities=jnp.asarray(fx["opacities"]),
        means2d_offset=jnp.zeros((n, 2), jnp.float32),
    )

    def render(p):
        return rasterize_tiled(
            p["means"], p["scales"], p["quats"], p["sh"], p["opacities"],
            alive, cam, jnp.asarray(fx["background"]),
            int(fx["sh_degree"]), cfg,
            scale_modifier=float(fx["scale_modifier"]),
            means2d_offset=p["means2d_offset"],
            # ample budget: the CUDA reference allocates pair lists
            # dynamically, so parity replay must not drop pairs
            pair_capacity=16 * n,
        )

    out = render(params)
    for key, atol in FWD_ATOL.items():
        np.testing.assert_allclose(
            np.asarray(out[key]), fx[key], atol=atol,
            err_msg=f"{os.path.basename(path)}: forward {key}",
        )
    # radii drive densification pruning; exact integer match required
    np.testing.assert_array_equal(np.asarray(out["radii"]), fx["radii"])

    def loss(p):
        o = render(p)
        return (jnp.sum(o["image"] * g_image) + jnp.sum(o["depth"] * g_depth)
                + jnp.sum(o["alpha"] * g_alpha))

    grads = jax.grad(loss)(params)
    for key, gkey in [
        ("means", "d_means"), ("scales", "d_scales"), ("quats", "d_quats"),
        ("sh", "d_sh"), ("opacities", "d_opacities"),
        ("means2d_offset", "d_means2d"),
    ]:
        ref = fx[gkey]
        scale = max(float(np.max(np.abs(ref))), 1e-20)
        np.testing.assert_allclose(
            np.asarray(grads[key]) / scale, ref / scale, atol=GRAD_RTOL,
            err_msg=f"{os.path.basename(path)}: grad {gkey}",
        )


def test_fixtures_exist():
    assert FIXTURES, (
        "no rasterizer parity fixtures found — run "
        "scripts/make_cuda_fixtures.py (or drop recorded CUDA dumps in "
        f"{FIXTURE_DIR})"
    )
