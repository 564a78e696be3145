"""Multi-class candidate-domain semantics (round-5 binning redesign).

The class chain ((side,side) -> (2,2) -> (2,1) -> (1,1)) must be:
  - layout-correct (resolve_class_blocks caps sum to n_cap, domain
    matches the per-block w*h*cap sum);
  - LOSSLESS under under-subscription (a smaller-class Gaussian sitting
    in a wider block renders identically — chain containment);
  - exactly counted under class-cap overflow (spilled Gaussians keep
    the next block's upper-left tiles; the clipped area lands in
    `overflow`);
  - and the opacity-aware rect extents must never change the image
    (the excluded pixels are exactly the per-pixel alpha-gate rejects).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w, look_at_c2w
from humangaussian_tpu.ops.binning import (
    build_pair_lists,
    classify,
    resolve_class_blocks,
)
from humangaussian_tpu.ops.projection import (
    RasterizeConfig,
    project_gaussians,
)
from humangaussian_tpu.ops.rasterize_tiled import rasterize_tiled


def _scene(n, seed=0, opa_scale=1.0):
    rng = np.random.RandomState(seed)
    means = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.5)
    scales = jnp.asarray(
        np.exp(rng.randn(n, 3).astype(np.float32) * 0.5 - 4.2))
    quats = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    sh = jnp.asarray(rng.randn(n, 1, 3).astype(np.float32) * 0.3)
    opas = jnp.asarray(
        (opa_scale / (1 + np.exp(-rng.randn(n)))).astype(np.float32))
    return means, scales, quats, sh, opas


def _cam(h=128, w=128):
    c2w = look_at_c2w(jnp.array([0.0, 0.0, 3.0]), jnp.zeros(3),
                      jnp.array([0.0, 1.0, 0.0]))
    return camera_from_c2w(c2w, 0.8, h, w)


class TestBlockLayout:
    def test_caps_sum_and_domain(self):
        cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9)
        # tiny scenes degenerate to all-big (the 4096 floor) by design
        assert resolve_class_blocks(1000, cfg) == ((3, 3, 1000),)
        blocks = resolve_class_blocks(100_000, cfg)
        assert sum(c for _, _, c in blocks) == 100_000
        shapes = [(w, h) for w, h, _ in blocks]
        assert shapes == [(3, 3), (2, 2), (2, 1), (1, 1)]
        # chain containment: each block contains every later shape
        for i, (w1, h1) in enumerate(shapes):
            for w2, h2 in shapes[i + 1:]:
                assert w1 >= w2 and h1 >= h2

    def test_training_shape_has_no_big_block(self):
        cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=4)
        blocks = resolve_class_blocks(1024, cfg)
        assert [(w, h) for w, h, _ in blocks] == [(2, 2), (2, 1), (1, 1)]

    def test_legacy_dual_class(self):
        cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9,
                              class_fracs=None)
        blocks = resolve_class_blocks(100_000, cfg)
        assert [(w, h) for w, h, _ in blocks] == [(3, 3), (2, 2)]

    def test_classify_picks_smallest_fit(self):
        cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9)
        blocks = resolve_class_blocks(100_000, cfg)
        rect = jnp.asarray([
            [0, 0, 1, 1],  # 1x1
            [0, 0, 2, 1],  # 2x1
            [0, 0, 1, 2],  # 1x2 -> must land in (2,2) (not (2,1))
            [0, 0, 2, 2],  # 2x2
            [0, 0, 3, 2],  # 3x2 -> big
        ], jnp.int32)
        vis = jnp.ones((5,), bool)
        cls = classify(vis, rect, blocks)
        np.testing.assert_array_equal(np.asarray(cls), [3, 2, 1, 1, 0])
        # invisible sorts last
        cls2 = classify(jnp.zeros((5,), bool), rect, blocks)
        np.testing.assert_array_equal(np.asarray(cls2), [4] * 5)


class TestClassSemantics:
    def test_fracs_dont_change_output(self):
        """Different (non-overflowing) class splits are pure layout:
        renders must be bit-identical."""
        n = 600
        means, scales, quats, sh, opas = _scene(n)
        alive = jnp.ones((n,), bool)
        cam = _cam()
        bg = jnp.asarray([0.1, 0.2, 0.3])
        outs = []
        for fracs in [None, (0.5625, 0.25), (0.8, 0.1)]:
            cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9,
                                  class_fracs=fracs)
            out = rasterize_tiled(means, scales, quats, sh, opas, alive,
                                  cam, bg, 0, cfg, pair_capacity=16 * n)
            assert int(out["overflow"]) == 0, fracs
            outs.append(np.asarray(out["image"]))
        np.testing.assert_array_equal(outs[0], outs[1])
        np.testing.assert_array_equal(outs[0], outs[2])

    def test_class_cap_overflow_is_counted(self):
        """Starving the wide blocks forces spill; the clipped tile area
        must be reported in `overflow` (never silent)."""
        n = 512
        means, scales, quats, sh, opas = _scene(n, seed=3)
        alive = jnp.ones((n,), bool)
        cam = _cam()
        cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9,
                              big_capacity=8,  # starve the big class
                              class_fracs=(0.02, 0.02))
        prims = project_gaussians(means, scales, quats, sh, opas, alive,
                                  cam, 0, cfg)
        blocks = resolve_class_blocks(n, cfg)
        cls = np.asarray(classify(prims.visible, prims.rect, blocks))
        counts = {k: int((cls == k).sum()) for k in range(len(blocks) + 1)}
        pairs = build_pair_lists(prims, 4, 4, 4096, cfg,
                                 pair_capacity=16 * n)
        # with the big class starved to 8 slots, spill into narrower
        # blocks must clip tiles and be counted
        n_wide = counts.get(0, 0) + counts.get(1, 0)
        assert n_wide > blocks[0][2] + blocks[1][2], counts
        assert int(pairs.overflow) > 0
        # the demotion component is reported separately (train/loop.py
        # uses it to pick the class_fracs ladder axis over tile_cap);
        # with an ample K cap and pair budget ALL overflow here is spill
        assert int(pairs.overflow_spill) == int(pairs.overflow)
        assert int(pairs.overflow_spill) > 0

    def test_opacity_extents_match_oracle(self):
        """Low-opacity splats get tighter rects; the render must still
        match the oracle exactly (gate-equivalence of the cull)."""
        from humangaussian_tpu.ops.rasterize_ref import rasterize_reference

        n = 400
        # opa_scale 0.3: everything lands in the tightened regime
        means, scales, quats, sh, opas = _scene(n, seed=5, opa_scale=0.3)
        alive = jnp.ones((n,), bool)
        cam = _cam()
        bg = jnp.asarray([0.0, 0.0, 0.0])
        cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=9)
        out = rasterize_tiled(means, scales, quats, sh, opas, alive, cam,
                              bg, 0, cfg, pair_capacity=16 * n)
        ref = rasterize_reference(means, scales, quats, sh, opas, alive,
                                  cam, bg, 0, cfg)
        np.testing.assert_allclose(
            np.asarray(out["image"]), np.asarray(ref["image"]), atol=2e-6)
        np.testing.assert_array_equal(
            np.asarray(out["radii"]), np.asarray(ref["radii"]))
