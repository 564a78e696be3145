"""Decompose dense-phase rasterizer overflow into its three sources.

The round-4 verdict's dense-phase bar is "median overflow <1% of live
pairs"; rehearsal_r5 still logs 0.6-1.3M dropped pairs/step at ~453k
alive.  `ops/binning.py` folds THREE distinct mechanisms into the one
`overflow` scalar (binning.py:380):

  1. per-tile K-cap   : seg_len > tile_capacity (ladder-capped 16384)
  2. global pair budget: cumulative pairs past pair_capacity (dom-capped)
  3. class-cap spill  : a (2,2)/(2,1)-class Gaussian whose (class,depth)
                        rank lands in a NARROWER block keeps only the
                        block's upper-left tiles (demoted_lost)

Each needs a different fix (raise tile_cap_max / grow dom / shift
class_fracs), so this probe separates them at the rehearsal's exact
dense shapes (tile=32, rect 2x2, pair_factor=4, 1024^2, bucket
=capacity) on the shell (converged-like) and scattered (random-weight
rehearsal regime) scenes of probe_r5_dense, over a batch of cameras.

Also prints per-class populations vs the static class caps, which is
the direct diagnostic for class_fracs tuning.

Env: N (default 460800), BATCH (8).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from humangaussian_tpu.core.camera import camera_from_c2w
from humangaussian_tpu.data.cameras import (
    RandomCameraConfig,
    sample_camera_batch,
)
from humangaussian_tpu.ops.binning import (
    build_pair_lists,
    classify,
    resolve_class_blocks,
)
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians
from humangaussian_tpu.train.loop import active_rank_bucket
from probe_r5_dense import pad, scattered_scene, shell_scene, N, CAPACITY, H, W

BATCH = int(os.environ.get("BATCH", "8"))
TILE_CAP = int(os.environ.get("TILE_CAP", "16384"))
# HEAD=1 forces the curriculum's head-zoom branch (distance 0.4-0.6,
# z+0.65) — the overflow-spike suspect: a closeup packs the scene into
# few tiles, blowing the per-tile K cap while total pairs stay modest
HEAD = os.environ.get("HEAD", "0") == "1"

# FRACS: "default" | "wide" ((0.75, 0.125) — ladder rung 1) | "none"
# (dual-class layout, dom=4n — ladder rung 2)
_FRACS = {
    "default": (0.5625, 0.25),
    "wide": (0.75, 0.125),
    "none": None,
}[os.environ.get("FRACS", "default")]

cfg = RasterizeConfig(tile=32, max_tiles_per_gaussian=4, pair_factor=4,
                      class_fracs=_FRACS)
cam_cfg = RandomCameraConfig(
    batch_size=BATCH, height=H, width=W,
    head_prob=1.0 if HEAD else 0.0,
)


def decompose(tag, pts, scales, opas):
    r = np.random.RandomState(2)
    means = pad(pts)
    scl = pad(scales, 1e-6)
    quats = pad(np.concatenate(
        [np.ones((N, 1), np.float32), np.zeros((N, 3), np.float32)], 1))
    sh = pad((r.randn(N, 1, 3) * 0.2).astype(np.float32))
    op = pad(opas)
    alive = jnp.arange(CAPACITY) < N
    bucket = active_rank_bucket(N, CAPACITY) or CAPACITY
    blocks = resolve_class_blocks(bucket, cfg)
    dom = sum(w * h * c for (w, h, c) in blocks)
    p_cap = min(cfg.pair_factor * bucket, dom)
    cams = sample_camera_batch(jax.random.PRNGKey(3), 3000, cam_cfg)
    cam_objs = jax.vmap(
        lambda c2w, fovy: camera_from_c2w(c2w, fovy, H, W)
    )(cams.c2w, cams.fovy)

    @jax.jit
    def one_cam(cam):
        p = project_gaussians(means, scl, quats, sh, op, alive, cam, 0, cfg)
        pairs = build_pair_lists(
            p, W // cfg.tile, H // cfg.tile, TILE_CAP, cfg,
            pair_capacity=p_cap, active_cap=bucket)
        seg_len = pairs.starts[1:] - pairs.starts[:-1]
        sl_k = jnp.minimum(seg_len, TILE_CAP)
        kcap_drop = jnp.sum(seg_len - sl_k)
        budget_drop = jnp.sum(sl_k - pairs.counts)
        # residual = cap_dropped (whole Gaussians past active_cap)
        #          + demoted_lost (class spill)
        spill = pairs.overflow - jnp.sum(seg_len - pairs.counts)
        live = jnp.sum(pairs.counts)
        # per-class visible population (for class_fracs tuning)
        cls = classify(p.visible, p.rect, blocks)
        pops = jnp.stack([jnp.sum(cls == k) for k in range(len(blocks))])
        return kcap_drop, budget_drop, spill, live, pops, jnp.max(seg_len)

    rows = []
    for b in range(BATCH):
        cam = jax.tree.map(lambda x: x[b], cam_objs)
        rows.append([np.asarray(v) for v in one_cam(cam)])
    k_d = np.array([r_[0] for r_ in rows])
    b_d = np.array([r_[1] for r_ in rows])
    s_d = np.array([r_[2] for r_ in rows])
    lv = np.array([r_[3] for r_ in rows])
    pops = np.stack([r_[4] for r_ in rows])
    mx = np.array([r_[5] for r_ in rows])
    caps = np.array([c for (_w, _h, c) in blocks])
    tot = k_d + b_d + s_d
    print(f"[{tag}] bucket={bucket} dom={dom} p_cap={p_cap} "
          f"blocks={blocks}", flush=True)
    print(f"[{tag}] per-camera overflow (batch {BATCH}): "
          f"total={tot.sum()} = K-cap {k_d.sum()} "
          f"+ budget {b_d.sum()} + class-spill {s_d.sum()}; "
          f"live_pairs={lv.sum()} "
          f"(overflow/live = {tot.sum() / max(lv.sum(), 1):.4f})",
          flush=True)
    print(f"[{tag}] hottest tile seg_len per cam: {mx.tolist()} "
          f"(K cap {TILE_CAP})", flush=True)
    print(f"[{tag}] class populations (mean over cams) vs caps: "
          f"{pops.mean(0).astype(int).tolist()} vs {caps.tolist()}",
          flush=True)
    return dict(kcap=int(k_d.sum()), budget=int(b_d.sum()),
                spill=int(s_d.sum()), live=int(lv.sum()))


def bloated_scene(log_scale):
    """Mid-SDS regime: scattered positions with a FAT scale tail, the
    class histogram skewed toward (2,2) rects — what random-gradient
    densification actually produces (rehearsal_r5.log dense phase)."""
    r = np.random.RandomState(0)
    pts = (r.randn(N, 3) * 0.5).astype(np.float32)
    scales = np.exp(r.randn(N, 3).astype(np.float32) * 0.6 + log_scale)
    opas = (0.02 + 0.53 * r.beta(5.0, 2.0, N)).astype(np.float32)
    return pts, scales, opas


if __name__ == "__main__":
    k = jax.random.PRNGKey(0)
    shell = decompose("shell", *shell_scene(k))
    scat = decompose("scatter", *scattered_scene())
    out = {"shell": shell, "scatter": scat}
    for ls in (-4.5, -4.0, -3.5):
        out[f"bloat{ls}"] = decompose(f"bloat{ls}", *bloated_scene(ls))
    print(out, flush=True)
