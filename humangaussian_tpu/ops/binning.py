"""Tile binning: (tile, Gaussian) pair lists for the tiled rasterizer.

TPU-native replacement for the CUDA rasterizer's duplicate-and-radix-sort
binning stage (diff-gaussian-rasterization forward: duplicateWithKeys +
cub radix sort by (tile | depth) key, called from
/root/reference/gaussiansplatting/gaussian_renderer/__init__.py:86-94).

The CUDA version builds dynamically-sized per-tile ranges. On TPU every
shape must be static, and the cost profile is different: XLA sort cost
has a large fixed component plus ~0.1-0.4 ms per payload operand per
million elements (benchmarks/probe_r4_sortcost.py), and scalar gathers
are index-serialized. The design accounts for both:

1. ONE class-depth sort of the N (padded) Gaussians into a CHAIN of
   shape classes — (side,side) "big" when rect_side > 2, then (2,2),
   (2,1), (1,1) (round 5; rounds 1-4 used two classes) — each class
   internally by view depth, invisible last. Each class occupies a
   static block of positions, so the candidate domain is

       dom = sum_k  w_k * h_k * cap_k

   instead of side^2 * n_cap. The chain property (every block's shape
   CONTAINS every later class's shape) makes under-subscription
   lossless: when a class has fewer members than its block, the block
   tail holds the next class's shallowest members, expanded with a
   superset shape (wasted domain only). Loss occurs only when a class
   overflows its cumulative cap — the spilled Gaussians keep the
   upper-left (w,h) tiles of the NEXT block's shape; clipped tiles are
   counted in `overflow`. With the default caps this never fires on
   reference-scale scenes. Invisible/padded Gaussians sort last and
   land in the (1,1) tail — 1 candidate slot each instead of 4, which
   is what keeps padded-capacity scenes cheap.
2. expand each class block into candidate (tile, depth, cand, gid)
   tuples; candidates outside the rect, culled by the exact
   tile-ellipse alpha bound (`_tile_alpha_bound`, bit-exact vs the
   compositing gate), or invisible get the sentinel tile that sorts
   last.
3. ONE 2-key sort by (tile, depth-bits) with (cand, gid) payloads
   orders pairs front-to-back per tile. Depth rides the key as its
   monotone int32 bitcast (view depths are positive), so pair ordering
   is exact CUDA (tile | depth) ordering — no global depth rank is
   needed, which is what frees the class sort to be class-major.
4. per-tile segment starts via searchsorted over the sorted tile ids.

`cand` is the J-MAJOR PER-BLOCK candidate index
    block k: off_k + j * cap_k + (rank - start_k)   (j < w_k * h_k)
— every candidate (valid or not) appears exactly once, so the
rasterizer VJP can route gradients to candidate order and reduce with
one static reshape-sum per block (no ragged segment sums).

Pairs beyond K for a given tile are dropped deepest-first (they sit
behind K closer Gaussians; with K=4096 and front-to-back saturation this
is visually nil) and reported in `overflow`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from humangaussian_tpu.ops.projection import ProjectedGaussians, RasterizeConfig


def _tile_alpha_bound(mx, my, ca, cb, cc, tx, ty, tile):
    """Exact min of the conic quadratic Q(d) = ca*dx^2 + 2*cb*dx*dy +
    cc*dy^2 over a tile's pixel-center box, per candidate.

    The compositing gate is alpha = opa*exp(-Q/2) >= alpha_min per pixel
    (rasterize_tiled._chunk_common); a candidate whose max alpha over the
    WHOLE tile is below alpha_min contributes nothing to any pixel, so
    culling it is exact. This is the tile-level analogue of the CUDA
    kernel's per-pixel cutoff — the CUDA binning keeps every bbox tile
    (forward.cu duplicateWithKeys uses the rect only), so this is
    strictly tighter binning with identical output.

    Pixel centers in tile (tx,ty) span [tx*T, tx*T+T-1] (integer coords,
    rasterize_tiled._pixel_coords). For a convex positive-definite Q the
    box minimum is 0 if the mean is inside, else it lies on one of the 4
    edges; each edge is a 1-D quadratic minimized by its clamped vertex.
    """
    t = float(tile)
    dx_hi = mx - tx * t  # dx = mx - px, px in [tx*t, tx*t + t - 1]
    dx_lo = dx_hi - (t - 1.0)
    dy_hi = my - ty * t
    dy_lo = dy_hi - (t - 1.0)
    ca_s = jnp.maximum(ca, 1e-12)
    cc_s = jnp.maximum(cc, 1e-12)

    def q(dx, dy):
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    def edge_dx(c):  # dx fixed at c, minimize over dy
        dy = jnp.clip(-cb * c / cc_s, dy_lo, dy_hi)
        return q(c, dy)

    def edge_dy(c):  # dy fixed at c, minimize over dx
        dx = jnp.clip(-cb * c / ca_s, dx_lo, dx_hi)
        return q(dx, c)

    qedge = jnp.minimum(
        jnp.minimum(edge_dx(dx_lo), edge_dx(dx_hi)),
        jnp.minimum(edge_dy(dy_lo), edge_dy(dy_hi)),
    )
    inside = (dx_lo <= 0.0) & (0.0 <= dx_hi) & (dy_lo <= 0.0) & (0.0 <= dy_hi)
    return jnp.maximum(jnp.where(inside, 0.0, qedge), 0.0)


class PairLists(NamedTuple):
    """Sorted pair structure (all static shapes)."""

    order: jnp.ndarray  # [N] Gaussian index by (class, depth) — widest
    #     class first, each class by view depth, invisible last
    sorted_gid: jnp.ndarray  # [P] ORIGINAL Gaussian index of each sorted
    #     pair (sort payload; consumers gather feature rows by gid)
    sorted_tile: jnp.ndarray  # [P] int32 tile id (sentinel = num_tiles)
    cand: jnp.ndarray  # [P] int32 j-major per-block candidate index of
    #     each sorted pair (a permutation of [0, dom))
    starts: jnp.ndarray  # [T+1] segment starts into the sorted pairs
    counts: jnp.ndarray  # [T] live pairs per tile (capped at K)
    lens: jnp.ndarray  # [T] segment lengths clamped to the pair budget
    #     only (>= counts; includes K-cap-dropped pairs — the backward
    #     sort-routing covers these positions with zero-grad keys)
    overflow: jnp.ndarray  # [] pairs dropped (K cap + budget + demotion)
    blocks: tuple  # static ((w, h, cap), ...) class-block layout
    dom: int  # static candidate domain size
    overflow_spill: jnp.ndarray | None = None  # [] the class-cap
    #     demotion component of `overflow` alone — separable because its
    #     fix (shift class_fracs toward (2,2); train/loop.py ladder)
    #     differs from the K-cap/budget fixes (grow tile_cap / pair
    #     budget); probe_r5_overflow.py measures all three


class TileBins(NamedTuple):
    slots: jnp.ndarray  # [T, K] int32 Gaussian index, -1 = empty
    counts: jnp.ndarray  # [T]
    overflow: jnp.ndarray  # []


def resolve_big_capacity(n_cap: int, cfg: RasterizeConfig) -> int:
    """Static big-class capacity. rect_side <= 2 needs no big class at
    all; otherwise default to n_cap/8 (trained scenes run ~2-5% big —
    radius > one tile — so 12.5% never demotes) with a 4096 floor so
    tiny scenes degenerate to all-big = the exact single-class layout."""
    if cfg.rect_side <= 2:
        return 0
    if cfg.big_capacity is not None:
        return min(cfg.big_capacity, n_cap)
    return min(n_cap, max(4096, n_cap // 8))


def resolve_class_blocks(n_cap: int, cfg: RasterizeConfig) -> tuple:
    """Static ((w, h, cap), ...) class-block chain (module docstring).

    The chain is (side,side) [if side > 2] -> (2,2) -> (2,1) -> (1,1);
    caps for (2,2)/(2,1) come from cfg.class_fracs as fractions of the
    non-big remainder, (1,1) takes the rest. class_fracs=None keeps the
    rounds-1-4 dual-class layout ((2,2) takes the whole remainder).
    Blocks round up to multiples of 128 lanes-friendliness not needed —
    candidate arrays are flat — but zero-size blocks are dropped."""
    side = cfg.rect_side
    if side <= 1:
        return ((1, 1, n_cap),)
    blocks = []
    rem = n_cap
    if side > 2:
        b = resolve_big_capacity(n_cap, cfg)
        blocks.append((side, side, b))
        rem -= b
    if cfg.class_fracs is None:
        blocks.append((2, 2, rem))
    else:
        f22, f21 = cfg.class_fracs
        m = min(rem, int(round(rem * f22)))
        r = min(rem - m, int(round(rem * f21)))
        s = rem - m - r
        blocks += [(2, 2, m), (2, 1, r), (1, 1, s)]
    return tuple((w, h, c) for (w, h, c) in blocks if c > 0)


def classify(visible, rect, blocks) -> jnp.ndarray:
    """Per-Gaussian class index: the SMALLEST chain block whose shape
    contains (rect_w, rect_h); invisible get len(blocks) (sorts last)."""
    w = rect[:, 2] - rect[:, 0]
    h = rect[:, 3] - rect[:, 1]
    cls = jnp.zeros(w.shape, jnp.int32)
    for k, (bw, bh, _c) in enumerate(blocks):
        if k == 0:
            continue
        fits = (w <= bw) & (h <= bh)
        cls = jnp.where(fits, k, cls)
    return jnp.where(visible, cls, len(blocks))


def class_depth_order(visible, depths, cls) -> jnp.ndarray:
    """Indices sorted by (class, depth): widest class first, each class
    internally by view depth, invisible last; ties by index.

    Depth inside the key only decides which Gaussians an `active_cap`
    truncation drops (deepest first); PAIR ordering uses exact depth
    bits in the binning sort keys.

    2-key (class, depth) sort: an additive class offset on the depth
    key (rounds 1-4) silently interleaved classes for metric depths
    near the offset and quantized depth keys around it (round-4
    advisor finding); an explicit integer class key has no such range
    coupling at the cost of one extra [N] sort operand."""
    n = depths.shape[0]
    _, _, order = jax.lax.sort(
        (cls, depths, jnp.arange(n, dtype=jnp.int32)),
        num_keys=2, is_stable=True,
    )
    return order


def depth_order(visible: jnp.ndarray, depths: jnp.ndarray) -> jnp.ndarray:
    """Indices sorted by view depth, invisible Gaussians last (ties by
    index — the CUDA radix sort over (tile|depth) keys is stable in
    duplication order, which is index order)."""
    n = depths.shape[0]
    key = jnp.where(visible, depths, jnp.inf)
    _, order = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    return order


def _expand_block(rect, m2d, conic, opa, vis, shape, tiles_x, tiles_y, cfg):
    """Expand one class block into candidate (tile, valid) arrays laid
    out [h, w, block] — the Gaussian axis minor (lane) so every
    intermediate pads only block -> ceil128(block); the natural
    [block,h,w] layout would pad (h,w) to (8,128) tiles (~400 MB per
    intermediate at 100k)."""
    bw, bh = shape
    num_tiles = tiles_x * tiles_y
    dy = jnp.arange(bh, dtype=jnp.int32)[:, None, None]  # [h,1,1]
    dx = jnp.arange(bw, dtype=jnp.int32)[None, :, None]  # [1,w,1]
    ty = rect[None, None, :, 1] + dy  # [s,s,b]
    tx = rect[None, None, :, 0] + dx
    in_rect = (ty < rect[None, None, :, 3]) & (tx < rect[None, None, :, 2])
    valid = in_rect & vis[None, None, :]
    if cfg.tight_cull:
        # exact tile-ellipse cull (see _tile_alpha_bound): drop rect
        # tiles where the candidate's best-case alpha stays below the
        # compositing gate. Bit-exact output, fewer live pairs. The
        # comparison carries a 1e-3 margin so float rounding between
        # this bound and the kernel's per-pixel power can never cull a
        # pair the kernel would pass at the gate boundary.
        qmin = _tile_alpha_bound(
            m2d[None, None, :, 0], m2d[None, None, :, 1],
            conic[None, None, :, 0], conic[None, None, :, 1],
            conic[None, None, :, 2], tx.astype(jnp.float32),
            ty.astype(jnp.float32), cfg.tile,
        )
        bound = opa[None, None, :] * jnp.exp(-0.5 * qmin)
        valid = valid & (bound >= cfg.alpha_min * (1.0 - 1e-3))
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles)  # sentinel
    return tile_id


def build_pair_lists(
    prims: ProjectedGaussians,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
    cfg: RasterizeConfig,
    pair_capacity: int | None = None,
    active_cap: int | None = None,
) -> PairLists:
    """Dual-class candidate expansion + one (tile, depth-bits) pair sort
    (see module docstring).

    `pair_capacity` additionally caps the TOTAL live pairs (the size of
    the compacted pair-feature array the consumer gathers); segments
    past the budget are truncated and reported in `overflow`.

    `active_cap` (static) truncates the candidate domain to the first
    `active_cap` (class, depth)-ranks. The class sort puts invisible
    (padded or culled) Gaussians last, so with a padded scene of
    capacity N and n_alive visible Gaussians, active_cap >= n_alive
    drops nothing while shrinking EVERY domain-proportional stage by
    N/active_cap — the padding slots stop costing sort passes. Visible
    Gaussians beyond the cap are dropped whole and counted in
    `overflow`; callers re-specialize with a larger bucket when the
    alive count approaches the cap (train/loop.py)."""
    n = prims.depths.shape[0]
    n_cap = n if active_cap is None else min(active_cap, n)
    num_tiles = tiles_x * tiles_y
    blocks = resolve_class_blocks(n_cap, cfg)
    dom = sum(w * h * c for (w, h, c) in blocks)
    if num_tiles >= (1 << 31) - 1:
        raise ValueError(f"{num_tiles} tiles overflow int32 tile keys")

    cls = classify(prims.visible, prims.rect, blocks)
    order = class_depth_order(prims.visible, prims.depths, cls)
    order_c = order[:n_cap]
    rect = prims.rect[order_c]  # [n_cap,4] x0,y0,x1,y1 (tile units)
    vis = prims.visible[order_c]
    depth = prims.depths[order_c]
    cap_dropped = (
        jnp.sum(prims.visible) - jnp.sum(vis) if n_cap < n else jnp.int32(0)
    )
    if cfg.tight_cull:
        conic = jax.lax.stop_gradient(prims.conics[order_c])
        m2d = jax.lax.stop_gradient(prims.means2d[order_c])
        opa = jax.lax.stop_gradient(prims.opacities[order_c])
    else:
        conic = m2d = opa = None

    def expand(sl, shape):
        return _expand_block(
            rect[sl],
            m2d[sl] if cfg.tight_cull else None,
            conic[sl] if cfg.tight_cull else None,
            opa[sl] if cfg.tight_cull else None,
            vis[sl], shape, tiles_x, tiles_y, cfg,
        )

    parts_tile, parts_cand, parts_gid, parts_depth = [], [], [], []
    start = 0
    off = 0
    for bw, bh, cap in blocks:
        sl = slice(start, start + cap)
        tl = expand(sl, (bw, bh))  # [bh, bw, cap]
        jl = (
            jnp.arange(bh, dtype=jnp.int32)[:, None, None] * bw
            + jnp.arange(bw, dtype=jnp.int32)[None, :, None]
        )
        cl = off + jl * cap + jnp.arange(cap, dtype=jnp.int32)[None, None, :]
        parts_tile.append(tl.reshape(-1))
        parts_cand.append(jnp.broadcast_to(cl, tl.shape).reshape(-1))
        parts_gid.append(
            jnp.broadcast_to(order_c[None, None, sl], tl.shape).reshape(-1)
        )
        parts_depth.append(
            jnp.broadcast_to(depth[None, None, sl], tl.shape).reshape(-1)
        )
        start += cap
        off += bw * bh * cap
    tile_flat = jnp.concatenate(parts_tile)
    cand_flat = jnp.concatenate(parts_cand)
    gid_flat = jnp.concatenate(parts_gid)
    depth_flat = jnp.concatenate(parts_depth)
    # positive floats compare identically as int32 bit patterns (view
    # depths pass the near cull, so depth > 0); exact CUDA (tile|depth)
    # pair ordering without any global depth rank
    depth_bits = jax.lax.bitcast_convert_type(depth_flat, jnp.int32)

    sorted_tile, _, cand_s, gid_s = jax.lax.sort(
        (tile_flat, depth_bits, cand_flat, gid_flat),
        num_keys=2, is_stable=True,
    )

    starts = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    seg_len = starts[1:] - starts[:-1]
    counts = jnp.minimum(seg_len, capacity)
    lens = seg_len
    if pair_capacity is not None:
        budget = pair_capacity - jnp.minimum(starts[:-1], pair_capacity)
        counts = jnp.minimum(counts, budget)
        lens = jnp.minimum(lens, budget)
    # class-cap spill: a Gaussian whose position landed in a narrower
    # block than its class keeps only the upper-left (block) tiles of
    # its rect; count the clipped-away area (module docstring — this is
    # zero unless a class overflows its cumulative cap)
    if len(blocks) > 1:
        side = blocks[0][0]
        wv = jnp.minimum(rect[:, 2] - rect[:, 0], side)
        hv = jnp.minimum(rect[:, 3] - rect[:, 1], side)
        covered = jnp.zeros((n_cap,), jnp.int32)
        start = 0
        for bw, bh, cap in blocks:
            cov_b = jnp.minimum(wv, bw) * jnp.minimum(hv, bh)
            pos_in = (jnp.arange(n_cap) >= start) & (
                jnp.arange(n_cap) < start + cap
            )
            covered = jnp.where(pos_in, cov_b, covered)
            start += cap
        lost = wv * hv - covered
        demoted_lost = jnp.sum(jnp.where(vis, jnp.maximum(lost, 0), 0))
    else:
        demoted_lost = jnp.int32(0)
    overflow = jnp.sum(seg_len - counts) + cap_dropped + demoted_lost
    return PairLists(
        order=order,
        sorted_gid=gid_s,
        sorted_tile=sorted_tile,
        cand=cand_s,
        starts=starts,
        counts=counts,
        lens=lens,
        overflow=overflow,
        blocks=blocks,
        dom=dom,
        overflow_spill=jnp.asarray(demoted_lost, jnp.int32),
    )


def build_tile_bins(
    prims: ProjectedGaussians,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
    cfg: RasterizeConfig,
) -> TileBins:
    """Materialized [T, K] Gaussian-index table (tests/debug; the
    production render path gathers feature rows directly from PairLists
    without this scalar index table)."""
    pairs = build_pair_lists(prims, tiles_x, tiles_y, capacity, cfg)
    p = pairs.sorted_gid.shape[0]
    k_idx = jnp.arange(capacity, dtype=jnp.int32)
    flat = pairs.starts[:-1, None] + k_idx[None, :]  # [T, K]
    valid = k_idx[None, :] < pairs.counts[:, None]
    gids = pairs.sorted_gid[jnp.minimum(flat, p - 1)]
    slots = jnp.where(valid, gids, -1)
    return TileBins(slots=slots, counts=pairs.counts, overflow=pairs.overflow)
