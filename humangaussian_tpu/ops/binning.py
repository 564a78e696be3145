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

1. ONE class-depth sort of the N (padded) Gaussians: Gaussians whose
   tile rect exceeds 2x2 ("big", ~4% of a trained scene) sort FIRST,
   each class internally by view depth, invisible last. This compacts
   the big class into a static `big_capacity` prefix so the candidate
   domain is sized DUAL-CLASS:

       dom = side^2 * B_CAP  +  2x2 * (n_cap - B_CAP)

   instead of side^2 * n_cap — a 2x shrink of every domain-proportional
   stage (this sort, the backward carry sort, the backward page-row
   gather) at rect_side=3. Bigs beyond B_CAP are DEMOTED to the 2x2
   class (they keep their upper-left 2x2 tiles; lost tiles are counted
   in `overflow`) — with the default B_CAP this never fires on
   reference-scale scenes.
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

`cand` is the J-MAJOR TWO-BLOCK candidate index
    L block: j * B_CAP + rank            (j < side^2, rank < B_CAP)
    S block: side^2*B_CAP + j*nS + (rank-B_CAP)   (j < 4)
— every candidate (valid or not) appears exactly once, so the
rasterizer VJP can route gradients to candidate order and reduce with
two static reshapes + a concat (no ragged segment sums).

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

    order: jnp.ndarray  # [N] Gaussian index by (class, depth) — bigs
    #     first, each class by view depth, invisible last
    sorted_gid: jnp.ndarray  # [P] ORIGINAL Gaussian index of each sorted
    #     pair (sort payload; consumers gather feature rows by gid)
    sorted_tile: jnp.ndarray  # [P] int32 tile id (sentinel = num_tiles)
    cand: jnp.ndarray  # [P] int32 j-major two-block candidate index of
    #     each sorted pair (a permutation of [0, dom))
    starts: jnp.ndarray  # [T+1] segment starts into the sorted pairs
    counts: jnp.ndarray  # [T] live pairs per tile (capped at K)
    lens: jnp.ndarray  # [T] segment lengths clamped to the pair budget
    #     only (>= counts; includes K-cap-dropped pairs — the backward
    #     sort-routing covers these positions with zero-grad keys)
    overflow: jnp.ndarray  # [] pairs dropped (K cap + budget + demotion)
    b_cap: int  # static big-class capacity actually used
    dom: int  # static candidate domain size


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


def class_depth_order(visible, depths, big) -> jnp.ndarray:
    """Indices sorted by (class, depth): big Gaussians first (each class
    internally by view depth), invisible last; ties by index.

    Depth inside the key only decides which Gaussians an `active_cap`
    truncation drops (deepest first); PAIR ordering uses exact depth
    bits in the binning sort keys.

    2-key (class, depth) sort: an additive class offset on the depth
    key (rounds 1-4) silently interleaved classes for metric depths
    near the offset and quantized depth keys around it (round-4
    advisor finding); an explicit integer class key has no such range
    coupling at the cost of one extra [N] sort operand."""
    n = depths.shape[0]
    cls = jnp.where(big, 0, 1)
    cls = jnp.where(visible, cls, 2).astype(jnp.int32)
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


def _expand_block(rect, m2d, conic, opa, vis, side, tiles_x, tiles_y, cfg):
    """Expand one class block into candidate (tile, valid) arrays laid
    out [side, side, block] — the Gaussian axis minor (lane) so every
    intermediate pads only block -> ceil128(block); the natural
    [block,s,s] layout would pad (s,s) to (8,128) tiles (~400 MB per
    intermediate at 100k)."""
    num_tiles = tiles_x * tiles_y
    dy = jnp.arange(side, dtype=jnp.int32)[:, None, None]  # [s,1,1]
    dx = jnp.arange(side, dtype=jnp.int32)[None, :, None]  # [1,s,1]
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
    side = cfg.rect_side
    b_cap = resolve_big_capacity(n_cap, cfg)
    s_side = min(side, 2)
    n_s = n_cap - b_cap
    dom = side * side * b_cap + s_side * s_side * n_s
    if num_tiles >= (1 << 31) - 1:
        raise ValueError(f"{num_tiles} tiles overflow int32 tile keys")

    rect_w = prims.rect[:, 2] - prims.rect[:, 0]
    rect_h = prims.rect[:, 3] - prims.rect[:, 1]
    big = prims.visible & ((rect_w > s_side) | (rect_h > s_side))
    order = class_depth_order(prims.visible, prims.depths, big)
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

    def block(sl, side_b):
        return _expand_block(
            rect[sl],
            m2d[sl] if cfg.tight_cull else None,
            conic[sl] if cfg.tight_cull else None,
            opa[sl] if cfg.tight_cull else None,
            vis[sl], side_b, tiles_x, tiles_y, cfg,
        )

    parts_tile, parts_cand, parts_gid, parts_depth = [], [], [], []
    if b_cap > 0:
        tl = block(slice(0, b_cap), side)  # [side, side, b_cap]
        jl = (
            jnp.arange(side, dtype=jnp.int32)[:, None, None] * side
            + jnp.arange(side, dtype=jnp.int32)[None, :, None]
        )
        cl = jl * b_cap + jnp.arange(b_cap, dtype=jnp.int32)[None, None, :]
        parts_tile.append(tl.reshape(-1))
        parts_cand.append(jnp.broadcast_to(cl, tl.shape).reshape(-1))
        parts_gid.append(
            jnp.broadcast_to(order_c[None, None, :b_cap], tl.shape).reshape(-1)
        )
        parts_depth.append(
            jnp.broadcast_to(depth[None, None, :b_cap], tl.shape).reshape(-1)
        )
    if n_s > 0:
        ts = block(slice(b_cap, n_cap), s_side)  # [2, 2, n_s]
        js = (
            jnp.arange(s_side, dtype=jnp.int32)[:, None, None] * s_side
            + jnp.arange(s_side, dtype=jnp.int32)[None, :, None]
        )
        cshift = side * side * b_cap
        csl = (cshift + js * n_s
               + jnp.arange(n_s, dtype=jnp.int32)[None, None, :])
        parts_tile.append(ts.reshape(-1))
        parts_cand.append(jnp.broadcast_to(csl, ts.shape).reshape(-1))
        parts_gid.append(
            jnp.broadcast_to(order_c[None, None, b_cap:], ts.shape).reshape(-1)
        )
        parts_depth.append(
            jnp.broadcast_to(depth[None, None, b_cap:], ts.shape).reshape(-1)
        )
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
    # demoted bigs (ranks past b_cap) keep only their upper-left 2x2
    # tiles; count the clipped-away rect area
    if b_cap > 0 and n_s > 0:
        wv = jnp.minimum(rect[b_cap:, 2] - rect[b_cap:, 0], side)
        hv = jnp.minimum(rect[b_cap:, 3] - rect[b_cap:, 1], side)
        lost = wv * hv - jnp.minimum(wv, s_side) * jnp.minimum(hv, s_side)
        demoted_lost = jnp.sum(jnp.where(vis[b_cap:], lost, 0))
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
        b_cap=b_cap,
        dom=dom,
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
