"""Tile binning: (tile, Gaussian) pair lists for the tiled rasterizer.

TPU-native replacement for the CUDA rasterizer's duplicate-and-radix-sort
binning stage (diff-gaussian-rasterization forward: duplicateWithKeys +
cub radix sort by (tile | depth) key, called from
/root/reference/gaussiansplatting/gaussian_renderer/__init__.py:86-94).

The CUDA version builds dynamically-sized per-tile ranges. On TPU every
shape must be static, and the cost profile is different: XLA sort passes
move every operand at every compare-exchange (a payload operand roughly
TRIPLES the measured sort cost at 900k keys), and scalar gathers are
~20x slower than 16-wide row gathers. The design accounts for both:

1. depth-sort the N (padded) Gaussians once (2-operand sort of N);
2. expand each Gaussian's tile rect into `rect_side**2` candidate pairs
   and PACK each pair into ONE uint32 key:
       tile_id << (rank_bits + j_bits) | depth_rank << j_bits | j
   where j < r is the candidate's slot inside its Gaussian's rect
   (invalid pairs get a sentinel tile that sorts last);
3. ONE single-operand sort of the packed keys orders pairs by
   (tile, depth) — no payload operands: the rank AND the original
   candidate index (perm = rank * r + j, needed by the backward's
   gather) are both recovered ELEMENTWISE from the sorted keys;
4. per-tile segment starts via searchsorted over the tile bits.

When tile/rank/j don't fit 32 bits (huge scenes or images) the packing
transparently falls back to a 2-operand (key, candidate-index) sort with
j_bits = 0.

Consumers read pair data through 16-wide row gathers (see
rasterize_tiled): depth-ordered feature rows indexed by the key's rank
bits as contiguous segment slices — no [T, K] scalar index table is ever
materialized.

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


class KeyPacking(NamedTuple):
    """Static description of the packed candidate-key layout."""

    rank_bits: int
    j_bits: int  # 0 when keys cannot pack j (fallback: carry cand payload)
    packed_j: bool


def key_packing(n_cap: int, num_tiles: int, r: int) -> KeyPacking:
    """Resolve the (tile | rank | j) bit layout for packed candidate keys."""
    rank_bits = max((n_cap - 1).bit_length(), 1)
    j_bits = max((r - 1).bit_length(), 1)
    packed_j = (num_tiles + 1) << (rank_bits + j_bits) <= (1 << 32)
    if not packed_j and (num_tiles + 1) << rank_bits >= 1 << 31:
        raise ValueError(
            f"packed pair keys overflow int32: {num_tiles} tiles x "
            f"2^{rank_bits} ranks; reduce capacity or tile count"
        )
    return KeyPacking(rank_bits=rank_bits, j_bits=j_bits, packed_j=packed_j)


def candidate_keys(
    mx, my, ca, cb, cc, opa, rx0, ry0, rx1, ry1, vis,
    tiles_x: int, tiles_y: int, cfg: RasterizeConfig, pk: KeyPacking,
):
    """Expand DEPTH-ORDERED per-Gaussian columns into packed candidate
    keys [r * n_cap] (j-minor slot layout [s, s, n_cap] flattened).

    All inputs are [n_cap] columns already sorted by depth rank (the
    caller carries them as payloads of the depth sort, so no gathers
    happen here). Invalid candidates (outside the rect, culled by the
    exact tile-ellipse bound, or invisible) get the sentinel tile that
    sorts last. Returns (keys_u32 [dom], cand_idx [dom] int32 or None):
    cand_idx is only materialized in the non-packed fallback; the packed
    layout recovers it elementwise from the sorted keys."""
    n_cap = mx.shape[0]
    num_tiles = tiles_x * tiles_y
    side = cfg.rect_side
    dy = jnp.arange(side, dtype=jnp.int32)[:, None, None]  # [s,1,1]
    dx = jnp.arange(side, dtype=jnp.int32)[None, :, None]  # [1,s,1]
    ty = ry0[None, None, :] + dy  # [s,s,n]
    tx = rx0[None, None, :] + dx
    in_rect = (ty < ry1[None, None, :]) & (tx < rx1[None, None, :])
    valid = in_rect & vis[None, None, :]
    if cfg.tight_cull:
        qmin = _tile_alpha_bound(
            mx[None, None, :], my[None, None, :], ca[None, None, :],
            cb[None, None, :], cc[None, None, :], tx.astype(jnp.float32),
            ty.astype(jnp.float32), cfg.tile,
        )
        bound = opa[None, None, :] * jnp.exp(-0.5 * qmin)
        valid = valid & (bound >= cfg.alpha_min * (1.0 - 1e-3))
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles)
    rank = jnp.arange(n_cap, dtype=jnp.int32)[None, None, :]
    if pk.packed_j:
        j_idx = (dy * side + dx).astype(jnp.uint32)
        keys = (
            (tile_id.astype(jnp.uint32) << (pk.rank_bits + pk.j_bits))
            | (rank.astype(jnp.uint32) << pk.j_bits)
            | j_idx
        )
        return keys.reshape(n_cap * side * side), None
    keys = (tile_id << pk.rank_bits) | rank
    # J-MAJOR candidate index (slot-major: j * n_cap + rank) — the layout
    # the rasterizer VJP's per-Gaussian reduce consumes directly
    cand_idx = (dy * side + dx) * n_cap + rank
    return keys.reshape(n_cap * side * side), cand_idx.reshape(
        n_cap * side * side)


class PairLists(NamedTuple):
    """Sorted pair structure (all static shapes)."""

    order: jnp.ndarray  # [N] Gaussian index by depth rank
    sorted_gid: jnp.ndarray  # [P] ORIGINAL Gaussian index of each sorted
    #     pair (carried as a sort payload — payload operands are nearly
    #     free, benchmarks/probe_segsum.py r3 — so consumers gather
    #     feature rows by gid directly instead of paying a depth-order
    #     row gather first)
    sorted_rank: jnp.ndarray  # [P] depth rank of each sorted pair
    sorted_key: jnp.ndarray  # [P] packed keys (tile << bits | rank), j bits
    #     stripped — the (tile, rank) key format consumers parse
    perm: jnp.ndarray  # [P] original candidate index of each sorted pair
    starts: jnp.ndarray  # [T+1] segment starts into the sorted pairs
    counts: jnp.ndarray  # [T] live pairs per tile (capped at K)
    lens: jnp.ndarray  # [T] segment lengths clamped to the pair budget
    #     only (>= counts; includes K-cap-dropped pairs — the backward
    #     sort-routing covers these positions with zero-grad keys)
    overflow: jnp.ndarray  # [] pairs dropped by the K cap
    rank_bits: int  # static


class TileBins(NamedTuple):
    slots: jnp.ndarray  # [T, K] int32 Gaussian index, -1 = empty
    counts: jnp.ndarray  # [T]
    overflow: jnp.ndarray  # []


def depth_order(visible: jnp.ndarray, depths: jnp.ndarray) -> jnp.ndarray:
    """Indices sorted by view depth, invisible Gaussians last.

    Ties broken by index (the CUDA radix sort over (tile|depth) keys is
    stable in duplication order, which is index order).
    """
    n = depths.shape[0]
    key = jnp.where(visible, depths, jnp.inf)
    _, order = jax.lax.sort(
        (key, jnp.arange(n, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    return order


def build_pair_lists(
    prims: ProjectedGaussians,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
    cfg: RasterizeConfig,
    pair_capacity: int | None = None,
    active_cap: int | None = None,
) -> PairLists:
    """Packed-key pair sort (see module docstring).

    `pair_capacity` additionally caps the TOTAL live pairs (the size of
    the compacted pair-feature array the consumer gathers); segments
    past the budget are truncated and reported in `overflow`.

    `active_cap` (static) truncates the candidate domain to the first
    `active_cap` depth ranks. The depth sort puts invisible (padded or
    culled) Gaussians last, so with a padded scene of capacity N and
    n_alive visible Gaussians, active_cap >= n_alive drops nothing while
    shrinking EVERY P-proportional stage (the candidate sort here and
    the carry-back sorts + gathers in the rasterizer VJP) by N/active_cap
    — the padding slots stop costing sort passes. Visible Gaussians
    beyond the cap are dropped whole and counted in `overflow` (one per
    Gaussian); callers re-specialize with a larger bucket when the alive
    count approaches the cap (train/loop.py)."""
    n = prims.depths.shape[0]
    n_cap = n if active_cap is None else min(active_cap, n)
    num_tiles = tiles_x * tiles_y
    side = cfg.rect_side
    r = side * side
    rank_bits = max((n_cap - 1).bit_length(), 1)
    j_bits = max((r - 1).bit_length(), 1)
    # single-operand layout needs tile|rank|j in 32 bits (unsigned)
    packed_j = (num_tiles + 1) << (rank_bits + j_bits) <= (1 << 32)
    if not packed_j and (num_tiles + 1) << rank_bits >= 1 << 31:
        raise ValueError(
            f"packed pair keys overflow int32: {num_tiles} tiles x "
            f"2^{rank_bits} ranks; reduce capacity or tile count"
        )

    order = depth_order(prims.visible, prims.depths)
    order_c = order[:n_cap]
    rect = prims.rect[order_c]  # [n_cap,4] x0,y0,x1,y1 (tile units)
    vis = prims.visible[order_c]
    cap_dropped = (
        jnp.sum(prims.visible) - jnp.sum(vis) if n_cap < n else jnp.int32(0)
    )

    # expand rect -> candidate tiles, laid out [side, side, n_cap]: the
    # GAUSSIAN axis is minor (lane) so every [s,s,N] intermediate pads
    # only N -> ceil128(N); the natural [N,s,s] layout pads (s,s) to
    # (8,128) tiles -- a ~400 MB materialization per intermediate at
    # 100k Gaussians whenever XLA fails to fuse the whole chain. Packed
    # keys are unique per candidate, so the pre-sort emission order is
    # irrelevant to the sorted output.
    dy = jnp.arange(side, dtype=jnp.int32)[:, None, None]  # [s,1,1]
    dx = jnp.arange(side, dtype=jnp.int32)[None, :, None]  # [1,s,1]
    ty = rect[None, None, :, 1] + dy  # [s,s,n]
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
        conic = jax.lax.stop_gradient(prims.conics[order_c])
        m2d = jax.lax.stop_gradient(prims.means2d[order_c])
        opa = jax.lax.stop_gradient(prims.opacities[order_c])
        qmin = _tile_alpha_bound(
            m2d[None, None, :, 0], m2d[None, None, :, 1],
            conic[None, None, :, 0], conic[None, None, :, 1],
            conic[None, None, :, 2], tx.astype(jnp.float32),
            ty.astype(jnp.float32), cfg.tile,
        )
        bound = opa[None, None, :] * jnp.exp(-0.5 * qmin)
        valid = valid & (bound >= cfg.alpha_min * (1.0 - 1e-3))
    tile_id = jnp.where(valid, ty * tiles_x + tx, num_tiles)  # sentinel last

    rank = jnp.arange(n_cap, dtype=jnp.int32)[None, None, :]
    gid = jnp.broadcast_to(order_c[None, None, :], tile_id.shape)
    if packed_j:
        # j (candidate slot in the rect) rides the low bits, so the
        # backward's candidate index perm = rank * r + j is elementwise
        j_idx = (dy * side + dx).astype(jnp.uint32)
        keys = (
            (tile_id.astype(jnp.uint32) << (rank_bits + j_bits))
            | (rank.astype(jnp.uint32) << j_bits)
            | j_idx
        )
        sorted_u, sorted_gid = jax.lax.sort(
            (keys.reshape(n_cap * r), gid.reshape(n_cap * r)), num_keys=1
        )
        rank_s = (sorted_u >> j_bits) & jnp.uint32((1 << rank_bits) - 1)
        j_s = sorted_u & jnp.uint32((1 << j_bits) - 1)
        perm = (rank_s * jnp.uint32(r) + j_s).astype(jnp.int32)
        tiles_sorted = (sorted_u >> (rank_bits + j_bits)).astype(jnp.int32)
        sorted_rank = rank_s.astype(jnp.int32)
        sorted_key = (tiles_sorted << rank_bits) | sorted_rank
    else:
        keys = (tile_id << rank_bits) | rank
        # payload = candidate index rank*r + j (the contract consumers
        # parse), NOT the emission position (which is j-major here)
        cand_idx = rank * r + (dy * side + dx)
        sorted_key, perm, sorted_gid = jax.lax.sort(
            (keys.reshape(n_cap * r), cand_idx.reshape(n_cap * r),
             gid.reshape(n_cap * r)),
            num_keys=1,
        )
        tiles_sorted = sorted_key >> rank_bits
        sorted_rank = sorted_key & ((1 << rank_bits) - 1)

    starts = jnp.searchsorted(
        tiles_sorted, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    seg_len = starts[1:] - starts[:-1]
    counts = jnp.minimum(seg_len, capacity)
    lens = seg_len
    if pair_capacity is not None:
        budget = pair_capacity - jnp.minimum(starts[:-1], pair_capacity)
        counts = jnp.minimum(counts, budget)
        lens = jnp.minimum(lens, budget)
    overflow = jnp.sum(seg_len - counts) + cap_dropped
    return PairLists(
        order=order,
        sorted_gid=sorted_gid,
        sorted_rank=sorted_rank,
        sorted_key=sorted_key,
        perm=perm,
        starts=starts,
        counts=counts,
        lens=lens,
        overflow=overflow,
        rank_bits=rank_bits,
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
    num_tiles = tiles_x * tiles_y
    p = pairs.sorted_rank.shape[0]
    k_idx = jnp.arange(capacity, dtype=jnp.int32)
    flat = pairs.starts[:-1, None] + k_idx[None, :]  # [T, K]
    valid = k_idx[None, :] < pairs.counts[:, None]
    ranks = pairs.sorted_rank[jnp.minimum(flat, p - 1)]
    slots = jnp.where(valid, pairs.order[ranks], -1)
    return TileBins(slots=slots, counts=pairs.counts, overflow=pairs.overflow)
