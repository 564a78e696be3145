"""Production tiled rasterizer: Pallas TPU kernels, custom analytic VJP.

TPU-native replacement for the external CUDA `diff_gaussian_rasterization`
extension (ashawkey fork with depth+alpha; call sites
/root/reference/gaussiansplatting/gaussian_renderer/__init__.py:86-104 and
/root/reference/gs_renderer.py:966-1015). Same contract: given projected
Gaussians it returns image [H,W,3] composited over a background, plus
depth, alpha and per-Gaussian radii, and its VJP produces gradients for
all Gaussian parameters including the screen-space means2d gradient that
drives densification (gaussian_model.py:434-437).

Architecture (three static-shaped stages):

  project (pure JAX, ops/projection.py)
    -> bin (ops/binning.py): [T, K] depth-ordered slot table per tile
    -> composite (THIS FILE): Pallas kernel grid over tiles.

The compositing math is the log-transmittance vectorized recurrence
documented in ops/rasterize_ref.py — oracle and kernel share the identity,
so they agree to float rounding. Per 128-Gaussian chunk the kernel does
VPU work on [PIX, 128] panels plus one [PIX,128]x[128,8] MXU matmul for
feature accumulation; the chunk loop is bounded by the tile's live count.

The backward pass is analytic (no autodiff through the scan): with
  w_i = T_i * alpha_i,   phi_i = F_i . gF   (F_i = [rgb_i, depth_i, 1]),
  P_i = sum_{j<=i} w_j phi_j   (inclusive prefix, carried across chunks),
  S   = sum_j w_j phi_j + g_logT   (from saved outputs),
the alpha gradient is
  dL/dalpha_i = T_i phi_i - (S - P_i) / (1 - alpha_i)
which the kernel evaluates in a single forward replay per tile —
the same suffix-accumulation trick the CUDA backward implements by
back-to-front traversal, re-expressed front-to-back so forward and
backward share code and memory layout.

Gradient semantics match jax.grad of the oracle (autodiff): the alpha
clamp at 0.99 and the power<=0 gate zero their branches' gradients. (The
CUDA backward lets gradient through its 0.99 clamp; the difference only
exists for Gaussians at alpha saturation and is numerically irrelevant.)
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from humangaussian_tpu.core.camera import Camera
from humangaussian_tpu.ops.binning import build_pair_lists
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians

# feature-row layout in the packed [T, Kc, NF, G] pair tensor.
# NF = 16: 10 live features + 6 zero rows — a full f32 sublane tile, so
# the pair data can be fetched as ONE wide-row gather from an [N+1, 16]
# feature matrix (21x faster on TPU than per-feature scalar gathers) and
# costs no extra VMEM (sublane padding would round 10 -> 16 anyway).
_FX, _FY, _FCA, _FCB, _FCC, _FR, _FG, _FB, _FOPA, _FDEPTH = range(10)
_NF = 16


class CompositeStatics(NamedTuple):
    """Hashable static configuration for the compositing kernels."""

    tiles_x: int
    tiles_y: int
    tile: int  # pixel tile edge
    pix: int  # tile * tile
    chunk: int  # Gaussians per inner chunk (lane count, 128)
    n_chunks: int  # K // chunk
    alpha_min: float
    alpha_max: float
    log_eps: float  # log of transmittance early-stop threshold
    interpret: bool


def _pixel_coords(t, s: CompositeStatics):
    """Per-tile pixel centers as [PIX,1] f32 columns (pix = py*tile+px).
    `t` is the GLOBAL tile id (grid id + shard offset when the tile axis
    is sharded across chips)."""
    ty = t // s.tiles_x
    tx = t % s.tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (s.pix, 1), 0)
    px = (tx * s.tile + lin % s.tile).astype(jnp.float32)
    py = (ty * s.tile + lin // s.tile).astype(jnp.float32)
    return px, py


def _chunk_common(f, px, py, lane, kc, count, s: CompositeStatics):
    """Shared per-chunk quantities for forward and backward replay."""
    x = f[_FX : _FX + 1, :]
    y = f[_FY : _FY + 1, :]
    ca = f[_FCA : _FCA + 1, :]
    cb = f[_FCB : _FCB + 1, :]
    cc = f[_FCC : _FCC + 1, :]
    opa = f[_FOPA : _FOPA + 1, :]
    dxv = x - px  # [PIX, G]
    dyv = y - py
    power = -0.5 * (ca * dxv * dxv + cc * dyv * dyv) - cb * dxv * dyv
    expp = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = opa * expp
    alpha = jnp.minimum(alpha_raw, s.alpha_max)
    valid = (kc * s.chunk + lane) < count
    pass_ = valid & (power <= 0.0) & (alpha >= s.alpha_min)
    log1ma = jnp.where(pass_, jnp.log1p(-jnp.where(pass_, alpha, 0.0)), 0.0)
    return dict(
        dxv=dxv,
        dyv=dyv,
        ca=ca,
        cb=cb,
        cc=cc,
        opa=opa,
        power=power,
        expp=expp,
        alpha_raw=alpha_raw,
        alpha=alpha,
        pass_=pass_,
        log1ma=log1ma,
    )


def _lane_cumsum(x, g: int):
    """Inclusive cumsum along the lane axis of [PIX, G] via an upper-
    triangular ones matmul — Mosaic has no cumsum primitive, and one
    [PIX,G]x[G,G] MXU pass beats a log-step shift chain anyway."""
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    tri = (row <= col).astype(jnp.float32)
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _recurrence(c, log_t, done_f, s: CompositeStatics):
    """Front-to-back recurrence for one chunk (see module docstring).

    `done_f` is the carried stop latch as float (0/1) — Mosaic handles
    f32 scratch state more robustly than i1 vectors."""
    cum = _lane_cumsum(c["log1ma"], s.chunk)
    log_t_before = log_t + cum - c["log1ma"]
    trigger = c["pass_"] & (log_t_before + c["log1ma"] < s.log_eps)
    done_upto_f = jnp.maximum(
        done_f,
        jnp.minimum(_lane_cumsum(trigger.astype(jnp.float32), s.chunk), 1.0),
    )
    contrib = c["pass_"] & (done_upto_f < 0.5)
    w = jnp.where(contrib, jnp.exp(log_t_before) * c["alpha"], 0.0)
    new_log_t = log_t + jnp.sum(
        jnp.where(contrib, c["log1ma"], 0.0), axis=1, keepdims=True
    )
    new_done_f = done_upto_f[:, s.chunk - 1 : s.chunk]
    return w, contrib, log_t_before, new_log_t, new_done_f


def _feat_matrix(f, s: CompositeStatics):
    """[8, G] accumulation features: rgb, depth, ones, zero-pad."""
    return jnp.concatenate(
        [
            f[_FR : _FB + 1, :],
            f[_FDEPTH : _FDEPTH + 1, :],
            jnp.ones((1, s.chunk), jnp.float32),
            jnp.zeros((3, s.chunk), jnp.float32),
        ],
        axis=0,
    )


def _fwd_kernel(
    counts_ref, offset_ref, feats_ref, out_ref, logt_ref, done_ref, acc_ref,
    *, s: CompositeStatics,
):
    """Per-pixel loop state (log T, stop latch, accumulators) lives in
    VMEM scratch, not loop carries — carrying ~130 vector registers
    through an scf loop trips Mosaic layout bugs and costs moves."""
    t = pl.program_id(0) + offset_ref[0]
    count = counts_ref[pl.program_id(0)]
    px, py = _pixel_coords(t, s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s.chunk), 1)

    logt_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)
    done_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)
    acc_ref[:, :] = jnp.zeros((s.pix, 8), jnp.float32)

    def body(kc, carry):
        f = feats_ref[0, kc]  # (NF, G)
        c = _chunk_common(f, px, py, lane, kc, count, s)
        w, contrib, _ltb, new_log_t, new_done = _recurrence(
            c, logt_ref[:, :], done_ref[:, :], s
        )
        acc_ref[:, :] += jax.lax.dot_general(
            w,
            _feat_matrix(f, s),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logt_ref[:, :] = new_log_t
        done_ref[:, :] = new_done
        return carry

    jax.lax.fori_loop(0, pl.cdiv(count, s.chunk), body, 0)
    # channels: 0-2 rgb, 3 depth, 4 sum(w), 5 log T_final, 6-7 zero
    acc = acc_ref[:, :]
    out_ref[0] = jnp.concatenate(
        [acc[:, 0:5], logt_ref[:, :], jnp.zeros((s.pix, 2), jnp.float32)],
        axis=1,
    )


def _bwd_kernel(
    counts_ref, offset_ref, feats_ref, gvec_ref, dfeats_ref, logt_ref,
    done_ref, prefix_ref, *, s: CompositeStatics,
):
    t = pl.program_id(0) + offset_ref[0]
    count = counts_ref[pl.program_id(0)]
    px, py = _pixel_coords(t, s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s.chunk), 1)
    g8 = gvec_ref[0]  # (PIX, 8): 0-4 output cotangents, 5 = S
    svec = g8[:, 5:6]

    logt_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)
    done_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)
    prefix_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)

    def body(kc, carry):
        log_t = logt_ref[:, :]
        done = done_ref[:, :]
        prefix = prefix_ref[:, :]
        f = feats_ref[0, kc]
        c = _chunk_common(f, px, py, lane, kc, count, s)
        w, contrib, log_t_before, new_log_t, new_done = _recurrence(
            c, log_t, done, s
        )
        featm = _feat_matrix(f, s)  # (8, G); rows 5-7 zero => S excluded
        phi = jax.lax.dot_general(
            g8, featm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PIX, G)
        wphi = w * phi
        p_incl = prefix + _lane_cumsum(wphi, s.chunk)
        t_i = jnp.exp(log_t_before)
        inv_1ma = 1.0 / jnp.maximum(1.0 - c["alpha"], 1e-6)
        dalpha = jnp.where(
            contrib, t_i * phi - (svec - p_incl) * inv_1ma, 0.0
        )
        dalpha_raw = jnp.where(c["alpha_raw"] < s.alpha_max, dalpha, 0.0)
        dopa_pix = dalpha_raw * c["expp"]
        dpow = jnp.where(
            c["power"] < 0.0, dalpha_raw * c["opa"] * c["expp"], 0.0
        )
        ddx = dpow * (-(c["ca"] * c["dxv"] + c["cb"] * c["dyv"]))
        ddy = dpow * (-(c["cc"] * c["dyv"] + c["cb"] * c["dxv"]))

        def psum(v):  # sum over pixels -> (1, G)
            return jnp.sum(v, axis=0, keepdims=True)

        dcg = jax.lax.dot_general(
            g8, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, G): rows 0-2 = drgb, row 3 = ddepth
        rows = jnp.concatenate(
            [
                psum(ddx),  # dmu_x
                psum(ddy),  # dmu_y
                psum(dpow * (-0.5 * c["dxv"] * c["dxv"])),  # dconic_a
                psum(dpow * (-(c["dxv"] * c["dyv"]))),  # dconic_b
                psum(dpow * (-0.5 * c["dyv"] * c["dyv"])),  # dconic_c
                dcg[0:3, :],  # drgb
                psum(dopa_pix),  # dopacity
                dcg[3:4, :],  # ddepth
                jnp.zeros((_NF - 10, s.chunk), jnp.float32),  # pad rows
            ],
            axis=0,
        )  # (NF, G)
        dfeats_ref[0, kc] = rows
        logt_ref[:, :] = new_log_t
        done_ref[:, :] = new_done
        prefix_ref[:, :] = prefix + jnp.sum(wphi, axis=1, keepdims=True)
        return carry

    n_live = pl.cdiv(count, s.chunk)
    jax.lax.fori_loop(0, n_live, body, 0)

    # zero the pair-grad rows of chunks beyond the live count
    def zero_body(kc, _):
        @pl.when(kc >= n_live)
        def _():
            dfeats_ref[0, kc] = jnp.zeros((_NF, s.chunk), jnp.float32)

        return 0

    jax.lax.fori_loop(0, s.n_chunks, zero_body, 0)


def _fwd_call(feats, counts, offset, s: CompositeStatics):
    num_tiles = counts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # counts + global tile offset -> SMEM
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, s.n_chunks, _NF, s.chunk),
                lambda t, *_: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s.pix, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((s.pix, 1), jnp.float32),  # log T
            pltpu.VMEM((s.pix, 1), jnp.float32),  # stop latch
            pltpu.VMEM((s.pix, 8), jnp.float32),  # accumulators
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, s.pix, 8), jnp.float32),
        interpret=s.interpret,
    )(counts, offset, feats)


def _bwd_call(feats, counts, offset, gvec, s: CompositeStatics):
    num_tiles = counts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, s.n_chunks, _NF, s.chunk),
                lambda t, *_: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s.pix, 8), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s.n_chunks, _NF, s.chunk),
            lambda t, *_: (t, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((s.pix, 1), jnp.float32),  # log T
            pltpu.VMEM((s.pix, 1), jnp.float32),  # stop latch
            pltpu.VMEM((s.pix, 1), jnp.float32),  # prefix sum(w*phi)
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, s=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(feats.shape, jnp.float32),
        interpret=s.interpret,
    )(counts, offset, feats, gvec)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gather_pair_table(fmat, order, sorted_rank, sorted_key, cand_keys,
                      starts, counts, tile_capacity: int, rank_bits: int):
    """[N,16] features -> [T,K,16] depth-ordered pair table via wide-row
    gathers, with a GATHER+SORT-ONLY custom VJP.

    Autodiff of the forward gathers would lower to TPU scatter-adds over
    millions of rows (hundreds of ms — the dominant cost of the render
    backward). The transpose is computed without scatters OR searches:

    - table slot (t, k) <- pair p = starts[t]+k is a bijection on live
      slots, and each sorted pair's tile is its key's high bits, so the
      hop-2 transpose is the inverse gather (t, k) = (key>>bits,
      p - starts[t]);
    - the pair sort's inverse permutation is rebuilt with two payload
      sorts (sort-of-sort trick), turning the hop-1 transpose into one
      wide gather + a sum over each rank's <= rect_side^2 candidate
      slots (which are contiguous in unsorted pair order);
    - the depth reordering fmat[order] is a permutation, inverted with
      one more payload sort.
    """
    fmat_sorted = fmat[order]
    p = sorted_rank.shape[0]
    pair_feats = jnp.concatenate(
        [fmat_sorted[sorted_rank], jnp.zeros((1, fmat.shape[1]), fmat.dtype)]
    )
    k_idx = jnp.arange(tile_capacity, dtype=jnp.int32)
    flat = starts[:-1, None] + k_idx[None, :]
    flat = jnp.where(k_idx[None, :] < counts[:, None], flat, p)
    return pair_feats[flat]  # [T, K, 16]


def _gather_fwd(fmat, order, sorted_rank, sorted_key, cand_keys, starts,
                counts, tile_capacity, rank_bits):
    out = gather_pair_table(
        fmat, order, sorted_rank, sorted_key, cand_keys, starts, counts,
        tile_capacity, rank_bits,
    )
    return out, (order, sorted_key, cand_keys, starts, counts)


def _gather_bwd(tile_capacity, rank_bits, res, g):
    order, sorted_key, cand_keys, starts, counts = res
    p = sorted_key.shape[0]
    num_tiles = counts.shape[0]
    p_idx = jnp.arange(p, dtype=jnp.int32)

    # hop-2 inverse: sorted pair p sits at slot (t = key>>bits,
    # k = p - starts[t]); dropped/sentinel pairs get zero
    t_of = (sorted_key >> rank_bits).astype(jnp.int32)
    t_safe = jnp.clip(t_of, 0, num_tiles - 1)
    k_of = p_idx - starts[t_safe]
    valid_p = (t_of < num_tiles) & (k_of < counts[t_safe])
    dpair = jnp.where(
        valid_p[:, None],
        g[t_safe, jnp.clip(k_of, 0, tile_capacity - 1)],
        0.0,
    )  # [P, 16] in SORTED pair order

    # sort-of-sort: rebuild the pair sort's inverse permutation, then
    # un-sort dpair so each rank's candidates are contiguous
    keys_flat = cand_keys.reshape(p)
    _, perm = jax.lax.sort((keys_flat, p_idx), num_keys=1)  # sorted->orig
    _, inv = jax.lax.sort((perm, p_idx), num_keys=1)  # orig->sorted
    dpair_unsorted = dpair[inv]  # [P, 16]
    r = cand_keys.shape[1]
    dfmat_sorted = jnp.sum(
        dpair_unsorted.reshape(-1, r, dpair.shape[1]), axis=1
    )  # [N, 16]

    # depth-permutation inverse (one more payload sort)
    n = order.shape[0]
    _, inv_order = jax.lax.sort(
        (order, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )
    dfmat = dfmat_sorted[inv_order]
    return (dfmat, None, None, None, None, None, None)


gather_pair_table.defvjp(_gather_fwd, _gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def composite_tiles(feats, counts, offset, s: CompositeStatics):
    """[T, Kc, NF, G] pair features + [T] counts -> [T, PIX, 8]
    accumulators. `offset` ([1] int32) is the global id of tile row 0 —
    nonzero when the tile axis is sharded across chips."""
    return _fwd_call(feats, counts, offset, s)


def _composite_fwd(feats, counts, offset, s):
    out = _fwd_call(feats, counts, offset, s)
    return out, (feats, counts, offset, out)


def _composite_bwd(s, res, g_out):
    feats, counts, offset, out = res
    # S = sum_j w_j phi_j + g_logT, phi from the 5 live output channels
    phi_tot = jnp.sum(out[..., 0:5] * g_out[..., 0:5], axis=-1, keepdims=True)
    svec = phi_tot + g_out[..., 5:6]
    gvec = jnp.concatenate(
        [g_out[..., 0:5], svec, jnp.zeros_like(svec), jnp.zeros_like(svec)],
        axis=-1,
    )
    dfeats = _bwd_call(feats, counts, offset, gvec, s)
    return dfeats, None, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def rasterize_tiled(
    means,
    scales,
    quats,
    features,
    opacities,
    alive,
    camera: Camera,
    background: jnp.ndarray,
    sh_degree: int = 0,
    cfg: RasterizeConfig = RasterizeConfig(),
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    tile_capacity: int = 4096,
    interpret: bool | None = None,
    tile_shard=None,  # (Mesh, axis_name): shard the tile grid across chips
):
    """Tiled Pallas render. Same contract as rasterize_reference (and the
    reference render(): gaussian_renderer/__init__.py:98-104): dict with
    image [H,W,3], depth [H,W], alpha [H,W], radii [N] int32, visible [N],
    plus pair-buffer `overflow` diagnostics.

    `tile_shard=(mesh, axis)` runs the compositing grid sequence-parallel
    over the pixel-tile axis (SURVEY.md §5.7: "sequence parallelism over
    rays"): projection/binning are replicated (cheap), each chip
    composites its contiguous tile range with the correct global offset,
    and the image shards concatenate along the tile axis."""
    h, w = camera.height, camera.width
    tile = cfg.tile
    if h % tile or w % tile:
        raise ValueError(f"image {h}x{w} must be a multiple of tile {tile}")
    chunk = 128
    if tile_capacity % chunk:
        raise ValueError(f"tile_capacity must be a multiple of {chunk}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    prims = project_gaussians(
        means, scales, quats, features, opacities, alive, camera,
        sh_degree, cfg, scale_modifier, means2d_offset,
    )
    tiles_x, tiles_y = w // tile, h // tile
    num_tiles = tiles_x * tiles_y
    pairs = build_pair_lists(prims, tiles_x, tiles_y, tile_capacity, cfg)

    # two-hop 16-wide row gathers (scalar gathers are ~20x slower on TPU):
    #   hop 1: feature rows in depth order, indexed by pair rank bits;
    #   hop 2: the static [T, K] table as contiguous segment slices,
    #          out-of-segment slots hitting an all-zero row (opacity 0
    #          never passes alpha_min).
    n = means.shape[0]
    p = pairs.sorted_rank.shape[0]
    fmat = jnp.stack(
        [
            prims.means2d[:, 0],
            prims.means2d[:, 1],
            prims.conics[:, 0],
            prims.conics[:, 1],
            prims.conics[:, 2],
            prims.rgb[:, 0],
            prims.rgb[:, 1],
            prims.rgb[:, 2],
            prims.opacities,
            prims.depths,
        ]
        + [jnp.zeros((n,), jnp.float32)] * (_NF - 10),
        axis=1,
    )  # [N, 16]
    n_chunks = tile_capacity // chunk
    feats = (
        gather_pair_table(
            fmat, pairs.order, pairs.sorted_rank, pairs.sorted_key,
            pairs.cand_keys, pairs.starts, pairs.counts, tile_capacity,
            pairs.rank_bits,
        )
        .reshape(num_tiles, n_chunks, chunk, _NF)
        .transpose(0, 1, 3, 2)
    )  # [T, Kc, NF, G]

    s = CompositeStatics(
        tiles_x=tiles_x,
        tiles_y=tiles_y,
        tile=tile,
        pix=tile * tile,
        chunk=chunk,
        n_chunks=n_chunks,
        alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max,
        log_eps=math.log(cfg.transmittance_eps),
        interpret=bool(interpret),
    )
    if tile_shard is not None:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as _P

        mesh, axis = tile_shard
        n_shards = mesh.shape[axis]
        if num_tiles % n_shards:
            raise ValueError(f"{num_tiles} tiles not divisible by {n_shards}")

        def comp(feats_l, counts_l):
            off = (
                jax.lax.axis_index(axis).astype(jnp.int32)
                * (num_tiles // n_shards)
            ).reshape(1)
            return composite_tiles(feats_l, counts_l, off, s)

        acc = shard_map(
            comp, mesh=mesh,
            in_specs=(_P(axis), _P(axis)),
            out_specs=_P(axis),
            check_rep=False,
        )(feats, pairs.counts)
    else:
        acc = composite_tiles(
            feats, pairs.counts, jnp.zeros((1,), jnp.int32), s
        )  # [T, PIX, 8]

    acc_img = acc.reshape(tiles_y, tiles_x, tile, tile, 8)
    acc_img = acc_img.transpose(0, 2, 1, 3, 4).reshape(h, w, 8)
    t_fin = jnp.exp(acc_img[..., 5])
    image = acc_img[..., 0:3] + t_fin[..., None] * background[None, None, :]
    return {
        "image": image,
        "depth": acc_img[..., 3],
        "alpha": 1.0 - t_fin,
        "radii": prims.radii,
        "visible": prims.visible,
        "overflow": pairs.overflow,
    }
