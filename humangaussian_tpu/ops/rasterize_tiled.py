"""Production tiled rasterizer: streaming Pallas TPU kernels, analytic VJP.

TPU-native replacement for the external CUDA `diff_gaussian_rasterization`
extension (ashawkey fork with depth+alpha; call sites
/root/reference/gaussiansplatting/gaussian_renderer/__init__.py:86-104 and
/root/reference/gs_renderer.py:966-1015). Same contract: given projected
Gaussians it returns image [H,W,3] composited over a background, plus
depth, alpha and per-Gaussian radii, and its VJP produces gradients for
all Gaussian parameters including the screen-space means2d gradient that
drives densification (gaussian_model.py:434-437).

Architecture (static shapes end to end):

  project (pure JAX, ops/projection.py)
    -> bin (ops/binning.py): ONE packed-key sort of the (tile, Gaussian)
       candidate pairs; per-tile segments of the sorted order
    -> pair_gather: ONE [P_cap, 16] row gather producing the compacted,
       depth-ordered pair-feature array (NO [tiles, K] table — v1
       materialized a 64x-oversized static table in HBM; the pair array
       is sized by live pairs, not tiles x capacity)
    -> composite (THIS FILE): Pallas kernel, grid over tiles. Each tile
       program streams its contiguous pair segment from HBM with
       double-buffered async DMA, bounded by the tile's live count, and
       STOPS EARLY once every pixel in the tile is saturated (the CUDA
       kernel's per-pixel early-out, lifted to whole-tile granularity).

The compositing math is the log-transmittance vectorized recurrence
documented in ops/rasterize_ref.py — oracle and kernel share the identity,
so they agree to float rounding. Panels are laid out [G, PIX] (pairs on
sublanes, pixels on lanes) so a DMA'd [128, 16] chunk of pair rows is
consumed directly with no transpose. Per chunk the kernel does VPU work
on [G, PIX] panels plus two MXU matmuls (cumsum-by-triangular-ones and
feature accumulation).

The backward pass is analytic (no autodiff through the scan): with
  w_i = T_i * alpha_i,   phi_i = F_i . gF   (F_i = [rgb_i, depth_i, 1]),
  P_i = sum_{j<=i} w_j phi_j   (inclusive prefix, carried across chunks),
  S   = sum_j w_j phi_j + g_logT   (from saved outputs),
the alpha gradient is
  dL/dalpha_i = T_i phi_i - (S - P_i) / (1 - alpha_i)
which the kernel evaluates in a single forward replay per tile —
the same suffix-accumulation trick the CUDA backward implements by
back-to-front traversal, re-expressed front-to-back so forward and
backward share code and memory layout. Pair gradients are written back
to the compacted pair array (each sorted pair belongs to exactly one
tile slot, so the write is a contiguous per-tile stream, not a scatter),
then transposed to per-Gaussian gradients with the pair sort's inverse
permutation (two payload sorts, computed only when gradients are needed)
and one [N*R] row gather — no TPU scatter anywhere.

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

# feature-column layout of a [P, 16] pair row. 16 = 10 live features + 6
# zero columns — one full f32 sublane tile, so a pair row is fetched as
# ONE wide-row gather (21x faster on TPU than per-feature scalar
# gathers) and a DMA'd [128, 16] chunk is lane-aligned.
_FX, _FY, _FCA, _FCB, _FCC, _FR, _FG, _FB, _FOPA, _FDEPTH = range(10)
_NF = 16
_GUARD = 128  # zero guard rows so the last chunk's DMA never runs OOB


class CompositeStatics(NamedTuple):
    """Hashable static configuration for the compositing kernels."""

    tiles_x: int
    tiles_y: int
    tile: int  # pixel tile edge
    pix: int  # tile * tile
    chunk: int  # Gaussians per inner chunk (128)
    alpha_min: float
    alpha_max: float
    log_eps: float  # log of transmittance early-stop threshold
    interpret: bool


def _pixel_rows(t, s: CompositeStatics):
    """Per-tile pixel centers as [1, PIX] f32 rows (pix = py*tile+px).
    `t` is the tile id within its image (from the prefetched tileid
    array, so the same kernel serves sharded and camera-batched grids)."""
    ty = t // s.tiles_x
    tx = t % s.tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, s.pix), 1)
    px = (tx * s.tile + lin % s.tile).astype(jnp.float32)
    py = (ty * s.tile + lin // s.tile).astype(jnp.float32)
    return px, py


def _sub_cumsum(x, g: int):
    """Inclusive cumsum along the sublane (pair) axis of [G, PIX] via a
    lower-triangular ones matmul — Mosaic has no cumsum primitive, and
    one [G,G]x[G,PIX] MXU pass beats a log-step shift chain anyway."""
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    tri = (col <= row).astype(jnp.float32)
    return jax.lax.dot_general(
        tri, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _chunk_common(f, px, py, kc, count, s: CompositeStatics):
    """Shared per-chunk quantities for forward and backward replay.

    `f` is a [G, NF] chunk of pair rows; panels are [G, PIX]."""
    x = f[:, _FX : _FX + 1]
    y = f[:, _FY : _FY + 1]
    ca = f[:, _FCA : _FCA + 1]
    cb = f[:, _FCB : _FCB + 1]
    cc = f[:, _FCC : _FCC + 1]
    opa = f[:, _FOPA : _FOPA + 1]
    dxv = x - px  # [G, PIX]
    dyv = y - py
    power = -0.5 * (ca * dxv * dxv + cc * dyv * dyv) - cb * dxv * dyv
    expp = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = opa * expp
    alpha = jnp.minimum(alpha_raw, s.alpha_max)
    gi = jax.lax.broadcasted_iota(jnp.int32, (s.chunk, 1), 0)
    valid = (kc * s.chunk + gi) < count  # masks tail lanes of last chunk
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


def _recurrence(c, log_t, done_f, s: CompositeStatics):
    """Front-to-back recurrence for one chunk (see module docstring).

    `log_t`/`done_f` are [1, PIX] carried rows; the stop latch is float
    (0/1) — Mosaic handles f32 scratch state more robustly than i1."""
    cum = _sub_cumsum(c["log1ma"], s.chunk)
    log_t_before = log_t + cum - c["log1ma"]
    trigger = c["pass_"] & (log_t_before + c["log1ma"] < s.log_eps)
    done_upto = jnp.maximum(
        done_f,
        jnp.minimum(_sub_cumsum(trigger.astype(jnp.float32), s.chunk), 1.0),
    )
    contrib = c["pass_"] & (done_upto < 0.5)
    w = jnp.where(contrib, jnp.exp(log_t_before) * c["alpha"], 0.0)
    new_log_t = log_t + jnp.sum(
        jnp.where(contrib, c["log1ma"], 0.0), axis=0, keepdims=True
    )
    new_done = done_upto[s.chunk - 1 : s.chunk, :]
    return w, contrib, log_t_before, new_log_t, new_done


def _feat_matrix(f, s: CompositeStatics):
    """[G, 8] accumulation features: rgb, depth, ones, zero-pad."""
    return jnp.concatenate(
        [
            f[:, _FR : _FB + 1],
            f[:, _FDEPTH : _FDEPTH + 1],
            jnp.ones((s.chunk, 1), jnp.float32),
            jnp.zeros((s.chunk, 3), jnp.float32),
        ],
        axis=1,
    )


def _pair_dma(pairs_hbm, buf, sem, start, kc, slot, s):
    """Async copy of pair chunk kc (rows [start+128kc, +128)) into slot."""
    return pltpu.make_async_copy(
        pairs_hbm.at[pl.ds(start + kc * s.chunk, s.chunk), :],
        buf.at[slot],
        sem.at[slot],
    )


def _fwd_kernel(
    counts_ref, starts_ref, tileid_ref, pairs_hbm, out_ref,
    buf, logt_ref, done_ref, acc_ref, sem, *, s: CompositeStatics,
):
    """Per-pixel loop state (log T, stop latch, accumulators) lives in
    VMEM scratch, not loop carries — carrying ~130 vector registers
    through an scf loop trips Mosaic layout bugs and costs moves."""
    ti = pl.program_id(0)
    count = counts_ref[ti]
    start = starts_ref[ti]
    t = tileid_ref[ti]
    nlive = pl.cdiv(count, s.chunk)
    px, py = _pixel_rows(t, s)

    logt_ref[:, :] = jnp.zeros((1, s.pix), jnp.float32)
    done_ref[:, :] = jnp.zeros((1, s.pix), jnp.float32)
    acc_ref[:, :] = jnp.zeros((8, s.pix), jnp.float32)

    @pl.when(nlive > 0)
    def _():
        _pair_dma(pairs_hbm, buf, sem, start, 0, 0, s).start()

    def cond(carry):
        kc, stop = carry
        return jnp.logical_and(kc < nlive, jnp.logical_not(stop))

    def body(carry):
        kc, _ = carry
        slot = jax.lax.rem(kc, 2)
        _pair_dma(pairs_hbm, buf, sem, start, kc, slot, s).wait()

        @pl.when(kc + 1 < nlive)
        def _():
            _pair_dma(
                pairs_hbm, buf, sem, start, kc + 1, jax.lax.rem(kc + 1, 2), s
            ).start()

        f = buf[slot]  # [G, NF]
        c = _chunk_common(f, px, py, kc, count, s)
        w, _contrib, _ltb, new_log_t, new_done = _recurrence(
            c, logt_ref[:, :], done_ref[:, :], s
        )
        acc_ref[:, :] += jax.lax.dot_general(
            _feat_matrix(f, s),
            w,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, PIX]
        logt_ref[:, :] = new_log_t
        done_ref[:, :] = new_done
        # whole-tile early stop: every pixel saturated => remaining
        # (deeper) pairs are invisible. CUDA does this per pixel; one
        # latched flag per tile is the vectorized equivalent.
        all_done = jnp.sum(new_done) > (s.pix - 0.5)
        return kc + 1, all_done

    kfin, stopped = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False))
    )

    # a prefetch for chunk kfin may be in flight after an early stop
    @pl.when(jnp.logical_and(stopped, kfin < nlive))
    def _():
        _pair_dma(pairs_hbm, buf, sem, start, kfin, jax.lax.rem(kfin, 2), s).wait()

    # channel rows: 0-2 rgb, 3 depth, 4 sum(w), 5 log T_final, 6-7 zero
    out_ref[0] = jnp.concatenate(
        [acc_ref[0:5, :], logt_ref[:, :], jnp.zeros((2, s.pix), jnp.float32)],
        axis=0,
    )


def _bwd_kernel(
    counts_ref, starts_ref, tileid_ref, pairs_hbm, gvec_ref, _zeros_hbm,
    dpair_hbm, buf, wbuf, logt_ref, done_ref, prefix_ref, sem, wsem,
    *, s: CompositeStatics,
):
    ti = pl.program_id(0)
    count = counts_ref[ti]
    start = starts_ref[ti]
    t = tileid_ref[ti]
    nlive = pl.cdiv(count, s.chunk)
    px, py = _pixel_rows(t, s)
    g8 = gvec_ref[0]  # [8, PIX]: rows 0-4 output cotangents, row 5 = S
    svec = g8[5:6, :]

    logt_ref[:, :] = jnp.zeros((1, s.pix), jnp.float32)
    done_ref[:, :] = jnp.zeros((1, s.pix), jnp.float32)
    prefix_ref[:, :] = jnp.zeros((1, s.pix), jnp.float32)

    @pl.when(nlive > 0)
    def _():
        _pair_dma(pairs_hbm, buf, sem, start, 0, 0, s).start()

    def wdma(slot, kc):
        return pltpu.make_async_copy(
            wbuf.at[slot],
            dpair_hbm.at[pl.ds(start + kc * s.chunk, s.chunk), :],
            wsem.at[slot],
        )

    def cond(carry):
        kc, stop = carry
        return jnp.logical_and(kc < nlive, jnp.logical_not(stop))

    def body(carry):
        kc, _ = carry
        slot = jax.lax.rem(kc, 2)
        _pair_dma(pairs_hbm, buf, sem, start, kc, slot, s).wait()

        @pl.when(kc + 1 < nlive)
        def _():
            _pair_dma(
                pairs_hbm, buf, sem, start, kc + 1, jax.lax.rem(kc + 1, 2), s
            ).start()

        # the write buffer slot is reused every 2 chunks
        @pl.when(kc >= 2)
        def _():
            wdma(slot, kc - 2).wait()

        f = buf[slot]
        c = _chunk_common(f, px, py, kc, count, s)
        w, contrib, log_t_before, new_log_t, new_done = _recurrence(
            c, logt_ref[:, :], done_ref[:, :], s
        )
        featm = _feat_matrix(f, s)  # [G, 8]; cols 5-7 zero => S excluded
        phi = jax.lax.dot_general(
            featm, g8, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, PIX]
        wphi = w * phi
        p_incl = prefix_ref[:, :] + _sub_cumsum(wphi, s.chunk)
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

        def psum(v):  # sum over pixels -> [G, 1]
            return jnp.sum(v, axis=1, keepdims=True)

        dcg = jax.lax.dot_general(
            w, g8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [G, 8]: cols 0-2 = drgb, col 3 = ddepth
        # masked-out lanes (beyond count / non-contributing) are exactly
        # zero here, so full-chunk writes spill only zeros into the next
        # tile's rows — overwritten by that tile's own (later) writes.
        wbuf[slot] = jnp.concatenate(
            [
                psum(ddx),  # dmu_x
                psum(ddy),  # dmu_y
                psum(dpow * (-0.5 * c["dxv"] * c["dxv"])),  # dconic_a
                psum(dpow * (-(c["dxv"] * c["dyv"]))),  # dconic_b
                psum(dpow * (-0.5 * c["dyv"] * c["dyv"])),  # dconic_c
                dcg[:, 0:3],  # drgb
                psum(dopa_pix),  # dopacity
                dcg[:, 3:4],  # ddepth
                jnp.zeros((s.chunk, _NF - 10), jnp.float32),
            ],
            axis=1,
        )  # [G, NF]
        wdma(slot, kc).start()

        logt_ref[:, :] = new_log_t
        done_ref[:, :] = new_done
        prefix_ref[:, :] = prefix_ref[:, :] + jnp.sum(
            wphi, axis=0, keepdims=True
        )
        all_done = jnp.sum(new_done) > (s.pix - 0.5)
        return kc + 1, all_done

    kfin, stopped = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False))
    )

    @pl.when(jnp.logical_and(stopped, kfin < nlive))
    def _():
        _pair_dma(pairs_hbm, buf, sem, start, kfin, jax.lax.rem(kfin, 2), s).wait()

    # drain outstanding writes BEFORE the grid advances: the next tile's
    # first rows overlap this tile's zero-spill region, and cross-tile
    # DMA ordering is only guaranteed by this wait.
    @pl.when(kfin >= 2)
    def _():
        wdma(jax.lax.rem(kfin, 2), kfin - 2).wait()

    @pl.when(kfin >= 1)
    def _():
        wdma(jax.lax.rem(kfin - 1, 2), kfin - 1).wait()


def _fwd_call(pair_feats, counts, starts, tileid, s: CompositeStatics):
    g = counts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # counts, starts, tileid -> SMEM
        grid=(g,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # pairs stay in HBM
        out_specs=pl.BlockSpec(
            (1, 8, s.pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, s.chunk, _NF), jnp.float32),  # DMA double buffer
            pltpu.VMEM((1, s.pix), jnp.float32),  # log T
            pltpu.VMEM((1, s.pix), jnp.float32),  # stop latch
            pltpu.VMEM((8, s.pix), jnp.float32),  # accumulators
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, 8, s.pix), jnp.float32),
        interpret=s.interpret,
    )(counts, starts, tileid, pair_feats)


def _bwd_call(pair_feats, counts, starts, tileid, gvec, s: CompositeStatics):
    g = counts.shape[0]
    p_rows = pair_feats.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # pair features (HBM)
            pl.BlockSpec(
                (1, 8, s.pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # zero-init dpair (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, s.chunk, _NF), jnp.float32),  # read buffer
            pltpu.VMEM((2, s.chunk, _NF), jnp.float32),  # write buffer
            pltpu.VMEM((1, s.pix), jnp.float32),  # log T
            pltpu.VMEM((1, s.pix), jnp.float32),  # stop latch
            pltpu.VMEM((1, s.pix), jnp.float32),  # prefix sum(w*phi)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # rows never written by any tile (capacity-dropped pairs, sentinel
    # tail, guard) must read as zero in the transpose: alias a zeros
    # array into the output so the kernel only overwrites live rows.
    zeros = jnp.zeros((p_rows, _NF), jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, s=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p_rows, _NF), jnp.float32),
        input_output_aliases={5: 0},  # zeros input (3 scalars + 2) -> out
        interpret=s.interpret,
    )(counts, starts, tileid, pair_feats, gvec, zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def composite_tiles(pair_feats, counts, starts, tileid, s: CompositeStatics):
    """Compacted pair rows [P_rows, 16] + per-grid-step (count, start,
    tile id) -> [G, 8, PIX] accumulators. Flattened-grid form: G may be
    tiles of one image, a shard of them, or tiles x cameras."""
    return _fwd_call(pair_feats, counts, starts, tileid, s)


def _composite_fwd(pair_feats, counts, starts, tileid, s):
    out = _fwd_call(pair_feats, counts, starts, tileid, s)
    return out, (pair_feats, counts, starts, tileid, out)


def _composite_bwd(s, res, g_out):
    pair_feats, counts, starts, tileid, out = res
    # S = sum_j w_j phi_j + g_logT, phi from the 5 live output channels
    phi_tot = jnp.sum(
        out[:, 0:5, :] * g_out[:, 0:5, :], axis=1, keepdims=True
    )
    svec = phi_tot + g_out[:, 5:6, :]
    gvec = jnp.concatenate(
        [g_out[:, 0:5, :], svec, jnp.zeros_like(svec), jnp.zeros_like(svec)],
        axis=1,
    )
    dpair = _bwd_call(pair_feats, counts, starts, tileid, gvec, s)
    return dpair, None, None, None


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pair_gather(fmat, order, sorted_key, cand_keys, p_cap: int,
                rank_bits: int):
    """[N,16] features -> [p_cap+guard, 16] compacted depth-ordered pair
    rows, with a GATHER+SORT-ONLY custom VJP.

    Autodiff of the forward gathers would lower to TPU scatter-adds over
    the pair array (hundreds of ms). The transpose instead runs entirely
    on gathers and sorts:

    - the composite backward hands back gradients for exactly the rows
      gathered here (pair p at row p — a bijection);
    - the pair sort's inverse permutation is rebuilt with two payload
      sorts (sort-of-sort trick) — only when gradients flow, so
      forward-only rendering never pays for it;
    - each depth rank's candidate pairs are contiguous in unsorted
      candidate order, so the per-Gaussian reduction is a masked sum
      over R static slots;
    - the depth reordering is a permutation, inverted with one more
      payload sort.
    """
    fmat_sorted = fmat[order]
    rank = sorted_key[:p_cap] & ((1 << rank_bits) - 1)
    pf = fmat_sorted[rank]
    return jnp.concatenate(
        [pf, jnp.zeros((_GUARD, fmat.shape[1]), fmat.dtype)]
    )


def _pair_gather_fwd(fmat, order, sorted_key, cand_keys, p_cap, rank_bits):
    out = pair_gather(fmat, order, sorted_key, cand_keys, p_cap, rank_bits)
    return out, (order, cand_keys)


def _pair_gather_bwd(p_cap, rank_bits, res, g):
    order, cand_keys = res
    n = order.shape[0]
    p = cand_keys.size
    r = p // n
    keys_flat = cand_keys.reshape(p)
    iota_p = jnp.arange(p, dtype=jnp.int32)
    _, perm = jax.lax.sort((keys_flat, iota_p), num_keys=1)  # sorted->orig
    _, inv = jax.lax.sort((perm, iota_p), num_keys=1)  # orig->sorted pos
    # positions beyond the pair capacity land on guard rows, which are
    # zero by construction (never written by the backward kernel)
    pos = jnp.minimum(inv, p_cap + _GUARD - 1)
    dpr = g[pos]  # [P, 16] rows
    dfmat_sorted = jnp.sum(dpr.reshape(n, r, g.shape[1]), axis=1)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    _, inv_order = jax.lax.sort((order, iota_n), num_keys=1)
    dfmat = dfmat_sorted[inv_order]
    return dfmat, None, None, None


pair_gather.defvjp(_pair_gather_fwd, _pair_gather_bwd)


def _feature_matrix(prims):
    n = prims.depths.shape[0]
    return jnp.stack(
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


def _resolve_pair_capacity(n: int, r: int, cfg: RasterizeConfig,
                           pair_capacity: int | None) -> int:
    if pair_capacity is None:
        pair_capacity = min(n * r, cfg.pair_factor * n)
    return -(-pair_capacity // 128) * 128


def _pair_stage(means, scales, quats, features, opacities, alive, camera,
                background, sh_degree, cfg, scale_modifier, means2d_offset,
                tile_capacity, p_cap):
    """Projection + binning + pair compaction for one camera."""
    h, w = camera.height, camera.width
    tiles_x, tiles_y = w // cfg.tile, h // cfg.tile
    prims = project_gaussians(
        means, scales, quats, features, opacities, alive, camera,
        sh_degree, cfg, scale_modifier, means2d_offset,
    )
    pairs = build_pair_lists(
        prims, tiles_x, tiles_y, tile_capacity, cfg, pair_capacity=p_cap
    )
    fmat = _feature_matrix(prims)
    pair_feats = pair_gather(
        fmat, pairs.order, pairs.sorted_key, pairs.cand_keys, p_cap,
        pairs.rank_bits,
    )
    starts_c = jnp.minimum(pairs.starts[:-1], p_cap)
    return prims, pair_feats, pairs.counts, starts_c, pairs.overflow


def _assemble(acc, background, s: CompositeStatics, h, w):
    """[T, 8, PIX] accumulators -> image/depth/alpha dict entries."""
    acc_img = acc.reshape(s.tiles_y, s.tiles_x, 8, s.tile, s.tile)
    acc_img = acc_img.transpose(0, 3, 1, 4, 2).reshape(h, w, 8)
    t_fin = jnp.exp(acc_img[..., 5])
    image = acc_img[..., 0:3] + t_fin[..., None] * background[None, None, :]
    return {
        "image": image,
        "depth": acc_img[..., 3],
        "alpha": 1.0 - t_fin,
    }


def _make_statics(h, w, cfg: RasterizeConfig, interpret):
    tile = cfg.tile
    if h % tile or w % tile:
        raise ValueError(f"image {h}x{w} must be a multiple of tile {tile}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return CompositeStatics(
        tiles_x=w // tile,
        tiles_y=h // tile,
        tile=tile,
        pix=tile * tile,
        chunk=128,
        alpha_min=cfg.alpha_min,
        alpha_max=cfg.alpha_max,
        log_eps=math.log(cfg.transmittance_eps),
        interpret=bool(interpret),
    )


def _composite_maybe_sharded(pair_feats, counts, starts, tileid, s,
                             tile_shard):
    if tile_shard is None:
        return composite_tiles(pair_feats, counts, starts, tileid, s)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as _P

    mesh, axis = tile_shard
    n_shards = mesh.shape[axis]
    if counts.shape[0] % n_shards:
        raise ValueError(
            f"{counts.shape[0]} grid steps not divisible by {n_shards}"
        )

    def comp(pair_l, counts_l, starts_l, tileid_l):
        return composite_tiles(pair_l, counts_l, starts_l, tileid_l, s)

    # pair rows replicated (starts are absolute rows); grid axis sharded.
    # shard_map's transpose psums the replicated pair-row cotangent.
    return shard_map(
        comp, mesh=mesh,
        in_specs=(_P(None), _P(axis), _P(axis), _P(axis)),
        out_specs=_P(axis),
        check_rep=False,
    )(pair_feats, counts, starts, tileid)


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
    pair_capacity: int | None = None,
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
    composites its contiguous tile range against the shared pair array,
    and the image shards concatenate along the tile axis."""
    h, w = camera.height, camera.width
    if tile_capacity % 128:
        raise ValueError("tile_capacity must be a multiple of 128")
    s = _make_statics(h, w, cfg, interpret)
    n = means.shape[0]
    p_cap = _resolve_pair_capacity(n, cfg.rect_side**2, cfg, pair_capacity)

    prims, pair_feats, counts, starts_c, overflow = _pair_stage(
        means, scales, quats, features, opacities, alive, camera,
        background, sh_degree, cfg, scale_modifier, means2d_offset,
        tile_capacity, p_cap,
    )
    num_tiles = s.tiles_x * s.tiles_y
    tileid = jnp.arange(num_tiles, dtype=jnp.int32)
    acc = _composite_maybe_sharded(
        pair_feats, counts, starts_c, tileid, s, tile_shard
    )
    out = _assemble(acc, background, s, h, w)
    out.update(radii=prims.radii, visible=prims.visible, overflow=overflow)
    return out


def rasterize_tiled_batch(
    means,
    scales,
    quats,
    features,
    opacities,
    alive,
    cameras,  # Camera pytree with leading batch axis on array leaves
    background: jnp.ndarray,
    sh_degree: int = 0,
    cfg: RasterizeConfig = RasterizeConfig(),
    scale_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    tile_capacity: int = 4096,
    pair_capacity: int | None = None,
    interpret: bool | None = None,
    tile_shard=None,
):
    """Batched render over B cameras sharing one Gaussian scene.

    The reference renders its 8-camera batch in a sequential Python loop
    (GaussianDreamer.py:244); here the projection/binning stage is
    vmapped and the compositing kernel runs ONE flattened grid of
    B x tiles programs — a single kernel launch per training step, which
    is also what lets the tile axis shard cleanly across chips."""
    some_h = cameras.height
    some_w = cameras.width
    s = _make_statics(some_h, some_w, cfg, interpret)
    if tile_capacity % 128:
        raise ValueError("tile_capacity must be a multiple of 128")
    n = means.shape[0]
    p_cap = _resolve_pair_capacity(n, cfg.rect_side**2, cfg, pair_capacity)

    def stage(cam):
        return _pair_stage(
            means, scales, quats, features, opacities, alive, cam,
            background, sh_degree, cfg, scale_modifier, means2d_offset,
            tile_capacity, p_cap,
        )

    prims_b, pair_b, counts_b, starts_b, overflow_b = jax.vmap(stage)(cameras)
    b = counts_b.shape[0]
    rows = p_cap + _GUARD
    num_tiles = s.tiles_x * s.tiles_y
    pair_flat = pair_b.reshape(b * rows, _NF)
    starts_flat = (
        starts_b + (jnp.arange(b, dtype=jnp.int32) * rows)[:, None]
    ).reshape(-1)
    counts_flat = counts_b.reshape(-1)
    tileid = jnp.tile(jnp.arange(num_tiles, dtype=jnp.int32), b)
    acc = _composite_maybe_sharded(
        pair_flat, counts_flat, starts_flat, tileid, s, tile_shard
    )
    acc = acc.reshape(b, num_tiles, 8, s.pix)
    out = jax.vmap(lambda a: _assemble(a, background, s, some_h, some_w))(acc)
    out.update(
        radii=prims_b.radii,
        visible=prims_b.visible,
        overflow=jnp.sum(overflow_b),
    )
    return out
