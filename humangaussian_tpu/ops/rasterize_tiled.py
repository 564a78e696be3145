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
    -> bin (ops/binning.py, dual-class since round 4): one class-depth
       sort compacts big splats (rect > 2x2) into a static prefix so the
       candidate domain is ~2x smaller than side^2*N; then ONE 2-key
       (tile, exact-depth-bits) sort with (candidate, gaussian-id)
       payloads orders the candidate pairs; per-tile segments of the
       sorted order via searchsorted
    -> pair_gather: ONE row gather producing the compacted, depth-ordered
       pair-feature array, stored FEATURE-MAJOR [16, P_cap] (NO
       [tiles, K] table — v1 materialized a 64x-oversized static table
       in HBM; the pair array is sized by live pairs, not tiles x cap.
       A feature-payload variant with the rows riding the sort was
       measured SLOWER in round 4: payloads cost ~0.4 ns/elem each,
       benchmarks/probe_r4_sortcost.py)
    -> composite (THIS FILE): Pallas kernel, grid over tiles. Each tile
       program streams 256-lane windows of its contiguous pair segment
       from HBM with double-buffered async DMA (lane offsets
       128-aligned; the sub-window offset is absorbed by a dynamic lane
       rotate), bounded by the tile's live count, and STOPS EARLY once
       every pixel in the tile is saturated (the CUDA kernel's per-pixel
       early-out, lifted to whole-tile granularity).

The compositing math is the log-transmittance vectorized recurrence
documented in ops/rasterize_ref.py — oracle and kernel share the identity,
so they agree to float rounding. Per 128-pair chunk the kernel does VPU
work on [PIX, 128] panels plus two MXU matmuls (cumsum-by-triangular-ones
and feature accumulation).

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

Backward data path (no TPU scatter anywhere): each chunk's [16, 128]
pair-gradient block is DMA'd to a per-tile PAGE slot of a
[16*C_cap, 128] buffer (page_start[t] = starts[t]//128 + t allocates
disjoint page ranges by construction), then the rows are routed to
j-major CANDIDATE order by one of two statically-chosen paths
(measured crossover ~1.3M candidates, RasterizeConfig.bwd_routing):

- GATHER (small scenes): the candidate -> page-row index (pos2) is
  computed entirely ELEMENTWISE over the sorted order (segment begins
  via cummax) and carried back to candidate order by ONE 2-operand
  sort per camera, then a [P,16] row gather (~4.5 ns/index at <1M).
- SORT (post-densification scale): XLA's gather degrades to ~23
  ns/index once the page source falls out of cache, while the
  multi-payload sort scales smoothly (~0.4 ns/elem/payload,
  benchmarks/probe_r4_sortcost.py — NOT "nearly free" as round 3
  claimed, but still the winner at 2M+ candidates). The kernel
  writes each pair's candidate key (+1; 0 = never written, keeping the
  buffer psum-mergeable across tile shards) into feature row _FCAND,
  including key-only blocks for budget-dropped and post-saturation
  pairs, and ONE multi-payload sort of [page rows + dummy keys for
  uncovered candidates] lands the 10 gradient columns at exactly their
  candidate positions.

Either way the routing is paid only when gradients flow.

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
from humangaussian_tpu.ops.binning import build_pair_lists, resolve_class_blocks
from humangaussian_tpu.ops.projection import RasterizeConfig, project_gaussians

# feature-row layout of the [16, P] pair array. 16 = 10 live features +
# the candidate-key row + 5 zero rows — one full f32 sublane tile.
_FX, _FY, _FCA, _FCB, _FCC, _FR, _FG, _FB, _FOPA, _FDEPTH = range(10)
_FCAND = 10  # j-major candidate index as f32 (exact: cand < 2^24)
_NF = 16
_WIN = 256  # DMA window lanes (2 x chunk; absorbs the segment offset)


class CompositeStatics(NamedTuple):
    """Hashable static configuration for the compositing kernels."""

    tiles_x: int
    tiles_y: int
    tile: int  # pixel tile edge
    pix: int  # tile * tile
    chunk: int  # pairs per inner chunk (128)
    alpha_min: float
    alpha_max: float
    log_eps: float  # log of transmittance early-stop threshold
    interpret: bool
    panel_math: str = "exact"  # "exact" | "mxu" (see RasterizeConfig)
    cumsum_bf16: bool = False  # bf16-input transmittance cumsum (fast)


def _pixel_coords(t, s: CompositeStatics):
    """Per-tile pixel centers as [PIX,1] f32 columns (pix = py*tile+px).
    `t` is the tile id within its image (from the prefetched tileid
    array, so the same kernel serves sharded and camera-batched grids)."""
    ty = t // s.tiles_x
    tx = t % s.tiles_x
    lin = jax.lax.broadcasted_iota(jnp.int32, (s.pix, 1), 0)
    px = (tx * s.tile + lin % s.tile).astype(jnp.float32)
    py = (ty * s.tile + lin // s.tile).astype(jnp.float32)
    return px, py


def _tile_geom(t, s: CompositeStatics):
    """Per-program pixel geometry: pixel centers, the tile center, and
    (under panel_math="mxu" or in the backward) the tile-centered pixel
    monomial matrix [PIX, 6] = [1, px', py', px'^2, py'^2, px'py']."""
    px, py = _pixel_coords(t, s)
    cx = (t % s.tiles_x) * s.tile + (s.tile - 1) * 0.5
    cy = (t // s.tiles_x) * s.tile + (s.tile - 1) * 0.5
    pxl = px - cx
    pyl = py - cy
    mono = jnp.concatenate(
        [jnp.ones((s.pix, 1), jnp.float32), pxl, pyl,
         pxl * pxl, pyl * pyl, pxl * pyl],
        axis=1,
    )  # [PIX, 6]
    return dict(px=px, py=py, cx=cx, cy=cy, mono=mono)


def _lane_cumsum(x, g: int, bf16: bool = False):
    """Inclusive cumsum along the lane axis of [PIX, G] via an upper-
    triangular ones matmul — Mosaic has no cumsum primitive, and one
    [PIX,G]x[G,G] MXU pass beats a log-step shift chain anyway.

    With `bf16` the inputs are rounded to bf16 (f32 accumulation): 4x
    MXU throughput, input-rounding error only (the tri matrix is 0/1,
    exact in bf16)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    tri = (row <= col).astype(dt)
    return jax.lax.dot_general(
        x.astype(dt), tri, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _chunk_common(f, geom, kc, count, s: CompositeStatics):
    """Shared per-chunk quantities for forward and backward replay.

    `f` is a [NF, G] chunk of pair features; panels are [PIX, G].

    panel_math="exact": the conic quadratic is evaluated per pair-pixel
    on the VPU (bit-matches the oracle's direct form).
    panel_math="mxu": power[PIX,G] = mono[PIX,6] @ coef[6,G] — the
    quadratic expanded in tile-centered pixel monomials with per-pair
    coefficients, one MXU pass replacing ~11 VPU panel ops. Same
    reassociation class as the round-3 monomial backward; centering
    keeps |px'| < tile/2 so the expansion loses little precision
    (measured in NUMERICS.md)."""
    x = f[_FX : _FX + 1, :]
    y = f[_FY : _FY + 1, :]
    ca = f[_FCA : _FCA + 1, :]
    cb = f[_FCB : _FCB + 1, :]
    cc = f[_FCC : _FCC + 1, :]
    opa = f[_FOPA : _FOPA + 1, :]
    if s.panel_math == "mxu":
        xl = x - geom["cx"]  # [1, G]
        yl = y - geom["cy"]
        coef = jnp.concatenate(
            [
                -0.5 * ca * xl * xl - cb * xl * yl - 0.5 * cc * yl * yl,
                ca * xl + cb * yl,
                cc * yl + cb * xl,
                -0.5 * ca,
                -0.5 * cc,
                -cb,
            ],
            axis=0,
        )  # [6, G]
        power = jax.lax.dot_general(
            geom["mono"], coef, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [PIX, G]
    else:
        dxv = x - geom["px"]  # [PIX, G]
        dyv = y - geom["py"]
        power = -0.5 * (ca * dxv * dxv + cc * dyv * dyv) - cb * dxv * dyv
    expp = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = opa * expp
    alpha = jnp.minimum(alpha_raw, s.alpha_max)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s.chunk), 1)
    valid = (kc * s.chunk + lane) < count
    pass_ = valid & (power <= 0.0) & (alpha >= s.alpha_min)
    # Mosaic's VPU log/log1p approximation carries ~2.7e-4 relative
    # error (measured round 4; exp is ~4e-6) — accumulated into the
    # per-pixel log-transmittance that becomes w = T*alpha, that is a
    # 3-6e-3 IMAGE error vs the oracle. One Newton step through the
    # accurate exp (y' = y - 1 + s*exp(-y), quadratic convergence)
    # brings log1p back to exp-level accuracy for ~8 extra VPU
    # ops/pair-pixel. Interpret mode (CPU tests) takes the exact
    # libm path.
    a_gated = jnp.where(pass_, alpha, 0.0)
    if s.interpret:
        log1ma = jnp.where(pass_, jnp.log1p(-a_gated), 0.0)
    else:
        sm = 1.0 - a_gated  # >= 0.01 (alpha_max clamp): no cancellation
        y = jnp.log(sm)
        y = y - 1.0 + sm * jnp.exp(-y)
        log1ma = jnp.where(pass_, y, 0.0)
    return dict(
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


def _recurrence(c, log_t_u, log_t_f, s: CompositeStatics):
    """Front-to-back recurrence for one chunk (see module docstring).

    Two [PIX, 1] carried columns:
      log_t_u — UNFROZEN log T: accumulates every passing pair, so it is
        monotone non-increasing; "pixel not yet saturated at pair i"
        is then simply u_before_i + log1ma_i >= log_eps, with no
        separate per-pixel done latch (and no second prefix scan for
        it): once a pixel crosses the threshold, adding further
        non-positive log1ma terms can never raise it back (fp addition
        is monotone), which IS the CUDA kernel's done-latch semantics.
      log_t_f — FROZEN log T: accumulates only contributing pairs; this
        is the T the CUDA kernel reports at saturation (the output alpha
        and background blend use it).

    Returns t_i = exp(u_before) alongside w: the backward reuses it for
    the dalpha term instead of paying a second [PIX,G] exp."""
    cum = _lane_cumsum(c["log1ma"], s.chunk, s.cumsum_bf16)
    u_before = log_t_u + cum - c["log1ma"]
    contrib = c["pass_"] & (u_before + c["log1ma"] >= s.log_eps)
    # u_before == frozen log T for every contributing pair (they only
    # diverge after saturation, where w is masked to zero anyway)
    t_i = jnp.exp(u_before)
    w = jnp.where(contrib, t_i * c["alpha"], 0.0)
    new_u = log_t_u + cum[:, s.chunk - 1 : s.chunk]
    new_f = log_t_f + jnp.sum(
        jnp.where(contrib, c["log1ma"], 0.0), axis=1, keepdims=True
    )
    return w, contrib, t_i, new_u, new_f


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


def _lane_shift(window, off, s: CompositeStatics):
    """[NF, WIN] DMA window -> [NF, chunk] chunk starting at lane `off`
    (off < chunk, so the first `chunk` lanes of the rotate never wrap)."""
    if s.interpret:
        rolled = jnp.roll(window, -off, axis=1)
    else:
        shift = jnp.where(off > 0, _WIN - off, 0)
        rolled = pltpu.roll(window, shift, axis=1)
    return rolled[:, : s.chunk]


def _read_dma(pairs_hbm, buf, sem, base, kc, slot, s):
    """Async copy of the 128-aligned [NF, WIN] window for chunk kc."""
    lane0 = pl.multiple_of(base + kc * s.chunk, 128)
    return pltpu.make_async_copy(
        pairs_hbm.at[:, pl.ds(lane0, _WIN)],
        buf.at[slot],
        sem.at[slot],
    )


def _fwd_kernel(
    counts_ref, starts_ref, tileid_ref, pairs_hbm, out_ref,
    buf, logt_ref, logtu_ref, acc_ref, sem, *, s: CompositeStatics,
):
    """Per-pixel loop state (frozen/unfrozen log T, accumulators) lives
    in VMEM scratch, not loop carries — carrying ~130 vector registers
    through an scf loop trips Mosaic layout bugs and costs moves.

    (Round 3 measured a tile-GROUPED variant — M tiles per program with
    shared cumsum/cross matmuls on [M*PIX, G] panels, exact via
    block-diagonal operands: fwd got ~10% SLOWER at M=2 (per-chunk
    conditional-DMA and stacking overhead exceeds the ~2.6 us/program
    setup it amortizes) and the backward exceeded the 16 MB VMEM budget
    at M=2. Single-tile programs are the right shape here.)"""
    ti = pl.program_id(0)
    count = counts_ref[ti]
    start = starts_ref[ti]  # lane offset into the flat pair array
    t = tileid_ref[ti]
    off = jax.lax.rem(start, s.chunk)
    base = start - off
    nlive = pl.cdiv(count, s.chunk)
    geom = _tile_geom(t, s)

    logt_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)
    logtu_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)
    acc_ref[:, :] = jnp.zeros((8, s.pix), jnp.float32)

    @pl.when(nlive > 0)
    def _():
        _read_dma(pairs_hbm, buf, sem, base, 0, 0, s).start()

    def cond(carry):
        kc, stop = carry
        return jnp.logical_and(kc < nlive, jnp.logical_not(stop))

    def body(carry):
        kc, _ = carry
        slot = jax.lax.rem(kc, 2)
        _read_dma(pairs_hbm, buf, sem, base, kc, slot, s).wait()

        @pl.when(kc + 1 < nlive)
        def _():
            _read_dma(
                pairs_hbm, buf, sem, base, kc + 1, jax.lax.rem(kc + 1, 2), s
            ).start()

        f = _lane_shift(buf[slot], off, s)  # [NF, G]
        c = _chunk_common(f, geom, kc, count, s)
        w, _contrib, _ti, new_u, new_f = _recurrence(
            c, logtu_ref[:, :], logt_ref[:, :], s
        )
        acc_ref[:, :] += jax.lax.dot_general(
            _feat_matrix(f, s),
            w,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, PIX] — channel-major so the 1024-wide pixel axis is the
        # minor (lane) dim of the output; a [.., PIX, 8] layout would be
        # lane-padded 8->128 by XLA (16x HBM) at training batch sizes
        logt_ref[:, :] = new_f
        logtu_ref[:, :] = new_u
        # whole-tile early stop: every pixel saturated => remaining
        # (deeper) pairs are invisible. CUDA does this per pixel; one
        # flag per tile is the vectorized equivalent. Saturation is read
        # off the unfrozen log T (monotone), no latch state needed.
        all_done = jnp.sum(
            (new_u < s.log_eps).astype(jnp.float32)
        ) > (s.pix - 0.5)
        return kc + 1, all_done

    kfin, stopped = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(False))
    )

    # a prefetch for chunk kfin may be in flight after an early stop
    @pl.when(jnp.logical_and(stopped, kfin < nlive))
    def _():
        _read_dma(
            pairs_hbm, buf, sem, base, kfin, jax.lax.rem(kfin, 2), s
        ).wait()

    # channel rows: 0-2 rgb, 3 depth, 4 sum(w), 5 log T_final,
    # 6 executed-chunk count (early-stop diagnostics), 7 zero
    out_ref[0] = jnp.concatenate(
        [
            acc_ref[0:5, :],
            logt_ref[:, :].reshape(1, s.pix),
            jnp.full((1, s.pix), kfin.astype(jnp.float32)),
            jnp.zeros((1, s.pix), jnp.float32),
        ],
        axis=0,
    )


def _bwd_kernel(
    counts_ref, starts_ref, tileid_ref, pagestart_ref, lens_ref, pairs_hbm,
    gvec_ref, _init_hbm, dpaged_hbm, buf, wbuf, done_ref, prefix_ref,
    sem, wsem, *, s: CompositeStatics, sort_routing: bool,
):
    """Backward replay. Every page block carries, in row _FCAND, the
    j-major CANDIDATE KEY of each lane (from the pair array; lanes
    outside this tile's segment get the sentinel) — the glue then routes
    gradient rows to candidate order with ONE multi-payload sort instead
    of a pos2 carry-back sort + a P-sized row gather (XLA's gather is
    ~23 ns/index at training scale; a 17-operand sort is ~3 ns/element,
    benchmarks/probe_segsum.py round 3).

    The loop runs over nlive_w = cdiv(len, chunk) blocks (len = the
    budget-clamped SEGMENT length >= count): blocks past the live count
    or past pixel saturation skip the math but still write their key
    rows (zero grads), so every in-budget candidate position is covered
    exactly once — the invariant the sort routing needs."""
    ti = pl.program_id(0)
    count = counts_ref[ti]
    start = starts_ref[ti]
    t = tileid_ref[ti]
    pstart = pagestart_ref[ti]
    seg_len = lens_ref[ti]
    off = jax.lax.rem(start, s.chunk)
    base = start - off
    nlive = pl.cdiv(count, s.chunk)
    # sort routing must WRITE key blocks for every in-budget candidate
    # (nlive_w = cdiv(len, chunk) >= nlive); gather routing only needs
    # the live blocks
    nloop = pl.cdiv(seg_len, s.chunk) if sort_routing else nlive
    geom = _tile_geom(t, s)
    g8t = gvec_ref[0]  # [8, PIX]: rows 0-4 output cotangents, row 5 = S
    svec = g8t[5:6, :].reshape(s.pix, 1)

    # tile-centered pixel monomials [PIX, 6]: 1, px', py', px'^2, py'^2,
    # px'py'. The five dpow-weighted pixel reductions (means2d + conic
    # grads) are linear combinations of S_k = sum_p dpow * m_k(p), so one
    # [PIX,6]x[PIX,G] MXU pass per chunk replaces ~18 VPU panel ops and 5
    # panel reductions. Centering keeps the monomial magnitudes small
    # (px' in [-T/2, T/2)) so the expanded form loses little precision
    # (measured <= ~1.4e-5 of the max-grad scale vs the direct per-pixel
    # products — the same order as the CUDA backward's nondeterministic
    # atomicAdd accumulation).
    cx = geom["cx"]
    cy = geom["cy"]
    mono = geom["mono"]

    done_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)
    prefix_ref[:, :] = jnp.zeros((s.pix, 1), jnp.float32)

    @pl.when(nloop > 0)
    def _():
        _read_dma(pairs_hbm, buf, sem, base, 0, 0, s).start()

    def wdma(slot, kc):
        # page slot pstart+kc is OWNED by this tile (page_start
        # allocation is disjoint by construction — module docstring)
        return pltpu.make_async_copy(
            wbuf.at[slot],
            dpaged_hbm.at[pl.ds((pstart + kc) * _NF, _NF), :],
            wsem.at[slot],
        )

    def body(kc, stopped):
        slot = jax.lax.rem(kc, 2)
        _read_dma(pairs_hbm, buf, sem, base, kc, slot, s).wait()

        @pl.when(kc + 1 < nloop)
        def _():
            _read_dma(
                pairs_hbm, buf, sem, base, kc + 1, jax.lax.rem(kc + 1, 2), s
            ).start()

        # the write buffer slot is reused every 2 chunks
        @pl.when(kc >= 2)
        def _():
            wdma(slot, kc - 2).wait()

        f = _lane_shift(buf[slot], off, s)
        # keys are stored +1 so that 0 means "never written" — page
        # buffers merge across tile shards by psum, so the init value
        # must be additive-identity zero (the glue maps 0 back to the
        # sort sentinel)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, s.chunk), 1)
        seg_mask = (kc * s.chunk + lane) < seg_len
        key_row = jnp.where(
            seg_mask, f[_FCAND : _FCAND + 1, :] + 1.0, 0.0
        )
        live = jnp.logical_and(kc < nlive, jnp.logical_not(stopped))

        @pl.when(live)
        def _():
            c = _chunk_common(f, geom, kc, count, s)
            # the frozen log T is not needed in the backward (no image
            # output); pass u for both carries and ignore new_f
            w, contrib, t_i, new_u, _new_f = _recurrence(
                c, done_ref[:, :], done_ref[:, :], s
            )
            featm = _feat_matrix(f, s)  # [8, G]; rows 5-7 zero
            phi = jax.lax.dot_general(
                g8t, featm, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [PIX, G]
            wphi = w * phi
            # gradient-carrying prefix: always f32 (see _lane_cumsum)
            p_incl = prefix_ref[:, :] + _lane_cumsum(wphi, s.chunk)
            inv_1ma = 1.0 / jnp.maximum(1.0 - c["alpha"], 1e-6)
            dalpha = jnp.where(
                contrib, t_i * phi - (svec - p_incl) * inv_1ma, 0.0
            )
            dalpha_raw = jnp.where(
                c["alpha_raw"] < s.alpha_max, dalpha, 0.0
            )
            # dalpha_raw * alpha_raw == dalpha_raw * opa * expp up to one
            # rounding; alpha_raw is already materialized
            dpow = jnp.where(
                c["power"] < 0.0, dalpha_raw * c["alpha_raw"], 0.0
            )

            dcg = jax.lax.dot_general(
                g8t, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8, G): rows 0-2 = drgb, row 3 = ddepth
            # pixel-monomial reduction (see mono above): S_k = sum_p
            # dpow * m_k(p') in tile-centered coords; dxv = xl - pxl, so
            #   sum dpow*dxv      = xl*S0 - S1x
            #   sum dpow*dxv^2    = xl^2*S0 - 2*xl*S1x + S2x
            #   sum dpow*dxv*dyv  = xl*yl*S0 - xl*S1y - yl*S1x + Sxy
            # — all on [1, G] rows instead of [PIX, G] panels.
            smat = jax.lax.dot_general(
                mono, dpow, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [6, G]
            s0 = smat[0:1, :]
            s1x = smat[1:2, :]
            s1y = smat[2:3, :]
            s2x = smat[3:4, :]
            s2y = smat[4:5, :]
            sxy = smat[5:6, :]
            xl = f[_FX : _FX + 1, :] - cx
            yl = f[_FY : _FY + 1, :] - cy
            gx = xl * s0 - s1x  # sum_p dpow * dxv
            gy = yl * s0 - s1y  # sum_p dpow * dyv
            # dopacity = sum_p dalpha_raw * expp, UNGATED by the
            # power<0 gate (a pair whose power lands exactly at 0.0
            # still passes the forward gate with expp=1 and contributes
            # to the opacity gradient). The mxu path used to derive this
            # as s0/opa from the gated dpow sum, silently dropping that
            # boundary contribution (round-4 advisor finding); the exact
            # panel reduction is correct in both modes and the extra
            # [PIX,G] product is noise next to the mxu mode's own
            # (measured-slower, non-default) panel matmuls.
            dopa_row = jnp.sum(
                dalpha_raw * c["expp"], axis=0, keepdims=True
            )
            # masked lanes (beyond count / non-contributing) are exactly
            # zero here.
            wbuf[slot] = jnp.concatenate(
                [
                    -(c["ca"] * gx + c["cb"] * gy),  # dmu_x
                    -(c["cc"] * gy + c["cb"] * gx),  # dmu_y
                    -0.5 * (xl * xl * s0 - 2.0 * xl * s1x + s2x),  # dcon_a
                    -(xl * yl * s0 - xl * s1y - yl * s1x + sxy),  # dcon_b
                    -0.5 * (yl * yl * s0 - 2.0 * yl * s1y + s2y),  # dcon_c
                    dcg[0:3, :],  # drgb
                    dopa_row,  # dopacity
                    dcg[3:4, :],  # ddepth
                    key_row,  # candidate keys for the sort routing
                    jnp.zeros((_NF - 11, s.chunk), jnp.float32),
                ],
                axis=0,
            )  # [NF, G]
            done_ref[:, :] = new_u  # unfrozen log T doubles as done
            prefix_ref[:, :] = prefix_ref[:, :] + jnp.sum(
                wphi, axis=1, keepdims=True
            )

        @pl.when(jnp.logical_not(live))
        def _():
            # key-only block: candidates past the live count (budget /
            # K-cap drops) or past whole-tile saturation contribute zero
            # gradient but must still claim their sort positions
            wbuf[slot] = jnp.concatenate(
                [
                    jnp.zeros((_FCAND, s.chunk), jnp.float32),
                    key_row,
                    jnp.zeros((_NF - 11, s.chunk), jnp.float32),
                ],
                axis=0,
            )

        wdma(slot, kc).start()
        # whole-tile early stop for the COMPUTE only (key blocks keep
        # writing under sort routing): saturation read off the monotone
        # unfrozen log T
        return stopped | (
            jnp.sum((done_ref[:, :] < s.log_eps).astype(jnp.float32))
            > (s.pix - 0.5)
        )

    if sort_routing:
        # every in-budget block must write its key row, so the loop runs
        # to nloop = nlive_w even past saturation (key-only blocks)
        jax.lax.fori_loop(0, nloop, body, jnp.bool_(False))
        kfin = nloop
    else:
        # gather routing reads page rows by position and never touches
        # beyond-count pages: keep the whole-tile early EXIT
        def cond_w(carry):
            kc, stop = carry
            return jnp.logical_and(kc < nloop, jnp.logical_not(stop))

        def body_w(carry):
            kc, stopped = carry
            return kc + 1, body(kc, stopped)

        kfin, _stopped = jax.lax.while_loop(
            cond_w, body_w, (jnp.int32(0), jnp.bool_(False))
        )
        # a prefetch for chunk kfin may be in flight after an early stop
        @pl.when(kfin < nloop)
        def _():
            _read_dma(
                pairs_hbm, buf, sem, base, kfin, jax.lax.rem(kfin, 2), s
            ).wait()

    # drain outstanding writes before the grid advances
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, 8, s.pix), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _NF, _WIN), jnp.float32),  # DMA double buffer
            pltpu.VMEM((s.pix, 1), jnp.float32),  # log T
            pltpu.VMEM((s.pix, 1), jnp.float32),  # stop latch
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


def _bwd_call(pair_feats, counts, starts, tileid, pagestart, lens, gvec,
              c_cap, s: CompositeStatics, sort_routing: bool):
    g = counts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # pair features
            pl.BlockSpec(
                (1, 8, s.pix), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # init (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, _NF, _WIN), jnp.float32),  # read buffer
            pltpu.VMEM((2, _NF, s.chunk), jnp.float32),  # write buffer
            pltpu.VMEM((s.pix, 1), jnp.float32),  # unfrozen log T
            pltpu.VMEM((s.pix, 1), jnp.float32),  # prefix sum(w*phi)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # pages never written by any tile (beyond-budget tails, guard pages)
    # must read as zero grads with zero keys (mapped to the sort sentinel
    # in the glue — zero init keeps the buffer additive-identity for the
    # tile-shard psum merge): alias zeros into the output so the kernel
    # only overwrites live page slots.
    init = jnp.zeros((c_cap * _NF, s.chunk), jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, s=s, sort_routing=sort_routing),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c_cap * _NF, s.chunk), jnp.float32),
        input_output_aliases={7: 0},  # init input (5 scalars + 2) -> out
        interpret=s.interpret,
    )(counts, starts, tileid, pagestart, lens, pair_feats, gvec, init)


def _shard_call(fn, args, tile_shard, psum_out=False):
    """Run a composite kernel either directly or under shard_map over the
    flattened grid axis. args[0] is the pair array (replicated); all
    other args are per-grid-step and shard along the grid axis. With
    `psum_out` the (partial, disjoint-rows) output is all-reduced."""
    if tile_shard is None:
        return fn(*args)
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as _P

    mesh, axis = tile_shard
    in_specs = (_P(None),) + tuple(_P(axis) for _ in args[1:])

    def wrapped(*xs):
        out = fn(*xs)
        if psum_out:
            out = jax.lax.psum(out, axis)
        return out

    return shard_map(
        wrapped, mesh=mesh, in_specs=in_specs,
        out_specs=_P(None) if psum_out else _P(axis),
        check_rep=False,
    )(*args)


# ---------------------------------------------------------------------------
# backward sort routing: per-position coverage + candidate keys, computed
# elementwise over the sorted pair order (see _bwd_kernel docstring).
# ---------------------------------------------------------------------------


def _seg_positions(stile, p_cap, k_cap, num_tiles):
    """Batched [B, P] sorted tile ids -> flattened segment geometry:
    (begin_c, offset, cnt, seg_ok) each [B*P], all CAMERA-LOCAL and
    budget-clamped exactly like binning's counts/lens.

    Everything runs on FLATTENED [B*P] 1-D arrays (vmapped recurrences
    get a hostile [1,P] layout from XLA); the segment cummax flattens
    safely because every camera's first element is forced to be a
    segment start."""
    b, p = stile.shape
    tot = b * p
    flat_idx = jnp.arange(tot, dtype=jnp.int32)
    cam = flat_idx // p
    t_p = stile.reshape(tot)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), t_p[1:] != t_p[:-1]]
    ) | ((flat_idx % p) == 0)
    seg_begin = jax.lax.cummax(jnp.where(is_first, flat_idx, -1), axis=0)
    # exclusive-from-the-right min of segment-start positions = seg end
    starts_pos = jnp.where(is_first, flat_idx, tot)
    rev_min = jax.lax.cummin(starts_pos[::-1], axis=0)[::-1]
    seg_end = jnp.concatenate([rev_min[1:], jnp.full((1,), tot, jnp.int32)])
    seg_len = seg_end - seg_begin
    begin_c = jnp.minimum(seg_begin - cam * p, p_cap)  # camera-local
    cnt = jnp.minimum(jnp.minimum(seg_len, k_cap), p_cap - begin_c)
    offset = flat_idx - seg_begin
    # budget clamp identical to binning's `lens`: offset < len means the
    # backward kernel wrote (or zero-init covers) this position's page
    # row
    seg_ok = (offset < (p_cap - begin_c)) & (t_p < num_tiles)
    return t_p, begin_c, offset, cnt, seg_ok


def _pos2_candidate_order(stile, cand, p_cap, c_cap, k_cap, num_tiles):
    """Batched: sorted tile ids / candidate indices [B, P] -> pos2 [B*P]
    CAMERA-LOCAL page-row indices (each value < c_cap*128, indexing that
    camera's own page block; never-written rows land on the camera's
    local guard page), in (camera, j-major candidate) order.
    Camera-local values let the backward gather one camera's rows at a
    time, bounding the 8x lane-padded [*,16] transients to a single
    camera."""
    b, p = stile.shape
    t_p, begin_c, offset, cnt, _seg_ok = _seg_positions(
        stile, p_cap, k_cap, num_tiles)
    valid = (offset < cnt) & (t_p < num_tiles)
    zero_row = c_cap * 128 - 1  # camera-local guard page, never written
    page = (begin_c >> 7) + t_p  # camera-local first page of the tile
    # ONE 2-operand (cand, pos2) sort per camera carries pos2 back to
    # j-major candidate order (cand is a permutation of [0, dom) per
    # camera — every candidate, valid or culled, appears exactly once)
    pos2_sorted = jnp.where(valid, page * 128 + offset, zero_row)
    cflat = cand.reshape(b * p)
    parts = []
    for ci in range(b):  # unrolled: per-camera 1-D sorts
        _, pc = jax.lax.sort(
            (cflat[ci * p : (ci + 1) * p],
             pos2_sorted[ci * p : (ci + 1) * p]),
            num_keys=1,
        )
        parts.append(pc)
    return jnp.concatenate(parts) if b > 1 else parts[0]


def _coverage(stile, p_cap, num_tiles):
    """Batched: sorted tile ids [B, P] -> covered [B*P] bool: True iff
    the backward kernel wrote a page row carrying that sorted position's
    candidate key (position inside its tile's budget-clamped segment);
    uncovered positions get DUMMY rows in the sort routing so every
    candidate index appears exactly once."""
    _t, _b, _o, _c, seg_ok = _seg_positions(stile, p_cap, 1 << 30,
                                            num_tiles)
    return seg_ok


# ---------------------------------------------------------------------------
# render core: one custom_vjp spanning gather + composite, batch-aware
# ---------------------------------------------------------------------------


class _CoreStatics(NamedTuple):
    s: CompositeStatics
    p_cap: int
    lanes: int  # padded lane count of one camera's pair array
    c_cap: int  # pages per camera in the backward buffer
    k_cap: int  # tile_capacity
    num_tiles: int
    n_cap: int  # active (class, depth)-rank cap
    blocks: tuple  # static ((w, h, cap), ...) class-block chain
    dom: int  # candidate domain = sum_k w_k*h_k*cap_k
    sort_routing: bool  # backward carry: multi-payload sort vs gather


def _reduce_candidates(dpr, cs: _CoreStatics):
    """[dom, 16] candidate-order gradient rows -> [n_cap, 16] rows in
    (class, depth) order: one static reshape-sum per class block (the
    j-major layout makes the per-Gaussian segment sum shape-static)."""
    parts = []
    off = 0
    for bw, bh, cap in cs.blocks:
        sz = bw * bh * cap
        parts.append(jnp.sum(
            dpr[off:off + sz].reshape(bw * bh, cap, _NF), axis=0))
        off += sz
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _build_pair_t(fmat_t, gid, cand, cs: _CoreStatics):
    """[16, N] feature-major features -> [16, lanes] compacted pair
    array for ONE camera.

    Gather-cost model (measured, benchmarks/probe_gather_scale.py +
    in-situ XPlane traces): XLA's TPU gather is INDEX-serialized
    (~9 ns/index) regardless of slice width, so one [S,16] row gather
    per index set is optimal — 16 separate 1-D gathers do NOT fuse in
    situ and pay the traversal 16x. Row-major [*,16] f32 arrays are
    lane-padded 16->128 (8x HBM), so they must stay TRANSIENT and
    per-camera (this function is called once per camera, unrolled):
    peak padded footprint is one camera's [p_cap,16] (~1 GB at full
    519k capacity), never the [B*P,16] resident (9 GB) that stalled
    full-scale training.

    (A feature-payload variant — the 10 feature rows riding the binning
    sort, no gather at all — was built and measured SLOWER in round 4:
    payload operands cost ~0.12 ms each per 400k elements
    (benchmarks/probe_r4_sortcost.py), so a 10-payload sort loses to
    this gather below the gather's ~1.3M cache crossover.)"""
    pf = fmat_t.T[gid[: cs.p_cap]]  # [p_cap, 16] transient
    pt = jnp.pad(pf.T, ((0, 0), (0, cs.lanes - cs.p_cap)))
    # row _FCAND: each sorted pair's j-major candidate index as f32 (a
    # binning sort payload) — the backward kernel copies it into the
    # page rows so the routing sort can key on it
    cr = jnp.pad(cand[: cs.p_cap].astype(jnp.float32),
                 (0, cs.lanes - cs.p_cap),
                 constant_values=float(cs.dom))
    return pt.at[_FCAND, :].set(cr)


def _assemble_pairs(fmat_t, gid, cand, starts_c, counts, cs):
    """Per-camera (unrolled) pair build + camera-flat lane addressing,
    shared by the primal and the VJP forward."""
    b = fmat_t.shape[0]
    pair_t = jnp.stack([
        _build_pair_t(fmat_t[i], gid[i], cand[i], cs)
        for i in range(b)
    ])  # [B, 16, lanes]
    pair_flat = jnp.transpose(pair_t, (1, 0, 2)).reshape(_NF, b * cs.lanes)
    lane_base = (jnp.arange(b, dtype=jnp.int32) * cs.lanes)[:, None]
    starts_flat = (starts_c + lane_base).reshape(-1)
    return pair_flat, counts.reshape(-1), starts_flat


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _render_core(fmat_t, order, gid, stile, cand, starts_c, counts,
                 lens, tileid, cs: _CoreStatics, tile_shard):
    """Batched: fmat_t [B,16,N] (FEATURE-MAJOR — row-major [N,16] would
    be lane-padded 16->128 by XLA, 8x HBM), order [B,N] (class-depth
    order), stile/cand/gid [B,P] (binning sort outputs), starts_c [B,T]
    (lane offsets, clamped), counts/lens [B,T], tileid [B*T]
    -> acc [B*T, 8, PIX]."""
    pair_flat, counts_flat, starts_flat = _assemble_pairs(
        fmat_t, gid, cand, starts_c, counts, cs
    )
    return _shard_call(
        lambda pf, c, st, ti: _fwd_call(pf, c, st, ti, cs.s),
        (pair_flat, counts_flat, starts_flat, tileid),
        tile_shard,
    )


def _render_core_fwd(fmat_t, order, gid, stile, cand, starts_c,
                     counts, lens, tileid, cs, tile_shard):
    pair_flat, counts_flat, starts_flat = _assemble_pairs(
        fmat_t, gid, cand, starts_c, counts, cs
    )
    out = _shard_call(
        lambda pf, c, st, ti: _fwd_call(pf, c, st, ti, cs.s),
        (pair_flat, counts_flat, starts_flat, tileid),
        tile_shard,
    )
    # keep the compacted pair array as a residual: rebuilding it in the
    # backward costs a second [P_cap] gather + transpose
    return out, (pair_flat, order, stile, cand, starts_c, counts,
                 lens, tileid, out)


def _render_core_bwd(cs: _CoreStatics, tile_shard, res, g_out):
    (pair_flat, order, stile, cand, starts_c, counts, lens, tileid,
     out) = res
    b, n = order.shape
    assert cs.dom < (1 << 24), (
        f"candidate keys ride an f32 feature row; domain {cs.dom} "
        "exceeds exact-int f32 range"
    )
    lane_base = (jnp.arange(b, dtype=jnp.int32) * cs.lanes)[:, None]
    starts_flat = (starts_c + lane_base).reshape(-1)
    counts_flat = counts.reshape(-1)
    lens_flat = lens.reshape(-1)
    t_local = jnp.tile(
        jnp.arange(cs.num_tiles, dtype=jnp.int32), b
    )
    page_base = (jnp.arange(b, dtype=jnp.int32) * cs.c_cap)[:, None]
    pagestart = (
        (starts_c >> 7) + jnp.arange(cs.num_tiles, dtype=jnp.int32)[None, :]
        + page_base
    ).reshape(-1)

    # S = sum_j w_j phi_j + g_logT, phi from the 5 live channel rows.
    # Everything stays [G, ch, PIX] (pixel minor) — a [.., PIX, ch]
    # layout would be lane-padded ch->128 by XLA (16x HBM)
    phi_tot = jnp.sum(out[:, 0:5, :] * g_out[:, 0:5, :], axis=1)
    svec = (phi_tot + g_out[:, 5, :])[:, None, :]
    gvec = jnp.concatenate(
        [g_out[:, 0:5, :], svec, jnp.zeros_like(svec), jnp.zeros_like(svec)],
        axis=1,
    )

    dpaged = _shard_call(
        lambda pf, c, st, ti, ps, ln, gv: _bwd_call(
            pf, c, st, ti, ps, ln, gv, b * cs.c_cap, cs.s, cs.sort_routing
        ),
        (pair_flat, counts_flat, starts_flat, t_local, pagestart,
         lens_flat, gvec),
        tile_shard,
        psum_out=True,
    )
    # inverse of the class-depth order (batch-flat sort, camera-local)
    iota_bn = jnp.arange(b * n, dtype=jnp.int32)
    okeys = (iota_bn // n) * n + order.reshape(b * n)
    _, inv_order = jax.lax.sort((okeys, iota_bn), num_keys=1)
    inv_local = inv_order.reshape(b, n) - (
        jnp.arange(b, dtype=jnp.int32) * n
    )[:, None]

    if cs.sort_routing:
        # SORT ROUTING (round 3): page rows carry their candidate key in
        # row _FCAND; one multi-payload sort of [page rows + dummy keys
        # for uncovered candidates] lands the 10 gradient columns at
        # exactly their j-major candidate positions. XLA's row gather
        # degrades to ~23 ns/index at the 2M-candidate training scale —
        # past the ~1.3M-candidate crossover this beats the gather
        # branch below despite the ~0.4 ns/elem/payload sort surcharge
        # (benchmarks/probe_r4_sortcost.py).
        covered = _coverage(stile, cs.p_cap, cs.num_tiles).reshape(b, -1)
        cand_f = cand.astype(jnp.float32)
        zeros_p = jnp.zeros((cs.dom,), jnp.float32)
        dfmat_cams = []
        for i in range(b):
            pages = dpaged[i * cs.c_cap * _NF : (i + 1) * cs.c_cap * _NF]
            pg3 = pages.reshape(cs.c_cap, _NF, 128)
            raw = pg3[:, _FCAND, :].reshape(-1)  # [c_cap*128] f32, cand+1
            keys_pg = jnp.where(raw > 0.0, raw - 1.0, float(cs.dom))
            dummy = jnp.where(covered[i], float(cs.dom), cand_f[i])
            ops = [jnp.concatenate([keys_pg, dummy])]
            for k in range(10):
                ops.append(
                    jnp.concatenate([pg3[:, k, :].reshape(-1), zeros_p])
                )
            srt = jax.lax.sort(tuple(ops), num_keys=1)
            # positions [0, dom) hold exactly candidate c's gradient
            # row (real page row if the kernel wrote it, zero dummy
            # otherwise); reduce column-wise (a [dom, 16] row-major
            # stack would be lane-padded 16->128: ~0.5 GB transient)
            red = [jnp.sum(_reduce_cols(c[: cs.dom], cs), axis=0)
                   for c in srt[1:]]
            dsorted = jnp.stack(
                red + [jnp.zeros((cs.n_cap,), jnp.float32)] * (_NF - 10),
                axis=-1,
            )  # [n_cap, 16]
            if cs.n_cap < n:
                dsorted = jnp.pad(dsorted, ((0, n - cs.n_cap), (0, 0)))
            dfmat_cams.append(dsorted[inv_local[i]].T)  # [16, N]
    else:
        # GATHER ROUTING: candidate-order gather + per-Gaussian reduce.
        # The pos2 sort runs camera-flat 1-D (vmapped sorts get a
        # hostile [1,P] layout); the row GATHERS run per camera,
        # unrolled: row-major [*,16] f32 is lane-padded 16->128 (8x HBM)
        # — per-camera keeps those transients at one camera's size
        # instead of materializing a B-camera 9 GB resident.
        pos2 = _pos2_candidate_order(
            stile, cand, cs.p_cap, cs.c_cap, cs.k_cap, cs.num_tiles,
        ).reshape(b, -1)  # [B, dom] camera-local page rows, j-major
        dfmat_cams = []
        for i in range(b):
            pages = dpaged[i * cs.c_cap * _NF : (i + 1) * cs.c_cap * _NF]
            rows = (
                pages.reshape(cs.c_cap, _NF, 128)
                .transpose(0, 2, 1)
                .reshape(cs.c_cap * 128, _NF)
            )  # transient, one camera
            dpr = rows[pos2[i]]  # [dom, 16] transient
            dsorted = _reduce_candidates(dpr, cs)
            if cs.n_cap < n:
                dsorted = jnp.pad(dsorted, ((0, n - cs.n_cap), (0, 0)))
            dfmat_cams.append(dsorted[inv_local[i]].T)  # [16, N]
    dfmat_t = jnp.stack(dfmat_cams)  # [B, 16, N]
    return dfmat_t, None, None, None, None, None, None, None, None


def _reduce_cols(col, cs: _CoreStatics):
    """[dom] candidate-order column -> [k, n_cap]-compatible stack for
    summing: returns a [k, n_cap] array whose axis-0 sum is the
    per-Gaussian reduction (k = max slots over class blocks). Used by
    the sort-routing branch where gradients arrive as separate columns."""
    parts = []
    off = 0
    for bw, bh, cap in cs.blocks:
        sz = bw * bh * cap
        parts.append(col[off:off + sz].reshape(bw * bh, cap))
        off += sz
    if len(parts) == 1:
        return parts[0]
    # pad slot axes to a common k, concat along the rank axis
    k = max(p.shape[0] for p in parts)
    parts = [jnp.pad(p, ((0, k - p.shape[0]), (0, 0))) for p in parts]
    return jnp.concatenate(parts, axis=1)


_render_core.defvjp(_render_core_fwd, _render_core_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def _feature_matrix(prims):
    """FEATURE-MAJOR [16, N]: the lane axis is the Gaussian count, so
    nothing here (nor any cotangent flowing back through the stack) is
    lane-padded; a [N, 16] layout costs 8x HBM on TPU."""
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
        axis=0,
    )  # [16, N]


def _resolve_pair_capacity(n: int, r: int, cfg: RasterizeConfig,
                           pair_capacity: int | None) -> int:
    if pair_capacity is None:
        pair_capacity = min(n * r, cfg.pair_factor * n)
    return -(-pair_capacity // 128) * 128


def _make_statics(h, w, cfg: RasterizeConfig, interpret):
    tile = cfg.tile
    if h % tile or w % tile:
        raise ValueError(f"image {h}x{w} must be a multiple of tile {tile}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if cfg.panel_math not in ("exact", "mxu"):
        raise ValueError(f"unknown panel_math {cfg.panel_math!r}")
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
        panel_math=cfg.panel_math,
        cumsum_bf16=cfg.cumsum_bf16,
    )


def _core_statics(n, h, w, cfg, tile_capacity, pair_capacity, interpret,
                  active_cap=None):
    s = _make_statics(h, w, cfg, interpret)
    if tile_capacity % 128:
        raise ValueError("tile_capacity must be a multiple of 128")
    n_cap = n if active_cap is None else min(active_cap, n)
    num_tiles = s.tiles_x * s.tiles_y
    blocks = resolve_class_blocks(n_cap, cfg)
    dom = sum(w * h * c for (w, h, c) in blocks)
    p_cap = _resolve_pair_capacity(n_cap, cfg.rect_side**2, cfg,
                                   pair_capacity)
    # the dual-class domain can undercut the requested budget; the pair
    # array slices the sorted order, so the budget can never exceed dom
    if dom < 128:
        raise ValueError(
            f"candidate domain {dom} < 128 (n_cap {n_cap} too small for "
            "the 128-lane pair layout); pad the scene capacity"
        )
    p_cap = min(max(128, min(p_cap, dom) // 128 * 128), dom)
    lanes = -(-(p_cap + 2 * _WIN) // 128) * 128
    c_cap = p_cap // 128 + num_tiles + 2  # +guard pages (incl. zero row)
    if cfg.bwd_routing == "auto":
        # measured crossover (BENCH.md round 3): XLA's row gather costs
        # 4.5 ns/idx at ~900k candidates but 23 ns/idx at ~2M (source
        # falls out of cache), while the multi-payload sort scales
        # smoothly — the sort routing wins past ~1.3M candidates
        sort_routing = dom >= 1_300_000
    else:
        sort_routing = cfg.bwd_routing == "sort"
    return _CoreStatics(
        s=s, p_cap=p_cap, lanes=lanes, c_cap=c_cap, k_cap=tile_capacity,
        num_tiles=num_tiles, n_cap=n_cap, blocks=blocks, dom=dom,
        sort_routing=sort_routing,
    )


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


def _bin_one(means, scales, quats, features, opacities, alive, camera,
             sh_degree, cfg, scale_modifier, means2d_offset,
             cs: _CoreStatics):
    prims = project_gaussians(
        means, scales, quats, features, opacities, alive, camera,
        sh_degree, cfg, scale_modifier, means2d_offset,
    )
    pairs = build_pair_lists(
        prims, cs.s.tiles_x, cs.s.tiles_y, cs.k_cap, cfg,
        pair_capacity=cs.p_cap,
        active_cap=cs.n_cap,
    )
    fmat = _feature_matrix(prims)
    starts_c = jnp.minimum(pairs.starts[:-1], cs.p_cap)
    assert pairs.blocks == cs.blocks and pairs.dom == cs.dom
    return (prims, fmat, pairs.order, pairs.sorted_gid, pairs.sorted_tile,
            pairs.cand, starts_c, pairs.counts, pairs.lens, pairs.overflow,
            pairs.overflow_spill)


def _finish(acc_b, prims_b, overflow, spill, background, cs, h, w, batched):
    b = acc_b.shape[0]
    out = jax.vmap(lambda a: _assemble(a, background, cs.s, h, w))(acc_b)
    if not batched:
        out = jax.tree.map(lambda x: x[0], out)
        radii, visible = prims_b.radii[0], prims_b.visible[0]
    else:
        radii, visible = prims_b.radii, prims_b.visible
    out.update(radii=radii, visible=visible, overflow=jnp.sum(overflow),
               overflow_spill=jnp.sum(spill))
    return out


def _rasterize_impl(means, scales, quats, features, opacities, alive,
                    cameras, background, sh_degree, cfg, scale_modifier,
                    means2d_offset, tile_capacity, pair_capacity, interpret,
                    tile_shard, batched, active_cap=None):
    h, w = cameras.height, cameras.width
    n = means.shape[0]
    cs = _core_statics(n, h, w, cfg, tile_capacity, pair_capacity, interpret,
                       active_cap)

    def bin_cam(cam):
        return _bin_one(means, scales, quats, features, opacities, alive,
                        cam, sh_degree, cfg, scale_modifier, means2d_offset,
                        cs)

    if batched:
        # static unroll, NOT vmap: a vmapped camera batch turns the two
        # big binning sorts into [B, P] batched sorts whose XLA layout
        # runs ~5x slower than the same sorts expressed 1-D; unrolling
        # runs the (already fully vectorized) per-camera binning with
        # the fast 1-D layouts, and the compositing kernel still gets
        # one flattened B x tiles grid. (lax.map would also work but
        # trips a Manual/Auto mesh check under shard_map.)
        b_cams = jax.tree_util.tree_leaves(cameras)[0].shape[0]
        per_cam = [
            bin_cam(jax.tree.map(lambda x: x[i], cameras))
            for i in range(b_cams)
        ]
        (prims_b, fmat_b, order_b, gid_b, skey_b, ckey_b, starts_b,
         counts_b, lens_b, ovf_b, spill_b) = jax.tree.map(
            lambda *xs: jnp.stack(xs), *per_cam)
    else:
        outs = bin_cam(cameras)
        (prims_b, fmat_b, order_b, gid_b, skey_b, ckey_b, starts_b,
         counts_b, lens_b, ovf_b, spill_b) = jax.tree.map(
            lambda x: x[None], outs)

    b = fmat_b.shape[0]
    tileid = jnp.tile(jnp.arange(cs.num_tiles, dtype=jnp.int32), b)
    acc = _render_core(
        fmat_b, order_b, gid_b, skey_b, ckey_b, starts_b, counts_b, lens_b,
        tileid, cs, tile_shard,
    )
    acc_b = acc.reshape(b, cs.num_tiles, 8, cs.s.pix)
    return _finish(acc_b, prims_b, ovf_b, spill_b, background, cs, h, w,
                   batched)


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
    active_cap: int | None = None,  # static cap on candidate depth ranks
):
    """Tiled Pallas render. Same contract as rasterize_reference (and the
    reference render(): gaussian_renderer/__init__.py:98-104): dict with
    image [H,W,3], depth [H,W], alpha [H,W], radii [N] int32, visible [N],
    plus pair-buffer `overflow` diagnostics.

    `active_cap` (static) truncates the candidate domain to the first
    active_cap depth ranks (invisible/padding Gaussians sort last, so a
    cap >= the alive count drops nothing) — the lever that keeps padded
    training scenes (capacity >> alive) from paying capacity-sized
    sorts. See binning.build_pair_lists.

    `tile_shard=(mesh, axis)` runs the compositing grid sequence-parallel
    over the pixel-tile axis (SURVEY.md §5.7: "sequence parallelism over
    rays"): projection/binning are replicated (cheap), each chip
    composites its contiguous tile range against the shared pair array,
    and the image shards concatenate along the tile axis."""
    return _rasterize_impl(
        means, scales, quats, features, opacities, alive, camera,
        background, sh_degree, cfg, scale_modifier, means2d_offset,
        tile_capacity, pair_capacity, interpret, tile_shard, batched=False,
        active_cap=active_cap,
    )


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
    active_cap: int | None = None,
):
    """Batched render over B cameras sharing one Gaussian scene.

    The reference renders its 8-camera batch in a sequential Python loop
    (GaussianDreamer.py:244); here the projection/binning stage is
    vmapped and the compositing kernel runs ONE flattened grid of
    B x tiles programs — a single kernel launch per training step, which
    is also what lets the tile axis shard cleanly across chips."""
    return _rasterize_impl(
        means, scales, quats, features, opacities, alive, cameras,
        background, sh_degree, cfg, scale_modifier, means2d_offset,
        tile_capacity, pair_capacity, interpret, tile_shard, batched=True,
        active_cap=active_cap,
    )
