"""Production differentiable rasterizer: Pallas tile compositor.

TPU-native replacement for gsplat's ``rasterize_to_pixels`` CUDA kernels
(reference call site runner.py:341-362). Design notes:

* Per-tile front-to-back alpha compositing is reformulated as **MXU
  matmuls**: within a chunk of K sorted gaussians the exclusive
  log-transmittance prefix is ``L @ log1p(-alpha)`` with ``L`` the strictly
  lower-triangular ones matrix, and color accumulation is a ``[K,4]^T @
  [K,P]`` contraction. No per-gaussian sequential loop — the systolic array
  does the scan. CUDA needs warp-serial compositing here; the TPU does not.
* Pairs arrive **attribute-major** ([PACK_COLS, PAIR_CAP] f32, sorted
  order; see tiles.py) — minor dim = pairs, so XLA does not lane-pad the
  narrow attribute dim and chunk DMA slices are 128-aligned.
* The grid iterates tiles; tile pair ranges are *unaligned* — the kernel DMAs
  chunk-aligned windows from ``align_down(start)`` and masks rows outside
  [start, end). Double-buffered DMA with early termination once every pixel
  saturates.
* Backward traverses chunks back-to-front using the saved final
  transmittance (same trick as gsplat's backward), emitting per-pair
  gradient records into **per-tile aligned output slots** (no two grid steps
  write the same chunk); the reduction to per-gaussian rows is a
  presort-order cumsum + boundary difference (tiles.segment_reduce_presort),
  not an XLA scatter-add.
* ``render_tiles`` fuses pack-gather + compositing into one custom-VJP op so
  the cotangent contract is per-gaussian (table) rather than per-pair.
* On CPU (tests) the kernels run in Pallas interpret mode.

Numerical semantics match ops/rasterize_ref.py (the oracle), which matches
gsplat: alpha clamp at 0.999, skip below 1/255, termination at T < 1e-4.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tiles import (
    PACK_CA,
    PACK_CB,
    PACK_CC,
    PACK_COLS,
    PACK_DEPTH,
    PACK_MX,
    PACK_MY,
    PACK_OPA,
    PACK_R,
    _segment_ids_from_offsets,
    padded_capacity,
    segment_reduce_presort,
)

ALPHA_MAX = 0.999
ALPHA_MIN = 1.0 / 255.0
TERM_EPS = 1e-4
OUT_ROWS = 8  # r, g, b, acc, depth, T_final, n_chunks_processed, log T_final
ROW_R, ROW_G, ROW_B, ROW_ACC, ROW_DEPTH, ROW_T, ROW_NPROC = 0, 1, 2, 3, 4, 5, 6
# log T accumulated exactly in log space by the forward: the backward
# reconstructs per-gaussian transmittance as exp(logT - suffix), which
# cannot overflow (T_after * exp(+suffix) does at ~128 near-opaque
# gaussians: exp(88) overflows f32 while T_after underflows).
ROW_LOGT = 7


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tri(chunk: int, strict_lower: bool) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j < i if strict_lower else j > i).astype(jnp.float32)


def _alpha_terms(d, px, py, lo, hi, chunk):
    """Shared fwd/bwd per-chunk alpha computation. d: [chunk, PACK_COLS];
    rows with index outside [lo, hi) (this tile's pairs within the aligned
    window) are masked out."""
    mx = d[:, PACK_MX : PACK_MX + 1]
    my = d[:, PACK_MY : PACK_MY + 1]
    ca = d[:, PACK_CA : PACK_CA + 1]
    cb = d[:, PACK_CB : PACK_CB + 1]
    cc = d[:, PACK_CC : PACK_CC + 1]
    opa = d[:, PACK_OPA : PACK_OPA + 1]
    k = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    inrange = (k >= lo) & (k < hi)
    dx = px - mx  # [chunk, P]
    dy = py - my
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    e = jnp.exp(-sigma)
    araw = opa * e
    ok = inrange & (sigma >= 0.0) & (araw >= ALPHA_MIN)
    alpha = jnp.where(ok, jnp.minimum(araw, ALPHA_MAX), 0.0)
    unclamped = ok & (araw <= ALPHA_MAX)
    return alpha, dict(
        dx=dx, dy=dy, e=e, araw=araw, unclamped=unclamped,
        ca=ca, cb=cb, cc=cc,
    )


def _pixel_coords(t, tile, ntx, nty, pixels):
    tiles_per_cam = ntx * nty
    tloc = t % tiles_per_cam
    px0 = (tloc % ntx) * tile
    py0 = (tloc // ntx) * tile
    col = jax.lax.broadcasted_iota(jnp.int32, (1, pixels), 1)
    px = (px0 + col % tile).astype(jnp.float32) + 0.5
    py = (py0 + col // tile).astype(jnp.float32) + 0.5
    return px, py


def _bands(pixels: int) -> int:
    """Number of independent termination bands (128-px lane groups)."""
    return max(pixels // 128, 1)


def _fwd_kernel(
    starts_ref, packed_ref, out_ref, buf, tcur_ref, lt_ref, nstate, sem,
    *, chunk, tile, ntx, nty, pixels,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    c0 = (start // chunk) * chunk
    nchunks = jnp.where(end > start, (end - c0 + chunk - 1) // chunk, 0)
    nb = _bands(pixels)
    band = pixels // nb

    px, py = _pixel_coords(t, tile, ntx, nty, pixels)
    out_ref[0] = jnp.zeros((OUT_ROWS, pixels), jnp.float32)
    tcur_ref[...] = jnp.ones((1, pixels), jnp.float32)
    lt_ref[...] = jnp.zeros((1, pixels), jnp.float32)
    for b in range(nb):
        nstate[b] = 0
        nstate[nb + b] = jnp.where(nchunks > 0, 1, 0)  # alive flags
    ltri = _tri(chunk, strict_lower=True)

    def dma(j, slot):
        off = pl.multiple_of(c0 + j * chunk, chunk)
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(off, chunk)], buf.at[slot], sem.at[slot]
        )

    # Double-buffered pipeline: chunk i+1 streams in while i composites.
    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    # Sub-tile early termination: each 128-px band carries its own alive
    # flag, so a saturated band (every pixel T < eps) skips ALL compute for
    # the remaining chunks while stragglers continue. Chunk DMA is shared —
    # bands process the same descending chunk stream, just drop out early.
    # This recovers most of CUDA's per-pixel early-exit advantage without
    # divergence: the guard granularity is one VPU lane group.
    def body(carry):
        i, _ = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        dma(i, slot).wait()
        d = jnp.transpose(buf[slot])  # [chunk, PACK_COLS]
        base = c0 + i * chunk
        rgbd = d[:, PACK_R : PACK_DEPTH + 1]  # [chunk, 4] r,g,b,depth

        for b in range(nb):
            bsl = slice(b * band, (b + 1) * band)

            @pl.when(nstate[nb + b] == 1)
            def _(b=b, bsl=bsl):
                alpha, _ = _alpha_terms(
                    d, px[:, bsl], py[:, bsl], start - base, end - base, chunk
                )
                logs = jnp.log1p(-alpha)
                # HIGHEST: the log-transmittance prefix rides an exp() —
                # bf16 MXU rounding of the logs (~2^-9 rel) compounds to
                # percent-level weight error under deep near-opaque stacks.
                excl = jax.lax.dot_general(
                    ltri, logs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                tb = tcur_ref[0:1, bsl]
                w = alpha * tb * jnp.exp(excl)  # [chunk, band]
                contrib = jax.lax.dot_general(
                    rgbd, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [4, band]
                out_ref[0, ROW_R : ROW_B + 1, bsl] += contrib[0:3]
                out_ref[0, ROW_DEPTH, bsl] += contrib[3]
                s = jnp.sum(logs, axis=0, keepdims=True)
                tnew = tb * jnp.exp(s)
                tcur_ref[0:1, bsl] = tnew
                lt_ref[0:1, bsl] += s
                nstate[b] = i + 1
                nstate[nb + b] = jnp.where(
                    jnp.max(tnew) > TERM_EPS, 1, 0
                )

        alive = nstate[nb]
        for b in range(1, nb):
            alive = alive | nstate[nb + b]
        return i + 1, alive == 1

    def cond(carry):
        i, alive = carry
        return (i < nchunks) & alive

    i_end, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.bool_(True))
    )

    # Early termination leaves the prefetched next chunk's DMA in flight;
    # drain it so the semaphore is clean for the next grid step.
    @pl.when(i_end < nchunks)
    def _():
        dma(i_end, jax.lax.rem(i_end, 2)).wait()

    tfin = tcur_ref[0, :]
    out_ref[0, ROW_ACC, :] = 1.0 - tfin
    out_ref[0, ROW_T, :] = tfin
    out_ref[0, ROW_LOGT, :] = lt_ref[0, :]
    for b in range(nb):
        out_ref[0, ROW_NPROC, b * band : (b + 1) * band] = jnp.full(
            (band,), 1.0, jnp.float32
        ) * nstate[b].astype(jnp.float32)


def _bwd_kernel(
    starts_ref, ostarts_ref, packed_ref, fwdout_ref, gout_ref, dpairs_ref,
    buf, gbuf, lt_ref, r_ref, sem, osem,
    *, chunk, tile, ntx, nty, pixels,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    c0 = (start // chunk) * chunk
    obase = ostarts_ref[t]
    nchunks = jnp.where(end > start, (end - c0 + chunk - 1) // chunk, 0)
    nb = _bands(pixels)
    band = pixels // nb

    px, py = _pixel_coords(t, tile, ntx, nty, pixels)

    # Per-pixel running suffix state, seeded from the forward's final log T
    # (log-space reconstruction: exp(lt - suf) <= 1 by construction, immune
    # to the T_after-underflow x exp-overflow blowup of the multiplicative
    # form). Refs, not loop carries, because bands update their own pixel
    # slices under pl.when guards.
    lt_ref[...] = fwdout_ref[0, ROW_LOGT : ROW_LOGT + 1, :]
    r_ref[...] = jnp.zeros((1, pixels), jnp.float32)
    # Per-band forward progress: band b composited chunks [0, nproc_b).
    # Chunks beyond a band's nproc_b have EXACTLY zero gradient for its
    # pixels w.r.t. the forward as computed.
    nproc_b = [
        fwdout_ref[0, ROW_NPROC, b * band].astype(jnp.int32) for b in range(nb)
    ]
    nproc_max = nproc_b[0]
    for b in range(1, nb):
        nproc_max = jnp.maximum(nproc_max, nproc_b[b])

    utri_incl = 1.0 - _tri(chunk, strict_lower=True)  # j >= i
    utri_strict = _tri(chunk, strict_lower=False)  # j > i

    def rdma(j, slot):
        off = pl.multiple_of(c0 + j * chunk, chunk)
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(off, chunk)], buf.at[slot], sem.at[slot]
        )

    def wdma(j, slot):
        ooff = pl.multiple_of(obase + j * chunk, chunk)
        return pltpu.make_async_copy(
            gbuf.at[slot], dpairs_ref.at[:, pl.ds(ooff, chunk)], osem.at[slot]
        )

    # Chunks NO band composited still hold REAL pairs that the presort
    # segment reduction counts — but the sort KEYS are derived XLA-side from
    # the slot -> sorted-pair mapping (see _render_bwd), not from anything
    # the kernel writes. Zero payload is all that's needed: pure 8 KB DMA
    # writes, no reads, no compute.
    def zbody(j, _):
        slot = jax.lax.rem(j, 2)
        gbuf[slot] = jnp.zeros_like(gbuf[slot])
        w = wdma(j, slot)
        w.start()
        w.wait()
        return 0

    jax.lax.fori_loop(nproc_max, nchunks, zbody, 0)

    # Back-to-front traversal over the chunks ANY band processed; reads
    # double-buffered, writes overlapped. Bands share the descending chunk
    # stream and join once i drops below their own nproc_b (sub-tile
    # termination: saturated bands skip all compute, not just masking).
    @pl.when(nproc_max > 0)
    def _():
        rdma(nproc_max - 1, jax.lax.rem(nproc_max - 1, 2)).start()

    def body(rev, _):
        i = nproc_max - 1 - rev
        slot = jax.lax.rem(i, 2)

        @pl.when(i - 1 >= 0)
        def _():
            rdma(i - 1, jax.lax.rem(i - 1, 2)).start()

        rdma(i, slot).wait()
        d = jnp.transpose(buf[slot])  # [chunk, PACK_COLS]
        base = c0 + i * chunk
        rgbd = d[:, PACK_R : PACK_DEPTH + 1]  # [chunk, 4]

        def band_partials(b):
            bsl = slice(b * band, (b + 1) * band)

            def live():
                # Per-band rows are loaded from the refs HERE, not sliced
                # from precomputed [1, P] values: value slices carry their
                # lane-offset layout, which Mosaic rejects when broadcast
                # to [chunk, band] inside this cond branch.
                g_rgbd_b = jnp.concatenate(
                    [
                        gout_ref[0, ROW_R : ROW_B + 1, bsl],
                        gout_ref[0, ROW_DEPTH : ROW_DEPTH + 1, bsl],
                    ],
                    axis=0,
                )  # [4, band]
                # acc = 1 - T_final and T_final itself are both outputs;
                # the combined dL/dalpha contribution of the T_N path is
                # (g_acc - g_T) T_N/(1-a_k).
                gt_b = (
                    gout_ref[0, ROW_ACC : ROW_ACC + 1, bsl]
                    - gout_ref[0, ROW_T : ROW_T + 1, bsl]
                ) * fwdout_ref[0, ROW_T : ROW_T + 1, bsl]
                alpha, aux = _alpha_terms(
                    d, px[:, bsl], py[:, bsl], start - base, end - base, chunk
                )
                logs = jnp.log1p(-alpha)
                inv1m = 1.0 / (1.0 - alpha)
                # Transmittance before each gaussian: exp(lt_after - suf),
                # clamped at 0 since float error could push the exponent
                # positive. HIGHEST for the same exp()-amplification reason
                # as the forward's prefix matmul.
                suf = jax.lax.dot_general(
                    utri_incl, logs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                lt_after = lt_ref[0:1, bsl]
                tk = jnp.exp(jnp.minimum(lt_after - suf, 0.0))
                w = alpha * tk
                q = jax.lax.dot_general(
                    rgbd, g_rgbd_b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [chunk, band] = sum_ch c_ch * g_ch + d * g_d
                u = q * w
                r_in = (
                    jax.lax.dot_general(
                        utri_strict, u, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + r_ref[0:1, bsl]
                )
                dalpha = q * tk - (r_in - gt_b) * inv1m

                # Chain through alpha -> (opacity, conic, mean2d); clamped/
                # skipped entries get zero gradient (matches the oracle).
                dcols = jax.lax.dot_general(
                    w, g_rgbd_b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [chunk, 4] = (dr, dg, db, ddepth)
                live_m = aux["unclamped"]
                e = jnp.where(live_m, aux["e"], 0.0)
                dopa = jnp.sum(dalpha * e, axis=1, keepdims=True)
                dsig = -dalpha * jnp.where(live_m, aux["araw"], 0.0)
                dx, dy = aux["dx"], aux["dy"]
                # Moment form: the five conic/mean gradient chains share the
                # dsig-weighted first/second moments of (dx, dy) — 5
                # products + 5 reduces instead of ~16 per-pixel ops. The
                # moments are linear over bands, so conic application
                # happens once after the band sum.
                dsx = dsig * dx
                dsy = dsig * dy
                dca = 0.5 * jnp.sum(dsx * dx, axis=1, keepdims=True)
                dcb = jnp.sum(dsx * dy, axis=1, keepdims=True)
                dcc = 0.5 * jnp.sum(dsy * dy, axis=1, keepdims=True)
                sx = jnp.sum(dsx, axis=1, keepdims=True)
                sy = jnp.sum(dsy, axis=1, keepdims=True)
                lt_ref[0:1, bsl] = lt_after - jnp.sum(
                    logs, axis=0, keepdims=True
                )
                r_ref[0:1, bsl] = r_in[0:1] + u[0:1]
                return dcols, dopa, dca, dcb, dcc, sx, sy

            def dead():
                z1 = jnp.zeros((chunk, 1), jnp.float32)
                return (
                    jnp.zeros((chunk, 4), jnp.float32),
                    z1, z1, z1, z1, z1, z1,
                )

            return jax.lax.cond(i < nproc_b[b], live, dead)

        parts_b = [band_partials(b) for b in range(nb)]
        dcols, dopa, dca, dcb, dcc, sx, sy = (
            functools.reduce(jnp.add, comps) for comps in zip(*parts_b)
        )
        ca = d[:, PACK_CA : PACK_CA + 1]
        cb = d[:, PACK_CB : PACK_CB + 1]
        cc = d[:, PACK_CC : PACK_CC + 1]
        dmx = -(ca * sx + cb * sy)
        dmy = -(cc * sy + cb * sx)

        parts = [
            dmx, dmy, dca, dcb, dcc, dopa,
            dcols,  # dr, dg, db at PACK_R..PACK_B, ddepth at PACK_DEPTH
            jnp.zeros((chunk, PACK_COLS - 10), jnp.float32),
        ]
        grec = jnp.concatenate(parts, axis=1)
        # Reuse of a gbuf slot must wait for its previous write to drain.
        @pl.when(rev >= 2)
        def _():
            wdma(i + 2, slot).wait()

        gbuf[slot] = jnp.transpose(grec)
        wdma(i, slot).start()
        return 0

    jax.lax.fori_loop(0, nproc_max, body, 0)

    # Drain outstanding writes (the last two chunks processed are i=1, i=0).
    @pl.when(nproc_max >= 2)
    def _():
        wdma(1, 1).wait()

    @pl.when(nproc_max >= 1)
    def _():
        wdma(0, 0).wait()


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "ntx", "nty", "tile", "chunk"),
)
def _composite_fwd_call(packed, tile_starts, num_tiles, ntx, nty, tile, chunk):
    pixels = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, OUT_ROWS, pixels), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_COLS, chunk), jnp.float32),
            pltpu.VMEM((1, pixels), jnp.float32),  # running T
            pltpu.VMEM((1, pixels), jnp.float32),  # running log T
            pltpu.SMEM((2 * _bands(pixels),), jnp.int32),  # nproc + alive per band
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, tile=tile, ntx=ntx, nty=nty, pixels=pixels
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_ROWS, pixels), jnp.float32),
        interpret=_interpret(),
    )(tile_starts, packed)


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "ntx", "nty", "tile", "chunk", "cap_pad"),
)
def _composite_bwd_call(
    packed, tile_starts, out_starts, fwd_out, g_out,
    num_tiles, ntx, nty, tile, chunk, cap_pad,
):
    pixels = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, OUT_ROWS, pixels), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, OUT_ROWS, pixels), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_COLS, chunk), jnp.float32),
            pltpu.VMEM((2, PACK_COLS, chunk), jnp.float32),
            pltpu.VMEM((1, pixels), jnp.float32),  # running suffix log T
            pltpu.VMEM((1, pixels), jnp.float32),  # running r_after
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, tile=tile, ntx=ntx, nty=nty, pixels=pixels
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PACK_COLS, cap_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(tile_starts, out_starts, packed, fwd_out, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def render_tiles(
    table, pair_dummy, gid_sorted, tile_starts, out_starts,
    offsets, counts, num_tiles, ntx, nty, tile, chunk,
    want_depth_grad=True, want_absgrad=True,
):
    """Gather the per-gaussian table into sorted pair rows and composite.

    Fusing the pack gather with compositing keeps the VJP contract
    per-gaussian: backward runs the Pallas kernel into aligned per-pair
    records, sorts them by the gaussian id they carry, and reduces the
    presort-contiguous segments straight to per-gaussian rows (cumsum +
    boundary diff) — no per-pair cotangent ever crosses the op boundary.

    Args:
      table: [C*N, PACK_COLS] f32 per-gaussian attribute rows
        (tiles.pack_table output; PACK_GID carries the row id).
      pair_dummy: [C*N, 2] f32 — **must be zeros**: a gradient tap whose
        cotangent is the per-gaussian sum of |dmx|, |dmy| over its pairs
        (the JAX equivalent of gsplat's absgrad densification signal).
      gid_sorted / tile_starts / out_starts / offsets / counts:
        binning arrays (tiles.bin_gaussians output), non-differentiable.
    Returns:
      out [num_tiles, OUT_ROWS, tile*tile] f32 (rows: r, g, b, acc, depth,
      T_final, chunks-processed; the last two rows are non-differentiable
      bookkeeping).
    """
    return _render_fwd(
        table, pair_dummy, gid_sorted, tile_starts, out_starts,
        offsets, counts, num_tiles, ntx, nty, tile, chunk,
        want_depth_grad, want_absgrad,
    )[0]


def _render_fwd(
    table, pair_dummy, gid_sorted, tile_starts, out_starts,
    offsets, counts, num_tiles, ntx, nty, tile, chunk,
    want_depth_grad=True, want_absgrad=True,
):
    del pair_dummy  # zeros by contract; see docstring
    # XLA fuses the transpose into the gather, producing the attribute-major
    # physical layout directly (minor dim = pairs, no lane padding).
    packed = jnp.transpose(jnp.take(table, gid_sorted, axis=0, mode="clip"))
    out = _composite_fwd_call(
        packed, tile_starts, num_tiles, ntx, nty, tile, chunk
    )
    res = (packed, gid_sorted, tile_starts, out_starts, offsets, counts, out)
    return out, res


def _render_bwd(
    num_tiles, ntx, nty, tile, chunk, want_depth_grad, want_absgrad,
    res, g_out,
):
    packed, gid_sorted, tile_starts, out_starts, offsets, counts, out = res
    pair_cap = packed.shape[1]
    cap_pad = padded_capacity(pair_cap, num_tiles, chunk)
    records = _composite_bwd_call(
        packed, tile_starts, out_starts, out, g_out,
        num_tiles, ntx, nty, tile, chunk, cap_pad,
    )  # [PACK_COLS, CAP_PAD] per-pair grads in aligned bwd-slot layout
    # Sort records by gaussian id; valid pairs land grouped per gaussian in
    # presort order (gids were assigned in presort order), everything else
    # sorts to the end. Keys come from the DETERMINISTIC slot -> sorted-pair
    # mapping — tile t's output slot out_starts[t]+k holds the record of
    # sorted pair align_down(tile_starts[t]) + k — gathered from the int32
    # binning arrays, NEVER from a kernel-written f32 column: int32 gid bits
    # viewed as f32 are denormals for gid < 2**23, and TPU vector units
    # flush f32 denormals to zero (that silently scrambled the sort on
    # hardware while CPU interpret stayed exact). It also lets the kernel
    # zero-fill forward-skipped chunks without re-reading their pair data.
    slot_tile, _ = _segment_ids_from_offsets(
        out_starts[:-1], out_starts[-1], cap_pad
    )
    t_start = jnp.take(tile_starts, slot_tile, mode="clip")
    t_end = jnp.take(tile_starts, slot_tile + 1, mode="clip")
    pair_idx = (t_start // chunk) * chunk + (
        jnp.arange(cap_pad, dtype=jnp.int32)
        - jnp.take(out_starts, slot_tile, mode="clip")
    )
    valid = (
        (jnp.arange(cap_pad, dtype=jnp.int32) < out_starts[-1])
        & (pair_idx >= t_start)
        & (pair_idx < t_end)
    )
    key = jnp.where(
        valid,
        jnp.take(gid_sorted, pair_idx, mode="clip"),
        jnp.int32(2**31 - 1),
    )
    n_base = 10 if want_depth_grad else 9  # ddepth column optional
    ops = tuple(records[i] for i in range(n_base))
    sorted_ops = jax.lax.sort((key,) + ops, num_keys=1)
    dpre = jnp.stack(sorted_ops[1:], axis=0)  # [R, CAP_PAD]
    if want_absgrad:
        # |dmx|, |dmy| ride the same permutation as dmx/dmy — take abs of
        # the sorted columns instead of sorting two extra payload columns.
        dpre = jnp.concatenate([dpre, jnp.abs(dpre[PACK_MX : PACK_MY + 1])], 0)
    # Under pair-capacity overflow the dropped pairs are exactly the presort
    # tail, so clip the per-gaussian segments to the surviving range.
    offs2 = jnp.minimum(offsets, pair_cap)
    cnt2 = jnp.minimum(offsets + counts, pair_cap) - offs2
    red = segment_reduce_presort(dpre, offs2, cnt2)  # [C*N, R]
    dtable = jnp.pad(
        red[:, :n_base], ((0, 0), (0, PACK_COLS - n_base))
    )
    if want_absgrad:
        dpair_dummy = red[:, n_base : n_base + 2]
    else:
        dpair_dummy = jnp.zeros((red.shape[0], 2), red.dtype)
    f0 = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
    return (
        dtable,
        dpair_dummy,
        f0((pair_cap,)),  # gid_sorted
        f0(tile_starts.shape),
        f0(out_starts.shape),
        f0(offsets.shape),
        f0(counts.shape),
    )


render_tiles.defvjp(_render_fwd, _render_bwd)


def unpack_tiles(
    out: jnp.ndarray, num_cams: int, ntx: int, nty: int, tile: int, width: int, height: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[num_tiles, OUT_ROWS, tile*tile] -> color [C,H,W,3], alpha/depth [C,H,W]."""
    x = out.reshape(num_cams, nty, ntx, OUT_ROWS, tile, tile)
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))  # [C, rows, nty, tile, ntx, tile]
    x = x.reshape(num_cams, OUT_ROWS, nty * tile, ntx * tile)
    x = x[:, :, :height, :width]
    color = jnp.transpose(x[:, ROW_R : ROW_B + 1], (0, 2, 3, 1))
    alpha = x[:, ROW_ACC]
    depth = x[:, ROW_DEPTH]
    return color, alpha, depth
