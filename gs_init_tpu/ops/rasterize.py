"""Production differentiable rasterizer: Pallas tile compositor.

TPU-native replacement for gsplat's ``rasterize_to_pixels`` CUDA kernels
(reference call site runner.py:341-362). Design notes:

* Per-tile front-to-back alpha compositing is reformulated as **MXU
  matmuls**: within a chunk of K sorted gaussians the exclusive
  log-transmittance prefix is ``L @ log1p(-alpha)`` with ``L`` the strictly
  lower-triangular ones matrix, and color accumulation is a ``[3,K] @ [K,P]``
  contraction. No per-gaussian sequential loop — the systolic array does the
  scan. CUDA needs warp-serial compositing here; the TPU does not.
* The grid iterates tiles; per-tile pair ranges arrive via scalar prefetch
  (``PrefetchScalarGridSpec``) and packed pair attributes are DMA'd from HBM
  chunk-by-chunk with early termination once every pixel saturates.
* Backward is a second Pallas kernel traversing chunks back-to-front using
  the saved final transmittance (same trick as gsplat's backward), emitting
  **per-pair gradient records**; the scatter-reduction back to per-gaussian
  arrays is the autodiff VJP of the (XLA) gather in ``tiles.pack_pairs``.
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
    PACK_B,
    PACK_CA,
    PACK_CB,
    PACK_CC,
    PACK_COLS,
    PACK_DEPTH,
    PACK_G,
    PACK_MX,
    PACK_MY,
    PACK_OPA,
    PACK_R,
)

ALPHA_MAX = 0.999
ALPHA_MIN = 1.0 / 255.0
TERM_EPS = 1e-4
OUT_ROWS = 8  # r, g, b, acc, depth, T_final, n_chunks_processed, unused
ROW_R, ROW_G, ROW_B, ROW_ACC, ROW_DEPTH, ROW_T, ROW_NPROC = 0, 1, 2, 3, 4, 5, 6


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tri(chunk: int, strict_lower: bool) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (j < i if strict_lower else j > i).astype(jnp.float32)


def _alpha_terms(d, px, py, i, chunk, n):
    """Shared fwd/bwd per-chunk alpha computation. d: [chunk, PACK_COLS]."""
    mx = d[:, PACK_MX : PACK_MX + 1]
    my = d[:, PACK_MY : PACK_MY + 1]
    ca = d[:, PACK_CA : PACK_CA + 1]
    cb = d[:, PACK_CB : PACK_CB + 1]
    cc = d[:, PACK_CC : PACK_CC + 1]
    opa = d[:, PACK_OPA : PACK_OPA + 1]
    k = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    inrange = (i * chunk + k) < n
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


def _fwd_kernel(
    starts_ref, packed_ref, out_ref, buf, sem,
    *, chunk, tile, ntx, nty, pixels,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    n = starts_ref[t + 1] - start
    nchunks = (n + chunk - 1) // chunk

    tiles_per_cam = ntx * nty
    tloc = t % tiles_per_cam
    px0 = (tloc % ntx) * tile
    py0 = (tloc // ntx) * tile
    col = jax.lax.broadcasted_iota(jnp.int32, (1, pixels), 1)
    px = (px0 + col % tile).astype(jnp.float32) + 0.5
    py = (py0 + col // tile).astype(jnp.float32) + 0.5

    out_ref[0] = jnp.zeros((OUT_ROWS, pixels), jnp.float32)
    ltri = _tri(chunk, strict_lower=True)

    def dma(j, slot):
        off = pl.multiple_of(start + j * chunk, chunk)
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(off, chunk)], buf.at[slot], sem.at[slot]
        )

    # Double-buffered pipeline: chunk i+1 streams in while i composites.
    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(carry):
        i, tcur, _ = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        dma(i, slot).wait()
        d = jnp.transpose(buf[slot])  # [chunk, PACK_COLS]
        alpha, _ = _alpha_terms(d, px, py, i, chunk, n)
        logs = jnp.log1p(-alpha)
        excl = jax.lax.dot_general(
            ltri, logs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w = alpha * tcur * jnp.exp(excl)  # [chunk, P]
        rgbd = d[:, PACK_R : PACK_DEPTH + 1]  # [chunk, 4] r,g,b,depth
        contrib = jax.lax.dot_general(
            rgbd, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [4, P]
        out_ref[0, ROW_R : ROW_B + 1, :] += contrib[0:3]
        out_ref[0, ROW_DEPTH, :] += contrib[3]
        tnew = tcur * jnp.exp(jnp.sum(logs, axis=0, keepdims=True))
        alive = jnp.max(tnew) > TERM_EPS
        return i + 1, tnew, alive

    def cond(carry):
        i, _, alive = carry
        return (i < nchunks) & alive

    tinit = jnp.ones((1, pixels), jnp.float32)
    i_end, tfin, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tinit, jnp.bool_(True))
    )

    # Early termination leaves the prefetched next chunk's DMA in flight;
    # drain it so the semaphore is clean for the next grid step.
    @pl.when(i_end < nchunks)
    def _():
        dma(i_end, jax.lax.rem(i_end, 2)).wait()

    out_ref[0, ROW_ACC, :] = 1.0 - tfin[0]
    out_ref[0, ROW_T, :] = tfin[0]
    out_ref[0, ROW_NPROC, :] = jnp.full((pixels,), 1.0, jnp.float32) * i_end.astype(
        jnp.float32
    )


def _bwd_kernel(
    starts_ref, packed_ref, fwdout_ref, gout_ref, dpairs_ref,
    buf, gbuf, sem, osem,
    *, chunk, tile, ntx, nty, pixels,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    n = starts_ref[t + 1] - start
    nchunks = (n + chunk - 1) // chunk

    tiles_per_cam = ntx * nty
    tloc = t % tiles_per_cam
    px0 = (tloc % ntx) * tile
    py0 = (tloc // ntx) * tile
    col = jax.lax.broadcasted_iota(jnp.int32, (1, pixels), 1)
    px = (px0 + col % tile).astype(jnp.float32) + 0.5
    py = (py0 + col // tile).astype(jnp.float32) + 0.5

    g_rgbd = jnp.concatenate(
        [gout_ref[0, ROW_R : ROW_B + 1, :], gout_ref[0, ROW_DEPTH : ROW_DEPTH + 1, :]],
        axis=0,
    )  # [4, P]
    # acc = 1 - T_final and T_final itself are both outputs; the combined
    # dL/dalpha_k contribution of the T_N path is (g_acc - g_T) T_N/(1-a_k).
    g_tn = gout_ref[0, ROW_ACC : ROW_ACC + 1, :] - gout_ref[0, ROW_T : ROW_T + 1, :]
    tfin = fwdout_ref[0, ROW_T : ROW_T + 1, :]  # [1, P]
    i_end_f = fwdout_ref[0, ROW_NPROC : ROW_NPROC + 1, :]  # [1, P] broadcast

    utri_incl = 1.0 - _tri(chunk, strict_lower=True)  # j >= i
    utri_strict = _tri(chunk, strict_lower=False)  # j > i

    def body(rev, carry):
        t_after, r_after = carry
        i = nchunks - 1 - rev
        off = pl.multiple_of(start + i * chunk, chunk)
        cp = pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(off, chunk)], buf, sem
        )
        cp.start()
        cp.wait()
        d = jnp.transpose(buf[:])  # [chunk, PACK_COLS]
        processed = (i.astype(jnp.float32) < i_end_f)  # [1, P], uniform

        alpha, aux = _alpha_terms(d, px, py, i, chunk, n)
        logs = jnp.log1p(-alpha)
        inv1m = 1.0 / (1.0 - alpha)
        # Transmittance before each gaussian: T_k = t_after * exp(-suffix_incl)
        suf = jax.lax.dot_general(
            utri_incl, logs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tk = t_after * jnp.exp(-suf)
        w = alpha * tk
        rgbd = d[:, PACK_R : PACK_DEPTH + 1]  # [chunk, 4]
        q = jax.lax.dot_general(
            rgbd, g_rgbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, P] = sum_ch c_ch * g_ch + d * g_d
        u = q * w
        r_in = (
            jax.lax.dot_general(
                utri_strict, u, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + r_after
        )
        dalpha = q * tk - r_in * inv1m + g_tn * tfin * inv1m
        dalpha = jnp.where(processed, dalpha, 0.0)

        # Chain through alpha -> (opacity, conic, mean2d); clamped/skipped
        # entries get zero gradient (matches the oracle's autodiff).
        dcols = jax.lax.dot_general(
            w, g_rgbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, 4] = (dr, dg, db, ddepth)
        dcols = jnp.where(processed[:, :1], dcols, 0.0)
        live = aux["unclamped"]
        e = jnp.where(live, aux["e"], 0.0)
        dopa = jnp.sum(dalpha * e, axis=1, keepdims=True)
        dsig = -dalpha * jnp.where(live, aux["araw"], 0.0)
        dx, dy = aux["dx"], aux["dy"]
        dca = jnp.sum(dsig * 0.5 * dx * dx, axis=1, keepdims=True)
        dcb = jnp.sum(dsig * dx * dy, axis=1, keepdims=True)
        dcc = jnp.sum(dsig * 0.5 * dy * dy, axis=1, keepdims=True)
        dmx = jnp.sum(-dsig * (aux["ca"] * dx + aux["cb"] * dy), axis=1, keepdims=True)
        dmy = jnp.sum(-dsig * (aux["cc"] * dy + aux["cb"] * dx), axis=1, keepdims=True)

        grec = jnp.concatenate(
            [
                dmx, dmy, dca, dcb, dcc, dopa,
                dcols,  # dr, dg, db at PACK_R..PACK_B, ddepth at PACK_DEPTH
                jnp.zeros((chunk, PACK_COLS - 10), jnp.float32),
            ],
            axis=1,
        )
        gbuf[:] = jnp.transpose(grec)
        ocp = pltpu.make_async_copy(
            gbuf, dpairs_ref.at[:, pl.ds(off, chunk)], osem
        )
        ocp.start()
        ocp.wait()

        t_next = jnp.where(
            processed, t_after * jnp.exp(-jnp.sum(logs, axis=0, keepdims=True)), t_after
        )
        r_next = jnp.where(processed, r_after + jnp.sum(u, axis=0, keepdims=True), r_after)
        return t_next, r_next

    jax.lax.fori_loop(
        0,
        nchunks,
        body,
        (tfin, jnp.zeros((1, pixels), jnp.float32)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "ntx", "nty", "tile", "chunk"),
)
def _composite_fwd_call(packed, tile_starts, num_tiles, ntx, nty, tile, chunk):
    pixels = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, OUT_ROWS, pixels), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, PACK_COLS, chunk), jnp.float32),
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
    static_argnames=("num_tiles", "ntx", "nty", "tile", "chunk"),
)
def _composite_bwd_call(
    packed, tile_starts, fwd_out, g_out, num_tiles, ntx, nty, tile, chunk
):
    pixels = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, OUT_ROWS, pixels), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, OUT_ROWS, pixels), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((PACK_COLS, chunk), jnp.float32),
            pltpu.VMEM((PACK_COLS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, tile=tile, ntx=ntx, nty=nty, pixels=pixels
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(tile_starts, packed, fwd_out, g_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def composite_pairs(packed, tile_starts, num_tiles, ntx, nty, tile, chunk):
    """Composite sorted packed pairs into per-tile images.

    Args:
      packed: [PACK_COLS, CAP_PAD] f32 sorted pair attributes, attribute-major
        with chunk-aligned tile ranges (tiles.pack_pairs output).
      tile_starts: [num_tiles + 1] int32 pair-range offsets.
    Returns:
      out [num_tiles, OUT_ROWS, tile*tile] f32 (rows: r, g, b, acc, depth,
      T_final, chunks-processed; the last two rows are non-differentiable
      bookkeeping).
    """
    return _composite_fwd(packed, tile_starts, num_tiles, ntx, nty, tile, chunk)[0]


def _composite_fwd(packed, tile_starts, num_tiles, ntx, nty, tile, chunk):
    out = _composite_fwd_call(
        packed, tile_starts, num_tiles, ntx, nty, tile, chunk
    )
    return out, (packed, tile_starts, out)


def _composite_bwd(num_tiles, ntx, nty, tile, chunk, res, g_out):
    packed, tile_starts, out = res
    dpacked = _composite_bwd_call(
        packed, tile_starts, out, g_out, num_tiles, ntx, nty, tile, chunk
    )
    dstarts = np.zeros(tile_starts.shape, dtype=jax.dtypes.float0)
    return dpacked, dstarts


composite_pairs.defvjp(_composite_fwd, _composite_bwd)


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
