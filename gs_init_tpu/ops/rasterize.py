"""Production differentiable rasterizer: Pallas tile compositor.

TPU-native replacement for gsplat's ``rasterize_to_pixels`` CUDA kernels
(reference call site runner.py:341-362). Design notes:

* Per-tile front-to-back alpha compositing has no per-gaussian sequential
  loop: within a chunk of K sorted gaussians the transmittance recurrence
  T_k = prod_{j<k}(1-alpha_j) runs as a **multiplicative Hillis-Steele
  scan** — log2(K) VPU multiplies, no log/exp round trip, see
  ``_prefix_prod`` — while color accumulation stays a ``[K,4]^T @ [K,P]``
  MXU contraction. CUDA needs warp-serial compositing here; the TPU does
  not. (Triangular-matrix matmul scans were the v1 design, kept as the
  probed fallback; log-space shifted-add scans were v2 — both spent ~2
  transcendentals per pair-pixel that the product form doesn't.)
* Pairs arrive **attribute-major** ([PACK_COLS, PAIR_CAP] f32, sorted
  order; see tiles.py) — minor dim = pairs, so XLA does not lane-pad the
  narrow attribute dim and chunk DMA slices are 128-aligned.
* The grid iterates tiles; tile pair ranges are *unaligned* — the kernel DMAs
  chunk-aligned windows from ``align_down(start)`` and masks rows outside
  [start, end). Double-buffered DMA with early termination once every pixel
  saturates.
* Backward traverses chunks FRONT-TO-BACK (unlike gsplat's back-to-front
  CUDA backward): transmittance follows the forward's own prefix-product
  recurrence, and the suffix accumulator it would need from the back is
  recovered as r_tot - prefix, where r_tot = <dL/d(rgbd), rendered rgbd>
  comes straight from the saved forward outputs. Per-pair gradient records
  land in **per-tile aligned output slots** (no two grid steps write the
  same chunk); the reduction to per-gaussian rows is a presort-order
  cumsum + boundary difference (tiles.segment_reduce_presort), not an XLA
  scatter-add.
* ``render_tiles`` fuses pack-gather + compositing into one custom-VJP op so
  the cotangent contract is per-gaussian (table) rather than per-pair.
* On CPU (tests) the kernels run in Pallas interpret mode.

Numerical semantics match ops/rasterize_ref.py (the oracle), which matches
gsplat: alpha clamp at 0.999, skip below 1/255, termination at T < 1e-4.
"""
from __future__ import annotations

import functools
import os as _os
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
    PACK_GID,
    PACK_MX,
    PACK_MY,
    PACK_OPA,
    PACK_R,
    PACK_VALID,
    WIRE_BD,
    WIRE_CACB,
    WIRE_CCOP,
    WIRE_COLS,
    WIRE_GID,
    WIRE_MX,
    WIRE_MY,
    WIRE_RG,
    pack_wire,
    padded_capacity,
    segment_reduce_presort,
)

ALPHA_MAX = 0.999
ALPHA_MIN = 1.0 / 255.0
TERM_EPS = 1e-4
OUT_ROWS = 8  # r, g, b, acc, depth, T_final, n_chunks_processed, (spare)
ROW_R, ROW_G, ROW_B, ROW_ACC, ROW_DEPTH, ROW_T, ROW_NPROC = 0, 1, 2, 3, 4, 5, 6
# Row 7 is spare (kept so the output block stays 8-sublane aligned). It
# used to carry log T_final for the v2 back-to-front backward; the
# front-to-back backward reconstructs transmittance by the same forward
# recurrence (prefix products of 1-alpha), which cannot overflow, so no
# log-space bookkeeping is needed anywhere.


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


_SCAN_MODE = None


def _scan_mode() -> str:
    """Resolve the prefix-scan lowering: "hs" (default) or "trimat".

    GS_SCAN overrides unconditionally (A/B knob). Otherwise, on the first
    use on a real TPU backend, a tiny Pallas probe compiles and checks the
    Hillis-Steele shifted-add scan under Mosaic *in a fresh subprocess*;
    any compile failure or numeric mismatch silently selects the
    hardware-proven triangular-matmul lowering instead, so a Mosaic
    regression degrades performance rather than breaking
    training/benchmarks.

    The probe MUST NOT execute jax ops in this process: the first call
    typically happens while tracing the compositor kernel (via
    _prefix_scan), where any eagerly-created array leaks into the enclosing
    jaxpr as a captured constant — the round-3 on-chip sanity failure
    ("captures constants [f32[128,128]]", results/sanity_r3.log) was the
    in-process probe's own input array poisoning the kernel trace, after
    which np.asarray on the probe's tracer output raised, the probe
    "failed", and trimat tracing inherited the leaked constant. A
    subprocess is immune to that and also contains Mosaic crashes and dead
    TPU relays (bounded timeout).
    """
    global _SCAN_MODE
    env = _os.environ.get("GS_SCAN")
    if env:
        return "trimat" if env == "trimat" else "hs"
    if _SCAN_MODE is None:
        # Interpret mode (CPU tests) has no Mosaic lowering to probe. Check
        # the env pin first so CPU-pinned processes (tests) resolve without
        # initializing a jax backend at all.
        if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            _SCAN_MODE = "hs"
        else:
            _SCAN_MODE = "hs" if (_interpret() or _probe_hs_scan()) else "trimat"
    return _SCAN_MODE


_PROBE_SRC = r"""
import sys
import numpy as np
sys.path.insert(0, sys.argv[1])
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from gs_init_tpu.ops.rasterize import _hs_scan

# Exit-code contract: 0 = HS scan OK, 1 = genuine Mosaic/numeric failure
# (cacheable), 42 = could not even acquire the device / run a trivial op
# (environment failure — the parent must NOT cache it, or a parent that
# already holds the single-client TPU would pin the slow lowering for the
# rest of the boot).
try:
    jax.block_until_ready(jnp.zeros((8, 128), jnp.float32) + 1.0)
except Exception:
    sys.exit(42)

n = 128
x = np.linspace(-1.0, 1.0, n * n, dtype=np.float32).reshape(n, n)
m = np.linspace(0.5, 1.0, n * n, dtype=np.float32).reshape(n, n)

def k(x_ref, m_ref, o_ref, p_ref):
    o_ref[...] = _hs_scan(x_ref[...], reverse=False, exclusive=True)
    p_ref[...] = _hs_scan(m_ref[...], exclusive=True, mul=True)

try:
    out, prod = pl.pallas_call(
        k,
        out_shape=[
            jax.ShapeDtypeStruct((n, n), jnp.float32),
            jax.ShapeDtypeStruct((n, n), jnp.float32),
        ],
    )(jnp.asarray(x), jnp.asarray(m))
    got = np.asarray(out)  # forces compile + execution on the real backend
    gotp = np.asarray(prod)
except Exception:
    sys.exit(1)
want = np.cumsum(x, axis=0) - x  # exclusive prefix
wantp = np.cumprod(m, axis=0) / m  # exclusive prefix product
ok = bool(
    np.isfinite(got).all()
    and np.abs(got - want).max() < 1e-3
    and np.isfinite(gotp).all()
    and np.abs(gotp - wantp).max() < 1e-3
)
sys.exit(0 if ok else 1)
"""


def _probe_hs_scan() -> bool:
    """Run the HS-scan hardware probe in a fresh subprocess (see _scan_mode).

    Touches no jax in THIS process (so callers may invoke it before backend
    init — e.g. bench.py resolves the mode up front, while the chip is still
    free for the child). Result is cached per env-signature in the system
    temp dir so the ~30 s jax init + compile cost is paid once per machine
    boot, not once per process.
    """
    import hashlib
    import pathlib
    import subprocess
    import sys
    import tempfile

    sig = hashlib.sha1(
        (
            repr(
                sorted(
                    (k, v)
                    for k, v in _os.environ.items()
                    if k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
                )
            )
            + _PROBE_SRC  # probe content versions the cache
        ).encode()
    ).hexdigest()[:12]
    cache = pathlib.Path(tempfile.gettempdir()) / f"gs_hs_probe_{sig}.result"
    try:
        cached = cache.read_text().strip()
        if cached in ("0", "1"):
            return cached == "1"
    except OSError:
        pass
    repo = str(pathlib.Path(__file__).resolve().parents[2])
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC, repo],
            timeout=300,
            capture_output=True,
        )
        ok = r.returncode == 0
        # Only cache definitive verdicts (0 = ok, 1 = genuine Mosaic
        # failure). Exit 42 means the child could not acquire the device at
        # all — e.g. the parent already holds the single-client TPU — and a
        # timeout may be a transient relay outage; caching either would pin
        # the slower trimat lowering for the rest of the machine boot.
        cacheable = r.returncode in (0, 1)
    except Exception:
        ok = False
        cacheable = False
    if cacheable:
        try:
            cache.write_text("1" if ok else "0")
        except OSError:
            pass
    return ok


def _moment_mode() -> str:
    """Backward conic/mean moment-reduction lowering (A/B knob GS_MOMENT).

    "off" (default): round-3 VPU moment form — 5 products + 5 reduces over
    [chunk, P]. "hi"/"bf16": single MXU contraction of the -dsig mass
    against the tile-centered pixel basis at HIGHEST/DEFAULT precision.
    Measured on v5e (300k flagship bench): off 16.13, hi 15.33 steps/s —
    the 6-pass HIGHEST matmul costs more than the VPU passes it replaces;
    kept as a knob for other TPU generations / the bf16 variant.
    """
    m = _os.environ.get("GS_MOMENT", "off")
    return m if m in ("off", "hi", "bf16") else "off"


def _pblock(pixels: int) -> int:
    """Pixel-band termination granularity (A/B knob GS_PBLOCK, default 1).

    The whole-tile early exit waits for EVERY pixel of the tile to
    saturate; GS_PBLOCK=2/4 splits the tile's pixel vector into that many
    lane bands with independent termination (fwd) and replay depth (bwd) —
    the CUDA rasterizer's per-pixel early exit at vector granularity.
    Bands must keep the lane dim a multiple of 128 (Mosaic): tile 32
    (1024 px) supports up to 8, tile 16 (256 px) up to 2. Resolved at
    trace time like GS_SCAN/GS_MOMENT (per-process knob).
    """
    try:
        nb = int(_os.environ.get("GS_PBLOCK", "1"))
    except ValueError:
        return 1
    nb = max(1, nb)
    while nb > 1 and (pixels % nb or (pixels // nb) % 128):
        nb -= 1
    return nb


def _hs_scan(x, *, reverse: bool = False, exclusive: bool = False, mul: bool = False):
    """Hillis-Steele prefix sum (or product, ``mul=True``) of [chunk, P]
    along axis 0: log2(chunk) shifted VPU adds/muls, off the MXU. The
    identity element (0 for add, 1 for mul) fills the shifted-in rows."""
    n, p = x.shape
    op = jnp.multiply if mul else jnp.add
    ident = jnp.ones if mul else jnp.zeros
    irow = ident((1, p), x.dtype)
    s = x
    k = 1
    while k < n:
        z = ident((k, p), x.dtype)
        sh = (
            jnp.concatenate([s[k:], z], 0)
            if reverse
            else jnp.concatenate([z, s[:-k]], 0)
        )
        s = op(s, sh)
        k *= 2
    if exclusive:
        s = (
            jnp.concatenate([s[1:], irow], 0)
            if reverse
            else jnp.concatenate([irow, s[:-1]], 0)
        )
    return s


def _prefix_scan(x, *, reverse: bool = False, exclusive: bool = False):
    """Prefix sum of [chunk, P] along axis 0 for the log-transmittance
    prefix/suffix accumulators.

    Default lowering is the Hillis-Steele shifted-add scan (exact f32; the
    prefix rides an exp(), so bf16 MXU rounding of the logs (~2^-9 rel)
    compounds to percent-level weight error under deep near-opaque stacks,
    and the Precision.HIGHEST matmul alternative costs 6 bf16 passes). The
    triangular-matmul lowering is kept as the probed/flagged fallback —
    same math, Precision.HIGHEST MXU contraction against an iota mask; see
    _scan_mode.
    """
    n, p = x.shape
    if _scan_mode() == "trimat":
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)  # output index
        c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)  # input index
        if reverse:
            keep = (c > r) if exclusive else (c >= r)
        else:
            keep = (c < r) if exclusive else (c <= r)
        return jax.lax.dot_general(
            keep.astype(x.dtype), x, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
    return _hs_scan(x, reverse=reverse, exclusive=exclusive)


def _prefix_prod(om, alpha, *, exclusive: bool = True):
    """Exclusive prefix PRODUCT of [chunk, P] along axis 0 — the per-pair
    transmittance recurrence T_k = prod_{j<k} (1 - alpha_j). ``om`` is
    1-alpha; ``alpha`` is passed too so the log-space fallback can use
    log1p(-alpha) (log(om) loses ~half the mantissa for alpha near 0).

    Front-to-back products of values in [1-ALPHA_MAX, 1] can only shrink,
    so there is no overflow hazard in either direction (underflow lands at
    0, which is the correct limit for a saturated pixel). Default lowering
    is the multiplicative Hillis-Steele scan; the trimat fallback computes
    the same thing through log space on the MXU (exp of a triangular-matmul
    prefix of log1p(-alpha)) — also safe, since exp of a non-positive
    prefix stays <= 1."""
    if _scan_mode() == "trimat":
        logs = jnp.log1p(-alpha)
        return jnp.exp(_prefix_scan(logs, exclusive=exclusive))
    return _hs_scan(om, exclusive=exclusive, mul=True)


def _decode_cols(d, wire8: bool):
    """Per-chunk attribute columns from the DMA'd window.

    f32-16 path: ``d`` is [chunk, PACK_COLS] f32 — direct slices, plus the
    contiguous rgbd block. wire-8 path: ``d`` is [chunk, WIRE_COLS] int32
    (tiles.pack_wire) — mx/my/gid are f32 bit patterns, the rest bf16
    pairs decoded with mask/shift + bitcast ([chunk, 1] column ops; bf16 ->
    f32 widening is exactly "append 16 zero mantissa bits")."""
    if not wire8:
        return dict(
            mx=d[:, PACK_MX : PACK_MX + 1],
            my=d[:, PACK_MY : PACK_MY + 1],
            ca=d[:, PACK_CA : PACK_CA + 1],
            cb=d[:, PACK_CB : PACK_CB + 1],
            cc=d[:, PACK_CC : PACK_CC + 1],
            opa=d[:, PACK_OPA : PACK_OPA + 1],
            rgbd=d[:, PACK_R : PACK_DEPTH + 1],
            gidf=d[:, PACK_GID : PACK_GID + 1],
        )
    f32 = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    u = lambda i: jax.lax.bitcast_convert_type(d[:, i : i + 1], jnp.uint32)
    hi = lambda i: f32(u(i) & jnp.uint32(0xFFFF0000))
    lo = lambda i: f32(u(i) << 16)
    return dict(
        mx=f32(d[:, WIRE_MX : WIRE_MX + 1]),
        my=f32(d[:, WIRE_MY : WIRE_MY + 1]),
        ca=hi(WIRE_CACB),
        cb=lo(WIRE_CACB),
        cc=hi(WIRE_CCOP),
        opa=lo(WIRE_CCOP),
        rgbd=jnp.concatenate(
            [hi(WIRE_RG), lo(WIRE_RG), hi(WIRE_BD), lo(WIRE_BD)], axis=1
        ),
        gidf=f32(d[:, WIRE_GID : WIRE_GID + 1]),
    )


def _alpha_terms(cols, px, py, lo, hi, chunk):
    """Shared fwd/bwd per-chunk alpha computation. ``cols``: decoded
    attribute columns (see _decode_cols); rows with index outside [lo, hi)
    (this tile's pairs within the aligned window) are masked out. The
    packed diagonal conic entries arrive PRE-HALVED (tiles.pack_table), so
    sigma needs no 0.5 scaling pass."""
    mx, my = cols["mx"], cols["my"]
    ca = cols["ca"]  # = 0.5 * conic_a
    cb = cols["cb"]
    cc = cols["cc"]  # = 0.5 * conic_c
    opa = cols["opa"]
    k = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    inrange = (k >= lo) & (k < hi)
    dx = px - mx  # [chunk, P]
    dy = py - my
    sigma = ca * dx * dx + cc * dy * dy + cb * dx * dy
    e = jnp.exp(-sigma)
    araw = opa * e
    ok = inrange & (sigma >= 0.0) & (araw >= ALPHA_MIN)
    alpha = jnp.where(ok, jnp.minimum(araw, ALPHA_MAX), 0.0)
    unclamped = ok & (araw <= ALPHA_MAX)
    return alpha, dict(
        dx=dx, dy=dy, e=e, araw=araw, unclamped=unclamped,
        ca=ca, cb=cb, cc=cc, opa=opa,
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


def _fwd_kernel(
    starts_ref, packed_ref, out_ref, buf, sem,
    *, chunk, tile, ntx, nty, pixels, wire8=False, nblocks=1,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    c0 = (start // chunk) * chunk
    nchunks = jnp.where(end > start, (end - c0 + chunk - 1) // chunk, 0)

    px, py = _pixel_coords(t, tile, ntx, nty, pixels)
    out_ref[0] = jnp.zeros((OUT_ROWS, pixels), jnp.float32)

    def dma(j, slot):
        off = pl.multiple_of(c0 + j * chunk, chunk)
        return pltpu.make_async_copy(
            packed_ref.at[:, pl.ds(off, chunk)], buf.at[slot], sem.at[slot]
        )

    # Double-buffered pipeline: chunk i+1 streams in while i composites.
    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    if nblocks == 1:
        def body(carry):
            i, tcur, _ = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < nchunks)
            def _():
                dma(i + 1, jax.lax.rem(i + 1, 2)).start()

            dma(i, slot).wait()
            d = jnp.transpose(buf[slot])  # [chunk, PACK_COLS | WIRE_COLS]
            cols = _decode_cols(d, wire8)
            base = c0 + i * chunk
            alpha, _ = _alpha_terms(
                cols, px, py, start - base, end - base, chunk
            )
            om = 1.0 - alpha
            # Transmittance before each pair = running T x exclusive prefix
            # product of (1 - alpha) — the forward recurrence itself, no
            # log/exp round trip (products of values <= 1 cannot overflow).
            pexcl = _prefix_prod(om, alpha, exclusive=True)
            w = alpha * tcur * pexcl  # [chunk, P]
            rgbd = cols["rgbd"]  # [chunk, 4] r,g,b,depth
            contrib = jax.lax.dot_general(
                rgbd, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [4, P]
            out_ref[0, ROW_R : ROW_B + 1, :] += contrib[0:3]
            out_ref[0, ROW_DEPTH, :] += contrib[3]
            tnew = tcur * (pexcl[chunk - 1 :] * om[chunk - 1 :])
            alive = jnp.max(tnew) > TERM_EPS
            return i + 1, tnew, alive

        def cond(carry):
            i, _, alive = carry
            return (i < nchunks) & alive

        tinit = jnp.ones((1, pixels), jnp.float32)
        i_end, tfin, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), tinit, jnp.bool_(True))
        )

        # Early termination leaves the prefetched next chunk's DMA in
        # flight; drain it so the semaphore is clean for the next grid step.
        @pl.when(i_end < nchunks)
        def _():
            dma(i_end, jax.lax.rem(i_end, 2)).wait()

        out_ref[0, ROW_ACC, :] = 1.0 - tfin[0]
        out_ref[0, ROW_T, :] = tfin[0]
        out_ref[0, ROW_NPROC, :] = jnp.full(
            (pixels,), 1.0, jnp.float32
        ) * i_end.astype(jnp.float32)
        return

    # --- Per-pixel-block termination (GS_PBLOCK > 1) ---------------------
    # The whole-tile loop terminates only when EVERY pixel saturates; deep
    # tiles keep compositing full [chunk, P] blocks for a handful of
    # stragglers. Splitting the tile's pixels into ``nblocks`` lane bands
    # with per-band termination skips the compute of saturated bands (the
    # CUDA rasterizer's per-pixel early exit, at vector-friendly
    # granularity). Chunk DMA/decode stay shared; the running T row lives
    # in out_ref[ROW_T] so each band's compositing is a predicated region
    # (carries cannot be updated under pl.when). ROW_NPROC holds each
    # band's processed-chunk count (the backward replays per band).
    pb = pixels // nblocks
    out_ref[0, ROW_T, :] = jnp.ones((pixels,), jnp.float32)

    def body(carry):
        i, _ = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        dma(i, slot).wait()
        d = jnp.transpose(buf[slot])  # [chunk, PACK_COLS | WIRE_COLS]
        cols = _decode_cols(d, wire8)
        base = c0 + i * chunk
        rgbd = cols["rgbd"]  # [chunk, 4]
        for b in range(nblocks):
            lo, hi = b * pb, (b + 1) * pb
            tb = out_ref[0, ROW_T : ROW_T + 1, lo:hi]  # [1, pb]

            @pl.when(jnp.max(tb) > TERM_EPS)
            def _():
                alpha, _ = _alpha_terms(
                    cols, px[:, lo:hi], py[:, lo:hi],
                    start - base, end - base, chunk,
                )
                om = 1.0 - alpha
                pexcl = _prefix_prod(om, alpha, exclusive=True)
                w = alpha * tb * pexcl  # [chunk, pb]
                contrib = jax.lax.dot_general(
                    rgbd, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [4, pb]
                out_ref[0, ROW_R : ROW_B + 1, lo:hi] += contrib[0:3]
                out_ref[0, ROW_DEPTH, lo:hi] += contrib[3]
                out_ref[0, ROW_T : ROW_T + 1, lo:hi] = tb * (
                    pexcl[chunk - 1 :] * om[chunk - 1 :]
                )
                out_ref[0, ROW_NPROC, lo:hi] = jnp.full(
                    (pb,), 1.0, jnp.float32
                ) * (i + 1).astype(jnp.float32)

        alive = jnp.max(out_ref[0, ROW_T, :]) > TERM_EPS
        return i + 1, alive

    def cond(carry):
        i, alive = carry
        return (i < nchunks) & alive

    i_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.bool_(True)))

    @pl.when(i_end < nchunks)
    def _():
        dma(i_end, jax.lax.rem(i_end, 2)).wait()

    tfin = out_ref[0, ROW_T, :]
    out_ref[0, ROW_ACC, :] = 1.0 - tfin


def _bwd_kernel(
    starts_ref, ostarts_ref, packed_ref, fwdout_ref, gout_ref, dpairs_ref,
    buf, gbuf, sem, osem, *scratch,
    chunk, tile, ntx, nty, pixels, wire8=False, nblocks=1,
):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    c0 = (start // chunk) * chunk
    obase = ostarts_ref[t]
    nchunks = jnp.where(end > start, (end - c0 + chunk - 1) // chunk, 0)

    px, py = _pixel_coords(t, tile, ntx, nty, pixels)
    # Tile-centered pixel-moment basis [6, P]: every dsig-weighted reduction
    # the conic/mean gradients need is a moment of dsig against
    # {1, qx, qy, qx^2, qy^2, qx*qy} (dx = qx - ux expands binomially), so
    # the ~14 per-chunk [chunk, P] VPU passes they used to cost collapse
    # into ONE [chunk, P] @ [P, 6] MXU contraction (depth P — well-shaped,
    # unlike the K=8 sigma matmul that lost; PERF.md) plus [chunk, 1]
    # epilogue math. Centering at the tile keeps |qx| <= tile/2 so the
    # binomial reconstruction's cancellation stays ~ (tile/2 / dx)^2 — f32
    # noise orders below the bf16 record-sort floor already accepted.
    basis = tcx = tcy = None
    if _moment_mode() != "off":  # resolved at trace time
        tcx = jnp.min(px) + (tile - 1) * 0.5
        tcy = jnp.min(py) + (tile - 1) * 0.5
        qx = px - tcx  # [1, P]
        qy = py - tcy
        basis = jnp.concatenate(
            [jnp.ones_like(qx), qx, qy, qx * qx, qy * qy, qx * qy], axis=0
        )  # [6, P]

    g_rgbd = jnp.concatenate(
        [gout_ref[0, ROW_R : ROW_B + 1, :], gout_ref[0, ROW_DEPTH : ROW_DEPTH + 1, :]],
        axis=0,
    )  # [4, P]
    # acc = 1 - T_final and T_final itself are both outputs; the combined
    # dL/dalpha_k contribution of the T_N path is (g_acc - g_T) T_N/(1-a_k).
    g_tn = gout_ref[0, ROW_ACC : ROW_ACC + 1, :] - gout_ref[0, ROW_T : ROW_T + 1, :]
    tfin = fwdout_ref[0, ROW_T : ROW_T + 1, :]  # [1, P]
    gt = g_tn * tfin  # loop-invariant piece of the dL/dalpha T_N path;
    # folded into the suffix carry below (rrem starts at r_tot - gt), so
    # the loop never spends a [chunk, P] pass subtracting it.
    # Total u = sum_k q_k w_k over every composited pair equals the
    # cotangent-weighted rendered color/depth (w_k c_k sums to the render),
    # so the suffix sums the traversal needs are available FRONT-TO-BACK:
    # r_in[k] = r_tot - prefix. Transmittance then follows the forward's
    # own prefix-product recurrence — no log-space reconstruction, no
    # overflow (see _prefix_prod), and one traversal direction shared with
    # the forward.
    out_rgbd = jnp.concatenate(
        [
            fwdout_ref[0, ROW_R : ROW_B + 1, :],
            fwdout_ref[0, ROW_DEPTH : ROW_DEPTH + 1, :],
        ],
        axis=0,
    )  # [4, P]
    r_tot = jnp.sum(g_rgbd * out_rgbd, axis=0, keepdims=True)  # [1, P]
    # Chunks the forward never composited (early termination at T < eps)
    # have EXACTLY zero gradient w.r.t. the forward as computed — skip their
    # compute entirely and only zero-fill their record slots below. With
    # pixel-band termination (nblocks > 1) ROW_NPROC holds per-band counts;
    # the zero-fill boundary is the max and each band replays its own.
    pbsz = pixels // nblocks
    nproc_b = [
        fwdout_ref[0, ROW_NPROC, b * pbsz].astype(jnp.int32)
        for b in range(nblocks)
    ]
    nproc = nproc_b[0]
    for _np_b in nproc_b[1:]:
        nproc = jnp.maximum(nproc, _np_b)

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

    # Forward-skipped chunks (early termination) still hold REAL pairs that
    # the presort segment reduction counts: every in-range pair must emit
    # exactly one record carrying its GID and VALID=1 (zero gradient
    # payload), else the sorted segment boundaries shift and gradients get
    # attributed to the wrong gaussians. Read the packed chunk (pure DMA,
    # no gradient compute) to recover the GID column. Double-buffered:
    # chunk j+1's read is in flight while chunk j is tagged and written,
    # and a gbuf slot is only rewritten once its j-2 write has drained.
    rows = jax.lax.broadcasted_iota(jnp.int32, (PACK_COLS, chunk), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (PACK_COLS, chunk), 1)
    gid_row = WIRE_GID if wire8 else PACK_GID

    @pl.when(nproc < nchunks)
    def _():
        rdma(nproc, jax.lax.rem(nproc, 2)).start()

    def zbody(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nchunks)
        def _():
            rdma(j + 1, jax.lax.rem(j + 1, 2)).start()

        rdma(j, slot).wait()

        @pl.when(j - 2 >= nproc)
        def _():
            wdma(j - 2, slot).wait()

        base = c0 + j * chunk
        inr = (cols_i >= start - base) & (cols_i < end - base)
        # The gid's biased-f32 bit pattern broadcasts from its wire/pack row
        # into the record's PACK_GID row (bit-identical in both formats).
        gidf = buf[slot][gid_row : gid_row + 1, :]
        if wire8:
            gidf = jax.lax.bitcast_convert_type(gidf, jnp.float32)
        gbuf[slot] = jnp.where(
            rows == PACK_GID,
            gidf,
            jnp.where(
                (rows == PACK_VALID) & inr, 1.0, 0.0
            ),
        )
        wdma(j, slot).start()
        return 0

    jax.lax.fori_loop(nproc, nchunks, zbody, 0)
    # Drain the last (up to two) outstanding zero-record writes before the
    # main back-to-front pass reuses the gbuf slots.
    @pl.when(nchunks - nproc >= 2)
    def _():
        wdma(nchunks - 2, jax.lax.rem(nchunks - 2, 2)).wait()

    @pl.when(nchunks - nproc >= 1)
    def _():
        wdma(nchunks - 1, jax.lax.rem(nchunks - 1, 2)).wait()

    if nblocks > 1:
        # Pixel-band replay (GS_PBLOCK > 1): each band traverses exactly
        # the chunks its forward composited (per-band ROW_NPROC), predicated
        # as side-effect regions. Band state (running T, suffix carry) lives
        # in the ``st`` scratch because carries cannot be written under
        # pl.when; per-chunk gradient columns accumulate across live bands
        # in ``gacc`` and are tagged/written once per chunk.
        st, gacc = scratch
        st[0:2, :] = jnp.concatenate(
            [jnp.ones((1, pixels), jnp.float32), r_tot - gt], axis=0
        )

        @pl.when(nproc > 0)
        def _():
            rdma(0, 0).start()

        rows_k = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

        def bbody(i, _):
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < nproc)
            def _():
                rdma(i + 1, jax.lax.rem(i + 1, 2)).start()

            rdma(i, slot).wait()
            d = jnp.transpose(buf[slot])
            dc = _decode_cols(d, wire8)
            base = c0 + i * chunk
            rgbd = dc["rgbd"]  # [chunk, 4]
            gacc[:, :] = jnp.zeros((chunk, PACK_COLS), jnp.float32)
            for b in range(nblocks):
                lo_px, hi_px = b * pbsz, (b + 1) * pbsz

                @pl.when(i < nproc_b[b])
                def _():
                    tcur = st[0:1, lo_px:hi_px]
                    rrem = st[1:2, lo_px:hi_px]
                    alpha, aux = _alpha_terms(
                        dc, px[:, lo_px:hi_px], py[:, lo_px:hi_px],
                        start - base, end - base, chunk,
                    )
                    om = 1.0 - alpha
                    inv1m = 1.0 / om
                    pexcl = _prefix_prod(om, alpha, exclusive=True)
                    tk = tcur * pexcl
                    w = alpha * tk
                    gr = g_rgbd[:, lo_px:hi_px]  # [4, pb]
                    q = jax.lax.dot_general(
                        rgbd, gr, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [chunk, pb]
                    u = q * w
                    usum = jnp.sum(u, axis=0, keepdims=True)
                    rnext = rrem - usum
                    r_in = (
                        _prefix_scan(u, reverse=True, exclusive=True) + rnext
                    )
                    dalpha = q * tk - r_in * inv1m
                    dcols = jax.lax.dot_general(
                        w, gr, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [chunk, 4]
                    live = aux["unclamped"]
                    if _moment_mode() != "off":
                        m = jnp.where(live, dalpha * alpha, 0.0)
                        prec = (
                            jax.lax.Precision.HIGHEST
                            if _moment_mode() == "hi"
                            else jax.lax.Precision.DEFAULT
                        )
                        S = jax.lax.dot_general(
                            m, basis[:, lo_px:hi_px],
                            (((1,), (1,)), ((), ())),
                            precision=prec,
                            preferred_element_type=jnp.float32,
                        )  # [chunk, 6]
                        s0 = S[:, 0:1]
                        s1x, s1y = S[:, 1:2], S[:, 2:3]
                        s2x, s2y, sxy = S[:, 3:4], S[:, 4:5], S[:, 5:6]
                        ux = dc["mx"] - tcx
                        uy = dc["my"] - tcy
                        dopa = s0 / aux["opa"]
                        sx = -(s1x - ux * s0)
                        sy = -(s1y - uy * s0)
                        dca = -(s2x - 2.0 * ux * s1x + ux * ux * s0)
                        dcc = -(s2y - 2.0 * uy * s1y + uy * uy * s0)
                        dcb = -(sxy - ux * s1y - uy * s1x + ux * uy * s0)
                    else:
                        de = dalpha * jnp.where(live, aux["e"], 0.0)
                        dopa = jnp.sum(de, axis=1, keepdims=True)
                        dsig = de * (-aux["opa"])
                        dx, dy = aux["dx"], aux["dy"]
                        dsx = dsig * dx
                        dsy = dsig * dy
                        dca = jnp.sum(dsx * dx, axis=1, keepdims=True)
                        dcb = jnp.sum(dsx * dy, axis=1, keepdims=True)
                        dcc = jnp.sum(dsy * dy, axis=1, keepdims=True)
                        sx = jnp.sum(dsx, axis=1, keepdims=True)
                        sy = jnp.sum(dsy, axis=1, keepdims=True)
                    dmx = -(2.0 * aux["ca"] * sx + aux["cb"] * sy)
                    dmy = -(2.0 * aux["cc"] * sy + aux["cb"] * sx)
                    gacc[:, 0:10] += jnp.concatenate(
                        [dmx, dmy, dca, dcb, dcc, dopa, dcols], axis=1
                    )
                    st[0:1, lo_px:hi_px] = tcur * (
                        pexcl[chunk - 1 :] * om[chunk - 1 :]
                    )
                    st[1:2, lo_px:hi_px] = rnext

            inrange = (
                (rows_k >= start - base) & (rows_k < end - base)
            ).astype(jnp.float32)
            parts = [gacc[:, 0:10], dc["gidf"], inrange]
            if PACK_COLS > 12:
                parts.append(
                    jnp.zeros((chunk, PACK_COLS - 12), jnp.float32)
                )
            grec = jnp.concatenate(parts, axis=1)

            @pl.when(i >= 2)
            def _():
                wdma(i - 2, slot).wait()

            gbuf[slot] = jnp.transpose(grec)
            wdma(i, slot).start()
            return 0

        jax.lax.fori_loop(0, nproc, bbody, 0)

        @pl.when(nproc >= 2)
        def _():
            wdma(nproc - 2, jax.lax.rem(nproc - 2, 2)).wait()

        @pl.when(nproc >= 1)
        def _():
            wdma(nproc - 1, jax.lax.rem(nproc - 1, 2)).wait()

        return

    # Front-to-back traversal over the PROCESSED chunks only (same
    # direction as the forward); reads double-buffered, writes overlapped.
    @pl.when(nproc > 0)
    def _():
        rdma(0, 0).start()

    def body(i, carry):
        tcur, rrem = carry  # T before this chunk; sum of u over chunks >= i
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < nproc)
        def _():
            rdma(i + 1, jax.lax.rem(i + 1, 2)).start()

        rdma(i, slot).wait()
        d = jnp.transpose(buf[slot])  # [chunk, PACK_COLS | WIRE_COLS]
        dc = _decode_cols(d, wire8)
        base = c0 + i * chunk

        alpha, aux = _alpha_terms(
            dc, px, py, start - base, end - base, chunk
        )
        om = 1.0 - alpha
        inv1m = 1.0 / om
        # Transmittance before each gaussian: the forward recurrence.
        pexcl = _prefix_prod(om, alpha, exclusive=True)
        tk = tcur * pexcl
        w = alpha * tk
        rgbd = dc["rgbd"]  # [chunk, 4]
        q = jax.lax.dot_general(
            rgbd, g_rgbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, P] = sum_ch c_ch * g_ch + d * g_d
        u = q * w
        usum = jnp.sum(u, axis=0, keepdims=True)
        rnext = rrem - usum  # sum of (u - gt-share) over chunks > i
        # r_in[k] = sum_{j>k} u[j]: exact reverse scan within the chunk,
        # r_tot-minus-prefix across chunks. rrem carries the -gt fold.
        # Precision note: reconstructing suffixes as r_tot - prefix leaves
        # ~eps*|r_tot| absolute error in r_in for pairs deep in the
        # composite (true suffix << r_tot), amplified by inv1m near
        # ALPHA_MAX. grads-close oracle tolerances hold at current scales
        # (tests/test_rasterize_pallas.py); if gradient noise appears on
        # long opaque tiles, carry rrem with a compensated (Kahan) update.
        r_in = _prefix_scan(u, reverse=True, exclusive=True) + rnext
        dalpha = q * tk - r_in * inv1m

        # Chain through alpha -> (opacity, conic, mean2d); clamped/skipped
        # entries get zero gradient (matches the oracle's autodiff).
        dcols = jax.lax.dot_general(
            w, g_rgbd, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [chunk, 4] = (dr, dg, db, ddepth)
        live = aux["unclamped"]
        if _moment_mode() != "off":
            # m = -dsig = dalpha * alpha on live pairs (alpha == araw
            # there): the ONLY remaining [chunk, P] gradient pass. All five
            # conic/mean reductions and dopa are moments of m against the
            # tile-centered pixel basis — one MXU contraction (see basis
            # above), then [chunk, 1] binomial reconstruction with the
            # centered means. A/B knob GS_MOMENT: "hi" = Precision.HIGHEST
            # (6 bf16 MXU passes, f32-exact), "bf16" = default precision
            # (1 pass; ~2^-9 relative moment rounding — the same noise
            # floor as the default-ON bf16 record sort), "off" = the
            # round-3 VPU moment form below.
            m = jnp.where(live, dalpha * alpha, 0.0)
            prec = (
                jax.lax.Precision.HIGHEST
                if _moment_mode() == "hi"
                else jax.lax.Precision.DEFAULT
            )
            S = jax.lax.dot_general(
                m, basis, (((1,), (1,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.float32,
            )  # [chunk, 6] = sum_p m * {1, qx, qy, qx^2, qy^2, qx qy}
            s0 = S[:, 0:1]
            s1x, s1y = S[:, 1:2], S[:, 2:3]
            s2x, s2y, sxy = S[:, 3:4], S[:, 4:5], S[:, 5:6]
            ux = dc["mx"] - tcx  # centered means
            uy = dc["my"] - tcy
            # de = dalpha * e * live = m / opa (alpha = opa * e on live).
            dopa = s0 / aux["opa"]
            # dsig moments: dsig = -m; dx = qx - ux, dy = qy - uy.
            sx = -(s1x - ux * s0)  # sum dsig * dx
            sy = -(s1y - uy * s0)
            dca = -(s2x - 2.0 * ux * s1x + ux * ux * s0)  # sum dsig dx^2
            dcc = -(s2y - 2.0 * uy * s1y + uy * uy * s0)
            dcb = -(sxy - ux * s1y - uy * s1x + ux * uy * s0)
        else:
            # VPU moment form (round 3): the five conic/mean gradients
            # share the dsig-weighted first/second moments of (dx, dy).
            de = dalpha * jnp.where(live, aux["e"], 0.0)
            dopa = jnp.sum(de, axis=1, keepdims=True)
            dsig = de * (-aux["opa"])
            dx, dy = aux["dx"], aux["dy"]
            dsx = dsig * dx
            dsy = dsig * dy
            dca = jnp.sum(dsx * dx, axis=1, keepdims=True)
            dcb = jnp.sum(dsx * dy, axis=1, keepdims=True)
            dcc = jnp.sum(dsy * dy, axis=1, keepdims=True)
            sx = jnp.sum(dsx, axis=1, keepdims=True)
            sy = jnp.sum(dsy, axis=1, keepdims=True)
        dmx = -(2.0 * aux["ca"] * sx + aux["cb"] * sy)
        dmy = -(2.0 * aux["cc"] * sy + aux["cb"] * sx)

        # Tag each record with its gaussian id + in-range validity so the
        # XLA side can sort records by gaussian for the segment reduction.
        k = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
        inrange = ((k >= start - base) & (k < end - base)).astype(jnp.float32)
        parts = [
            dmx, dmy, dca, dcb, dcc, dopa,
            dcols,  # dr, dg, db at PACK_R..PACK_B, ddepth at PACK_DEPTH
            dc["gidf"],
            inrange,
        ]
        if PACK_COLS > 12:  # zero-width vectors are invalid under Mosaic
            parts.append(jnp.zeros((chunk, PACK_COLS - 12), jnp.float32))
        grec = jnp.concatenate(parts, axis=1)
        # Reuse of a gbuf slot must wait for its previous write to drain.
        @pl.when(i >= 2)
        def _():
            wdma(i - 2, slot).wait()

        gbuf[slot] = jnp.transpose(grec)
        wdma(i, slot).start()

        tnext = tcur * (pexcl[chunk - 1 :] * om[chunk - 1 :])
        return tnext, rnext

    jax.lax.fori_loop(
        0,
        nproc,
        body,
        (jnp.ones((1, pixels), jnp.float32), r_tot - gt),
    )

    # Drain outstanding writes (the last two chunks processed).
    @pl.when(nproc >= 2)
    def _():
        wdma(nproc - 2, jax.lax.rem(nproc - 2, 2)).wait()

    @pl.when(nproc >= 1)
    def _():
        wdma(nproc - 1, jax.lax.rem(nproc - 1, 2)).wait()


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "ntx", "nty", "tile", "chunk", "wire8"),
)
def _composite_fwd_call(
    packed, tile_starts, num_tiles, ntx, nty, tile, chunk, wire8=False
):
    pixels = tile * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, OUT_ROWS, pixels), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM(
                (2, WIRE_COLS if wire8 else PACK_COLS, chunk),
                jnp.int32 if wire8 else jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, tile=tile, ntx=ntx, nty=nty, pixels=pixels,
        wire8=wire8, nblocks=_pblock(pixels),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, OUT_ROWS, pixels), jnp.float32),
        interpret=_interpret(),
    )(tile_starts, packed)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_tiles", "ntx", "nty", "tile", "chunk", "cap_pad", "wire8"
    ),
)
def _composite_bwd_call(
    packed, tile_starts, out_starts, fwd_out, g_out,
    num_tiles, ntx, nty, tile, chunk, cap_pad, wire8=False,
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
            pltpu.VMEM(
                (2, WIRE_COLS if wire8 else PACK_COLS, chunk),
                jnp.int32 if wire8 else jnp.float32,
            ),
            pltpu.VMEM((2, PACK_COLS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        + (
            # Pixel-band replay state (running T + suffix carry rows) and
            # the per-chunk cross-band gradient-column accumulator.
            [
                pltpu.VMEM((8, pixels), jnp.float32),
                pltpu.VMEM((chunk, PACK_COLS), jnp.float32),
            ]
            if _pblock(pixels) > 1
            else []
        ),
    )
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, tile=tile, ntx=ntx, nty=nty, pixels=pixels,
        wire8=wire8, nblocks=_pblock(pixels),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((PACK_COLS, cap_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_interpret(),
    )(tile_starts, out_starts, packed, fwd_out, g_out)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16)
)
def render_tiles(
    table, pair_dummy, gid_sorted, row_order, tile_starts, out_starts,
    offsets, counts, num_tiles, ntx, nty, tile, chunk,
    want_depth_grad=True, want_absgrad=True, sort_bf16=False, wire8=False,
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
      gid_sorted / row_order / tile_starts / out_starts / offsets / counts:
        binning arrays (tiles.bin_gaussians output), non-differentiable.
        row_order (size C*N, or size 0 = disabled) physically reorders the
        table by center tile before the pair gather for access locality;
        gid_sorted must then be in rank space (bin_gaussians does both).
    Returns:
      out [num_tiles, OUT_ROWS, tile*tile] f32 (rows: r, g, b, acc, depth,
      T_final, chunks-processed; the last two rows are non-differentiable
      bookkeeping).
    """
    return _render_fwd(
        table, pair_dummy, gid_sorted, row_order, tile_starts, out_starts,
        offsets, counts, num_tiles, ntx, nty, tile, chunk,
        want_depth_grad, want_absgrad, sort_bf16, wire8,
    )[0]


def _render_fwd(
    table, pair_dummy, gid_sorted, row_order, tile_starts, out_starts,
    offsets, counts, num_tiles, ntx, nty, tile, chunk,
    want_depth_grad=True, want_absgrad=True, sort_bf16=False, wire8=False,
):
    del pair_dummy  # zeros by contract; see docstring
    if row_order.shape[0]:
        # Locality permutation: one contiguous-index row gather of [C*N]
        # rows makes the (much larger) per-pair gather read near-contiguous
        # rows. The custom bwd is unaffected: records carry ORIGINAL gids,
        # so dtable lands in original row order, matching the table operand.
        table = jnp.take(table, row_order, axis=0)
    if wire8:
        # Compressed wire format: bf16-pair packing runs ONCE over the
        # [C*N] rows, and every per-PAIR cost below (the dominant random
        # row gather + the kernels' chunk DMA) moves half the bytes. The
        # bf16 rounding is forward-only; the VJP returns exact-layout f32
        # dtable rows (straight-through, same noise class as sort_bf16).
        table = pack_wire(table)
    # XLA fuses the transpose into the gather, producing the attribute-major
    # physical layout directly (minor dim = pairs, no lane padding).
    packed = jnp.transpose(jnp.take(table, gid_sorted, axis=0, mode="clip"))
    out = _composite_fwd_call(
        packed, tile_starts, num_tiles, ntx, nty, tile, chunk, wire8=wire8
    )
    res = (packed, row_order, tile_starts, out_starts, offsets, counts, out)
    return out, res


def reduce_records(
    records, n_written, offsets, counts, pair_cap,
    *, n_base, want_absgrad, sort_bf16,
):
    """Per-pair gradient records [PACK_COLS, CAP_PAD] -> per-gaussian sums.

    Sorts records by the gaussian id they carry; valid pairs land grouped
    per gaussian in presort order (gids were assigned in presort order),
    garbage slots (never written / masked rows) sort to the end. Returns
    [C*N, n_base (+2 absgrad)] sums. Robust to arbitrary garbage (incl.
    NaN/Inf) in slots at/after ``n_written`` and in VALID=0 columns — the
    hardware leaves raw HBM contents there (see the masking note below).
    """
    cap_pad = records.shape[1]
    written = jnp.arange(cap_pad, dtype=jnp.int32) < n_written
    valid = written & (records[PACK_VALID] > 0.5)
    # GID column carries gid + GID_BIAS as f32 bits (normal-float encoding;
    # see tiles.GID_BIAS). Positive normal floats order like their bit
    # patterns, so the raw bitcast is monotone in gid and the int32-max
    # sentinel (> any biased gid < 0x7F800000) still sorts invalids last.
    key = jnp.where(
        valid,
        jax.lax.bitcast_convert_type(records[PACK_GID], jnp.int32),
        jnp.int32(2**31 - 1),
    )
    if sort_bf16:
        # Halve the sort's payload traffic: round each gradient column to
        # bf16 and ride PAIRS of columns in one int32 payload (5 packed
        # columns instead of 10 f32). The per-pair terms get bf16-rounded
        # (~2^-9 rel) BEFORE the per-gaussian sum — a ~0.2% gradient noise
        # floor, acceptable for SGD; flag-gated off by default.
        def pack2(a, b):
            ah = jax.lax.bitcast_convert_type(
                a.astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            bh = jax.lax.bitcast_convert_type(
                b.astype(jnp.bfloat16), jnp.uint16
            ).astype(jnp.uint32)
            return ((ah << 16) | bh).astype(jnp.int32)

        packed_ops = tuple(
            pack2(records[2 * i], records[2 * i + 1]) for i in range(5)
        )
        # is_stable=False: a stable sort carries an extra iota payload
        # through every comparator round; record order within a gaussian's
        # segment only permutes the fp summation order. (Safe only because
        # invalid-key payloads are zeroed after the sort — see below.)
        sorted_ops = jax.lax.sort(
            (key,) + packed_ops, num_keys=1, is_stable=False
        )

        def unpack2(p):
            u = p.astype(jnp.uint32)
            hi = jax.lax.bitcast_convert_type(
                (u >> 16).astype(jnp.uint16), jnp.bfloat16
            )
            lo = jax.lax.bitcast_convert_type(
                u.astype(jnp.uint16), jnp.bfloat16
            )
            return hi.astype(jnp.float32), lo.astype(jnp.float32)

        cols = []
        for p in sorted_ops[1:]:
            hi, lo = unpack2(p)
            cols.extend([hi, lo])
        dpre = jnp.stack(cols[:n_base], axis=0)  # [R, CAP_PAD]
    else:
        ops = tuple(records[i] for i in range(n_base))
        sorted_ops = jax.lax.sort(
            (key,) + ops, num_keys=1, is_stable=False
        )
        dpre = jnp.stack(sorted_ops[1:], axis=0)  # [R, CAP_PAD]
    # Zero every invalid-key column: the NEVER-WRITTEN slots past
    # out_starts[-1] hold raw HBM garbage (often NaN). A stable sort
    # incidentally kept them at the very end (their original positions are
    # maximal among the int32-max keys), but an unstable sort interleaves
    # them with the written-invalid records, so one NaN lands inside an
    # early 256-block of the segment reduction and its exclusive
    # block-prefix (cumsum(tot) - tot = NaN - NaN) poisons EVERY gaussian's
    # gradient. Masking here makes the reduction sort-order-independent.
    dpre = jnp.where(sorted_ops[0][None, :] != jnp.int32(2**31 - 1), dpre, 0.0)
    if want_absgrad:
        # |dmx|, |dmy| ride the same permutation as dmx/dmy — take abs of
        # the sorted columns instead of sorting two extra payload columns.
        dpre = jnp.concatenate([dpre, jnp.abs(dpre[PACK_MX : PACK_MY + 1])], 0)
    # Under pair-capacity overflow the dropped pairs are exactly the presort
    # tail, so clip the per-gaussian segments to the surviving range.
    offs2 = jnp.minimum(offsets, pair_cap)
    cnt2 = jnp.minimum(offsets + counts, pair_cap) - offs2
    return segment_reduce_presort(dpre, offs2, cnt2)  # [C*N, R]


def _render_bwd(
    num_tiles, ntx, nty, tile, chunk, want_depth_grad, want_absgrad,
    sort_bf16, wire8, res, g_out,
):
    packed, row_order, tile_starts, out_starts, offsets, counts, out = res
    row_order_shape = row_order.shape
    pair_cap = packed.shape[1]
    cap_pad = padded_capacity(pair_cap, num_tiles, chunk)
    records = _composite_bwd_call(
        packed, tile_starts, out_starts, out, g_out,
        num_tiles, ntx, nty, tile, chunk, cap_pad, wire8=wire8,
    )  # [PACK_COLS, CAP_PAD] per-pair grads in aligned bwd-slot layout
    n_base = 10 if want_depth_grad else 9  # ddepth column optional
    red = reduce_records(
        records, out_starts[-1], offsets, counts, pair_cap,
        n_base=n_base, want_absgrad=want_absgrad, sort_bf16=sort_bf16,
    )
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
        f0(row_order_shape),  # row_order
        f0(tile_starts.shape),
        f0(out_starts.shape),
        f0(offsets.shape),
        f0(counts.shape),
    )


render_tiles.defvjp(_render_fwd, _render_bwd)


def unpack_tiles(
    out: jnp.ndarray, num_cams: int, ntx: int, nty: int, tile: int, width: int, height: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[num_tiles, OUT_ROWS, tile*tile] -> color [C,H,W,3], alpha/depth [C,H,W].

    Only rows 0..ROW_DEPTH leave the op — slicing the bookkeeping rows
    (T_final, chunks-processed, spare) BEFORE the tile->raster transpose
    cuts 3/8 of its bytes."""
    rows = ROW_DEPTH + 1
    x = out.reshape(num_cams, nty, ntx, OUT_ROWS, tile, tile)[:, :, :, :rows]
    x = jnp.transpose(x, (0, 3, 1, 4, 2, 5))  # [C, rows, nty, tile, ntx, tile]
    x = x.reshape(num_cams, rows, nty * tile, ntx * tile)
    x = x[:, :, :height, :width]
    color = jnp.transpose(x[:, ROW_R : ROW_B + 1], (0, 2, 3, 1))
    alpha = x[:, ROW_ACC]
    depth = x[:, ROW_DEPTH]
    return color, alpha, depth
