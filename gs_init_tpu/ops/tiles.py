"""Tile binning for the production rasterizer — pure XLA, static shapes.

TPU-native replacement for gsplat's ``isect_tiles``/``isect_offset_encode``
CUDA kernels. Design (no atomics, no dynamic allocation):

1. per (camera, gaussian): tile span from screen radius
2. exclusive prefix-sum of span sizes -> pair offsets
3. expand to a fixed-capacity pair list; the pair->gaussian map is built with
   a scatter + cumsum (a 17-round binary search per pair would be ~40x more
   gather traffic on TPU)
4. lexicographic ``lax.sort`` by (tile_id, depth) with the flattened
   (camera*gaussian) index as payload
5. per-tile ranges via one-shot comparisons (``searchsorted`` compare_all)

Pairs live in **sorted order, attribute-major** ([PACK_COLS, PAIR_CAP] f32,
minor dim = pairs so XLA doesn't lane-pad the narrow attribute dim). Tile
ranges stay *unaligned*; the Pallas compositor DMAs chunk-aligned windows
starting at ``align_down(start)`` and masks pairs outside [start, end) —
read overlap between adjacent tiles is a few KB. This removes the aligned
re-gather layer (three 2.6M-element gathers/scatters, ~80 ms/step at garden
scale in round 1). The backward kernel writes per-pair gradient records to
*per-tile aligned output slots* (``out_starts``) so no two grid steps write
the same chunk. The per-gaussian gradient reduction sorts the records by the
gaussian id they carry (PACK_GID) — an 11-column sort measured ~4x cheaper
than the index-gather alternative — then runs a cumsum + boundary difference
over the resulting presort-contiguous segments (no scatter-add).
"""
from __future__ import annotations

from typing import NamedTuple

import os as _os

import jax
import jax.numpy as jnp
import numpy as np

# Column layout of the packed per-pair row consumed by the Pallas kernel.
PACK_MX, PACK_MY = 0, 1
PACK_CA, PACK_CB, PACK_CC = 2, 3, 4
PACK_OPA = 5
PACK_R, PACK_G, PACK_B = 6, 7, 8
PACK_DEPTH = 9
PACK_GID = 10  # gaussian id (biased int32 bits viewed as f32, see GID_BIAS)
PACK_VALID = 11  # 1.0 for in-range pairs (written by the backward kernel)
# The gid column rides f32 tensors through gathers, Mosaic selects and DMAs.
# Raw int32 bits for gid < 2**23 are f32 DENORMALS, and TPU vector units
# flush denormals to zero — which silently zeroed the backward's sort keys
# on hardware (gradients then attributed to whatever pairs sat at each
# presort position). Biasing by 0x40000000 (the bit pattern of 2.0f) maps
# every id below ~1.06e9 to a normal positive float, and positive normal
# floats order exactly like their bit patterns, so the biased view stays
# monotone in gid and sorts correctly with no decode step.
GID_BIAS = 0x40000000
# 12 used columns; padded to 16 because Mosaic DMA slices must be 8-aligned
# along the sublane dim (12 was rejected: "Slice shape along dimension 0
# must be aligned to tiling (8)").
PACK_COLS = 16

# --- Compressed 8-column wire format (GS_WIRE=8) -------------------------
# Halves the dominant per-pair random-row gather traffic (64 -> 32 B/row)
# and the kernels' chunk DMA/VMEM: mx/my keep f32 (bf16 at x ~ 1300 px
# quantizes to 8 px), gid keeps its exact biased-f32 bit pattern, and the
# eight remaining attributes ride as bf16 PAIRS. The wire table is int32
# END TO END (gather, transpose, DMA) so no packed bit pattern is ever a
# denormal f32 in an arithmetic/select path — the flush-to-zero hazard that
# forced GID_BIAS cannot arise. Kernels decode with shift/mask + bitcast
# ([chunk, 1] column ops). The bf16 rounding happens FORWARD-only; the VJP
# treats it as identity (same ~2^-9 noise floor as the default-ON bf16
# record sort).
WIRE_MX, WIRE_MY = 0, 1  # f32 bits
WIRE_CACB = 2  # bf16(0.5*conic_a) << 16 | bf16(conic_b)
WIRE_CCOP = 3  # bf16(0.5*conic_c) << 16 | bf16(opacity)
WIRE_RG = 4  # bf16(r) << 16 | bf16(g)
WIRE_BD = 5  # bf16(b) << 16 | bf16(depth)
WIRE_GID = 6  # biased gid f32 bits (same pattern as PACK_GID, as int32)
WIRE_COLS = 8  # padded: Mosaic sublane slices must be 8-aligned


def pack_wire(table: jnp.ndarray) -> jnp.ndarray:
    """[C*N, PACK_COLS] f32 attribute rows -> [C*N, WIRE_COLS] int32 rows.

    Runs once per step over per-gaussian rows (cheap) so every downstream
    per-PAIR cost (pack gather, kernel DMA) moves half the bytes.
    """

    def bits16(x):  # f32 -> bf16 bits (RNE) as uint32
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.bfloat16), jnp.uint16
        ).astype(jnp.uint32)

    def pair(hi, lo):
        return ((bits16(hi) << 16) | bits16(lo)).astype(jnp.int32)

    f32bits = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    cols = [
        f32bits(table[:, PACK_MX]),
        f32bits(table[:, PACK_MY]),
        pair(table[:, PACK_CA], table[:, PACK_CB]),
        pair(table[:, PACK_CC], table[:, PACK_OPA]),
        pair(table[:, PACK_R], table[:, PACK_G]),
        pair(table[:, PACK_B], table[:, PACK_DEPTH]),
        f32bits(table[:, PACK_GID]),
        jnp.zeros_like(table[:, 0], jnp.int32),
    ]
    return jnp.stack(cols, axis=1)


class TileBinning(NamedTuple):
    """Sorted pair list with unaligned tile ranges + aligned output slots."""

    gid_sorted: jnp.ndarray  # [PAIR_CAP] int32 flattened (cam*N + gaussian)
    tile_starts: jnp.ndarray  # [num_tiles + 1] int32 sorted-order ranges
    out_starts: jnp.ndarray  # [num_tiles + 1] int32 chunk-aligned bwd slots
    num_tiles_x: int
    num_tiles_y: int
    overflow: jnp.ndarray  # [] int32: pairs dropped due to capacity
    # Per-gaussian presort segment [offset, offset+count) for the sort-based
    # backward reduction (see rasterize.render_tiles).
    gauss_offsets: jnp.ndarray  # [C*N] exclusive prefix of per-gaussian pairs
    gauss_counts: jnp.ndarray  # [C*N]
    # Optional pack-gather locality permutation (reorder_rows=True): table
    # rows get physically reordered by the tile of the gaussian center, and
    # gid_sorted is remapped into that rank space, so consecutive sorted
    # pairs read neighbouring table rows. Size-0 when disabled.
    row_order: jnp.ndarray = np.zeros((0,), np.int32)  # [C*N] or [0]


def tile_spans(
    means2d: jnp.ndarray,  # [M, 2] flattened over cameras
    radii: jnp.ndarray,  # [M] int32 (0 = culled)
    width: int,
    height: int,
    tile_size: int,
    extents: jnp.ndarray | None = None,  # [M, 2] int32 per-axis half-extents
):
    """Inclusive tile ranges [x0, x1] x [y0, y1] per gaussian and pair counts.

    ``extents`` (projection.Projected.extents) gives the ellipse's per-axis
    AABB — strictly tighter than the bounding circle ``radii`` for any
    anisotropic gaussian while covering the same level set, so every
    pair-proportional cost downstream (pack gathers, sorts, both Pallas
    kernels) shrinks with it. Falls back to the circle when absent.
    """
    num_tx = -(-width // tile_size)
    num_ty = -(-height // tile_size)
    if extents is not None:
        rx = extents[:, 0].astype(jnp.float32)
        ry = extents[:, 1].astype(jnp.float32)
    else:
        rx = ry = radii.astype(jnp.float32)
    x0 = jnp.floor((means2d[:, 0] - rx) / tile_size).astype(jnp.int32)
    x1 = jnp.floor((means2d[:, 0] + rx) / tile_size).astype(jnp.int32)
    y0 = jnp.floor((means2d[:, 1] - ry) / tile_size).astype(jnp.int32)
    y1 = jnp.floor((means2d[:, 1] + ry) / tile_size).astype(jnp.int32)
    x0 = jnp.clip(x0, 0, num_tx - 1)
    x1 = jnp.clip(x1, 0, num_tx - 1)
    y0 = jnp.clip(y0, 0, num_ty - 1)
    y1 = jnp.clip(y1, 0, num_ty - 1)
    valid = radii > 0
    counts = jnp.where(valid, (x1 - x0 + 1) * (y1 - y0 + 1), 0)
    return (x0, x1, y0, y1), counts, (num_tx, num_ty)


def _segment_ids_from_offsets(offsets: jnp.ndarray, total: jnp.ndarray, cap: int):
    """Map each slot in [0, cap) to its segment: scatter ones at segment
    starts, cumsum, subtract 1. Replaces a per-slot binary search.

    Empty segments share their start with the next segment; their scatters
    accumulate at the tied index so the cumsum resolves to the *last* segment
    of the tie group — exactly the one that occupies those slots.
    """
    ind = jnp.zeros((cap,), jnp.int32)
    ind = ind.at[jnp.minimum(offsets, cap)].add(1, mode="drop")
    ids = jnp.cumsum(ind) - 1
    valid = jnp.arange(cap, dtype=jnp.int32) < total
    return jnp.clip(ids, 0, None), valid


def padded_capacity(pair_capacity: int, num_tiles: int, chunk: int) -> int:
    """Static capacity of the backward kernel's aligned-slot output."""
    cap = pair_capacity + num_tiles * (chunk - 1)
    return -(-cap // chunk) * chunk


def bin_gaussians(
    means2d: jnp.ndarray,  # [C, N, 2]
    radii: jnp.ndarray,  # [C, N] int32
    depths: jnp.ndarray,  # [C, N]
    width: int,
    height: int,
    tile_size: int,
    pair_capacity: int,
    chunk: int = 128,
    reorder_rows: bool = False,
    extents: jnp.ndarray | None = None,  # [C, N, 2] int32 (see tile_spans)
) -> TileBinning:
    assert pair_capacity % chunk == 0, "pair_capacity must be chunk-aligned"
    c, n = radii.shape
    m2 = means2d.reshape(c * n, 2)
    rad = radii.reshape(c * n)
    dep = depths.reshape(c * n)

    (x0, x1, y0, y1), counts, (ntx, nty) = tile_spans(
        m2, rad, width, height, tile_size,
        extents=None if extents is None else extents.reshape(c * n, 2),
    )
    tiles_per_cam = ntx * nty
    num_tiles = c * tiles_per_cam

    offsets = jnp.cumsum(counts) - counts  # exclusive prefix
    total = offsets[-1] + counts[-1]

    # pair -> gaussian map via scatter + cumsum.
    pair_gid, pair_valid = _segment_ids_from_offsets(
        offsets, total, pair_capacity
    )

    # One gather of the packed per-gaussian table (span + depth key) instead
    # of five: gathers dominate binning cost on TPU. The (x0, y0, width)
    # span rides one int32 as 10-bit fields (tile grids up to 1024 tiles
    # per dim = 16k px), so the table is 3 columns, not 5. Positive-depth
    # float bits are monotone as int32 -> cheap sortable key packed
    # alongside.
    assert max(ntx, nty) < 1024, "tile grid exceeds 10-bit span packing"
    depth_bits = jax.lax.bitcast_convert_type(jnp.maximum(dep, 0.0), jnp.int32)
    span = (x0 << 20) | (y0 << 10) | (x1 - x0 + 1)
    span_tbl = jnp.stack([span, offsets, depth_bits], axis=1)
    g = span_tbl[pair_gid]  # [CAP, 3]
    idx = jnp.arange(pair_capacity, dtype=jnp.int32)
    local = idx - g[:, 1]
    w_span = g[:, 0] & 0x3FF
    tx = (g[:, 0] >> 20) + local % w_span
    ty = ((g[:, 0] >> 10) & 0x3FF) + local // w_span
    cam = pair_gid // n
    tile = cam * tiles_per_cam + ty * ntx + tx
    tile = jnp.where(pair_valid, tile, num_tiles)  # sentinel sorts to the end

    # is_stable=False: XLA's stable sort rides an extra iota operand through
    # every comparator round; equal (tile, depth) keys are exact float-depth
    # ties whose compositing order is arbitrary anyway.
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    db = 31 - tile_bits
    if _os.environ.get("GS_PACK_KEY") == "1" and db >= 16:
        # Experimental single-key sort: tile id and the top db bits of the
        # positive-float depth pattern share one int32 key (2 sort operands
        # instead of 3). Depth resolution drops to (db - 9) mantissa bits
        # (~2^-11 relative at garden scale) — near-coplanar splats may
        # composite in either order, so this stays opt-in until an e2e
        # quality run clears it.
        key = (tile << db) | (g[:, 2] >> (31 - db))
        key_s, gid_s = jax.lax.sort((key, pair_gid), num_keys=1, is_stable=False)
        tile_s = key_s >> db
    else:
        tile_s, _, gid_s = jax.lax.sort(
            (tile, g[:, 2], pair_gid), num_keys=2, is_stable=False
        )

    row_order = jnp.zeros((0,), jnp.int32)
    if reorder_rows:
        # Pack-gather locality: order table rows by the tile their center
        # falls in (the pair sort's major key), so pairs of the same tile
        # gather near-contiguous rows instead of striding the whole table.
        # Culled rows sort to the end. gid_sorted is remapped to rank space;
        # PACK_GID / gauss_offsets / gauss_counts stay in ORIGINAL row order
        # (the backward reduction and dtable are unaffected).
        iota = jnp.arange(c * n, dtype=jnp.int32)
        cx = (x0 + x1) // 2
        cy = (y0 + y1) // 2
        ckey = (iota // n) * tiles_per_cam + cy * ntx + cx
        ckey = jnp.where(rad > 0, ckey, num_tiles)
        _, row_order = jax.lax.sort((ckey, iota), num_keys=1)
        rank = jnp.zeros((c * n,), jnp.int32).at[row_order].set(iota)
        gid_s = rank[gid_s]

    # Binary search per tile boundary ('scan': ~21 gather rounds of
    # num_tiles+1 queries). 'compare_all' is O(num_tiles * capacity)
    # comparisons — measured 6 ms/step at garden scale vs ~0 for 'scan'.
    starts = jnp.searchsorted(
        tile_s,
        jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left",
        method="scan",
    ).astype(jnp.int32)

    # Backward-output slot bases: tile t's kernel reads/writes chunks
    # covering [align_down(start), end); its records land at
    # [out_starts[t], out_starts[t] + nchunk*chunk). Static bound:
    # sum(nchunk*chunk) <= total_valid + num_tiles*(chunk-1) <= CAP_PAD.
    read_base = (starts[:-1] // chunk) * chunk
    tile_counts = starts[1:] - starts[:-1]
    nchunk = jnp.where(
        tile_counts > 0, -((read_base - starts[1:]) // chunk), 0
    )
    out_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(nchunk * chunk)]
    ).astype(jnp.int32)

    overflow = jnp.maximum(total - pair_capacity, 0).astype(jnp.int32)
    return TileBinning(
        gid_sorted=gid_s,
        tile_starts=starts,
        out_starts=out_starts,
        num_tiles_x=ntx,
        num_tiles_y=nty,
        overflow=overflow,
        gauss_offsets=offsets,
        gauss_counts=counts,
        row_order=row_order,
    )


def pack_table(
    means2d: jnp.ndarray,  # [C, N, 2]
    conics: jnp.ndarray,  # [C, N, 3]
    opacities: jnp.ndarray,  # [C, N]
    colors: jnp.ndarray,  # [C, N, 3]
    depths: jnp.ndarray,  # [C, N]
) -> jnp.ndarray:
    """Pack per-gaussian attributes into [C*N, PACK_COLS] f32 rows.

    PACK_GID carries the row's own (cam*N + gaussian) id as GID_BIAS-offset
    int32 bits (normal-float encoding — raw bits would be flushed-to-zero
    denormals on TPU) so the backward kernel can tag gradient records for
    the sort-based per-gaussian reduction.

    The diagonal conic entries ride PRE-HALVED (0.5a, b, 0.5c): the kernel's
    per-pair-pixel quadratic becomes a'dx^2 + b dxdy + c'dy^2 with no 0.5
    scaling pass over [chunk, pixels], and autodiff through this function
    restores the factor on the conic cotangent for free ([C, N]-scale)."""
    c, n = opacities.shape
    gid_bits = jax.lax.bitcast_convert_type(
        jnp.arange(c * n, dtype=jnp.int32) + GID_BIAS, jnp.float32
    )
    half_diag = conics * jnp.array([0.5, 1.0, 0.5], conics.dtype)
    return jnp.concatenate(
        [
            means2d.reshape(c * n, 2),
            half_diag.reshape(c * n, 3),
            opacities.reshape(c * n, 1),
            colors.reshape(c * n, 3),
            depths.reshape(c * n, 1),
            gid_bits[:, None],
            jnp.zeros((c * n, PACK_COLS - 11), jnp.float32),
        ],
        axis=1,
    )


def unpack_table_grads(dtable: jnp.ndarray, c: int, n: int):
    """Split per-gaussian table cotangent back into attribute cotangents.

    (In the product path this split is done by autodiff through pack_table;
    the explicit 0.5 here undoes the pre-halved diagonal conic packing.)"""
    d = dtable.reshape(c, n, PACK_COLS)
    return (
        d[..., PACK_MX : PACK_MY + 1],  # dmeans2d [C,N,2]
        d[..., PACK_CA : PACK_CC + 1]
        * jnp.array([0.5, 1.0, 0.5], dtable.dtype),  # dconics [C,N,3]
        d[..., PACK_OPA],  # dopacities [C,N]
        d[..., PACK_R : PACK_B + 1],  # dcolors [C,N,3]
        d[..., PACK_DEPTH],  # ddepths [C,N]
    )


def segment_reduce_presort(
    dpre: jnp.ndarray,  # [R, PAIR_CAP] cotangents in presort pair order
    offsets: jnp.ndarray,  # [C*N]
    counts: jnp.ndarray,  # [C*N]
) -> jnp.ndarray:
    """Sum presort-contiguous per-pair columns into per-gaussian rows
    [C*N, R] with a cumsum + boundary difference — no scatter-add (XLA's
    scatter-add here is ~10x slower, measured at garden scale).

    Segments are contiguous (offsets[g] = offsets[g-1] + counts[g-1]), so
    one gather at the segment ends suffices: sums[g] = hi[g] - hi[g-1],
    where empty segments automatically difference to zero.
    """
    pair_cap = dpre.shape[1]
    # "rowt" (row-direction boundary gathers) measured ~equal to "blocked"
    # at both 300k and 3M on v5e — the [CAP, R] transpose's lane padding
    # costs what the fast-direction gather saves — so blocked stays default.
    mode = _os.environ.get("GS_SEGRED", "blocked")
    idx = jnp.minimum(offsets + counts, pair_cap)
    qi = jnp.maximum(idx - 1, 0)
    if mode == "rowt" and pair_cap % 256 == 0:
        # Same two-level prefix as "blocked", but the boundary lookups run
        # in the ROW direction: TPU gathers cost ~4x less per index along
        # rows ([CAP, R] at qi) than along lanes ([R, CAP] at qi) — the
        # lane-dim gather was ~10 ms/step at garden scale, the transpose +
        # row gathers ~3 ms. Output lands directly as [C*N, R].
        r = dpre.shape[0]
        blk = dpre.reshape(r, pair_cap // 256, 256)
        cum_intra = jnp.cumsum(blk, axis=2)
        block_tot = cum_intra[:, :, -1]
        block_pref = jnp.cumsum(block_tot, axis=1) - block_tot  # exclusive
        bi = qi // 256
        intra_t = cum_intra.reshape(r, -1).T  # [CAP, R]
        pref_t = block_pref.T  # [num_blocks, R]
        hi_t = jnp.take(pref_t, bi, axis=0, mode="clip") + jnp.take(
            intra_t, qi, axis=0, mode="clip"
        )
        hi_t = jnp.where((idx > 0)[:, None], hi_t, 0.0)
        prev_t = jnp.concatenate([jnp.zeros_like(hi_t[:1]), hi_t[:-1]], 0)
        return hi_t - prev_t
    if mode == "blocked" and pair_cap % 256 == 0:
        # Two-level prefix: a full-width cumsum is log2(cap) ~ 21 shifted
        # passes over the whole [R, CAP] array; blocking at 256 keeps the
        # wide passes to log2(256) = 8 within the minor dim plus a
        # negligible scan over CAP/256 block totals. The boundary lookup
        # splits into block prefix + intra-block prefix (two cheap gathers).
        r = dpre.shape[0]
        blk = dpre.reshape(r, pair_cap // 256, 256)
        cum_intra = jnp.cumsum(blk, axis=2)
        block_tot = cum_intra[:, :, -1]
        block_pref = jnp.cumsum(block_tot, axis=1) - block_tot  # exclusive
        bi, li = qi // 256, qi % 256
        flat_pref = block_pref.reshape(r, -1)
        flat_intra = cum_intra.reshape(r, -1)
        hi = jnp.take(flat_pref, bi, axis=1) + jnp.take(
            flat_intra, bi * 256 + li, axis=1
        )
    else:
        # GS_SEGRED=assoc/cumsum switch the prefix-sum lowering (hardware
        # A/B knobs: associative_scan blocks the scan, cumsum lowers to log
        # shifted adds).
        if mode == "assoc":
            cum = jax.lax.associative_scan(jnp.add, dpre, axis=1)
        else:
            cum = jnp.cumsum(dpre, axis=1)
        hi = jnp.take(cum, qi, axis=1, mode="clip")
    # hi[g] = sum of the first (offsets[g] + counts[g]) elements; then
    # hi[g-1] = sum of the first offsets[g] elements, so the difference is
    # exactly segment g (empty segments difference to zero).
    hi = jnp.where((idx > 0)[None, :], hi, 0.0)
    prev = jnp.concatenate([jnp.zeros_like(hi[:, :1]), hi[:, :-1]], axis=1)
    return (hi - prev).T



