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
6. ranges re-gathered into a *chunk-aligned* layout (Mosaic requires
   128-aligned offsets when DMA-slicing the minor dim of an HBM buffer)

The pair list is then gathered into a packed [PACK_COLS, CAP_PAD] f32 array
(one row-gather of a pre-packed per-gaussian attribute table, not ten
separate gathers) that the Pallas compositor DMAs chunk-by-chunk.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Column layout of the packed per-pair array consumed by the Pallas kernel.
PACK_MX, PACK_MY = 0, 1
PACK_CA, PACK_CB, PACK_CC = 2, 3, 4
PACK_OPA = 5
PACK_R, PACK_G, PACK_B = 6, 7, 8
PACK_DEPTH = 9
PACK_COLS = 16  # padded for aligned DMA


class TileBinning(NamedTuple):
    """Pair list in *chunk-aligned* layout.

    Every tile's pair range [tile_starts[t], tile_starts[t+1]) starts at a
    multiple of the compositor chunk (and is chunk-sized-padded), so the
    Pallas kernel's DMA slices are lane-aligned. Padding slots inside a range
    have ``pair_valid=False`` and zeroed attributes.
    """

    pair_gid: jnp.ndarray  # [CAP_PAD] int32 flattened (cam*N + gaussian) id
    pair_valid: jnp.ndarray  # [CAP_PAD] bool
    tile_starts: jnp.ndarray  # [num_tiles + 1] int32, all chunk-aligned
    num_tiles_x: int
    num_tiles_y: int
    overflow: jnp.ndarray  # [] int32: pairs dropped due to capacity
    # Pre-sort bookkeeping for the gather-free pack backward (see pack_pairs):
    pair_inv: jnp.ndarray  # [PAIR_CAP] presort pair -> aligned slot (CAP_PAD
    #                         = dropped), int32
    gauss_offsets: jnp.ndarray  # [C*N] exclusive prefix of per-gaussian pairs
    gauss_counts: jnp.ndarray  # [C*N]


def tile_spans(
    means2d: jnp.ndarray,  # [M, 2] flattened over cameras
    radii: jnp.ndarray,  # [M] int32 (0 = culled)
    width: int,
    height: int,
    tile_size: int,
):
    """Inclusive tile ranges [x0, x1] x [y0, y1] per gaussian and pair counts."""
    num_tx = -(-width // tile_size)
    num_ty = -(-height // tile_size)
    r = radii.astype(jnp.float32)
    x0 = jnp.floor((means2d[:, 0] - r) / tile_size).astype(jnp.int32)
    x1 = jnp.floor((means2d[:, 0] + r) / tile_size).astype(jnp.int32)
    y0 = jnp.floor((means2d[:, 1] - r) / tile_size).astype(jnp.int32)
    y1 = jnp.floor((means2d[:, 1] + r) / tile_size).astype(jnp.int32)
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
    """Static capacity of the chunk-aligned pair layout."""
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
) -> TileBinning:
    c, n = radii.shape
    m2 = means2d.reshape(c * n, 2)
    rad = radii.reshape(c * n)
    dep = depths.reshape(c * n)

    (x0, x1, y0, y1), counts, (ntx, nty) = tile_spans(
        m2, rad, width, height, tile_size
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
    # of five: gathers dominate binning cost on TPU. Positive-depth float
    # bits are monotone as int32 -> cheap sortable key packed alongside.
    depth_bits = jax.lax.bitcast_convert_type(jnp.maximum(dep, 0.0), jnp.int32)
    span_tbl = jnp.stack(
        [x0, y0, x1 - x0 + 1, offsets, depth_bits], axis=1
    )
    g = span_tbl[pair_gid]  # [CAP, 5]
    idx = jnp.arange(pair_capacity, dtype=jnp.int32)
    local = idx - g[:, 3]
    tx = g[:, 0] + local % g[:, 2]
    ty = g[:, 1] + local // g[:, 2]
    cam = pair_gid // n
    tile = cam * tiles_per_cam + ty * ntx + tx
    tile = jnp.where(pair_valid, tile, num_tiles)  # sentinel sorts to the end

    tile_s, _, gid_s, presort_s = jax.lax.sort(
        (tile, g[:, 4], pair_gid, idx), num_keys=2
    )

    starts = jnp.searchsorted(
        tile_s,
        jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left",
        method="compare_all",
    ).astype(jnp.int32)
    tile_counts = starts[1:] - starts[:-1]

    # Re-gather into the chunk-aligned layout.
    cap_pad = padded_capacity(pair_capacity, num_tiles, chunk)
    counts_pad = -(-tile_counts // chunk) * chunk
    astarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_pad).astype(jnp.int32)]
    )
    slot_tile, _ = _segment_ids_from_offsets(astarts[:-1], astarts[-1], cap_pad)
    slot_tile = jnp.minimum(slot_tile, num_tiles - 1)
    slot = jnp.arange(cap_pad, dtype=jnp.int32)
    # One gather of the packed per-tile table instead of three.
    tile_tbl = jnp.stack([astarts[:-1], tile_counts, starts[:-1]], axis=1)
    tt = tile_tbl[slot_tile]  # [CAP_PAD, 3]
    off = slot - tt[:, 0]
    aligned_valid = (off < tt[:, 1]) & (slot < astarts[-1])
    src = jnp.clip(tt[:, 2] + off, 0, pair_capacity - 1)
    pair_gid_a = jnp.where(aligned_valid, gid_s[src], 0)

    # Inverse permutation presort-pair -> aligned slot (CAP_PAD = dropped):
    # enables the pack backward to reduce per-pair cotangents with a cumsum
    # over the *contiguous* presort order instead of a scatter-add.
    pair_presort = presort_s[src]
    pair_inv = (
        jnp.full((pair_capacity,), cap_pad, jnp.int32)
        .at[jnp.where(aligned_valid, pair_presort, pair_capacity)]
        .set(slot, mode="drop")
    )

    overflow = jnp.maximum(total - pair_capacity, 0).astype(jnp.int32) + (
        jnp.maximum(astarts[-1] - cap_pad, 0)
    )
    astarts = jnp.minimum(astarts, cap_pad)  # keep kernel DMA in bounds
    return TileBinning(
        pair_gid=pair_gid_a,
        pair_valid=aligned_valid,
        tile_starts=astarts,
        num_tiles_x=ntx,
        num_tiles_y=nty,
        overflow=overflow,
        pair_inv=pair_inv,
        gauss_offsets=offsets,
        gauss_counts=counts,
    )


def _pack_impl(pair_gid, pair_valid, table):
    rows = table[pair_gid].T  # [10, CAP_PAD]
    rows = jnp.pad(rows, ((0, PACK_COLS - rows.shape[0]), (0, 0)))
    # Zero attributes of invalid (overflow/padding) pairs so the kernel's
    # chunk math is inert for them regardless of tile ranges.
    return jnp.where(pair_valid[None, :], rows, 0.0)


@jax.custom_vjp
def _pack_from_table(pair_gid, pair_valid, pair_inv, offsets, counts, table):
    return _pack_impl(pair_gid, pair_valid, table)


def _pack_fwd(pair_gid, pair_valid, pair_inv, offsets, counts, table):
    out = _pack_impl(pair_gid, pair_valid, table)
    return out, (pair_inv, offsets, counts, table.shape)


def _pack_bwd(res, ct):
    """Segment-reduce per-pair cotangents to per-gaussian rows WITHOUT a
    scatter-add: pairs of one gaussian are contiguous in presort order
    ([offsets[g], offsets[g]+counts[g])), so gather the cotangents into
    presort order via the precomputed inverse permutation, cumsum along
    pairs, and difference at segment boundaries. XLA's scatter-add here is
    ~10x slower (column-major strided) at garden scale."""
    pair_inv, offsets, counts, tshape = res
    pair_cap = pair_inv.shape[0]
    ct10 = ct[:10]  # [10, CAP_PAD]
    # Dropped pairs (inv == CAP_PAD) read zero.
    dpre = jnp.take(ct10, pair_inv, axis=1, mode="fill", fill_value=0.0)
    cum = jnp.cumsum(dpre, axis=1)  # [10, PAIR_CAP]
    ends = jnp.clip(offsets + counts - 1, 0, pair_cap - 1)
    hi = jnp.take(cum, ends, axis=1, mode="clip")
    lo = jnp.where(
        (offsets > 0)[None, :],
        jnp.take(cum, jnp.maximum(offsets - 1, 0), axis=1, mode="clip"),
        0.0,
    )
    seg = jnp.where((counts > 0)[None, :], hi - lo, 0.0)  # [10, C*N]
    dtable = seg.T.reshape(tshape)
    f0 = lambda shape: np.zeros(shape, dtype=jax.dtypes.float0)
    return (
        f0((ct.shape[1],)),
        f0((ct.shape[1],)),
        f0((pair_cap,)),
        f0(offsets.shape),
        f0(counts.shape),
        dtable,
    )


_pack_from_table.defvjp(_pack_fwd, _pack_bwd)


def pack_pairs(
    binning: TileBinning,
    means2d: jnp.ndarray,  # [C, N, 2]
    conics: jnp.ndarray,  # [C, N, 3]
    opacities: jnp.ndarray,  # [C, N]
    colors: jnp.ndarray,  # [C, N, 3]
    depths: jnp.ndarray,  # [C, N]
) -> jnp.ndarray:
    """Gather per-pair gaussian attributes into [PACK_COLS, CAP_PAD] f32.

    Attribute-major (transposed) so the kernel's chunked DMA slices the lane
    dimension at chunk-aligned offsets. The per-gaussian attribute table is
    packed once ([C*N, 10]) and gathered with a single row-gather; the
    backward is a cumsum-based segment reduction over the contiguous presort
    pair order (see _pack_bwd) rather than XLA's scatter-add.
    """
    c, n = opacities.shape
    table = jnp.concatenate(
        [
            means2d.reshape(c * n, 2),
            conics.reshape(c * n, 3),
            opacities.reshape(c * n, 1),
            colors.reshape(c * n, 3),
            depths.reshape(c * n, 1),
        ],
        axis=1,
    )  # [C*N, 10]
    return _pack_from_table(
        binning.pair_gid,
        binning.pair_valid,
        binning.pair_inv,
        binning.gauss_offsets,
        binning.gauss_counts,
        table,
    )


def segment_reduce_pairs(vals: jnp.ndarray, binning: TileBinning) -> jnp.ndarray:
    """Sum per-pair rows [R, CAP_PAD] into per-gaussian rows [C*N, R] using
    the presort-contiguous cumsum reduction (same trick as the pack
    backward — no scatter-add). Used e.g. for absgrad densification stats."""
    pair_inv = binning.pair_inv
    offsets = binning.gauss_offsets
    counts = binning.gauss_counts
    pair_cap = pair_inv.shape[0]
    dpre = jnp.take(vals, pair_inv, axis=1, mode="fill", fill_value=0.0)
    cum = jnp.cumsum(dpre, axis=1)
    ends = jnp.clip(offsets + counts - 1, 0, pair_cap - 1)
    hi = jnp.take(cum, ends, axis=1, mode="clip")
    lo = jnp.where(
        (offsets > 0)[None, :],
        jnp.take(cum, jnp.maximum(offsets - 1, 0), axis=1, mode="clip"),
        0.0,
    )
    return jnp.where((counts > 0)[None, :], hi - lo, 0.0).T
