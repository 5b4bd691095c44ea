"""Parity: Pallas tile rasterizer (interpret mode on CPU) vs the XLA oracle."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gs_init_tpu.ops.projection import project_gaussians
from gs_init_tpu.ops.render import rasterize
from gs_init_tpu.ops.tiles import bin_gaussians

W, H = 80, 64


def _scene(rng, n=48):
    K = jnp.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], jnp.float32)
    viewmat = jnp.eye(4, dtype=jnp.float32)
    means = jnp.asarray(
        np.stack(
            [
                rng.uniform(-0.7, 0.7, n),
                rng.uniform(-0.5, 0.5, n),
                rng.uniform(1.0, 4.0, n),
            ],
            -1,
        ),
        jnp.float32,
    )
    quats = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    scales = jnp.asarray(rng.uniform(0.02, 0.2, (n, 3)), jnp.float32)
    opac = jnp.asarray(rng.uniform(0.3, 0.95, n), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    return means, quats, scales, opac, colors, viewmat[None], K[None]


def test_binning_invariants(rng):
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng)
    proj = project_gaussians(means, quats, scales, opac, viewmats, Ks, W, H)
    chunk = 128
    b = bin_gaussians(
        proj.means2d, proj.radii, proj.depths, W, H, 16, 4096, chunk=chunk
    )
    ntiles = b.num_tiles_x * b.num_tiles_y
    assert b.num_tiles_x == 5 and b.num_tiles_y == 4
    starts = np.asarray(b.tile_starts)
    ostarts = np.asarray(b.out_starts)
    assert (np.diff(starts) >= 0).all()
    assert (ostarts % chunk == 0).all()  # bwd output slots are aligned
    assert int(b.overflow) == 0
    gid = np.asarray(b.gid_sorted)
    m2 = np.asarray(proj.means2d[0])
    rad = np.asarray(proj.radii[0])
    dep = np.asarray(proj.depths[0])
    offs = np.asarray(b.gauss_offsets)
    cnts = np.asarray(b.gauss_counts)
    n_valid = int(starts[-1])
    for t in range(ntiles):
        seg = slice(starts[t], starts[t + 1])
        tx, ty = t % b.num_tiles_x, t // b.num_tiles_x
        for g in gid[seg]:
            # Every valid pair's gaussian overlaps its tile's bbox.
            assert m2[g, 0] + rad[g] >= tx * 16 and m2[g, 0] - rad[g] <= (tx + 1) * 16
            assert m2[g, 1] + rad[g] >= ty * 16 and m2[g, 1] - rad[g] <= (ty + 1) * 16
        # Depth-sorted within each tile.
        assert (np.diff(dep[gid[seg]]) >= 0).all()
        # Backward-slot mapping: aligned window covers the range, 1:1 slots.
        nchunk = (ostarts[t + 1] - ostarts[t]) // chunk
        assert nchunk * chunk >= starts[t + 1] - (starts[t] // chunk) * chunk
    # Presort segments cover the valid pairs exactly.
    assert n_valid == int(cnts.sum())
    assert (offs[1:] == np.cumsum(cnts)[:-1]).all()
    # Total pair count matches the per-gaussian tile span sum.
    spans = 0
    for g in range(len(rad)):
        if rad[g] > 0:
            x0 = max(0, int(np.floor((m2[g, 0] - rad[g]) / 16)))
            x1 = min(b.num_tiles_x - 1, int(np.floor((m2[g, 0] + rad[g]) / 16)))
            y0 = max(0, int(np.floor((m2[g, 1] - rad[g]) / 16)))
            y1 = min(b.num_tiles_y - 1, int(np.floor((m2[g, 1] + rad[g]) / 16)))
            spans += (x1 - x0 + 1) * (y1 - y0 + 1)
    assert n_valid == spans


def test_binning_overflow_reported(rng):
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=64)
    proj = project_gaussians(means, quats, scales, opac, viewmats, Ks, W, H)
    b = bin_gaussians(proj.means2d, proj.radii, proj.depths, W, H, 16, 128)
    from gs_init_tpu.ops.tiles import padded_capacity

    cap_pad = padded_capacity(128, b.num_tiles_x * b.num_tiles_y, 128)
    assert int(b.overflow) > 0
    assert int(b.tile_starts[-1]) <= 128
    assert int(b.out_starts[-1]) <= cap_pad



def _render_both(rng, n=48, render_mode="RGB", bg=None, antialiased=False):
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n)
    kw = dict(
        sh_degree=None,
        render_mode=render_mode,
        backgrounds=bg,
        rasterize_mode="antialiased" if antialiased else "classic",
        pair_capacity=8192,
    )
    out_ref = rasterize(
        means, quats, scales, opac, colors, viewmats, Ks, W, H, impl="xla", **kw
    )
    out_pal = rasterize(
        means, quats, scales, opac, colors, viewmats, Ks, W, H, impl="pallas", **kw
    )
    return out_ref, out_pal


@pytest.mark.parametrize("render_mode", ["RGB", "RGB+ED"])
def test_pallas_matches_oracle_forward(rng, render_mode):
    (r_ref, a_ref, _), (r_pal, a_pal, info) = _render_both(
        rng, render_mode=render_mode, bg=jnp.array([[0.2, 0.3, 0.4]])
    )
    assert int(info.overflow) == 0
    np.testing.assert_allclose(
        np.asarray(a_pal), np.asarray(a_ref), atol=2e-4
    )
    rgb_ref, rgb_pal = np.asarray(r_ref[..., :3]), np.asarray(r_pal[..., :3])
    np.testing.assert_allclose(rgb_pal, rgb_ref, atol=5e-4)
    if render_mode == "RGB+ED":
        ed_ref, ed_pal = np.asarray(r_ref[..., 3]), np.asarray(r_pal[..., 3])
        significant = np.asarray(a_ref[..., 0]) > 1e-2
        np.testing.assert_allclose(
            ed_pal[significant], ed_ref[significant], atol=5e-3
        )


def test_pallas_matches_oracle_antialiased(rng):
    (r_ref, a_ref, _), (r_pal, a_pal, _) = _render_both(rng, antialiased=True)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=5e-4)


def test_pallas_backward_matches_oracle(rng):
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=32)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(impl, params):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmats, Ks, W, H, impl=impl, pair_capacity=8192
        )
        return jnp.mean((render - target) ** 2) + 0.1 * jnp.mean(alpha)

    params = (means, quats, scales, opac, colors)
    l_ref, g_ref = jax.value_and_grad(lambda p: loss("xla", p))(params)
    l_pal, g_pal = jax.value_and_grad(lambda p: loss("pallas", p))(params)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-4)
    names = ["means", "quats", "scales", "opacities", "colors"]
    for name, gr, gp in zip(names, g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gr / scale, atol=2e-3, err_msg=name)


def test_pallas_backward_early_termination(rng):
    """Deep stacks of near-opaque gaussians saturate transmittance early;
    the backward must skip the forward-unprocessed chunks (their record
    slots zero-filled) and still match the oracle on the visible front.
    Uses chunk_size-many+ gaussians per tile so nproc < nchunks in the
    Pallas path."""
    n = 96
    means = np.zeros((n, 3), np.float32)
    means[:, 0] = rng.uniform(-0.1, 0.1, n)
    means[:, 1] = rng.uniform(-0.1, 0.1, n)
    means[:, 2] = np.linspace(2.0, 6.0, n)  # stacked in depth
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 0.3, np.float32)
    opac = np.full((n,), 0.95, np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    viewmats = jnp.eye(4, dtype=jnp.float32)[None]
    Ks = jnp.asarray(
        [[[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]], jnp.float32
    )
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(impl, params):
        m, o, c = params
        render, alpha, _ = rasterize(
            jnp.asarray(m), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(o), jnp.asarray(c), viewmats, Ks, W, H,
            impl=impl, pair_capacity=8192, chunk_size=128, tile_size=16,
        )
        return jnp.mean((render - target) ** 2)

    params = (means, opac, colors)
    l_ref, g_ref = jax.value_and_grad(lambda p: loss("xla", p))(params)
    l_pal, g_pal = jax.value_and_grad(lambda p: loss("pallas", p))(params)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-3)
    for name, gr, gp in zip(["means", "opac", "colors"], g_ref, g_pal):
        gp = np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        # The oracle composites past the termination point (weights < 1e-4);
        # tolerance covers that intentional difference.
        np.testing.assert_allclose(
            gp / scale, np.asarray(gr) / scale, atol=5e-3, err_msg=name
        )
    # Far-behind gaussians must get (near-)zero gradients in both.
    gc_pal = np.asarray(g_pal[2])
    assert np.abs(gc_pal[-8:]).max() < 1e-5


def test_pallas_backward_termination_shuffled_gids(rng):
    """Early termination with gid order DECOUPLED from depth order.

    Forward-skipped pairs belong to arbitrary (not tail) gaussian ids here,
    and other gaussians with interleaved ids are visible in different tiles.
    The backward's record-sort segment reduction must keep every skipped
    pair's GID/VALID tag so presort segment boundaries stay exact —
    regression test for the zero-filled-record misattribution bug (skipped
    records sorting to the tail shifted every later gaussian's segment)."""
    n_stack, n_side = 320, 24
    n = n_stack + n_side
    means = np.zeros((n, 3), np.float32)
    scales = np.zeros((n, 3), np.float32)
    opac = np.zeros((n,), np.float32)
    # Deep stack of LARGE near-opaque gaussians at image center: the center
    # tile gets ~n_stack pairs (3 chunks at chunk=128) and every pixel of it
    # saturates within the first chunk -> forward skips >= 1 chunk of real
    # pairs. Depths shuffled so the skipped pairs carry arbitrary gids.
    depths = np.linspace(2.0, 6.0, n_stack)
    perm = rng.permutation(n_stack)
    stack_idx = np.sort(rng.choice(n, n_stack, replace=False))
    side_idx = np.setdiff1d(np.arange(n), stack_idx)
    means[stack_idx, 0] = rng.uniform(-0.1, 0.1, n_stack)
    means[stack_idx, 1] = rng.uniform(-0.1, 0.1, n_stack)
    means[stack_idx, 2] = depths[perm]
    scales[stack_idx] = 1.6  # sigma_screen = f*s/z in [16, 48] px
    opac[stack_idx] = 0.95
    # Side gaussians: visible in other tiles, ids interleaved with the
    # stack's — their presort segments shift if skipped records lose tags.
    means[side_idx, 0] = rng.uniform(-2.0, 2.0, n_side)
    means[side_idx, 1] = rng.uniform(-1.5, 1.5, n_side)
    means[side_idx, 2] = rng.uniform(2.5, 4.0, n_side)
    scales[side_idx] = 0.15
    opac[side_idx] = 0.8
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    viewmats = jnp.eye(4, dtype=jnp.float32)[None]
    Ks = jnp.asarray(
        [[[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]], jnp.float32
    )
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    # The scenario must actually reach the skip path: center tile holds
    # multiple chunks of pairs.
    proj = project_gaussians(
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(opac), viewmats, Ks, W, H,
    )
    b = bin_gaussians(
        proj.means2d, proj.radii, proj.depths, W, H, 16, 32768, chunk=128
    )
    starts = np.asarray(b.tile_starts)
    center_tile = (H // 2 // 16) * b.num_tiles_x + (W // 2 // 16)
    assert starts[center_tile + 1] - starts[center_tile] > 256

    def loss(impl, params):
        m, o, c = params
        render, alpha, _ = rasterize(
            jnp.asarray(m), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(o), jnp.asarray(c), viewmats, Ks, W, H,
            impl=impl, pair_capacity=32768, chunk_size=128, tile_size=16,
        )
        return jnp.mean((render - target) ** 2)

    params = (means, opac, colors)
    l_ref, g_ref = jax.value_and_grad(lambda p: loss("xla", p))(params)
    l_pal, g_pal = jax.value_and_grad(lambda p: loss("pallas", p))(params)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-3)
    for name, gr, gp in zip(["means", "opac", "colors"], g_ref, g_pal):
        gp = np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(
            gp / scale, np.asarray(gr) / scale, atol=5e-3, err_msg=name
        )


def test_means2d_dummy_gradients(rng):
    """Screen-space gradient taps (densification signal) flow and match."""
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=24)
    dummy = jnp.zeros((1, means.shape[0], 2))

    def loss(impl, dummy):
        render, _, _ = rasterize(
            means, quats, scales, opac, colors, viewmats, Ks, W, H,
            impl=impl, means2d_dummy=dummy, pair_capacity=8192,
        )
        return jnp.sum(render**2)

    g_ref = jax.grad(lambda d: loss("xla", d))(dummy)
    g_pal = jax.grad(lambda d: loss("pallas", d))(dummy)
    assert float(jnp.abs(g_ref).sum()) > 0
    scale = float(jnp.abs(g_ref).max()) + 1e-8
    np.testing.assert_allclose(
        np.asarray(g_pal) / scale, np.asarray(g_ref) / scale, atol=2e-3
    )


def test_sh_rendering_path(rng):
    means, quats, scales, opac, _, viewmats, Ks = _scene(rng, n=16)
    sh = jnp.asarray(rng.normal(size=(16, 16, 3)) * 0.3, jnp.float32)
    r_ref, _, _ = rasterize(
        means, quats, scales, opac, sh, viewmats, Ks, W, H,
        sh_degree=3, impl="xla",
    )
    r_pal, _, _ = rasterize(
        means, quats, scales, opac, sh, viewmats, Ks, W, H,
        sh_degree=3, impl="pallas", pair_capacity=8192,
    )
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref), atol=5e-4)


def test_empty_scene_pallas(rng):
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=8)
    means = means + jnp.array([0.0, 0.0, -50.0])  # all behind camera
    render, alpha, _ = rasterize(
        means, quats, scales, opac, colors, viewmats, Ks, W, H,
        impl="pallas", pair_capacity=1024,
        backgrounds=jnp.array([[1.0, 0.5, 0.25]]),
    )
    np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(render), np.broadcast_to([1.0, 0.5, 0.25], (1, H, W, 3)), atol=1e-6
    )


def test_reorder_table_exact(rng):
    """reorder_table permutes the packed table for gather locality; the
    composited output and every gradient must be EXACTLY unchanged (same
    pairs, same order within each tile, dtable in original row order)."""
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=64)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(reorder, params):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmats, Ks, W, H, impl="pallas",
            pair_capacity=8192, reorder_table=reorder,
        )
        return jnp.mean((render - target) ** 2) + 0.1 * jnp.mean(alpha)

    params = (means, quats, scales, opac, colors)
    l0, g0 = jax.value_and_grad(lambda p: loss(False, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(True, p))(params)
    assert float(l0) == float(l1)
    for a, b in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sort_bf16_grads_close(rng):
    """bf16-packed record sort rounds per-pair gradient terms to bf16
    before the per-gaussian sum — values must stay within bf16-grade
    relative error of the exact path."""
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=64)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(bf16, params):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmats, Ks, W, H, impl="pallas",
            pair_capacity=8192, sort_bf16=bf16,
        )
        return jnp.mean((render - target) ** 2) + 0.1 * jnp.mean(alpha)

    params = (means, quats, scales, opac, colors)
    l0, g0 = jax.value_and_grad(lambda p: loss(False, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(True, p))(params)
    assert float(l0) == float(l1)  # forward identical
    for name, a, b in zip(["means", "quats", "scales", "opac", "colors"], g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=1.5e-2, err_msg=name)


def test_wire8_matches(rng):
    """The compressed 8-column int32 wire format (bf16-paired attributes,
    f32 mx/my, exact gid bits) must agree with the 16-column f32 table to
    bf16 rounding: forward within ~2^-9 of the render scale, gradients
    within the same normalized tolerance class as sort_bf16."""
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=64)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(wire8, params):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmats, Ks, W, H, impl="pallas",
            pair_capacity=8192, wire8=wire8,
        )
        return jnp.mean((render - target) ** 2) + 0.1 * jnp.mean(alpha)

    params = (means, quats, scales, opac, colors)
    l0, g0 = jax.value_and_grad(lambda p: loss(False, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(True, p))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-3)
    for name, a, b in zip(["means", "quats", "scales", "opac", "colors"], g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=2e-2, err_msg=name)


@pytest.mark.parametrize("mode", ["hi", "bf16"])
def test_moment_mxu_matches(rng, monkeypatch, mode):
    """GS_MOMENT=hi/bf16 (MXU pixel-basis moment reduction in the backward)
    must agree with the default VPU moment form. hi is f32-exact up to the
    binomial reconstruction's reassociation; bf16 adds ~2^-9 relative
    rounding to the moment mass (same floor as the bf16 record sort)."""
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=64)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(params):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmats, Ks, W, H, impl="pallas",
            pair_capacity=8192,
        )
        return jnp.mean((render - target) ** 2) + 0.1 * jnp.mean(alpha)

    params = (means, quats, scales, opac, colors)
    jax.clear_caches()
    l0, g0 = jax.value_and_grad(loss)(params)
    l0, g0 = float(l0), jax.tree.map(np.asarray, g0)
    monkeypatch.setenv("GS_MOMENT", mode)
    jax.clear_caches()
    l1, g1 = jax.value_and_grad(loss)(params)
    monkeypatch.delenv("GS_MOMENT")
    jax.clear_caches()
    np.testing.assert_allclose(float(l1), l0, rtol=1e-6)  # fwd untouched
    atol = 5e-5 if mode == "hi" else 1.5e-2
    for name, a, b in zip(["means", "quats", "scales", "opac", "colors"], g0, g1):
        b = np.asarray(b)
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=atol, err_msg=name)


def test_scan_trimat_matches(rng, monkeypatch):
    """GS_SCAN=trimat (v1 triangular-matmul prefix lowering) must agree
    with the default Hillis-Steele scan. Env knobs are read at trace time,
    so the jit caches must be cleared between variants."""
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=64)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(params):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmats, Ks, W, H, impl="pallas",
            pair_capacity=8192,
        )
        return jnp.mean((render - target) ** 2) + 0.1 * jnp.mean(alpha)

    params = (means, quats, scales, opac, colors)
    jax.clear_caches()
    l0, g0 = jax.value_and_grad(loss)(params)
    l0, g0 = float(l0), jax.tree.map(np.asarray, g0)
    monkeypatch.setenv("GS_SCAN", "trimat")
    jax.clear_caches()
    l1, g1 = jax.value_and_grad(loss)(params)
    monkeypatch.delenv("GS_SCAN")
    jax.clear_caches()
    # On CPU both lowerings are exact f32 sums of the same terms; the
    # tolerance covers reassociation — including the tile-centered moment
    # basis in the backward, whose binomial reconstruction amplifies the
    # scan-lowering difference by up to ~(tile/2 / dx)^2 (see _bwd_kernel).
    np.testing.assert_allclose(float(l1), l0, rtol=1e-6)
    for name, a, b in zip(["means", "quats", "scales", "opac", "colors"], g0, g1):
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-5, err_msg=name)


def test_scan_unit_variants():
    """_hs_scan agrees with numpy cumsum for every (reverse, exclusive)
    combination, and the trimat lowering of _prefix_scan matches it."""
    from gs_init_tpu.ops import rasterize as rz

    r = np.random.default_rng(0)
    x = jnp.asarray(r.normal(size=(16, 8)).astype(np.float32))
    xn = np.asarray(x)
    for reverse in (False, True):
        for exclusive in (False, True):
            want = np.cumsum(xn[::-1], 0)[::-1] if reverse else np.cumsum(xn, 0)
            if exclusive:
                want = want - xn
            got = np.asarray(rz._hs_scan(x, reverse=reverse, exclusive=exclusive))
            np.testing.assert_allclose(got, want, atol=1e-5)
            os.environ["GS_SCAN"] = "trimat"
            try:
                tri = np.asarray(
                    rz._prefix_scan(x, reverse=reverse, exclusive=exclusive)
                )
            finally:
                del os.environ["GS_SCAN"]
            np.testing.assert_allclose(tri, want, atol=1e-5)


def test_scan_mode_dispatch(monkeypatch):
    """GS_SCAN overrides the probe; unset resolves to 'hs' in interpret
    mode (no Mosaic to probe on CPU)."""
    from gs_init_tpu.ops import rasterize as rz

    monkeypatch.setenv("GS_SCAN", "trimat")
    assert rz._scan_mode() == "trimat"
    monkeypatch.setenv("GS_SCAN", "hs")
    assert rz._scan_mode() == "hs"
    monkeypatch.delenv("GS_SCAN")
    monkeypatch.setattr(rz, "_SCAN_MODE", None)
    assert rz._scan_mode() == "hs"  # CPU/interpret: no probe needed


def test_scan_mode_probe_is_trace_safe(monkeypatch):
    """Regression for the round-3 on-chip failure (results/sanity_r3.log):
    the first _scan_mode() call happens INSIDE the compositor kernel trace
    (via _prefix_scan), so the hardware probe must not execute jax ops in
    this process — an eagerly-created probe array leaks into the enclosing
    jaxpr as a captured constant ("captures constants [f32[128,128]]").
    Force the probe path on CPU and verify that resolving the mode mid-trace
    (a) runs the probe, (b) produces a working kernel with no leaked
    constants, (c) caches the decision."""
    from gs_init_tpu.ops import rasterize as rz

    monkeypatch.delenv("GS_SCAN", raising=False)
    # The CPU-pin shortcut (JAX_PLATFORMS=cpu resolves "hs" with no probe)
    # would bypass the path under test; the jax backend is already
    # initialized by this point, so clearing the var only affects
    # _scan_mode's own check.
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(rz, "_interpret", lambda: False)
    monkeypatch.setattr(rz, "_SCAN_MODE", None)
    calls = []

    def fake_probe():
        # The contract the real subprocess probe satisfies: pure host code.
        from jax._src import core as _core

        calls.append(_core.trace_state_clean())
        return False  # probe failure must select the proven trimat lowering

    monkeypatch.setattr(rz, "_probe_hs_scan", fake_probe)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)), jnp.float32)

    @jax.jit
    def f(x):
        return rz._prefix_scan(x, exclusive=True)  # resolves mode mid-trace

    got = np.asarray(f(x))
    want = np.cumsum(np.asarray(x), 0) - np.asarray(x)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert calls == [False]  # probe ran exactly once, inside the trace
    assert rz._SCAN_MODE == "trimat"
    # Cached: a second trace must not re-probe.
    np.asarray(jax.jit(lambda x: rz._prefix_scan(x))(x))
    assert calls == [False]


@pytest.mark.heavy
def test_probe_subprocess_real():
    """The real subprocess probe runs end-to-end. On the CPU backend the
    child's pallas_call has no Mosaic lowering, so the probe must cleanly
    report failure (rc!=0 → False) rather than raising, and must cache."""
    import hashlib
    import tempfile
    import pathlib
    from gs_init_tpu.ops import rasterize as rz

    sig = hashlib.sha1(
        (
            repr(
                sorted(
                    (k, v)
                    for k, v in os.environ.items()
                    if k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
                )
            )
            + rz._PROBE_SRC  # probe content versions the cache
        ).encode()
    ).hexdigest()[:12]
    cache = pathlib.Path(tempfile.gettempdir()) / f"gs_hs_probe_{sig}.result"
    if cache.exists():
        cache.unlink()
    ok = rz._probe_hs_scan()
    assert isinstance(ok, bool)
    assert cache.exists()
    assert cache.read_text().strip() == ("1" if ok else "0")
    # Second call must hit the cache (fast path, no subprocess).
    assert rz._probe_hs_scan() == ok


def test_segment_reduce_lowerings_agree(monkeypatch):
    """blocked (default) / cumsum / assoc segment-reduce lowerings produce
    the same per-gaussian sums (tiles.segment_reduce_presort)."""
    from gs_init_tpu.ops import tiles as tz

    r = np.random.default_rng(7)
    cap, ng = 1024, 37
    counts = r.integers(0, 9, ng).astype(np.int32)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    dpre = r.normal(size=(10, cap)).astype(np.float32)
    # Slots past the last segment are garbage the reduction must ignore.
    want = np.stack(
        [dpre[:, o : o + c].sum(1) for o, c in zip(offsets, counts)]
    )
    outs = {}
    for mode in ("blocked", "cumsum", "assoc"):
        monkeypatch.setenv("GS_SEGRED", mode)
        outs[mode] = np.asarray(
            tz.segment_reduce_presort(
                jnp.asarray(dpre), jnp.asarray(offsets), jnp.asarray(counts)
            )
        )[:ng]
        np.testing.assert_allclose(outs[mode], want, atol=1e-4, err_msg=mode)


def test_reduce_records_garbage_tail_robust(rng):
    """The record buffer's never-written slots hold raw HBM garbage on
    hardware (often NaN/Inf); the unstable gid sort interleaves them with
    written-invalid records, and an unmasked NaN inside any 256-block
    poisons the blocked segment reduction's exclusive block prefix
    (cumsum(tot) - tot = NaN - NaN) for EVERY gaussian. reduce_records must
    return the exact per-gaussian sums regardless of garbage content."""
    from gs_init_tpu.ops.rasterize import reduce_records
    from gs_init_tpu.ops.tiles import (
        GID_BIAS, PACK_COLS, PACK_GID, PACK_VALID,
    )

    n_gauss, cap_pad, pair_cap = 37, 1024, 512
    counts = rng.integers(0, 6, n_gauss).astype(np.int32)
    offsets = np.cumsum(counts) - counts
    total = int(counts.sum())
    rec = rng.normal(size=(PACK_COLS, cap_pad)).astype(np.float32)
    # Valid records for gaussian g occupy slots [2*offsets[g], ...) spread
    # over the written region with written-invalid rows in between.
    written = 2 * total + 64
    rec[PACK_VALID] = 0.0
    gid_col = np.zeros(cap_pad, np.float32)
    slot = 0
    expected = np.zeros((n_gauss, 9), np.float32)
    for g in range(n_gauss):
        for _ in range(int(counts[g])):
            rec[PACK_VALID, slot] = 1.0
            gid_col[slot] = np.int32(g + GID_BIAS).view(np.float32)
            expected[g] += rec[:9, slot]
            slot += 2  # leave a written-invalid row between valid ones
    rec[PACK_GID] = gid_col
    # Garbage: NaN/Inf everywhere invalid — written-invalid payloads AND
    # the never-written tail (including its VALID/GID columns).
    invalid = np.ones(cap_pad, bool)
    invalid[: written] = rec[PACK_VALID, :written] < 0.5
    for r in range(PACK_COLS):
        if r != PACK_VALID and r != PACK_GID:
            rec[r, invalid] = np.nan
        rec[r, written + 1 :: 3] = np.inf  # unwritten: garbage in ALL cols
    rec[PACK_VALID, written:] = np.nan
    rec[PACK_GID, written:] = np.nan

    for sort_bf16 in (False, True):
        red = np.asarray(
            reduce_records(
                jnp.asarray(rec), jnp.int32(written),
                jnp.asarray(offsets), jnp.asarray(counts), pair_cap,
                n_base=9, want_absgrad=False, sort_bf16=sort_bf16,
            )
        )
        assert np.isfinite(red).all(), f"sort_bf16={sort_bf16}"
        tol = 2e-2 if sort_bf16 else 1e-5
        scale = np.abs(expected).max() + 1e-6
        np.testing.assert_allclose(
            red[:, :9] / scale, expected / scale, atol=tol,
            err_msg=f"sort_bf16={sort_bf16}",
        )


@pytest.mark.parametrize("nb", [2, 4])
def test_pblock_matches(rng, monkeypatch, nb):
    """GS_PBLOCK pixel-band termination must agree with the whole-tile
    path: identical math per band, only the termination granularity is
    finer (saturated bands stop earlier — differences are bounded by the
    TERM_EPS tail the whole-tile path still composites)."""
    means, quats, scales, opac, colors, viewmats, Ks = _scene(rng, n=64)
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(params):
        m, q, s, o, c = params
        render, alpha, _ = rasterize(
            m, q, s, o, c, viewmats, Ks, W, H, impl="pallas",
            pair_capacity=8192,
        )
        return jnp.mean((render - target) ** 2) + 0.1 * jnp.mean(alpha)

    params = (means, quats, scales, opac, colors)
    jax.clear_caches()
    l0, g0 = jax.value_and_grad(loss)(params)
    l0, g0 = float(l0), jax.tree.map(np.asarray, g0)
    monkeypatch.setenv("GS_PBLOCK", str(nb))
    jax.clear_caches()
    l1, g1 = jax.value_and_grad(loss)(params)
    monkeypatch.delenv("GS_PBLOCK")
    jax.clear_caches()
    np.testing.assert_allclose(float(l1), l0, rtol=1e-4)
    for name, a, b in zip(["means", "quats", "scales", "opac", "colors"], g0, g1):
        b = np.asarray(b)
        assert np.isfinite(b).all(), name
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-3, err_msg=name)


def test_pblock_deep_stack_termination(rng, monkeypatch):
    """Pixel-band replay under real early termination: deep near-opaque
    stacks saturate bands at different chunk depths; per-band nproc must
    keep gradients matched to the oracle and far-behind pairs at zero."""
    n = 160
    means = np.zeros((n, 3), np.float32)
    means[:, 0] = rng.uniform(-0.6, 0.6, n)
    means[:, 1] = rng.uniform(-0.5, 0.5, n)
    means[:, 2] = np.linspace(1.5, 6.0, n)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    scales = np.full((n, 3), 0.35, np.float32)
    opac = np.full((n,), 0.93, np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    viewmats = jnp.eye(4, dtype=jnp.float32)[None]
    Ks = jnp.asarray(
        [[[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]], jnp.float32
    )
    target = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32)

    def loss(impl, params):
        m, o, c = params
        render, alpha, _ = rasterize(
            jnp.asarray(m), jnp.asarray(quats), jnp.asarray(scales),
            jnp.asarray(o), jnp.asarray(c), viewmats, Ks, W, H,
            impl=impl, pair_capacity=8192, chunk_size=128, tile_size=16,
        )
        return jnp.mean((render - target) ** 2)

    params = (means, opac, colors)
    jax.clear_caches()
    l_ref, g_ref = jax.value_and_grad(lambda p: loss("xla", p))(params)
    monkeypatch.setenv("GS_PBLOCK", "2")  # tile 16 -> 256 px -> 2 bands max
    jax.clear_caches()
    l_pal, g_pal = jax.value_and_grad(lambda p: loss("pallas", p))(params)
    monkeypatch.delenv("GS_PBLOCK")
    jax.clear_caches()
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-3)
    for name, gr, gp in zip(["means", "opac", "colors"], g_ref, g_pal):
        gp = np.asarray(gp)
        assert np.isfinite(gp).all(), name
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        # 1.2e-2 (vs the whole-tile test's 5e-3): bands cut off a chunk
        # earlier than the whole-tile loop for pairs whose band saturated
        # first, so straggler pairs at a band boundary carry one extra
        # oracle-composited tail term.
        np.testing.assert_allclose(
            gp / scale, np.asarray(gr) / scale, atol=1.2e-2, err_msg=name
        )
    gc_pal = np.asarray(g_pal[2])
    assert np.abs(gc_pal[-8:]).max() < 1e-5
