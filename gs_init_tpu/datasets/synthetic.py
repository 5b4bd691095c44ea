"""Synthetic gaussian scene fixture (the repo's tiny COLMAP-free test scene).

The reference has no tests (SURVEY.md §4); our correctness leverage is a
self-consistent scene: ground-truth gaussians rendered by the oracle become
the training images, so a training run must be able to recover them. Also
provides look-at camera rigs reused by trajectory tests.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.projection import project_gaussians
from ..ops.rasterize_ref import rasterize_reference


def render_surface_depth(proj, width: int, height: int) -> np.ndarray:
    """Per-pixel depth of the dominant (max compositing-weight) gaussian.

    The stand-in for what a monocular depth network actually predicts: the
    visible surface, not the alpha-expectation blend `rasterize_reference`
    returns in its depth channel (see SyntheticScene.surface_depths).
    Zero-coverage pixels return 0 (callers mask on alpha anyway).
    """
    import jax

    from ..ops.rasterize_ref import alpha_at

    def render_one(means2d, conics, opac, depths, radii):
        valid = radii > 0
        order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
        means2d, conics = means2d[order], conics[order]
        opac, depths_s = opac[order], depths[order]
        valid = valid[order]
        ys = jnp.arange(height, dtype=jnp.float32) + 0.5
        xs = jnp.arange(width, dtype=jnp.float32) + 0.5
        pix = jnp.stack(
            jnp.meshgrid(xs, ys, indexing="xy"), axis=-1
        ).reshape(-1, 2)
        npix = pix.shape[0]
        chunk = min(2048, npix)
        pad = (-npix) % chunk
        pix = jnp.concatenate(
            [pix, jnp.full((pad, 2), -1e6, jnp.float32)], axis=0
        )

        def body(pchunk):
            alpha = alpha_at(means2d, conics, opac, valid, pchunk)
            log1m = jnp.log1p(-alpha)
            log_t_excl = jnp.cumsum(log1m, axis=0) - log1m
            w = alpha * jnp.exp(log_t_excl)  # [N, P]
            return depths_s[jnp.argmax(w, axis=0)]

        chunks = pix.reshape(-1, chunk, 2)
        return jax.lax.map(body, chunks).reshape(-1)[:npix].reshape(
            height, width
        )

    return np.asarray(
        jax.vmap(render_one)(
            proj.means2d, proj.conics, proj.opacities, proj.depths, proj.radii
        )
    )


class SyntheticScene(NamedTuple):
    points: np.ndarray  # [N, 3] gt gaussian means
    rgbs: np.ndarray  # [N, 3]
    images: np.ndarray  # [C, H, W, 3]
    camtoworlds: np.ndarray  # [C, 4, 4]
    Ks: np.ndarray  # [C, 3, 3]
    width: int
    height: int
    scene_scale: float
    # GT expected-depth / coverage renders (depth-oracle fixtures).
    depths: np.ndarray = None  # [C, H, W]
    alphas: np.ndarray = None  # [C, H, W]
    # Dominant-surface depth (depth of the max-compositing-weight gaussian
    # per pixel). Monocular depth networks predict the VISIBLE SURFACE;
    # the alpha-expectation `depths` blends foreground with whatever is
    # behind it (a fg gaussian at z=3 with alpha .7 over a wall at z=8.5
    # "expects" to z≈4.6), which corrupts depth↔SfM correspondences by
    # ~20% — measured to break RANSAC alignment outright (negative scale).
    # Use THIS field for depth-predictor oracles.
    surface_depths: np.ndarray = None  # [C, H, W]


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """OpenCV-convention camera-to-world (+z forward, +y down)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return c2w


def make_scene(
    seed: int = 0,
    n_gaussians: int = 96,
    n_cams: int = 12,
    width: int = 64,
    height: int = 48,
    radius: float = 3.0,
) -> SyntheticScene:
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-0.8, 0.8, (n_gaussians, 3))
    rgbs = rng.uniform(0.1, 0.9, (n_gaussians, 3))
    quats = rng.normal(size=(n_gaussians, 4))
    scales = rng.uniform(0.04, 0.15, (n_gaussians, 3))
    opac = rng.uniform(0.5, 0.95, n_gaussians)

    c2ws = []
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        eye = np.array(
            [radius * np.cos(a), 0.6 * np.sin(2 * a), radius * np.sin(a)]
        )
        c2ws.append(look_at(eye, np.zeros(3)))
    c2ws = np.stack(c2ws)
    f = 0.9 * width
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float64)
    Ks = np.tile(K, (n_cams, 1, 1))

    viewmats = jnp.asarray(np.linalg.inv(c2ws), jnp.float32)
    proj = project_gaussians(
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(quats, jnp.float32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(opac, jnp.float32),
        viewmats,
        jnp.asarray(Ks, jnp.float32),
        width,
        height,
    )
    colors = jnp.broadcast_to(
        jnp.asarray(rgbs, jnp.float32)[None], (n_cams, n_gaussians, 3)
    )
    images, alpha, depth_acc = rasterize_reference(proj, colors, width, height)
    images = np.clip(np.asarray(images), 0.0, 1.0)
    alphas = np.asarray(alpha)
    depths = np.asarray(depth_acc) / np.maximum(alphas, 1e-8)

    return SyntheticScene(
        points=pts.astype(np.float32),
        rgbs=rgbs.astype(np.float32),
        images=images,
        camtoworlds=c2ws.astype(np.float32),
        Ks=Ks.astype(np.float32),
        width=width,
        height=height,
        scene_scale=float(radius),
        depths=depths.astype(np.float32),
        alphas=alphas.astype(np.float32),
        surface_depths=render_surface_depth(proj, width, height).astype(
            np.float32
        ),
    )


def make_clustered_scene(
    seed: int = 0,
    n_fg: int = 900,
    n_bg: int = 2600,
    n_cams: int = 28,
    width: int = 480,
    height: int = 360,
    radius: float = 3.0,
) -> SyntheticScene:
    """Scene built for the question the mdi method exists to answer
    (VERDICT round-2 item #6): SfM coverage is spatially CLUSTERED.

    - Foreground: a compact textured cluster near the origin. Only these
      points are materialized as SfM points (pass n_points <= n_fg to
      write_colmap_scene; the array is ordered foreground-first), mimicking
      feature-rich central geometry.
    - Background: a surrounding shell + ground of larger gaussians that the
      cameras always see behind the cluster — photometrically important but
      with ZERO SfM coverage (feature-poor walls/vegetation in real scenes,
      the large under-reconstructed regions of results.md's garden).

    SfM init must grow the background from nothing via densification; depth
    init covers it directly — the reference's headline effect
    (results.md:10-13)."""
    rng = np.random.default_rng(seed)
    # Foreground cluster: dense ball, high-frequency colors.
    fg = rng.normal(0, 0.35, (n_fg, 3))
    fg_rgb = rng.uniform(0.05, 0.95, (n_fg, 3))
    fg_scales = rng.uniform(0.02, 0.07, (n_fg, 3))
    # Background: cylindrical shell (walls) + disk (ground), textured by
    # per-gaussian color variation.
    n_wall = int(n_bg * 0.7)
    ang = rng.uniform(0, 2 * np.pi, n_wall)
    r_wall = rng.uniform(5.5, 7.0, n_wall)
    wall = np.stack(
        [r_wall * np.cos(ang), rng.uniform(-2.2, 2.2, n_wall), r_wall * np.sin(ang)],
        axis=-1,
    )
    n_gnd = n_bg - n_wall
    gr = np.sqrt(rng.uniform(0.15, 1.0, n_gnd)) * 6.5
    ga = rng.uniform(0, 2 * np.pi, n_gnd)
    ground = np.stack(
        [gr * np.cos(ga), np.full(n_gnd, 2.3) + rng.normal(0, 0.05, n_gnd),
         gr * np.sin(ga)],
        axis=-1,
    )
    bg = np.concatenate([wall, ground])
    bg_rgb = rng.uniform(0.1, 0.9, (n_bg, 3))
    bg_scales = rng.uniform(0.12, 0.35, (n_bg, 3))

    pts = np.concatenate([fg, bg])
    rgbs = np.concatenate([fg_rgb, bg_rgb])
    scales = np.concatenate([fg_scales, bg_scales])
    n = n_fg + n_bg
    quats = rng.normal(size=(n, 4))
    opac = rng.uniform(0.55, 0.95, n)

    c2ws = []
    for i in range(n_cams):
        a = 2 * np.pi * i / n_cams
        eye = np.array(
            [radius * np.cos(a), -0.4 + 0.5 * np.sin(2 * a), radius * np.sin(a)]
        )
        c2ws.append(look_at(eye, np.zeros(3)))
    c2ws = np.stack(c2ws)
    f = 0.85 * width
    K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]], np.float64)
    Ks = np.tile(K, (n_cams, 1, 1))

    viewmats = jnp.asarray(np.linalg.inv(c2ws), jnp.float32)
    proj = project_gaussians(
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(quats, jnp.float32),
        jnp.asarray(scales, jnp.float32),
        jnp.asarray(opac, jnp.float32),
        viewmats,
        jnp.asarray(Ks, jnp.float32),
        width,
        height,
    )
    colors = jnp.broadcast_to(jnp.asarray(rgbs, jnp.float32)[None], (n_cams, n, 3))
    images, alpha, depth_acc = rasterize_reference(proj, colors, width, height)
    images = np.clip(np.asarray(images), 0.0, 1.0)
    alphas = np.asarray(alpha)
    depths = np.asarray(depth_acc) / np.maximum(alphas, 1e-8)

    return SyntheticScene(
        points=pts.astype(np.float32),
        rgbs=rgbs.astype(np.float32),
        images=images,
        camtoworlds=c2ws.astype(np.float32),
        Ks=Ks.astype(np.float32),
        width=width,
        height=height,
        scene_scale=float(radius),
        depths=depths.astype(np.float32),
        alphas=alphas.astype(np.float32),
        surface_depths=render_surface_depth(proj, width, height).astype(
            np.float32
        ),
    )


def write_colmap_scene(out_dir: str, scene: SyntheticScene, n_points: int = 64) -> str:
    """Materialize a synthetic scene as an on-disk COLMAP dataset
    (images/ + sparse/0 binary model) so the full data layer — parser,
    undistortion, per-image point indices — is exercised end-to-end."""
    import os

    import imageio.v2 as imageio

    from . import colmap_io as cio

    data_dir = os.path.join(str(out_dir), "scene")
    img_dir = os.path.join(data_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    cameras = {
        1: cio.ColmapCamera(
            1,
            "PINHOLE",
            scene.width,
            scene.height,
            np.array(
                [
                    scene.Ks[0, 0, 0],
                    scene.Ks[0, 1, 1],
                    scene.Ks[0, 0, 2],
                    scene.Ks[0, 1, 2],
                ]
            ),
        )
    }
    pts = scene.points[:n_points].astype(np.float64)
    ids = np.arange(1, len(pts) + 1, dtype=np.int64)
    images = {}
    for i, c2w in enumerate(scene.camtoworlds):
        w2c = np.linalg.inv(c2w)
        q = cio.rotmat_to_qvec(w2c[:3, :3])
        name = f"img_{i:03d}.png"
        imageio.imwrite(
            os.path.join(img_dir, name),
            (scene.images[i] * 255).astype(np.uint8),
        )
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        uv = cam[:, :2] / cam[:, 2:3]
        pix = uv @ scene.Ks[0][:2, :2].T + scene.Ks[0][:2, 2]
        ok = (
            (cam[:, 2] > 0)
            & (pix[:, 0] >= 0)
            & (pix[:, 0] < scene.width)
            & (pix[:, 1] >= 0)
            & (pix[:, 1] < scene.height)
        )
        if scene.surface_depths is not None:
            # Visibility gate: real SfM only registers a 2D-3D observation
            # where the feature is actually VISIBLE. Without this, points
            # occluded by nearer gaussians produce depth correspondences
            # with ~20% median error that break alignment (measured: 75%
            # of in-frustum correspondences on the clustered proxy were
            # occluded).
            sd = scene.surface_depths[i]
            xi = np.clip(pix[:, 0].astype(np.int64), 0, scene.width - 1)
            yi = np.clip(pix[:, 1].astype(np.int64), 0, scene.height - 1)
            surf = sd[yi, xi]
            ok = ok & (np.abs(cam[:, 2] - surf) < 0.05 * np.maximum(surf, 1e-6))
        sel = np.where(ok)[0][:40]
        images[i + 1] = cio.ColmapImage(
            i + 1, q, w2c[:3, 3], 1, name, pix[sel], ids[sel]
        )
    rec = cio.ColmapReconstruction(
        cameras=cameras,
        images=images,
        points_xyz=pts,
        points_rgb=(scene.rgbs[:n_points] * 255).astype(np.uint8),
        points_err=np.full(len(pts), 0.5),
        point_ids=ids,
    )
    cio.write_reconstruction_bin(os.path.join(data_dir, "sparse/0"), rec)
    return data_dir
