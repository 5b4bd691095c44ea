"""SIFT descriptor prep (mdi/descriptors.py) vs a per-patch numpy oracle.

The oracle implements the same Lowe-SIFT semantics with explicit Python
loops over pixels and bins — no shared code with the batched einsum
formulation under test (reference: point_cloud_postprocess/
prepare_descriptors.py:13-48).
"""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gs_init_tpu.mdi.descriptors import (
    border_mask,
    extract_patches,
    prepare_descriptors,
    rgb_to_grayscale,
    sift_descriptors,
)


def _oracle_sift(patch, num_ang_bins=8, num_spatial_bins=4, clipval=0.2,
                 rootsift=True, eps=1e-10):
    p = patch.shape[0]
    padded = np.pad(patch, 1, mode="edge")
    gx = 0.5 * (padded[1:-1, 2:] - padded[1:-1, :-2])
    gy = 0.5 * (padded[2:, 1:-1] - padded[:-2, 1:-1])
    mag = np.sqrt(gx**2 + gy**2 + eps)
    ori = np.arctan2(gy, gx) % (2 * math.pi)

    sigma = p / 2.0
    bin_w = p / num_spatial_bins
    hist = np.zeros((num_spatial_bins, num_spatial_bins, num_ang_bins))
    for y in range(p):
        for x in range(p):
            cy, cx = y + 0.5, x + 0.5
            g = math.exp(-0.5 * (((cy - p / 2) / sigma) ** 2
                                 + ((cx - p / 2) / sigma) ** 2))
            of = ori[y, x] / (2 * math.pi) * num_ang_bins
            for by in range(num_spatial_bins):
                wy = max(0.0, 1 - abs(cy - (by + 0.5) * bin_w) / bin_w)
                if wy == 0.0:
                    continue
                for bx in range(num_spatial_bins):
                    wx = max(0.0, 1 - abs(cx - (bx + 0.5) * bin_w) / bin_w)
                    if wx == 0.0:
                        continue
                    for bo in range(num_ang_bins):
                        d = abs(of - bo)
                        d = min(d, num_ang_bins - d)
                        wo = max(0.0, 1 - d)
                        hist[by, bx, bo] += wy * wx * wo * mag[y, x] * g
    desc = hist.reshape(-1)
    desc = desc / max(np.linalg.norm(desc), eps)
    desc = np.minimum(desc, clipval)
    desc = desc / max(np.linalg.norm(desc), eps)
    if rootsift:
        desc = np.sqrt(desc / max(desc.sum(), eps))
    return desc


@pytest.mark.parametrize("rootsift", [True, False])
def test_sift_matches_oracle(rootsift):
    rng = np.random.default_rng(0)
    patches = rng.uniform(0, 1, (5, 32, 32)).astype(np.float32)
    got = np.asarray(sift_descriptors(jnp.asarray(patches), rootsift=rootsift))
    assert got.shape == (5, 128)
    for i in range(5):
        want = _oracle_sift(patches[i], rootsift=rootsift)
        np.testing.assert_allclose(got[i], want, atol=2e-5)


def test_descriptor_invariances():
    rng = np.random.default_rng(1)
    patch = rng.uniform(0, 1, (1, 32, 32)).astype(np.float32)
    d1 = np.asarray(sift_descriptors(jnp.asarray(patch), rootsift=False))
    # Affine brightness invariance: a*I + b has identical descriptors
    # (gradients scale by a; normalization removes it).
    d2 = np.asarray(
        sift_descriptors(jnp.asarray(0.5 * patch + 0.2), rootsift=False)
    )
    np.testing.assert_allclose(d1, d2, atol=1e-4)
    # Unit norm, non-negative, clipped before renorm.
    assert abs(np.linalg.norm(d1) - 1.0) < 1e-4
    assert (d1 >= 0).all()


def test_extract_patches_and_border():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, (40, 48)).astype(np.float32)
    yx = np.array([[20, 24], [16, 17]])
    pats = np.asarray(extract_patches(jnp.asarray(img), jnp.asarray(yx), 32))
    np.testing.assert_array_equal(pats[0], img[4:36, 8:40])
    np.testing.assert_array_equal(pats[1], img[0:32, 1:33])
    bm = border_mask(40, 48, 16)
    assert bm.sum() == (40 - 32) * (48 - 32)
    assert not bm[15, 20] and bm[16, 16] and not bm[24, 32]


def test_prepare_descriptors_end_to_end():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
    mask = np.zeros(40 * 48, bool)
    mask[[20 * 48 + 24, 5 * 48 + 5, 18 * 48 + 20]] = True  # one in-border
    desc, gated = prepare_descriptors(img, mask)
    assert desc.shape == (2, 128) and desc.dtype == np.float32
    assert gated.sum() == 2 and not gated[5 * 48 + 5]
    # Descriptor equals the direct computation on the gathered patch.
    gray = np.asarray(rgb_to_grayscale(jnp.asarray(img)))
    want = _oracle_sift(gray[2:34, 4:36])  # first survivor, row-major: (18, 20)
    np.testing.assert_allclose(desc[0], want, atol=2e-5)

    empty, gated0 = prepare_descriptors(img, np.zeros(40 * 48, bool))
    assert empty.shape == (0, 128) and gated0.sum() == 0
