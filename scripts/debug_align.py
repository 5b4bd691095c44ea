#!/usr/bin/env python
"""Per-image alignment debug on the tiny clustered proxy: recovered (s, t)
vs the analytically expected values, and where background pixels get lost.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

from e2e_quality import build_scene, _gt_depth_oracle


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/e2e_dbg"
    os.makedirs(out, exist_ok=True)
    scene, data_dir = build_scene(out, width=160, height=120, n_cams=8)

    from gs_init_tpu.config import Config
    from gs_init_tpu.datasets.nerfstudio import open_dataset
    from gs_init_tpu.datasets.parser import Dataset
    from gs_init_tpu.mdi.points_from_depth import points_from_depth

    cfg = Config(data_dir=data_dir, data_factor=1, result_dir=out)
    parser = open_dataset(data_dir, factor=1, normalize=True, test_every=8)
    stub = _gt_depth_oracle(scene, parser)
    trainset = Dataset(parser, "train")

    # Normalization scale: parser transform T maps orig->parser; for a
    # similarity transform depth scales by |det(R)|^(1/3).
    T = np.asarray(parser.transform)
    k = float(np.cbrt(np.abs(np.linalg.det(T[:3, :3]))))
    s_true = k / 0.37
    t_true = -1.3 * k / 0.37
    print(f"norm scale k={k:.4f}  expected s={s_true:.4f} t={t_true:.4f}")

    m_pad = max(int(max((len(v) for v in parser.point_indices.values()), default=1)), 1)
    key = jax.random.PRNGKey(0)
    for i in range(3):
        it = trainset[i]
        pred = stub.predict_depth(it["image"], None)
        idx = parser.point_indices.get(it["image_name"], np.empty(0, np.int64))
        sfm = np.zeros((m_pad, 3), np.float32)
        valid = np.zeros((m_pad,), bool)
        kk = min(len(idx), m_pad)
        sfm[:kk] = parser.points[idx[:kk]]
        valid[:kk] = True
        h, w = it["image"].shape[:2]
        key, sk = jax.random.split(key)
        out_pfd = points_from_depth(
            jnp.asarray(pred.depth), jnp.asarray(pred.mask),
            jnp.asarray(it["camtoworld"], jnp.float32),
            jnp.asarray(it["K"], jnp.float32),
            jnp.asarray(sfm), jnp.asarray(valid), sk,
            width=w, height=h,
            align_method="ransac",
            subsample_factor=6,
            use_grad_mask=True,
        )
        s = float(out_pfd.scale)
        t = float(out_pfd.shift)
        m = np.asarray(out_pfd.mask)
        pts = np.asarray(out_pfd.pts_world)[m]
        # classify bg by radius in ORIGINAL frame
        R3, t3 = T[:3, :3], T[:3, 3]
        po = (pts - t3) @ np.linalg.inv(R3).T
        r_xz = np.sqrt(po[:, 0] ** 2 + po[:, 2] ** 2)
        # how many DEPTH pixels are background (true depth far)?
        td = np.asarray(scene.depths[list(parser.split_indices('train'))[i]])
        al = np.asarray(scene.alphas[list(parser.split_indices('train'))[i]])
        covered = al > 0.3
        print(
            f"img{i}: s={s:.4f} ({s/s_true:.3f}x true) t={t:.4f} "
            f"(true {t_true:.4f}) npts={len(pts)} "
            f"bg(r>4)={int((r_xz>4).sum())} "
            f"maxdepth_pred={float(np.nanmax(pred.depth)):.2f} "
            f"covered_frac={covered.mean():.2f} "
            f"truedepth_p95={np.nanpercentile(td[covered],95):.2f}"
        )


if __name__ == "__main__":
    main()
