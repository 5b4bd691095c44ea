"""MoGe-2 port: converter + Flax model parity vs a random-weights torch
oracle assembled from the same published block design (the MoGe submodule is
NOT checked out in the reference snapshot — .gitmodules:1-9 — so a torch
assembly is the strongest available oracle; same pattern as the validated
Metric3D/DepthPro ports)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.heavy


def _build_torch_moge(dim=384, depth=12, heads=6, grid=37,
                      dim_proj=64, dim_upsample=(48, 32, 16), num_res=2,
                      out_ch=7):
    """Torch assembly with the exact key layout moge_convert expects."""
    import torch.nn as tnn

    class Mlp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(dim, 4 * dim)
            self.fc2 = tnn.Linear(4 * dim, dim)

        def forward(self, x):
            return self.fc2(tnn.functional.gelu(self.fc1(x)))

    class Attn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(dim, 3 * dim)
            self.proj = tnn.Linear(dim, dim)

        def forward(self, x):
            b, n, d = x.shape
            qkv = self.qkv(x).reshape(b, n, 3, heads, d // heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = q.transpose(1, 2)
            k = k.transpose(1, 2)
            v = v.transpose(1, 2)
            a = (q * (d // heads) ** -0.5) @ k.transpose(-2, -1)
            a = a.softmax(-1)
            return self.proj((a @ v).transpose(1, 2).reshape(b, n, d))

    class LS(tnn.Module):
        def __init__(self):
            super().__init__()
            self.gamma = tnn.Parameter(torch.randn(dim) * 0.1 + 1.0)

        def forward(self, x):
            return x * self.gamma

    class Blk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
            self.attn = Attn()
            self.ls1 = LS()
            self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
            self.mlp = Mlp()
            self.ls2 = LS()

        def forward(self, x):
            x = x + self.ls1(self.attn(self.norm1(x)))
            return x + self.ls2(self.mlp(self.norm2(x)))

    class PatchEmbed(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Conv2d(3, dim, 14, 14)

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
            self.pos_embed = tnn.Parameter(
                torch.randn(1, grid * grid + 1, dim) * 0.02
            )
            self.patch_embed = PatchEmbed()
            self.blocks = tnn.ModuleList([Blk() for _ in range(depth)])
            self.norm = tnn.LayerNorm(dim, eps=1e-6)

        def forward(self, x, out_layers):
            b = x.shape[0]
            p = self.patch_embed.proj(x)  # [B, D, h, w]
            h, w = p.shape[2:]
            p = p.flatten(2).transpose(1, 2) + self.pos_embed[:, 1:]
            cls = (self.cls_token + self.pos_embed[:, :1]).expand(b, -1, -1)
            x = torch.cat([cls, p], 1)
            feats = []
            for i, blk in enumerate(self.blocks):
                x = blk(x)
                if i in out_layers:
                    feats.append(self.norm(x))
            patches = [
                f[:, 1:].transpose(1, 2).reshape(b, dim, h, w) for f in feats
            ]
            return patches, feats[-1][:, 0]

    class Res(tnn.Module):
        def __init__(self, ch):
            super().__init__()
            self.conv1 = tnn.Conv2d(ch, ch, 3, padding=1)
            self.conv2 = tnn.Conv2d(ch, ch, 3, padding=1)

        def forward(self, x):
            y = self.conv2(
                tnn.functional.relu(self.conv1(tnn.functional.relu(x)))
            )
            return x + y

    class Head(tnn.Module):
        def __init__(self):
            super().__init__()
            self.projects = tnn.ModuleList(
                [tnn.Conv2d(dim, dim_proj, 1) for _ in range(4)]
            )
            ups, res = [], []
            d_in = dim_proj
            for d_out in dim_upsample:
                ups.append(tnn.Conv2d(d_in, d_out, 3, padding=1))
                res.append(tnn.ModuleList([Res(d_out) for _ in range(num_res)]))
                d_in = d_out
            self.upsample = tnn.ModuleList(ups)
            self.res = tnn.ModuleList(res)
            self.out = tnn.Sequential(
                tnn.Conv2d(d_in, dim_upsample[-1], 3, padding=1),
                tnn.ReLU(),
                tnn.Conv2d(dim_upsample[-1], out_ch, 1),
            )

        def forward(self, feats, out_hw):
            x = None
            for proj, f in zip(self.projects, feats):
                p = proj(f)
                x = p if x is None else x + p
            for up, blocks in zip(self.upsample, self.res):
                x = tnn.functional.interpolate(
                    x, scale_factor=2, mode="bilinear", align_corners=False
                )
                x = up(x)
                for blk in blocks:
                    x = blk(x)
            x = tnn.functional.interpolate(
                x, size=out_hw, mode="bilinear", align_corners=False
            )
            return self.out(x)

    class MoGeTorch(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.head = Head()
            self.scale_head = tnn.Sequential(
                tnn.Linear(dim, 64), tnn.ReLU(), tnn.Linear(64, 1)
            )

        def forward(self, x, out_layers):
            b, _, H, W = x.shape
            feats, cls = self.encoder(x, out_layers)
            out = self.head(feats, (H // 2, W // 2))
            out = tnn.functional.interpolate(
                out, size=(H, W), mode="bilinear", align_corners=False
            )
            scale = torch.exp(self.scale_head(cls)[:, 0])
            pts = out[:, 0:3]
            z = torch.exp(pts[:, 2])
            pts = torch.stack([pts[:, 0], pts[:, 1], z], 1)
            pts = pts * scale[:, None, None, None]
            return pts, out[:, 3], out[:, 4:7], scale

    torch.manual_seed(0)
    m = MoGeTorch()
    m.eval()
    return m


def test_moge_converter_parity(rng):
    from gs_init_tpu.mdi.predictors.moge_convert import convert_moge_checkpoint
    from gs_init_tpu.models.moge import MoGeModel

    dim_up = (48, 32, 16)
    oracle = _build_torch_moge(dim_upsample=dim_up)
    variables = convert_moge_checkpoint(
        oracle.state_dict(), "vits", dim_upsample=dim_up, num_res_blocks=2
    )
    net = MoGeModel(
        backbone="vits", dim_proj=64, dim_upsample=dim_up, num_res_blocks=2,
        scale_hidden=64,
    )

    H = W = 14 * 37  # native pos-embed grid: no interpolation in play
    img = rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32)
    out = net.apply(variables, jnp.asarray(img))

    from gs_init_tpu.models.vit import VIT_CONFIGS

    with torch.no_grad():
        pts_t, mask_t, normal_t, scale_t = oracle(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            set(VIT_CONFIGS["vits"]["out_layers"]),
        )
    pts_ref = pts_t.numpy().transpose(0, 2, 3, 1)
    scale = np.abs(pts_ref).max()
    np.testing.assert_allclose(
        np.asarray(out["points"]) / scale, pts_ref / scale, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["mask_logit"]), mask_t.numpy(), atol=1e-4
    )
    n_ref = normal_t.numpy().transpose(0, 2, 3, 1)
    n_ref = n_ref / np.maximum(
        np.linalg.norm(n_ref, axis=-1, keepdims=True), 1e-8
    )
    np.testing.assert_allclose(np.asarray(out["normal"]), n_ref, atol=1e-3)
    np.testing.assert_allclose(
        float(out["scale"][0]), float(scale_t[0]), rtol=1e-4
    )


def test_moge_predictor_pipeline(rng, monkeypatch, tmp_path):
    """Weights-gated predictor: raises without a checkpoint, runs the full
    batched pipeline with allow_random_weights (interface + shape contract,
    reference moge.py:8-33 returns depth/mask/normal)."""
    monkeypatch.setenv("GS_TPU_CHECKPOINT_DIR", str(tmp_path))
    from gs_init_tpu.mdi.predictors.moge import MoGePredictor

    with pytest.raises(FileNotFoundError):
        MoGePredictor(backbone="vits")

    pred = MoGePredictor(backbone="vits", allow_random_weights=True)
    imgs = rng.uniform(0, 1, (2, 48, 64, 3)).astype(np.float32)
    outs = pred.predict_depth_batch(imgs, [None, None])
    assert len(outs) == 2
    for o in outs:
        assert o.depth.shape == (48, 64)
        assert o.mask.shape == (48, 64)
        assert o.normal.shape == (48, 64, 3)
        assert np.isfinite(o.depth).all()
