"""SAM port: converter + Flax model parity vs a random-weights torch oracle
assembled with the OFFICIAL checkpoint key layout (segment_anything's
sam_vit_h modules — the package is not installed in this environment, so a
faithful torch assembly is the oracle; the established converter pattern).
Covers the windowed/global rel-pos encoder, prompt encoder and two-way
mask decoder, plus the automatic-mask-generator pipeline shape contract."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.heavy

DIM, DEPTH, HEADS, IMG, WIN = 32, 2, 2, 128, 4
GLOBAL_IDX = (1,)
EMB = 256


def _build_torch_sam():
    import torch.nn as tnn
    import torch.nn.functional as F

    class LayerNorm2d(tnn.Module):
        def __init__(self, ch):
            super().__init__()
            self.weight = tnn.Parameter(torch.ones(ch))
            self.bias = tnn.Parameter(torch.zeros(ch))

        def forward(self, x):  # [B, C, H, W]
            u = x.mean(1, keepdim=True)
            s = (x - u).pow(2).mean(1, keepdim=True)
            x = (x - u) / torch.sqrt(s + 1e-6)
            return self.weight[:, None, None] * x + self.bias[:, None, None]

    def window_partition(x, win):
        b, h, w, c = x.shape
        ph, pw = (win - h % win) % win, (win - w % win) % win
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
        hp, wp = h + ph, w + pw
        x = x.view(b, hp // win, win, wp // win, win, c)
        return (
            x.permute(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c),
            (hp, wp),
        )

    def window_unpartition(x, win, pad_hw, hw):
        hp, wp = pad_hw
        h, w = hw
        b = x.shape[0] // (hp * wp // win // win)
        x = x.view(b, hp // win, wp // win, win, win, -1)
        x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
        return x[:, :h, :w]

    def get_rel_pos(q_size, k_size, rel_pos):
        q = torch.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
        k = torch.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
        rel = (q - k) + (k_size - 1) * max(q_size / k_size, 1.0)
        return rel_pos[rel.long()]

    class Attn(tnn.Module):
        def __init__(self, input_size):
            super().__init__()
            head = DIM // HEADS
            self.qkv = tnn.Linear(DIM, 3 * DIM)
            self.proj = tnn.Linear(DIM, DIM)
            self.rel_pos_h = tnn.Parameter(
                torch.randn(2 * input_size[0] - 1, head) * 0.1
            )
            self.rel_pos_w = tnn.Parameter(
                torch.randn(2 * input_size[1] - 1, head) * 0.1
            )

        def forward(self, x):
            b, h, w, _ = x.shape
            head = DIM // HEADS
            qkv = (
                self.qkv(x.reshape(b, h * w, DIM))
                .reshape(b, h * w, 3, HEADS, head)
                .permute(2, 0, 3, 1, 4)
                .reshape(3, b * HEADS, h * w, head)
            )
            q, k, v = qkv.unbind(0)
            attn = (q * head**-0.5) @ k.transpose(-2, -1)
            Rh = get_rel_pos(h, h, self.rel_pos_h)
            Rw = get_rel_pos(w, w, self.rel_pos_w)
            r_q = q.reshape(b * HEADS, h, w, head)
            rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
            rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
            attn = (
                attn.view(b * HEADS, h, w, h, w)
                + rel_h[:, :, :, :, None]
                + rel_w[:, :, :, None, :]
            ).view(b * HEADS, h * w, h * w)
            attn = attn.softmax(-1)
            out = (
                (attn @ v)
                .view(b, HEADS, h * w, head)
                .permute(0, 2, 1, 3)
                .reshape(b, h, w, DIM)
            )
            return self.proj(out)

    class Mlp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lin1 = tnn.Linear(DIM, 4 * DIM)
            self.lin2 = tnn.Linear(4 * DIM, DIM)

        def forward(self, x):
            return self.lin2(F.gelu(self.lin1(x)))

    class Block(tnn.Module):
        def __init__(self, window, input_size):
            super().__init__()
            self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)
            self.attn = Attn(
                (window, window) if window > 0 else input_size
            )
            self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)
            self.mlp = Mlp()
            self.window = window

        def forward(self, x):
            sc = x
            x = self.norm1(x)
            hw = x.shape[1:3]
            if self.window > 0:
                x, pad = window_partition(x, self.window)
            x = self.attn(x)
            if self.window > 0:
                x = window_unpartition(x, self.window, pad, hw)
            x = sc + x
            return x + self.mlp(self.norm2(x))

    class PatchEmbed(tnn.Module):
        def __init__(self):
            super().__init__()
            self.proj = tnn.Conv2d(3, DIM, 16, 16)

    class ImageEncoder(tnn.Module):
        def __init__(self):
            super().__init__()
            g = IMG // 16
            self.patch_embed = PatchEmbed()
            self.pos_embed = tnn.Parameter(torch.randn(1, g, g, DIM) * 0.1)
            self.blocks = tnn.ModuleList(
                [
                    Block(0 if i in GLOBAL_IDX else WIN, (g, g))
                    for i in range(DEPTH)
                ]
            )
            self.neck = tnn.Sequential(
                tnn.Conv2d(DIM, EMB, 1, bias=False),
                LayerNorm2d(EMB),
                tnn.Conv2d(EMB, EMB, 3, padding=1, bias=False),
                LayerNorm2d(EMB),
            )

        def forward(self, x):
            x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
            x = x + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.neck(x.permute(0, 3, 1, 2))

    class PromptEncoder(tnn.Module):
        def __init__(self):
            super().__init__()

            class PE(tnn.Module):
                def __init__(self):
                    super().__init__()
                    self.register_buffer(
                        "positional_encoding_gaussian_matrix",
                        torch.randn(2, EMB // 2),
                    )

            self.pe_layer = PE()
            self.point_embeddings = tnn.ModuleList(
                [tnn.Embedding(1, EMB) for _ in range(4)]
            )
            self.not_a_point_embed = tnn.Embedding(1, EMB)
            self.no_mask_embed = tnn.Embedding(1, EMB)

        def _pe(self, coords):
            c = 2 * coords - 1
            c = c @ self.pe_layer.positional_encoding_gaussian_matrix
            c = 2 * np.pi * c
            return torch.cat([torch.sin(c), torch.cos(c)], -1)

        def forward(self, points, labels):
            coords = (points + 0.5) / torch.tensor([IMG, IMG]).float()
            pe = self._pe(coords)
            pe[labels == -1] = 0.0
            emb = torch.where(
                (labels == -1)[..., None],
                self.not_a_point_embed.weight[0],
                torch.where(
                    (labels == 1)[..., None],
                    self.point_embeddings[1].weight[0],
                    self.point_embeddings[0].weight[0],
                ),
            )
            return pe + emb

        def dense_pe(self, size):
            h, w = size
            ys = (torch.arange(h).float() + 0.5) / h
            xs = (torch.arange(w).float() + 0.5) / w
            gx, gy = torch.meshgrid(xs, ys, indexing="xy")
            return self._pe(torch.stack([gx, gy], -1))

    class DecAttn(tnn.Module):
        def __init__(self, downsample=1):
            super().__init__()
            d = EMB // downsample
            self.q_proj = tnn.Linear(EMB, d)
            self.k_proj = tnn.Linear(EMB, d)
            self.v_proj = tnn.Linear(EMB, d)
            self.out_proj = tnn.Linear(d, EMB)
            self.d = d
            self.heads = 8

        def forward(self, q, k, v):
            head = self.d // self.heads
            qp, kp, vp = self.q_proj(q), self.k_proj(k), self.v_proj(v)

            def split(t):
                b, n, _ = t.shape
                return t.reshape(b, n, self.heads, head).transpose(1, 2)

            qh, kh, vh = split(qp), split(kp), split(vp)
            a = (qh / np.sqrt(head)) @ kh.transpose(-2, -1)
            a = a.softmax(-1)
            o = (a @ vh).transpose(1, 2).reshape(q.shape[0], q.shape[1], self.d)
            return self.out_proj(o)

    class TwoWay(tnn.Module):
        def __init__(self, skip_pe):
            super().__init__()
            self.self_attn = DecAttn()
            self.norm1 = tnn.LayerNorm(EMB)
            self.cross_attn_token_to_image = DecAttn(2)
            self.norm2 = tnn.LayerNorm(EMB)
            self.mlp = Mlp2()
            self.norm3 = tnn.LayerNorm(EMB)
            self.cross_attn_image_to_token = DecAttn(2)
            self.norm4 = tnn.LayerNorm(EMB)
            self.skip_pe = skip_pe

        def forward(self, queries, keys, qpe, kpe):
            if self.skip_pe:
                queries = self.self_attn(queries, queries, queries)
            else:
                q = queries + qpe
                queries = queries + self.self_attn(q, q, queries)
            queries = self.norm1(queries)
            q = queries + qpe
            k = keys + kpe
            queries = self.norm2(
                queries + self.cross_attn_token_to_image(q, k, keys)
            )
            queries = self.norm3(queries + self.mlp(queries))
            q = queries + qpe
            k = keys + kpe
            keys = self.norm4(
                keys + self.cross_attn_image_to_token(k, q, queries)
            )
            return queries, keys

    class Mlp2(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lin1 = tnn.Linear(EMB, 2048)
            self.lin2 = tnn.Linear(2048, EMB)

        def forward(self, x):
            return self.lin2(torch.relu(self.lin1(x)))

    class Transformer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.layers = tnn.ModuleList([TwoWay(True), TwoWay(False)])
            self.final_attn_token_to_image = DecAttn(2)
            self.norm_final_attn = tnn.LayerNorm(EMB)

    class MLP3(tnn.Module):
        def __init__(self, dims):
            super().__init__()
            self.layers = tnn.ModuleList(
                [tnn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])]
            )

        def forward(self, x):
            for i, l in enumerate(self.layers):
                x = l(x)
                if i < len(self.layers) - 1:
                    x = torch.relu(x)
            return x

    class MaskDecoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.iou_token = tnn.Embedding(1, EMB)
            self.mask_tokens = tnn.Embedding(4, EMB)
            self.transformer = Transformer()
            self.output_upscaling = tnn.Sequential(
                tnn.ConvTranspose2d(EMB, EMB // 4, 2, 2),
                LayerNorm2d(EMB // 4),
                tnn.GELU(),
                tnn.ConvTranspose2d(EMB // 4, EMB // 8, 2, 2),
                tnn.GELU(),
            )
            self.output_hypernetworks_mlps = tnn.ModuleList(
                [MLP3([EMB, EMB, EMB, EMB // 8]) for _ in range(4)]
            )
            self.iou_prediction_head = MLP3([EMB, EMB, EMB, 4])

        def forward(self, image_embed, image_pe, sparse):
            b = sparse.shape[0]
            tok = torch.cat(
                [self.iou_token.weight, self.mask_tokens.weight], 0
            )
            tokens = torch.cat(
                [tok[None].expand(b, -1, -1), sparse], 1
            )
            src = image_embed.expand(b, -1, -1, -1)
            bq, c, h, w = src.shape
            src = src.flatten(2).permute(0, 2, 1)
            # image_pe is [C, H, W]: flatten spatially THEN move channels
            # last (official TwoWayTransformer image_pe.flatten(2).permute).
            pos = (
                image_pe.reshape(c, h * w).permute(1, 0)[None].expand(b, -1, -1)
            )
            queries, keys = tokens, src
            for layer in self.transformer.layers:
                queries, keys = layer(queries, keys, tokens, pos)
            q = queries + tokens
            k = keys + pos
            queries = queries + self.transformer.final_attn_token_to_image(
                q, k, keys
            )
            queries = self.transformer.norm_final_attn(queries)
            iou_out = queries[:, 0]
            mask_out = queries[:, 1:5]
            x = keys.permute(0, 2, 1).reshape(b, c, h, w)
            x = self.output_upscaling(x)
            hyper = torch.stack(
                [
                    m(mask_out[:, i])
                    for i, m in enumerate(self.output_hypernetworks_mlps)
                ],
                1,
            )
            masks = torch.einsum(
                "btc,bchw->bthw", hyper, x
            )
            return masks, self.iou_prediction_head(iou_out)

    class Sam(tnn.Module):
        def __init__(self):
            super().__init__()
            self.image_encoder = ImageEncoder()
            self.prompt_encoder = PromptEncoder()
            self.mask_decoder = MaskDecoder()

    torch.manual_seed(0)
    m = Sam()
    m.eval()
    return m


def test_sam_converter_parity(rng):
    from gs_init_tpu.mdi.predictors.sam_convert import (
        SAM_VARIANTS,
        convert_sam_checkpoint,
    )
    from gs_init_tpu.models.sam import (
        SamImageEncoder,
        SamMaskDecoder,
        SamPromptEncoder,
    )

    SAM_VARIANTS["tiny"] = dict(
        dim=DIM, depth=DEPTH, num_heads=HEADS, global_attn_indexes=GLOBAL_IDX
    )
    oracle = _build_torch_sam()
    full = convert_sam_checkpoint(oracle.state_dict(), "tiny")["params"]

    g = IMG // 16
    enc = SamImageEncoder(
        img_size=IMG, dim=DIM, depth=DEPTH, num_heads=HEADS,
        window_size=WIN, global_attn_indexes=GLOBAL_IDX,
    )
    prompt = SamPromptEncoder(
        image_embedding_size=(g, g), input_image_size=(IMG, IMG)
    )
    dec = SamMaskDecoder()

    img = rng.uniform(-1, 1, (1, IMG, IMG, 3)).astype(np.float32)
    embed = enc.apply({"params": full["encoder"]}, jnp.asarray(img))
    with torch.no_grad():
        embed_t = oracle.image_encoder(
            torch.from_numpy(img.transpose(0, 3, 1, 2))
        )
    ref = embed_t.numpy().transpose(0, 2, 3, 1)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        np.asarray(embed) / scale, ref / scale, atol=3e-5
    )

    pts = rng.uniform(0, IMG, (3, 2, 2)).astype(np.float32)
    labels = np.array([[1, -1], [1, 0], [0, -1]], np.int32)
    sparse, no_mask = prompt.apply(
        {"params": full["prompt"]}, jnp.asarray(pts), jnp.asarray(labels)
    )
    dense_pe = prompt.apply(
        {"params": full["prompt"]}, method=SamPromptEncoder.dense_pe
    )
    with torch.no_grad():
        sparse_t = oracle.prompt_encoder(
            torch.from_numpy(pts), torch.from_numpy(labels)
        )
        dense_pe_t = oracle.prompt_encoder.dense_pe((g, g))
    np.testing.assert_allclose(
        np.asarray(sparse), sparse_t.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(dense_pe), dense_pe_t.numpy(), atol=1e-5
    )

    masks, iou = dec.apply(
        {"params": full["decoder"]},
        jnp.broadcast_to(embed, (3,) + embed.shape[1:]),
        dense_pe,
        sparse,
        no_mask,
    )
    with torch.no_grad():
        src = embed_t + oracle.prompt_encoder.no_mask_embed.weight[0][
            None, :, None, None
        ]
        pe_chw = dense_pe_t.permute(2, 0, 1)
        masks_t, iou_t = oracle.mask_decoder(src, pe_chw, sparse_t)
    m_ref = masks_t.numpy()
    scale = np.abs(m_ref).max()
    np.testing.assert_allclose(
        np.asarray(masks) / scale, m_ref / scale, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(iou), iou_t.numpy(), atol=1e-3
    )


def test_sam_segmenter_pipeline(rng, monkeypatch, tmp_path):
    """Weights-gated SAM segmenter: raises without weights; with random
    weights explicitly allowed, the full AMG -> region-assignment flow
    returns a labeled segmentation of the right shape."""
    monkeypatch.setenv("GS_TPU_CHECKPOINT_DIR", str(tmp_path))
    import gs_init_tpu.mdi.segmentation_sam as S

    S._cached_generator.cache_clear()
    from gs_init_tpu.config import SegmentationConfig

    seg_cfg = SegmentationConfig(
        method="sam", sam_variant="vit_b", sam_use_normals=False,
        sam_img_size=128,  # keep the random-weights CPU forward small
    )
    depth = rng.uniform(1, 5, (48, 64)).astype(np.float32)
    mask = np.ones((48, 64), bool)
    with pytest.raises(FileNotFoundError):
        S.segment_depth_sam(depth, mask, None, seg_cfg)

    S._cached_generator.cache_clear()
    labels = S.segment_depth_sam(
        depth, mask, None, seg_cfg, allow_random_weights=True
    )
    assert labels.shape == depth.shape
    assert labels.dtype.kind == "i"
    S._cached_generator.cache_clear()


def test_sam_segmenter_nan_depth(rng, monkeypatch, tmp_path):
    """Predictors legitimately emit non-finite depth at masked pixels
    (e.g. MoGe sky); the quantile normalization must ignore them instead
    of poisoning the whole colormap image."""
    monkeypatch.setenv("GS_TPU_CHECKPOINT_DIR", str(tmp_path))
    import gs_init_tpu.mdi.segmentation_sam as S

    from gs_init_tpu.config import SegmentationConfig

    seg_cfg = SegmentationConfig(
        method="sam", sam_variant="vit_b", sam_use_normals=False,
        sam_img_size=128,
    )
    depth = rng.uniform(1, 5, (48, 64)).astype(np.float32)
    mask = np.ones((48, 64), bool)
    depth[:10] = np.nan  # sky
    mask[:10] = False
    S._cached_generator.cache_clear()
    labels = S.segment_depth_sam(
        depth, mask, None, seg_cfg, allow_random_weights=True
    )
    assert labels.shape == depth.shape
    assert np.issubdtype(labels.dtype, np.integer)
    S._cached_generator.cache_clear()
    # Fully-invalid input degrades to a single unassigned region.
    empty = S.segment_depth_sam(
        np.full((8, 8), np.nan, np.float32), np.zeros((8, 8), bool),
        None, seg_cfg, allow_random_weights=True,
    )
    assert (np.asarray(empty) == 0).all()
    S._cached_generator.cache_clear()


def test_create_segmentation_overlap_rule():
    """The reference's largest-first >75%-overlap merge (sam.py:36-66)."""
    from gs_init_tpu.mdi.segmentation_sam import create_segmentation

    big = np.zeros((10, 10), bool)
    big[:, :6] = True
    sub = np.zeros((10, 10), bool)
    sub[2:5, 1:5] = True  # fully inside big -> merges into it
    other = np.zeros((10, 10), bool)
    other[:, 7:] = True
    masks = [
        dict(segmentation=big, area=int(big.sum())),
        dict(segmentation=sub, area=int(sub.sum())),
        dict(segmentation=other, area=int(other.sum())),
    ]
    seg = create_segmentation(masks, (10, 10), degenerate_mask_thresh=0.9)
    assert seg[3, 3] == seg[0, 0] != 0  # merged
    assert seg[0, 8] not in (0, seg[0, 0])  # separate region
    assert (seg[:, 6] == 0).all()  # unassigned stripe
