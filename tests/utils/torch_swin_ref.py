"""Independent PyTorch reference implementation of the IR-ADS dual-stream
Swin backbone + heads, used ONLY in tests for numerical parity.

Written from the reference's documented semantics
(semseg/models/backbones/swin.py, heads/segformer.py, models/cmnext.py)
with the reference's exact module/parameter names so that ``state_dict()``
produces reference-format checkpoints — this simultaneously tests
ir_ads_tpu.utils.torch_import and the model math.  Follows the detrex test
pattern of keeping reference impls under tests/utils (SURVEY.md §4).

Eval-mode only: dropout/droppath are identity; BatchNorm uses running stats.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def window_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(windows, ws, h, w):
    b = int(windows.shape[0] / (h * w / ws / ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class WindowMSA(nn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.num_heads, self.ws = dim, heads, ws
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) * (2 * ws - 1), heads)
        )
        seq1 = torch.arange(0, (2 * ws - 1) * ws, 2 * ws - 1)
        seq2 = torch.arange(0, ws)
        coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
        idx = (coords + coords.T).flip(1)
        self.register_buffer("relative_position_index", idx)
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b, n, c = x.shape
        qkv = (
            self.qkv(x)
            .reshape(b, n, 3, self.num_heads, c // self.num_heads)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b // nw, nw, self.num_heads, n, n) + mask[None, :, None]
            attn = attn.view(-1, self.num_heads, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(x)


class ShiftWindowMSA(nn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.w_msa = WindowMSA(dim, heads, ws)

    def forward(self, x, hw):
        b, l, c = x.shape
        h, w = hw
        x = x.view(b, h, w, c)
        pad_r = (self.ws - w % self.ws) % self.ws
        pad_b = (self.ws - h % self.ws) % self.ws
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = h + pad_b, w + pad_r
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), (1, 2))
            img_mask = torch.zeros((1, hp, wp, 1))
            cnt = 0
            for hs in (
                slice(0, -self.ws),
                slice(-self.ws, -self.shift),
                slice(-self.shift, None),
            ):
                for vs in (
                    slice(0, -self.ws),
                    slice(-self.ws, -self.shift),
                    slice(-self.shift, None),
                ):
                    img_mask[:, hs, vs, :] = cnt
                    cnt += 1
            mw = window_partition(img_mask, self.ws).reshape(-1, self.ws * self.ws)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
        else:
            mask = None
        wins = window_partition(x, self.ws).reshape(-1, self.ws * self.ws, c)
        wins = self.w_msa(wins, mask)
        x = window_reverse(wins.reshape(-1, self.ws, self.ws, c), self.ws, hp, wp)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), (1, 2))
        if pad_r or pad_b:
            x = x[:, :h, :w, :]
        return x.reshape(b, h * w, c)


class FFN(nn.Module):
    """mmcv FFN layout: layers.0.0 (Linear) -> act -> layers.1 (Linear)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.ModuleList(
            [nn.Sequential(nn.Linear(dim, hidden)), nn.Linear(hidden, dim)]
        )

    def forward(self, x, identity):
        h = F.gelu(self.layers[0][0](x))
        return identity + self.layers[1](h)


class Adapter(nn.Module):
    def __init__(self, dim, ratio=0.0625):
        super().__init__()
        hidden = int(dim * ratio)
        self.D_fc1 = nn.Linear(dim, hidden)
        self.D_fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.D_fc2(F.relu(self.D_fc1(x)))  # skip_connect=False


class SwinBlockAdapter(nn.Module):
    def __init__(self, dim, heads, ffn_dim, ws, shift, adapter_ratio=0.0625):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = ShiftWindowMSA(dim, heads, ws, ws // 2 if shift else 0)
        self.norm2 = nn.LayerNorm(dim)
        self.ffn = FFN(dim, ffn_dim)
        self.MLP_RGB_Adapter = Adapter(dim, adapter_ratio)
        self.MLP_DTE_Adapter = Adapter(dim, adapter_ratio)

    def forward(self, x, hw, sub_mode):
        identity = x
        x = self.attn(self.norm1(x), hw) + identity
        adapter = (
            self.MLP_RGB_Adapter if sub_mode == "rgb" else self.MLP_DTE_Adapter
        )
        adapter_x = 0.5 * adapter(x)
        x = self.ffn(self.norm2(x), identity=x)
        return x + adapter_x


class PatchMerging(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.sampler = nn.Unfold(kernel_size=2, stride=2)
        self.norm = nn.LayerNorm(4 * in_dim)
        self.reduction = nn.Linear(4 * in_dim, out_dim, bias=False)

    def forward(self, x, hw):
        b, l, c = x.shape
        h, w = hw
        x = x.view(b, h, w, c).permute(0, 3, 1, 2)
        pad_h, pad_w = h % 2, w % 2
        if pad_h or pad_w:
            x = F.pad(x, (0, pad_w, 0, pad_h))
        x = self.sampler(x).transpose(1, 2)
        out_hw = ((h + pad_h) // 2, (w + pad_w) // 2)
        return self.reduction(self.norm(x)), out_hw


class Stage(nn.Module):
    def __init__(self, dim, depth, heads, ws, downsample, adapter_ratio=0.0625):
        super().__init__()
        self.blocks = nn.ModuleList(
            [
                SwinBlockAdapter(dim, heads, dim * 4, ws, j % 2 == 1, adapter_ratio)
                for j in range(depth)
            ]
        )
        self.downsample = PatchMerging(dim, dim * 2) if downsample else None

    def forward(self, x, hw, sub_mode):
        for blk in self.blocks:
            x = blk(x, hw, sub_mode)
        if self.downsample is not None:
            down, down_hw = self.downsample(x, hw)
            return down, down_hw, x, hw
        return x, hw, x, hw


class PatchEmbed(nn.Module):
    def __init__(self, dim, patch=4):
        super().__init__()
        self.patch = patch
        self.projection = nn.Conv2d(3, dim, patch, patch)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        h, w = x.shape[2:]
        pad_h = (self.patch - h % self.patch) % self.patch
        pad_w = (self.patch - w % self.patch) % self.patch
        x = F.pad(x, (0, pad_w, 0, pad_h))  # corner padding
        x = self.projection(x)
        hw = (x.shape[2], x.shape[3])
        return self.norm(x.flatten(2).transpose(1, 2)), hw


class MPGBlock(nn.Module):
    def __init__(self, dim, ratio=0.125):
        super().__init__()
        hidden = int(dim * ratio)
        self.D_fc1 = nn.Linear(dim, hidden)
        self.D_fc2 = nn.Linear(dim, hidden)
        self.P_fc2 = nn.Linear(hidden * 2, hidden)
        self.U_fc1 = nn.Linear(hidden, dim)
        self.tfts_gamma_rgb = nn.Parameter(torch.ones(dim))
        self.tfts_beta_rgb = nn.Parameter(torch.zeros(dim))
        self.tfts_gamma_dte = nn.Parameter(torch.ones(dim))
        self.tfts_beta_dte = nn.Parameter(torch.zeros(dim))

    def forward(self, a, b):
        x = self.U_fc1(
            self.P_fc2(torch.cat([self.D_fc1(a), self.D_fc2(b)], dim=-1))
        )
        p_rgb = x * self.tfts_gamma_rgb + self.tfts_beta_rgb
        p_dte = x * self.tfts_gamma_dte + self.tfts_beta_dte
        return x + p_rgb, x + p_dte


class DAttentionMM(nn.Module):
    """Reference swin.py:726-1025 semantics, eval mode, default flags
    (offset_range_factor=-1, use_pe=True, not dwc/fixed/log_cpb)."""

    def __init__(self, dims, stride, n_groups, n_heads, rpe_size=(60, 80)):
        super().__init__()
        self.n_heads, self.n_groups, self.stride = n_heads, n_groups, stride
        self.nc = dims
        self.n_head_channels = dims // n_heads
        self.n_group_channels = dims // n_groups
        self.n_group_heads = n_heads // n_groups
        self.scale = self.n_head_channels**-0.5
        kk = 9
        pad = kk // 2 if kk != stride else 0
        gc = self.n_group_channels
        self.conv_offset_x = nn.Sequential(
            nn.Conv2d(gc, gc, kk, stride, pad, groups=gc),
            _LNProxy(gc),
            nn.GELU(),
            nn.Conv2d(gc, 2, 1, 1, 0, bias=False),
        )
        self.conv_offset_y = nn.Sequential(
            nn.Conv2d(gc, gc, kk, stride, pad, groups=gc),
            _LNProxy(gc),
            nn.GELU(),
            nn.Conv2d(gc, 2, 1, 1, 0, bias=False),
        )
        self.fuse_q = _ConvBNGELU(dims * 2, dims)
        self.proj_q = nn.Conv2d(dims, dims, 1)
        self.get_sample_weight = nn.Sequential(
            nn.Conv2d(dims, dims, 1), nn.ReLU(), nn.Conv2d(dims, 2, 1)
        )
        self.proj_k = nn.Conv2d(dims, dims, 1)
        self.proj_v = nn.Conv2d(dims, dims, 1)
        self.proj_out = nn.Conv2d(dims, dims, 1)
        self.rpe_table = nn.Parameter(
            torch.zeros(n_heads, rpe_size[0] * 2 - 1, rpe_size[1] * 2 - 1)
        )
        self.deform_weight = nn.Parameter(torch.ones(dims))
        self.identity_weight = nn.Parameter(torch.ones(dims))

    def _ref_points(self, hk, wk, b):
        ys = torch.linspace(0.5, hk - 0.5, hk)
        xs = torch.linspace(0.5, wk - 0.5, wk)
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        ref = torch.stack((gy, gx), -1)
        ref[..., 1] = ref[..., 1] / max(wk - 1, 1) * 2 - 1
        ref[..., 0] = ref[..., 0] / max(hk - 1, 1) * 2 - 1
        return ref[None].expand(b * self.n_groups, -1, -1, -1)

    def _q_grid(self, h, w, b):
        gy, gx = torch.meshgrid(
            torch.arange(h).float(), torch.arange(w).float(), indexing="ij"
        )
        ref = torch.stack((gy, gx), -1)
        ref[..., 1] = ref[..., 1] / (w - 1) * 2 - 1
        ref[..., 0] = ref[..., 0] / (h - 1) * 2 - 1
        return ref[None].expand(b * self.n_groups, -1, -1, -1)

    def forward(self, x, y):
        b, c, h, w = x.shape
        g, gc = self.n_groups, self.n_group_channels
        xy = self.fuse_q(torch.cat([x, y], 1))
        q = self.proj_q(xy)
        x_off = x.reshape(b * g, gc, h, w)
        y_off = y.reshape(b * g, gc, h, w)
        x_offset = self.conv_offset_x(x_off).permute(0, 2, 3, 1)  # B*g,Hk,Wk,2
        y_offset = self.conv_offset_y(y_off).permute(0, 2, 3, 1)
        hk, wk = x_offset.shape[1:3]
        n = hk * wk
        ref = self._ref_points(hk, wk, b)
        pos_x = (x_offset + ref).clamp(-1, 1)
        pos_y = (y_offset + ref).clamp(-1, 1)

        def samp(feat, pos):
            return F.grid_sample(
                feat.reshape(b * g, gc, h, w),
                pos[..., (1, 0)],
                mode="bilinear",
                align_corners=True,
            )

        def both(feat):
            sx = samp(feat, pos_x).reshape(b, c, 1, n)
            sy = samp(feat, pos_y).reshape(b, c, 1, n)
            return torch.cat([sx, sy], dim=-1)

        x_s, y_s, q_s = both(x), both(y), both(q)
        wgt = self.get_sample_weight(q_s)
        wgt = wgt.softmax(dim=1).squeeze(2).unsqueeze(1)
        sampled = torch.sum(
            wgt * torch.cat([x_s, y_s], dim=-2), dim=-2, keepdim=True
        )
        qh = q.reshape(b * self.n_heads, self.n_head_channels, h * w)
        k = self.proj_k(sampled).reshape(
            b * self.n_heads, self.n_head_channels, n * 2
        )
        v = self.proj_v(sampled).reshape(
            b * self.n_heads, self.n_head_channels, n * 2
        )
        attn = torch.einsum("bcm,bcn->bmn", qh, k) * self.scale

        rpe = self.rpe_table[None].expand(b, -1, -1, -1)
        q_grid = self._q_grid(h, w, b)
        hg = self.n_group_heads

        def bias(pos):
            disp = (
                q_grid.reshape(b * g, h * w, 2).unsqueeze(2)
                - pos.reshape(b * g, n, 2).unsqueeze(1)
            ) * 0.5
            table = rpe.reshape(b, g, hg, *rpe.shape[2:]).reshape(
                b * g, hg, *rpe.shape[2:]
            )
            return F.grid_sample(
                table, disp[..., (1, 0)], mode="bilinear", align_corners=True
            )  # B*g, hg, HW, n

        ab = torch.cat([bias(pos_x), bias(pos_y)], dim=-1)
        attn = attn + ab.reshape(b * self.n_heads, h * w, n * 2)
        attn = attn.softmax(dim=2)
        out = torch.einsum("bmn,bcn->bcm", attn, v).reshape(b, c, h, w)
        out = self.proj_out(out)
        dw = self.deform_weight[None, :, None, None]
        iw = self.identity_weight[None, :, None, None]
        return dw * out + iw * xy


class _LNProxy(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(dim)

    def forward(self, x):
        return self.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


class _ConvBNGELU(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.GELU()
        )

    def forward(self, x):
        return self.conv(x)


class DeformMPGBlock(nn.Module):
    def __init__(self, dims, stride, n_groups, n_heads, ratio=0.125):
        super().__init__()
        hidden = int(dims * ratio)
        self.D_fc1 = nn.Linear(dims, hidden)
        self.D_fc2 = nn.Linear(dims, hidden)
        self.U_fc1 = nn.Linear(hidden, dims)
        self.deform_atten = DAttentionMM(hidden, stride, n_groups, n_heads)

    def forward(self, a, b, h, w):
        a = self.D_fc1(a)
        b = self.D_fc2(b)
        bsz, n, cc = a.shape
        a = a.reshape(bsz, h, w, cc).permute(0, 3, 1, 2)
        b = b.reshape(bsz, h, w, cc).permute(0, 3, 1, 2)
        fused = self.deform_atten(a, b)
        fused = fused.reshape(bsz, cc, -1).permute(0, 2, 1)
        return self.U_fc1(fused)


class SwinTransformerRef(nn.Module):
    """Full dual-stream backbone with reference names."""

    def __init__(self, embed_dim=16, depths=(1, 1, 1, 1), heads=(1, 2, 4, 8), ws=4):
        super().__init__()
        self.patch_embed = PatchEmbed(embed_dim)
        self.extra_patch_embed = PatchEmbed(embed_dim)
        dims = [embed_dim * 2**i for i in range(len(depths))]
        self.stages = nn.ModuleList(
            [
                Stage(dims[i], depths[i], heads[i], ws, i < len(depths) - 1)
                for i in range(len(depths))
            ]
        )
        self.MPGBlocks = nn.ModuleList([MPGBlock(d) for d in dims])
        strides = [8, 4, 2, 1]
        groups = [1, 2, 4, 8]
        dheads = [2, 4, 8, 16]
        self.DeformMPGBlocks = nn.ModuleList(
            [
                DeformMPGBlock(dims[i], strides[i], groups[i], dheads[i])
                for i in range(len(dims))
            ]
        )
        for i, d in enumerate(dims):
            setattr(self, f"norm{i}", nn.LayerNorm(d))
            setattr(self, f"extra_norm{i}", nn.LayerNorm(d))
            setattr(self, f"fuse_norm{i}", nn.LayerNorm(d))
        self.num_features = dims

    def forward(self, x_rgb, x_dte):
        x_rgb, hw = self.patch_embed(x_rgb)
        x_dte, _ = self.extra_patch_embed(x_dte)
        outs, outs_rgb, outs_dte = [], [], []
        hw_rgb = hw_dte = hw
        for i, stage in enumerate(self.stages):
            pr, pd = self.MPGBlocks[i](x_rgb, x_dte)
            x_rgb = x_rgb + pr
            x_dte = x_dte + pd
            x_rgb, hw_rgb, r_out, out_hw = stage(x_rgb, hw_rgb, "rgb")
            x_dte, hw_dte, d_out, _ = stage(x_dte, hw_dte, "dte")
            r_out = getattr(self, f"norm{i}")(r_out)
            d_out = getattr(self, f"extra_norm{i}")(d_out)
            fused = self.DeformMPGBlocks[i](r_out, d_out, *out_hw)
            fused = getattr(self, f"fuse_norm{i}")(fused)
            for lst, t in ((outs, fused), (outs_rgb, r_out), (outs_dte, d_out)):
                lst.append(
                    t.view(-1, *out_hw, t.shape[-1]).permute(0, 3, 1, 2)
                )
        return outs, outs_rgb, outs_dte


class SegFormerHeadRef(nn.Module):
    def __init__(self, dims, embed_dim, num_classes):
        super().__init__()
        for i, d in enumerate(dims):
            setattr(
                self,
                f"linear_c{i + 1}",
                nn.ModuleDict({"proj": nn.Linear(d, embed_dim)}),
            )
        self.linear_fuse = nn.ModuleDict(
            {
                "conv": nn.Conv2d(embed_dim * 4, embed_dim, 1, bias=False),
                "bn": nn.BatchNorm2d(embed_dim),
            }
        )
        self.linear_pred = nn.Conv2d(embed_dim, num_classes, 1)

    def forward(self, feats):
        b, _, h, w = feats[0].shape
        outs = []
        for i, f in enumerate(feats):
            proj = getattr(self, f"linear_c{i + 1}")["proj"]
            cf = (
                proj(f.flatten(2).transpose(1, 2))
                .permute(0, 2, 1)
                .reshape(b, -1, *f.shape[-2:])
            )
            if i > 0:
                cf = F.interpolate(
                    cf, size=(h, w), mode="bilinear", align_corners=False
                )
            outs.append(cf)
        x = self.linear_fuse["conv"](torch.cat(outs[::-1], dim=1))
        x = self.linear_fuse["bn"](x)
        x = F.relu(x)
        return self.linear_pred(x)


class CMNeXtRef(nn.Module):
    def __init__(self, embed_dim=16, depths=(1, 1, 1, 1), heads=(1, 2, 4, 8),
                 ws=4, num_classes=5, head_dims=(32, 16)):
        super().__init__()
        self.backbone = SwinTransformerRef(embed_dim, depths, heads, ws)
        dims = self.backbone.num_features
        self.decode_head = SegFormerHeadRef(dims, head_dims[0], num_classes)
        self.decode_head_rgb = SegFormerHeadRef(dims, head_dims[1], num_classes)
        self.decode_head_dte = SegFormerHeadRef(dims, head_dims[1], num_classes)

    def forward(self, rgb, dte):
        y, y_rgb, y_dte = self.backbone(rgb, dte)
        size = rgb.shape[2:]
        out = []
        for head, feats in (
            (self.decode_head, y),
            (self.decode_head_rgb, y_rgb),
            (self.decode_head_dte, y_dte),
        ):
            o = head(feats)
            out.append(
                F.interpolate(o, size=size, mode="bilinear", align_corners=False)
            )
        return tuple(out)
