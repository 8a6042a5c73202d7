"""Torch oracles with exact diffusers state-dict key names (test-only).

VERDICT weak #6: the load-path round-trip tests share their transpose
conventions with the export inverses, so a systematically transposed
weight would pass every round-trip and still produce garbage with real
checkpoints. These oracles break that symmetry: independent torch NCHW
implementations of the diffusers UNet2DConditionModel / AutoencoderKL
architectures (reference consumes them via diffusers — reference
gyre/pipeline/unified_pipeline.py, gyre/manager.py:1145-1252) whose
``state_dict()`` uses the published diffusers key names.  Tests feed the
oracle's state dict through models/load.py and require numeric agreement,
which only holds if every transpose, group ordering, GEGLU split, head
reshape and pad convention matches the real checkpoints' semantics.

Never imported by package code.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000.0):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) *
                      torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResnetBlock(nn.Module):
    def __init__(self, c_in, c_out, temb_dim, groups, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, c_in, eps=eps)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = nn.Linear(temb_dim, c_out)
        self.norm2 = nn.GroupNorm(groups, c_out, eps=eps)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        if c_in != c_out:
            self.conv_shortcut = nn.Conv2d(c_in, c_out, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class CrossAttention(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, t, c = x.shape
        h, d = self.heads, c // self.heads
        q = self.to_q(x).view(b, t, h, d).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, t, c)
        return self.to_out[0](o)


class GEGLU(nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim, dim_out * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, ctx_dim, heads)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList(
            [GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim)])

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        return x + self.ff.net[2](self.ff.net[0](self.norm3(x)))


class Transformer2D(nn.Module):
    def __init__(self, dim, ctx_dim, heads, n_layers, linear_proj, groups):
        super().__init__()
        self.linear_proj = linear_proj
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        if linear_proj:
            self.proj_in = nn.Linear(dim, dim)
            self.proj_out = nn.Linear(dim, dim)
        else:
            self.proj_in = nn.Conv2d(dim, dim, 1)
            self.proj_out = nn.Conv2d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, ctx_dim, heads)
             for _ in range(n_layers)])

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        x = self.norm(x)
        if self.linear_proj:
            x = x.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            x = x.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        for blk in self.transformer_blocks:
            x = blk(x, ctx)
        if self.linear_proj:
            x = self.proj_out(x)
            x = x.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        else:
            x = x.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
            x = self.proj_out(x)
        return x + res


class OracleUNet(nn.Module):
    """Tiny UNet2DConditionModel with diffusers key names + semantics."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.block_out_channels[0]
        ted = cfg.time_embed_dim
        g = cfg.norm_groups
        self.conv_in = nn.Conv2d(cfg.in_channels, ch0, 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(ch0, ted)
        self.time_embedding.linear_2 = nn.Linear(ted, ted)

        self.down_blocks = nn.ModuleList()
        c_prev = ch0
        for lvl, c_out in enumerate(cfg.block_out_channels):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock(c_prev if i == 0 else c_out, c_out, ted, g)
                 for i in range(cfg.layers_per_block)])
            if cfg.attn_levels[lvl]:
                blk.attentions = nn.ModuleList(
                    [Transformer2D(c_out, cfg.cross_attention_dim,
                                   cfg.num_heads[lvl],
                                   cfg.transformer_layers[lvl],
                                   cfg.linear_projection, g)
                     for _ in range(cfg.layers_per_block)])
            if lvl < cfg.levels - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(c_out, c_out, 3,
                                                     stride=2, padding=1)
            self.down_blocks.append(blk)
            c_prev = c_out

        c_mid = cfg.block_out_channels[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(c_mid, c_mid, ted, g),
             ResnetBlock(c_mid, c_mid, ted, g)])
        if cfg.mid_attn:
            self.mid_block.attentions = nn.ModuleList(
                [Transformer2D(c_mid, cfg.cross_attention_dim,
                               cfg.num_heads[cfg.levels - 1],
                               cfg.mid_transformer_layers,
                               cfg.linear_projection, g)])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(cfg.block_out_channels))
        for i, c_out in enumerate(rev):
            lvl = cfg.levels - 1 - i
            c_skip_base = rev[min(i + 1, cfg.levels - 1)]
            c_prev_blk = rev[max(i - 1, 0)] if i > 0 else c_mid
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(cfg.layers_per_block + 1):
                res_skip = (c_skip_base if j == cfg.layers_per_block
                            else c_out)
                res_in = (c_prev_blk if j == 0 else c_out) + res_skip
                blk.resnets.append(ResnetBlock(res_in, c_out, ted, g))
            if cfg.attn_levels[lvl]:
                blk.attentions = nn.ModuleList(
                    [Transformer2D(c_out, cfg.cross_attention_dim,
                                   cfg.num_heads[lvl],
                                   cfg.transformer_layers[lvl],
                                   cfg.linear_projection, g)
                     for _ in range(cfg.layers_per_block + 1)])
            if i < cfg.levels - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(c_out, c_out, 3, padding=1)
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(g, ch0)
        self.conv_out = nn.Conv2d(ch0, cfg.out_channels, 3, padding=1)

    def forward(self, x, timesteps, ctx):
        cfg = self.cfg
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for i, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[i](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        if hasattr(self.mid_block, "attentions"):
            h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ----------------------------------------------------------------- VAE


class VAEAttention(nn.Module):
    """diffusers Attention as used in the VAE mid block (heads=1,
    modern to_q/to_k/to_v/to_out.0 key names, group_norm)."""

    def __init__(self, c, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        res = x
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        a = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), dim=-1)
        o = self.to_out[0](a @ v)
        return o.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res


class OracleVAE(nn.Module):
    """Tiny AutoencoderKL with diffusers key names + semantics."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        chs = cfg.block_out_channels
        g = cfg.norm_groups
        lc = cfg.latent_channels
        eps = 1e-6

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        c_prev = chs[0]
        for lvl, c_out in enumerate(chs):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock(c_prev if i == 0 else c_out, c_out, 0, g,
                             eps=eps)
                 for i in range(cfg.layers_per_block)])
            if lvl < len(chs) - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                # VAE encoder: asymmetric (0,1,0,1) pad + VALID stride-2
                blk.downsamplers[0].conv = nn.Conv2d(c_out, c_out, 3,
                                                     stride=2, padding=0)
            enc.down_blocks.append(blk)
            c_prev = c_out
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(chs[-1], chs[-1], 0, g, eps=eps),
             ResnetBlock(chs[-1], chs[-1], 0, g, eps=eps)])
        enc.mid_block.attentions = nn.ModuleList([VAEAttention(chs[-1], g)])
        enc.conv_norm_out = nn.GroupNorm(g, chs[-1], eps=eps)
        enc.conv_out = nn.Conv2d(chs[-1], 2 * lc, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(lc, chs[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [ResnetBlock(chs[-1], chs[-1], 0, g, eps=eps),
             ResnetBlock(chs[-1], chs[-1], 0, g, eps=eps)])
        dec.mid_block.attentions = nn.ModuleList([VAEAttention(chs[-1], g)])
        dec.up_blocks = nn.ModuleList()
        c_prev = chs[-1]
        for i, c_out in enumerate(reversed(chs)):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock(c_prev if j == 0 else c_out, c_out, 0, g,
                             eps=eps)
                 for j in range(cfg.layers_per_block + 1)])
            if i < len(chs) - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(c_out, c_out, 3,
                                                   padding=1)
            dec.up_blocks.append(blk)
            c_prev = c_out
        dec.conv_norm_out = nn.GroupNorm(g, chs[0], eps=eps)
        dec.conv_out = nn.Conv2d(chs[0], cfg.out_channels, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * lc, 2 * lc, 1)
        self.post_quant_conv = nn.Conv2d(lc, lc, 1)

    def encode(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))
                h = blk.downsamplers[0].conv(h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        h = self.quant_conv(h)
        mean, logvar = h.chunk(2, dim=1)
        return mean, logvar.clamp(-30.0, 20.0)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


class BodyPose(nn.Module):
    """OpenPose body model with the published `body_pose_model.pth` key
    naming (model0 VGG-CPM stem; model{s}_{1,2} refinement branches).
    Architecture from the published CPM/OpenPose design."""

    STEM = [("conv1_1", 3, 64), ("conv1_2", 64, 64), "pool",
            ("conv2_1", 64, 128), ("conv2_2", 128, 128), "pool",
            ("conv3_1", 128, 256), ("conv3_2", 256, 256),
            ("conv3_3", 256, 256), ("conv3_4", 256, 256), "pool",
            ("conv4_1", 256, 512), ("conv4_2", 512, 512),
            ("conv4_3_CPM", 512, 256), ("conv4_4_CPM", 256, 128)]

    def __init__(self):
        super().__init__()
        from collections import OrderedDict

        stem = OrderedDict()
        pools = 0
        for e in self.STEM:
            if e == "pool":
                pools += 1
                stem[f"pool{pools}_stage1"] = nn.MaxPool2d(2, 2, 0)
            else:
                name, ci, co = e
                stem[name] = nn.Conv2d(ci, co, 3, 1, 1)
                stem[name + "_relu"] = nn.ReLU()
        # relu modules carry no weights; key names below strip them
        self.model0 = nn.Sequential(
            OrderedDict((k, v) for k, v in stem.items()))

        def branch(stage, out_ch):
            b = "L1" if out_ch == 38 else "L2"
            od = OrderedDict()
            if stage == 1:
                spec = [(f"conv5_1_CPM_{b}", 128, 128, 3),
                        (f"conv5_2_CPM_{b}", 128, 128, 3),
                        (f"conv5_3_CPM_{b}", 128, 128, 3),
                        (f"conv5_4_CPM_{b}", 128, 512, 1),
                        (f"conv5_5_CPM_{b}", 512, out_ch, 1)]
            else:
                spec = [(f"Mconv1_stage{stage}_{b}", 185, 128, 7)] + \
                    [(f"Mconv{i}_stage{stage}_{b}", 128, 128, 7)
                     for i in range(2, 6)] + \
                    [(f"Mconv6_stage{stage}_{b}", 128, 128, 1),
                     (f"Mconv7_stage{stage}_{b}", 128, out_ch, 1)]
            for j, (name, ci, co, k) in enumerate(spec):
                od[name] = nn.Conv2d(ci, co, k, 1, (k - 1) // 2)
                if j < len(spec) - 1:
                    od[name + "_relu"] = nn.ReLU()
            return nn.Sequential(od)

        for s in range(1, 7):
            setattr(self, f"model{s}_1", branch(s, 38))
            setattr(self, f"model{s}_2", branch(s, 19))

    def forward(self, x):
        feat = self.model0(x)
        out1 = self.model1_1(feat)
        out2 = self.model1_2(feat)
        for s in range(2, 7):
            inp = torch.cat([out1, out2, feat], dim=1)
            out1 = getattr(self, f"model{s}_1")(inp)
            out2 = getattr(self, f"model{s}_2")(inp)
        return out1, out2


# --------------------------------------------------------------- DexiNed
# Independent reconstruction of the published DexiNed torch model
# (xavysp/DexiNed model.py, served by the reference via kornia.filters.
# DexiNed) with the checkpoint's module naming — including its quirks:
# side blocks named 1/2/3/5, dense-layer conv paddings (2, 0).


class DexiSingleConv(nn.Module):
    def __init__(self, ci, co, stride, use_bs=True):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, 1, stride=stride)
        self.bn = nn.BatchNorm2d(co) if use_bs else None

    def forward(self, x):
        x = self.conv(x)
        return self.bn(x) if self.bn is not None else x


class DexiDoubleConv(nn.Module):
    def __init__(self, ci, cm, co=None, stride=1, use_act=True):
        super().__init__()
        co = co or cm
        self.conv1 = nn.Conv2d(ci, cm, 3, stride=stride, padding=1)
        self.bn1 = nn.BatchNorm2d(cm)
        self.conv2 = nn.Conv2d(cm, co, 3, padding=1)
        self.bn2 = nn.BatchNorm2d(co)
        self.use_act = use_act

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.bn2(self.conv2(x))
        return F.relu(x) if self.use_act else x


class DexiDenseLayer(nn.Sequential):
    def __init__(self, ci, co):
        super().__init__()
        self.add_module("conv1", nn.Conv2d(ci, co, 3, padding=2))
        self.add_module("norm1", nn.BatchNorm2d(co))
        self.add_module("relu1", nn.ReLU(inplace=True))
        self.add_module("conv2", nn.Conv2d(co, co, 3))  # padding 0
        self.add_module("norm2", nn.BatchNorm2d(co))

    def forward(self, x):
        x1, x2 = x
        new = super().forward(F.relu(x1))
        return 0.5 * (new + x2), x2


class DexiDenseBlock(nn.Sequential):
    def __init__(self, n, ci, co):
        super().__init__()
        for i in range(n):
            self.add_module(f"denselayer{i + 1}",
                            DexiDenseLayer(ci if i == 0 else co, co))

    def forward(self, x):
        for layer in self:
            x = layer(x)
        return x[0]


class DexiUpBlock(nn.Module):
    def __init__(self, ci, up_scale):
        super().__init__()
        pads = [0, 0, 1, 3, 7]
        layers = []
        for i in range(up_scale):
            co = 1 if i == up_scale - 1 else 16
            layers.append(nn.Conv2d(ci, co, 1))
            layers.append(nn.ReLU(inplace=True))
            layers.append(nn.ConvTranspose2d(co, co, 2 ** up_scale,
                                             stride=2,
                                             padding=pads[up_scale]))
            ci = co
        self.features = nn.Sequential(*layers)

    def forward(self, x):
        return self.features(x)


class DexiNed(nn.Module):
    def __init__(self):
        super().__init__()
        self.block_1 = DexiDoubleConv(3, 32, 64, stride=2)
        self.block_2 = DexiDoubleConv(64, 128, use_act=False)
        self.dblock_3 = DexiDenseBlock(2, 128, 256)
        self.dblock_4 = DexiDenseBlock(3, 256, 512)
        self.dblock_5 = DexiDenseBlock(3, 512, 512)
        self.dblock_6 = DexiDenseBlock(3, 512, 256)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.side_1 = DexiSingleConv(64, 128, 2)
        self.side_2 = DexiSingleConv(128, 256, 2)
        self.side_3 = DexiSingleConv(256, 512, 2)
        self.side_5 = DexiSingleConv(512, 512, 1)
        self.pre_dense_2 = DexiSingleConv(128, 256, 2)
        self.pre_dense_3 = DexiSingleConv(128, 256, 1)
        self.pre_dense_4 = DexiSingleConv(256, 512, 1)
        self.pre_dense_5 = DexiSingleConv(512, 512, 1)
        self.pre_dense_6 = DexiSingleConv(512, 256, 1)
        self.up_block_1 = DexiUpBlock(64, 1)
        self.up_block_2 = DexiUpBlock(128, 1)
        self.up_block_3 = DexiUpBlock(256, 2)
        self.up_block_4 = DexiUpBlock(512, 3)
        self.up_block_5 = DexiUpBlock(512, 4)
        self.up_block_6 = DexiUpBlock(256, 4)
        self.block_cat = DexiSingleConv(6, 1, 1, use_bs=False)

    def forward(self, x):
        b1 = self.block_1(x)
        b1_side = self.side_1(b1)
        b2 = self.block_2(b1)
        b2_down = self.maxpool(b2)
        b2_add = b2_down + b1_side
        b2_side = self.side_2(b2_add)
        b3_pre = self.pre_dense_3(b2_down)
        b3 = self.dblock_3([b2_add, b3_pre])
        b3_down = self.maxpool(b3)
        b3_add = b3_down + b2_side
        b3_side = self.side_3(b3_add)
        b2_half = self.pre_dense_2(b2_down)
        b4_pre = self.pre_dense_4(b3_down + b2_half)
        b4 = self.dblock_4([b3_add, b4_pre])
        b4_down = self.maxpool(b4)
        b4_add = b4_down + b3_side
        b4_side = self.side_5(b4_add)
        b5_pre = self.pre_dense_5(b4_down)
        b5 = self.dblock_5([b4_add, b5_pre])
        b5 = b5 + b4_side
        b6_pre = self.pre_dense_6(b5)
        b6 = self.dblock_6([b5, b6_pre])
        outs = [self.up_block_1(b1), self.up_block_2(b2),
                self.up_block_3(b3), self.up_block_4(b4),
                self.up_block_5(b5), self.up_block_6(b6)]
        fused = self.block_cat(torch.cat(outs, dim=1))
        outs.append(fused)
        return outs


# -------------------------------------------------------------- ZoeDepth
# Independent reconstruction of the published ZoeDepth metric-bins head
# (isl-org/ZoeDepth single-head ZoeD_N: SeedBinRegressorUnnormed,
# Projector, AttractorLayerUnnormed 'inv'/'mean', ConditionalLogBinomial)
# with the checkpoint key naming, as the oracle for
# gyre_tpu/models/zoedepth.py.


class ZoeSeedBinRegressorUnnormed(nn.Module):
    def __init__(self, in_features, n_bins=16, mlp_dim=256):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1), nn.ReLU(inplace=True),
            nn.Conv2d(mlp_dim, n_bins, 1), nn.Softplus())

    def forward(self, x):
        c = self._net(x)
        return c, c


class ZoeProjector(nn.Module):
    def __init__(self, in_features, out_features, mlp_dim=128):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1), nn.ReLU(inplace=True),
            nn.Conv2d(mlp_dim, out_features, 1))

    def forward(self, x):
        return self._net(x)


class ZoeAttractorLayerUnnormed(nn.Module):
    def __init__(self, in_features, n_bins, n_attractors=16, mlp_dim=128,
                 alpha=1000, gamma=2, kind="mean", attractor_type="inv"):
        super().__init__()
        self.alpha, self.gamma = alpha, gamma
        self.kind, self.attractor_type = kind, attractor_type
        self._net = nn.Sequential(
            nn.Conv2d(in_features, mlp_dim, 1), nn.ReLU(inplace=True),
            nn.Conv2d(mlp_dim, n_attractors, 1), nn.Softplus())

    def forward(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = F.interpolate(
                prev_b_embedding, x.shape[-2:], mode="bilinear",
                align_corners=True)
            x = x + prev_b_embedding
        A = self._net(x)
        b_prev = F.interpolate(b_prev, x.shape[-2:], mode="bilinear",
                               align_corners=True)
        dx = A.unsqueeze(2) - b_prev.unsqueeze(1)
        if self.attractor_type == "inv":
            pulled = dx / (1 + self.alpha * dx.abs() ** self.gamma)
        else:
            pulled = torch.exp(-self.alpha * dx.abs() ** self.gamma) * dx
        func = torch.mean if self.kind == "mean" else torch.sum
        delta = func(pulled, dim=1)
        b_new = b_prev + delta
        return b_new, b_new


class ZoeConditionalLogBinomial(nn.Module):
    def __init__(self, in_features, condition_dim, n_classes=64,
                 p_eps=1e-4, max_temp=50.0, min_temp=0.0212):
        super().__init__()
        self.K = n_classes
        self.p_eps, self.max_temp, self.min_temp = p_eps, max_temp, min_temp
        bottleneck = (in_features + condition_dim) // 4
        self.mlp = nn.Sequential(
            nn.Conv2d(in_features + condition_dim, bottleneck, 1),
            nn.GELU(),
            nn.Conv2d(bottleneck, 4, 1), nn.Softplus())
        k = torch.arange(n_classes).float()
        km1 = float(n_classes - 1)
        self.register_buffer(
            "log_coef",
            torch.lgamma(torch.tensor(km1 + 1)) - torch.lgamma(k + 1)
            - torch.lgamma(km1 - k + 1), persistent=False)

    def forward(self, x, cond):
        pc = self.mlp(torch.cat((x, cond), dim=1))
        p, c = pc[:, :2], pc[:, 2:]
        p = p + self.p_eps
        prob = p[:, 0:1] / (p[:, 0:1] + p[:, 1:2])
        c = c + self.min_temp
        t = (c[:, 0:1] / (c[:, 0:1] + c[:, 1:2])) * self.max_temp
        k = torch.arange(self.K, device=x.device).float().view(1, -1, 1, 1)
        km1 = float(self.K - 1)
        eps = 1e-4
        pc_ = prob.clamp(eps, 1.0)
        omp = (1 - prob).clamp(eps, 1.0)
        y = self.log_coef.view(1, -1, 1, 1) + k * torch.log(pc_) + \
            (km1 - k) * torch.log(omp)
        return torch.softmax(y / t, dim=1)


class ZoeHead(nn.Module):
    """The metric head with checkpoint key naming (conv2,
    seed_bin_regressor, seed_projector, projectors.N, attractors.N,
    conditional_log_binomial)."""

    def __init__(self, btlnck=64, out_feats=64, n_bins=8, embed=16,
                 mlp_dim=16, seed_mlp=16, n_attractors=(4, 2, 2, 1),
                 out_conv_ch=32):
        super().__init__()
        self.n_bins = n_bins
        self.conv2 = nn.Conv2d(btlnck, btlnck, 1)
        self.seed_bin_regressor = ZoeSeedBinRegressorUnnormed(
            btlnck, n_bins, seed_mlp)
        self.seed_projector = ZoeProjector(btlnck, embed, mlp_dim)
        self.projectors = nn.ModuleList(
            [ZoeProjector(out_feats, embed, mlp_dim) for _ in range(4)])
        self.attractors = nn.ModuleList(
            [ZoeAttractorLayerUnnormed(embed, n_bins, n, mlp_dim)
             for n in n_attractors])
        self.conditional_log_binomial = ZoeConditionalLogBinomial(
            out_conv_ch + 1, embed, n_bins)

    def forward(self, l4_rn, x_blocks, out_conv, rel_depth):
        x = self.conv2(l4_rn)
        _, seed = self.seed_bin_regressor(x)
        b_prev = seed
        prev_embed = self.seed_projector(x)
        embed = prev_embed
        for proj, attr, xb in zip(self.projectors, self.attractors,
                                  x_blocks):
            embed = proj(xb)
            b, _ = attr(embed, b_prev, prev_embed)
            b_prev, prev_embed = b, embed
        last = torch.cat(
            [out_conv,
             F.interpolate(rel_depth, out_conv.shape[-2:],
                           mode="bilinear", align_corners=True)], dim=1)
        cond = F.interpolate(embed, last.shape[-2:], mode="bilinear",
                             align_corners=True)
        probs = self.conditional_log_binomial(last, cond)
        centers = F.interpolate(b_prev, probs.shape[-2:], mode="bilinear",
                                align_corners=True)
        return torch.sum(probs * centers, dim=1, keepdim=True)


# ------------------------------------------------------------------ M-LSD

# MobileV2_MLSD_Large oracle with the published mlsd_large_512_fp32.pth
# key names (backbone.features.N.conv..., blockNN.convN...). The
# reference vendors this architecture unmodified
# (gyre/pipeline/hinters/models/mbv2_mlsd_large.py); independent
# reimplementation here so load_mlsd's BN folding, TFLite padding and
# align_corners upsample are verified against real torch semantics.


class MlsdConvBNReLU(nn.Sequential):
    """Conv+BN+ReLU6 with the TFLite quirk: stride-2 convs pad (0,1,0,1)
    explicitly then conv with padding=0. Sequential so state-dict keys
    are positional (``...0.weight`` conv / ``...1.*`` BN) like the
    published checkpoint."""

    def __init__(self, ci, co, k=3, stride=1, groups=1):
        pad = 0 if stride == 2 else (k - 1) // 2
        super().__init__(
            nn.Conv2d(ci, co, k, stride, pad, groups=groups, bias=False),
            nn.BatchNorm2d(co))
        self.stride = stride

    def forward(self, x):
        if self.stride == 2:
            x = F.pad(x, (0, 1, 0, 1))
        for m in self:
            x = m(x)
        return F.relu6(x)


class MlsdInvertedResidual(nn.Module):
    def __init__(self, ci, co, stride, expand):
        super().__init__()
        hidden = ci * expand
        self.use_res = stride == 1 and ci == co
        mods = []
        if expand != 1:
            mods.append(MlsdConvBNReLU(ci, hidden, k=1))
        mods += [MlsdConvBNReLU(hidden, hidden, stride=stride,
                                groups=hidden),
                 nn.Conv2d(hidden, co, 1, bias=False),
                 nn.BatchNorm2d(co)]
        self.conv = nn.Sequential(*mods)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class MlsdBackbone(nn.Module):
    PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1))
    TAPS = (1, 3, 6, 10, 13)

    def __init__(self):
        super().__init__()
        feats = [MlsdConvBNReLU(4, 32, stride=2)]
        ci = 32
        for t, c, n, s in self.PLAN:
            for i in range(n):
                feats.append(MlsdInvertedResidual(ci, c, s if i == 0
                                                  else 1, t))
                ci = c
        self.features = nn.Sequential(*feats)

    def forward(self, x):
        taps = []
        for i, f in enumerate(self.features):
            x = f(x)
            if i in self.TAPS:
                taps.append(x)
        return taps


def _cbr1(ci, co):
    return nn.Sequential(nn.Conv2d(ci, co, 1), nn.BatchNorm2d(co),
                         nn.ReLU())


def _cbr3(ci, co, pad=1, dil=1):
    return nn.Sequential(nn.Conv2d(ci, co, 3, padding=pad, dilation=dil),
                         nn.BatchNorm2d(co), nn.ReLU())


class MlsdBlockA(nn.Module):
    def __init__(self, ci1, ci2, upscale=True):
        super().__init__()
        self.conv1 = _cbr1(ci2, 64)
        self.conv2 = _cbr1(ci1, 64)
        self.upscale = upscale

    def forward(self, a, b):
        b = self.conv1(b)
        a = self.conv2(a)
        if self.upscale:
            b = F.interpolate(b, scale_factor=2.0, mode="bilinear",
                              align_corners=True)
        return torch.cat((a, b), dim=1)


class MlsdBlockB(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv1 = _cbr3(ci, ci)
        self.conv2 = _cbr3(ci, co)

    def forward(self, x):
        return self.conv2(self.conv1(x) + x)


class MlsdBlockC(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv1 = _cbr3(ci, ci, pad=5, dil=5)
        self.conv2 = _cbr3(ci, ci)
        self.conv3 = nn.Conv2d(ci, co, 1)

    def forward(self, x):
        return self.conv3(self.conv2(self.conv1(x)))


class MlsdLarge(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = MlsdBackbone()
        self.block15 = MlsdBlockA(64, 96, upscale=False)
        self.block16 = MlsdBlockB(128, 64)
        self.block17 = MlsdBlockA(32, 64)
        self.block18 = MlsdBlockB(128, 64)
        self.block19 = MlsdBlockA(24, 64)
        self.block20 = MlsdBlockB(128, 64)
        self.block21 = MlsdBlockA(16, 64)
        self.block22 = MlsdBlockB(128, 64)
        self.block23 = MlsdBlockC(64, 16)

    def forward(self, x):
        c1, c2, c3, c4, c5 = self.backbone(x)
        x = self.block16(self.block15(c4, c5))
        x = self.block18(self.block17(c3, x))
        x = self.block20(self.block19(c2, x))
        x = self.block22(self.block21(c1, x))
        return self.block23(x)


# ----------------------------------------------------------------- K-UNet

# sd-x2-latent-upscaler oracle: diffusers' KBlock UNet2DConditionModel
# structure with the published state-dict key names (time_proj fourier
# weight, time_embedding.linear_*, down_blocks.N.resnets.M ada_group
# resnets with norm{1,2}.linear FiLM, KAttentionBlock attn1/attn2 with
# to_out.0 + norm_cross, blur up/downsampling, no mid block). Independent
# reimplementation so gyre_tpu/models/kunet.py's NHWC port and strict
# loader are verified against real torch semantics.


class KAdaGroupNorm(nn.Module):
    def __init__(self, emb_dim, dim, groups):
        super().__init__()
        self.linear = nn.Linear(emb_dim, dim * 2)
        self.groups = groups

    def forward(self, x, emb):
        e = self.linear(emb)
        scale, shift = e.chunk(2, dim=1)
        x = F.group_norm(x, self.groups, eps=1e-5)
        return x * (1 + scale[:, :, None, None]) + shift[:, :, None, None]


class KResnet(nn.Module):
    def __init__(self, cin, cout, temb_dim, group_size):
        super().__init__()
        self.norm1 = KAdaGroupNorm(temb_dim, cin, max(1, cin // group_size))
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = KAdaGroupNorm(temb_dim, cout, max(1, cout // group_size))
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1, bias=False)

    def forward(self, x, emb):
        h = F.gelu(self.norm1(x, emb))
        h = self.conv1(h)
        h = F.gelu(self.norm2(h, emb))
        h = self.conv2(h)
        sc = self.conv_shortcut(x) if hasattr(self, "conv_shortcut") else x
        return sc + h


class KOracleAttention(nn.Module):
    """diffusers Attention key surface: to_q/k/v (no bias), to_out.0,
    optional norm_cross LayerNorm on the encoder states."""

    def __init__(self, dim, kv_dim, heads, norm_cross=False):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(kv_dim, dim, bias=False)
        self.to_v = nn.Linear(kv_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])
        if norm_cross:
            self.norm_cross = nn.LayerNorm(kv_dim)

    def forward(self, x, ctx=None):
        src = x if ctx is None else ctx
        if ctx is not None and hasattr(self, "norm_cross"):
            src = self.norm_cross(src)
        b, t, c = x.shape
        h = self.heads
        d = c // h
        q = self.to_q(x).view(b, t, h, d).transpose(1, 2)
        k = self.to_k(src).view(b, src.shape[1], h, d).transpose(1, 2)
        v = self.to_v(src).view(b, src.shape[1], h, d).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, t, c)
        return self.to_out[0](o)


class KAttentionBlock(nn.Module):
    def __init__(self, dim, heads, cross_dim, temb_dim, group_size,
                 self_attn):
        super().__init__()
        if self_attn:
            self.norm1 = KAdaGroupNorm(temb_dim, dim,
                                       max(1, dim // group_size))
            self.attn1 = KOracleAttention(dim, dim, heads)
        self.norm2 = KAdaGroupNorm(temb_dim, dim, max(1, dim // group_size))
        self.attn2 = KOracleAttention(dim, cross_dim, heads, norm_cross=True)

    def forward(self, x, emb, ctx):
        b, c, hh, ww = x.shape
        if hasattr(self, "attn1"):
            n = self.norm1(x, emb).view(b, c, hh * ww).transpose(1, 2)
            a = self.attn1(n).transpose(1, 2).view(b, c, hh, ww)
            x = x + a
        n = self.norm2(x, emb).view(b, c, hh * ww).transpose(1, 2)
        a = self.attn2(n, ctx).transpose(1, 2).view(b, c, hh, ww)
        return x + a


def _k_blur_kernel(mult=1.0):
    k1 = torch.tensor([[1.0, 3.0, 3.0, 1.0]]) / 8.0 * mult
    return k1.T @ k1


def k_blur_down(x):
    c = x.shape[1]
    x = F.pad(x, (1, 1, 1, 1), "reflect")
    w = x.new_zeros(c, c, 4, 4)
    idx = torch.arange(c)
    w[idx, idx] = _k_blur_kernel().to(x)
    return F.conv2d(x, w, stride=2)


def k_blur_up(x):
    c = x.shape[1]
    x = F.pad(x, (1, 1, 1, 1), "reflect")
    w = x.new_zeros(c, c, 4, 4)
    idx = torch.arange(c)
    w[idx, idx] = _k_blur_kernel(2.0).to(x)
    return F.conv_transpose2d(x, w, stride=2, padding=3)


class KBlock(nn.Module):
    def __init__(self, cin, cout, layers, temb_dim, group_size, heads,
                 cross_dim, attn, self_attn, last_out=None):
        super().__init__()
        res, att = [], []
        for i in range(layers):
            ci = cin if i == 0 else cout
            co = cout if (last_out is None or i < layers - 1) else last_out
            res.append(KResnet(ci, co, temb_dim, group_size))
            if attn:
                att.append(KAttentionBlock(co, max(1, co // heads), cross_dim,
                                           temb_dim, group_size, self_attn))
        self.resnets = nn.ModuleList(res)
        if attn:
            self.attentions = nn.ModuleList(att)

    def forward(self, x, emb, ctx):
        for i, r in enumerate(self.resnets):
            x = r(x, emb)
            if hasattr(self, "attentions"):
                x = self.attentions[i](x, emb, ctx)
        return x


class KFourier(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(dim) * 16.0,
                                   requires_grad=False)

    def forward(self, t):
        ang = 2 * torch.pi * t[:, None] * self.weight[None]
        return torch.cat([torch.cos(ang), torch.sin(ang)], dim=-1)


class KTimeEmbedding(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear_1 = nn.Linear(dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.gelu(self.linear_1(x)))


class KUnet(nn.Module):
    """head_dim: channels per attention head (published: 64)."""

    def __init__(self, in_ch=8, out_ch=4, boc=(64, 128), layers=2,
                 cross_dim=96, head_dim=64, group_size=16,
                 attn_levels=(False, True), self_attn_levels=(False, True)):
        super().__init__()
        ted = boc[0] * 2
        self.time_proj = KFourier(boc[0])
        self.time_embedding = KTimeEmbedding(ted)
        self.conv_in = nn.Conv2d(in_ch, boc[0], 3, padding=1)
        downs, ups = [], []
        for li, co in enumerate(boc):
            ci = boc[max(li - 1, 0)]
            downs.append(KBlock(ci, co, layers, ted, group_size, head_dim,
                                cross_dim, attn_levels[li],
                                self_attn_levels[li]))
        rev = list(reversed(boc))
        for li in range(len(boc)):
            c_here = rev[li]
            c_out = rev[min(li + 1, len(boc) - 1)]
            lvl = len(boc) - 1 - li
            ups.append(KBlock(2 * c_here, c_here, layers, ted, group_size,
                              head_dim, cross_dim, attn_levels[lvl],
                              self_attn_levels[lvl], last_out=c_out))
        self.down_blocks = nn.ModuleList(downs)
        self.up_blocks = nn.ModuleList(ups)
        self.conv_out = nn.Conv2d(boc[0], out_ch, 3, padding=1)

    def forward(self, x, c_noise, ctx):
        emb = self.time_embedding(self.time_proj(c_noise))
        h = self.conv_in(x)
        skips = []
        for li, blk in enumerate(self.down_blocks):
            h = blk(h, emb, ctx)
            skips.append(h)
            if li != len(self.down_blocks) - 1:
                h = k_blur_down(h)
        for li, blk in enumerate(self.up_blocks):
            h = torch.cat([h, skips[-(li + 1)]], dim=1)
            h = blk(h, emb, ctx)
            if li != len(self.up_blocks) - 1:
                h = k_blur_up(h)
        return self.conv_out(h)
