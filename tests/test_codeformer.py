"""CodeFormer tests: the published checkpoint layout loads with 100% key
consumption, configs derive from shapes, and numerics match a torch
mini-oracle built with the published module structure (sczhou/CodeFormer
key names: encoder.blocks.N sequential VQGAN, ft_layers.N
TransformerSALayer with nn.MultiheadAttention, fuse_convs_dict SFT)."""

import numpy as np
import pytest

from gyre_tpu.models import codeformer as cf

CFG = cf.CODEFORMER_TEST


def build_torch_oracle(cfg: cf.CodeFormerConfig, seed=0):
    torch = pytest.importorskip("torch")
    nn = torch.nn
    torch.manual_seed(seed)
    g = cfg.norm_groups

    def normalize(c):
        return nn.GroupNorm(g, c, eps=1e-5, affine=True)

    def swish(x):
        return x * torch.sigmoid(x)

    class ResBlock(nn.Module):
        def __init__(self, c_in, c_out):
            super().__init__()
            self.norm1 = normalize(c_in)
            self.conv1 = nn.Conv2d(c_in, c_out, 3, 1, 1)
            self.norm2 = normalize(c_out)
            self.conv2 = nn.Conv2d(c_out, c_out, 3, 1, 1)
            if c_in != c_out:
                self.conv_out = nn.Conv2d(c_in, c_out, 1, 1, 0)
            self.has_skip = c_in != c_out

        def forward(self, x):
            h = self.conv1(swish(self.norm1(x)))
            h = self.conv2(swish(self.norm2(h)))
            if self.has_skip:
                x = self.conv_out(x)
            return x + h

    class AttnBlock(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = normalize(c)
            self.q = nn.Conv2d(c, c, 1)
            self.k = nn.Conv2d(c, c, 1)
            self.v = nn.Conv2d(c, c, 1)
            self.proj_out = nn.Conv2d(c, c, 1)

        def forward(self, x):
            b, c, h, w = x.shape
            hn = self.norm(x)
            q = self.q(hn).reshape(b, c, h * w).permute(0, 2, 1)
            k = self.k(hn).reshape(b, c, h * w)
            v = self.v(hn).reshape(b, c, h * w)
            attn = torch.bmm(q, k) * c ** -0.5
            attn = torch.softmax(attn, dim=2)
            out = torch.bmm(v, attn.permute(0, 2, 1)).reshape(b, c, h, w)
            return x + self.proj_out(out)

    class Downsample(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, 2, 0)

        def forward(self, x):
            return self.conv(nn.functional.pad(x, (0, 1, 0, 1)))

    class Upsample(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = nn.Conv2d(c, c, 3, 1, 1)

        def forward(self, x):
            return self.conv(nn.functional.interpolate(x, scale_factor=2,
                                                       mode="nearest"))

    def seq_blocks(plan):
        mods = []
        for kind, ci, co, _ in plan:
            if kind == "conv":
                mods.append(nn.Conv2d(ci, co, 3, 1, 1))
            elif kind == "res":
                mods.append(ResBlock(ci, co))
            elif kind == "attn":
                mods.append(AttnBlock(ci))
            elif kind == "down":
                mods.append(Downsample(ci))
            elif kind == "up":
                mods.append(Upsample(ci))
            elif kind == "norm":
                mods.append(normalize(ci))
        return nn.ModuleList(mods)

    class TransformerSALayer(nn.Module):
        def __init__(self, d, heads, mlp):
            super().__init__()
            self.self_attn = nn.MultiheadAttention(d, heads)
            self.linear1 = nn.Linear(d, mlp)
            self.linear2 = nn.Linear(mlp, d)
            self.norm1 = nn.LayerNorm(d)
            self.norm2 = nn.LayerNorm(d)

        def forward(self, tgt, query_pos):        # tgt: (T, B, D)
            t2 = self.norm1(tgt)
            q = k = t2 + query_pos
            out, _ = self.self_attn(q, k, value=t2)
            tgt = tgt + out
            t2 = self.norm2(tgt)
            return tgt + self.linear2(
                nn.functional.gelu(self.linear1(t2)))

    class FuseSft(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.encode_enc = ResBlock(2 * c, c)
            self.scale = nn.Sequential(nn.Conv2d(c, c, 3, 1, 1),
                                       nn.LeakyReLU(0.2, True),
                                       nn.Conv2d(c, c, 3, 1, 1))
            self.shift = nn.Sequential(nn.Conv2d(c, c, 3, 1, 1),
                                       nn.LeakyReLU(0.2, True),
                                       nn.Conv2d(c, c, 3, 1, 1))

        def forward(self, enc, dec, w):
            h = self.encode_enc(torch.cat([enc, dec], 1))
            return dec + w * (dec * self.scale(h) + self.shift(h))

    enc_plan, enc_fuse = cf.encoder_plan(cfg)
    gen_plan, gen_fuse = cf.generator_plan(cfg)

    class Oracle(nn.Module):
        def __init__(self):
            super().__init__()

            class Enc(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.blocks = seq_blocks(enc_plan)

            class Gen(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.blocks = seq_blocks(gen_plan)

            class Quant(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.embedding = nn.Embedding(cfg.codebook_size,
                                                  cfg.emb_dim)

            self.encoder = Enc()
            self.generator = Gen()
            self.quantize = Quant()
            self.position_emb = nn.Parameter(
                torch.randn(cfg.latent_size, cfg.dim_embd) * 0.02)
            self.feat_emb = nn.Linear(cfg.emb_dim, cfg.dim_embd)
            self.ft_layers = nn.ModuleList(
                [TransformerSALayer(cfg.dim_embd, cfg.n_head,
                                    cfg.dim_embd * 2)
                 for _ in range(cfg.n_layers)])
            self.idx_pred_layer = nn.Sequential(
                nn.LayerNorm(cfg.dim_embd),
                nn.Linear(cfg.dim_embd, cfg.codebook_size, bias=False))
            self.fuse_convs_dict = nn.ModuleDict(
                {s: FuseSft(dict((str(r), co) for _, _, co, r in
                                 enc_plan)[s]) for s in cfg.connect})

        def forward(self, x, w):
            x = x * 2 - 1
            feats = {}
            for i, blk in enumerate(self.encoder.blocks):
                x = blk(x)
                for size, idx in enc_fuse.items():
                    if idx == i and size in cfg.connect:
                        feats[size] = x
            b, c, hh, ww = x.shape
            tokens = x.flatten(2).permute(2, 0, 1)       # (T, B, C)
            q = self.feat_emb(tokens)
            pos = self.position_emb.unsqueeze(1).repeat(1, b, 1)
            for layer in self.ft_layers:
                q = layer(q, pos)
            logits = self.idx_pred_layer(q).permute(1, 0, 2)
            idx = logits.argmax(2)
            quant = self.quantize.embedding(idx).permute(0, 2, 1) \
                .reshape(b, cfg.emb_dim, hh, ww)
            x = quant
            for i, blk in enumerate(self.generator.blocks):
                x = blk(x)
                for size, idxf in gen_fuse.items():
                    if idxf == i and size in cfg.connect:
                        x = self.fuse_convs_dict[size](feats[size], x, w)
            return (x * 0.5 + 0.5).clamp(0, 1)

    net = Oracle()
    net.eval()
    return net


def test_published_fuse_indices():
    """The standard config must reproduce the checkpoint's hardcoded fuse
    positions (sczhou codeformer_arch.py)."""
    _, enc_fuse = cf.encoder_plan(cf.CODEFORMER)
    _, gen_fuse = cf.generator_plan(cf.CODEFORMER)
    assert enc_fuse == {"512": 2, "256": 5, "128": 8, "64": 11, "32": 14,
                        "16": 18}
    assert gen_fuse == {"16": 6, "32": 9, "64": 12, "128": 15, "256": 18,
                        "512": 21}


def test_load_layout_and_parity():
    import jax.numpy as jnp
    torch = pytest.importorskip("torch")

    net = build_torch_oracle(CFG)
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params, derived = cf.load_codeformer(state)   # strict
    assert derived.nf == CFG.nf and derived.ch_mult == CFG.ch_mult
    assert derived.res_blocks == CFG.res_blocks
    assert derived.codebook_size == CFG.codebook_size
    assert derived.dim_embd == CFG.dim_embd
    assert derived.n_layers == CFG.n_layers
    assert derived.connect == CFG.connect
    assert derived.img_size == CFG.img_size

    x = np.random.RandomState(0).rand(
        1, CFG.img_size, CFG.img_size, 3).astype(np.float32)
    for w in (0.0, 0.5, 1.0):
        ours = np.asarray(cf.restore(params, jnp.asarray(x), fidelity=w,
                                     cfg=derived))
        with torch.no_grad():
            theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         w).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, atol=3e-4,
                                   err_msg=f"w={w}")


def test_strict_load_catches_unconsumed():
    net = build_torch_oracle(CFG)
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    state["generator.blocks.0.zzz"] = np.zeros((1,), np.float32)
    with pytest.raises(KeyError):
        cf.load_codeformer(state)


def test_fidelity_changes_output():
    import jax
    import jax.numpy as jnp

    p = cf.init(jax.random.PRNGKey(0), CFG)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (1, CFG.img_size, CFG.img_size, 3))
    a = np.asarray(cf.restore(p, x, fidelity=0.0, cfg=CFG))
    b = np.asarray(cf.restore(p, x, fidelity=1.0, cfg=CFG))
    assert a.shape == (1, CFG.img_size, CFG.img_size, 3)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-5


def test_manager_codeformer_engine(tmp_path):
    import jax.numpy as jnp

    from gyre_tpu.manager.manager import EngineManager
    from gyre_tpu.models.load import write_safetensors

    net = build_torch_oracle(CFG)
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    path = str(tmp_path / "codeformer.safetensors")
    write_safetensors(path, state)
    m = EngineManager(
        [{"id": "face", "task": "face_restore", "model": path,
          "fidelity": 0.7}],
        compute_dtype=jnp.float32, batch_max=1)
    fr = m.task_pipeline("face_restore", "face")
    assert fr is not None
    out = np.asarray(fr(np.random.RandomState(0).rand(1, 48, 48, 3)
                        .astype(np.float32)))
    assert out.shape == (1, 48, 48, 3) and np.isfinite(out).all()
