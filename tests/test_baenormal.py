"""BAE surface-normal hinter: random-init runs + the published NNET
checkpoint layout loads key-for-key (the reference oracle cannot
instantiate offline — its encoder constructor calls torch.hub.load,
reference baenormal/submodules/encoder.py:12 — so load-path verification
uses a synthetic state dict shaped exactly like the published one)."""

import jax
import jax.numpy as jnp
import numpy as np

from gyre_tpu.models import baenormal as bae


def test_random_init_runs():
    p = bae.init(jax.random.PRNGKey(0), bae.EFFNET_TEST)
    img = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(jax.jit(
        lambda p, x: bae.apply(p, x, bae.EFFNET_TEST))(p, jnp.asarray(img)))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


class Tracked(dict):
    def __init__(self, base):
        super().__init__(base)
        self.used = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        ok = super().__contains__(k)
        return ok

    def get(self, k, default=None):
        if super().__contains__(k):
            self.used.add(k)
            return super().__getitem__(k)
        return default


def _synthetic_state():
    """Tiny NNET state dict with the published gen-efficientnet +
    UpSampleBN key names."""
    rng = np.random.default_rng(0)
    st = {}
    enc = "encoder.original_model."

    def conv(pre, cin, cout, k, bias=False, groups=1):
        st[f"{pre}.weight"] = rng.standard_normal(
            (cout, cin // groups, k, k)).astype(np.float32) * 0.05
        if bias:
            st[f"{pre}.bias"] = np.zeros(cout, np.float32)

    def bn(pre, c):
        st[f"{pre}.weight"] = np.ones(c, np.float32)
        st[f"{pre}.bias"] = np.zeros(c, np.float32)
        st[f"{pre}.running_mean"] = np.zeros(c, np.float32)
        st[f"{pre}.running_var"] = np.ones(c, np.float32)

    stem = 8
    conv(enc + "conv_stem", 3, stem, 3)
    bn(enc + "bn1", stem)
    # stage 0: DepthwiseSeparableConv (no expand)
    pre = enc + "blocks.0.0"
    conv(f"{pre}.conv_dw", stem, stem, 3, groups=stem)
    bn(f"{pre}.bn1", stem)
    conv(f"{pre}.se.conv_reduce", stem, 2, 1, bias=True)
    conv(f"{pre}.se.conv_expand", 2, stem, 1, bias=True)
    conv(f"{pre}.conv_pw", stem, 8, 1)
    bn(f"{pre}.bn2", 8)
    chans = [8]
    # stages 1..6: InvertedResidual
    cfg = [(8, 3), (8, 5), (16, 3), (16, 5), (24, 5), (32, 3)]
    c_prev = 8
    for si, (c, k) in enumerate(cfg, start=1):
        pre = enc + f"blocks.{si}.0"
        mid = c_prev * 6
        conv(f"{pre}.conv_pw", c_prev, mid, 1)
        bn(f"{pre}.bn1", mid)
        conv(f"{pre}.conv_dw", mid, mid, k, groups=mid)
        bn(f"{pre}.bn2", mid)
        conv(f"{pre}.se.conv_reduce", mid, max(c_prev // 4, 1), 1,
             bias=True)
        conv(f"{pre}.se.conv_expand", max(c_prev // 4, 1), mid, 1,
             bias=True)
        conv(f"{pre}.conv_pwl", mid, c, 1)
        bn(f"{pre}.bn3", c)
        chans.append(c)
        c_prev = c
    head = 64
    conv(enc + "conv_head", c_prev, head, 1)
    bn(enc + "bn2", head)

    # decoder (BN architecture)
    def dec_conv(pre, cin, cout, k, bias=True):
        conv(pre, cin, cout, k, bias=bias)

    def up(pre, cin, cout):
        dec_conv(f"{pre}._net.0", cin, cout, 3)
        bn(f"{pre}._net.1", cout)
        dec_conv(f"{pre}._net.3", cout, cout, 3)
        bn(f"{pre}._net.4", cout)

    d = head // 2
    dec_conv("decoder.conv2", head, head, 1)
    up("decoder.up1", head + chans[4], d)
    up("decoder.up2", d + chans[2], d // 2)
    up("decoder.up3", d // 2 + chans[1], d // 4)
    up("decoder.up4", d // 4 + chans[0], d // 8)
    dec_conv("decoder.out_conv_res8", d // 2, 4, 3)
    for name, cin in (("res4", d // 2 + 4), ("res2", d // 4 + 4),
                      ("res1", d // 8 + 4)):
        c_in = cin
        for i, cout in zip((0, 2, 4, 6), (128, 128, 128, 4)):
            st[f"decoder.out_conv_{name}.{i}.weight"] = \
                rng.standard_normal((cout, c_in, 1)).astype(np.float32) \
                * 0.05
            st[f"decoder.out_conv_{name}.{i}.bias"] = \
                np.zeros(cout, np.float32)
            c_in = cout
    return st


def test_published_layout_loads_and_runs():
    st = Tracked(_synthetic_state())
    params, cfg = bae.load_baenormal(st)
    unused = set(st) - st.used
    assert not unused, f"unconsumed keys: {sorted(unused)[:8]}"
    assert cfg.stem == 8 and cfg.head == 64
    assert len(cfg.stages) == 7

    img = np.random.default_rng(1).random((1, 64, 64, 3)).astype(np.float32)
    out = np.asarray(jax.jit(
        lambda p, x: bae.apply(p, x, cfg))(params, jnp.asarray(img)))
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_normal_engine_kind():
    from gyre_tpu.manager.manager import EngineManager

    m = EngineManager(
        [{"id": "bae", "task": "normal", "kind": "bae"}],
        compute_dtype=jnp.float32)
    m.load_engines()
    fn = m.task_pipeline("normal", "bae")
    assert fn is not None
    img = np.random.default_rng(2).random((1, 32, 32, 3)).astype(np.float32)
    out = np.asarray(fn(img))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out).all()
