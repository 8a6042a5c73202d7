"""LoRA / LyCORIS / Textual Inversion as functional weight transforms.

The reference applies these via runtime forward hooks on torch modules
(gyre/pipeline/lora.py:99-166, lycoris.py:236-335); hooks don't exist in a
functional world and would break XLA fusion anyway. Instead every adapter
becomes a *weight-tree transform*: W' = W + scale * rebuild(delta), applied
once per (engine, adapter-set) and cached — the compiled denoise program is
unchanged because params are traced arguments.

Format support (reference detect_lora_type, gyre/pipeline/lora.py:59-97):
  * kohya:      lora_unet_*/lora_te_* with .lora_up/.lora_down/.alpha
  * diffusers:  unet.*.lora_A/lora_B (peft) or *_lora.up/down
  * LyCORIS:    hada_w1_a/b + hada_w2_a/b (LoHa), lokr_w1/w2 (LoKr),
                diff (full)
"""

from __future__ import annotations

import re
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------- format detection


def detect_lora_format(state: dict) -> str:
    keys = list(state)
    if any(".hada_w1_a" in k or ".lokr_w1" in k for k in keys):
        return "lycoris"
    if any(k.startswith(("lora_unet_", "lora_te")) for k in keys):
        return "kohya"
    if any(".lora_A." in k or ".lora_B." in k or ".lora.up." in k or
           ".lora_linear_layer." in k or "_lora.up" in k for k in keys):
        return "diffusers"
    if any(k.endswith(":up") or "<s>" in k for k in keys):
        return "cloneofsimo"
    return "unknown"


# --------------------------------------------------- module-name resolution

_KOHYA_UNET_RE = re.compile(
    r"lora_unet_(down_blocks|up_blocks|mid_block)_?(\d)?_"
    r"(attentions|resnets)_(\d)_(.*)")


def _kohya_unet_path(name: str):
    """kohya module name -> path into our unet tree, or None."""
    m = _KOHYA_UNET_RE.match(name)
    if not m:
        return None
    section, lvl, kind, idx, rest = m.groups()
    base = {"down_blocks": ("down",), "up_blocks": ("up",),
            "mid_block": ("mid",)}[section]
    if section == "mid_block":
        if kind == "attentions":
            head = ("mid", "attn")
        else:
            head = ("mid", "res1" if idx == "0" else "res2")
    else:
        head = base + (int(lvl), "attns" if kind == "attentions" else
                       "resnets", int(idx))
    tail = _module_tail(rest)
    if tail is None:
        return None
    return head + tail


def _module_tail(rest: str):
    """transformer_blocks_0_attn1_to_q -> ('blocks', 0, 'attn1', 'q')."""
    m = re.match(r"transformer_blocks_(\d+)_(attn[12])_to_(q|k|v|out_0)",
                 rest)
    if m:
        tgt = m.group(3).replace("out_0", "out")
        return ("blocks", int(m.group(1)), m.group(2), tgt)
    m = re.match(r"transformer_blocks_(\d+)_ff_net_0_proj", rest)
    if m:
        return ("blocks", int(m.group(1)), "ff1")
    m = re.match(r"transformer_blocks_(\d+)_ff_net_2", rest)
    if m:
        return ("blocks", int(m.group(1)), "ff2")
    if rest == "proj_in":
        return ("proj_in",)
    if rest == "proj_out":
        return ("proj_out",)
    m = re.match(r"conv(\d)", rest)
    if m:
        return (f"conv{m.group(1)}",)
    if rest == "conv_shortcut":
        return ("shortcut",)
    if rest == "time_emb_proj":
        return ("time_emb",)
    return None


_KOHYA_TE_RE = re.compile(
    r"lora_te\d?_text_model_encoder_layers_(\d+)_(.*)")


def _kohya_te_path(name: str):
    m = _KOHYA_TE_RE.match(name)
    if not m:
        return None
    layer, rest = int(m.group(1)), m.group(2)
    tails = {
        "self_attn_q_proj": ("attn", "q"), "self_attn_k_proj": ("attn", "k"),
        "self_attn_v_proj": ("attn", "v"),
        "self_attn_out_proj": ("attn", "out"),
        "mlp_fc1": ("fc1",), "mlp_fc2": ("fc2",),
    }
    tail = tails.get(rest)
    return ("blocks", layer) + tail if tail else None


def _diffusers_unet_path(name: str):
    """diffusers/peft key prefix -> our tree path."""
    name = name.replace(".processor", "")
    parts = name.split(".")
    try:
        out: list = []
        i = 0
        if parts[0] == "unet":
            i = 1
        sec = parts[i]
        if sec == "mid_block":
            if parts[i + 1] == "attentions":
                out = ["mid", "attn"]
                i += 3
            else:
                out = ["mid", "res1" if parts[i + 2] == "0" else "res2"]
                i += 3
        else:
            out = ["down" if sec == "down_blocks" else "up", int(parts[i + 1])]
            out.append("attns" if parts[i + 2] == "attentions" else "resnets")
            out.append(int(parts[i + 3]))
            i += 4
        rest = "_".join(parts[i:])
        rest = (rest.replace("transformer_blocks_", "transformer_blocks.")
                .replace("to_out_0", "to_out_0"))
        tail = _module_tail("_".join(parts[i:]))
        return tuple(out) + tail if tail else None
    except (IndexError, ValueError):
        return None


# ------------------------------------------------------------ delta build


def _rebuild_delta(entry: dict) -> np.ndarray | None:
    """One module's adapter tensors -> dense torch-layout delta.

    LoRA: up @ down * (alpha/rank); LoHa: (w1a@w1b)*(w2a@w2b)*(alpha/dim);
    LoKr: kron(w1, w2)*scale; full: diff.
    (reference rebuild math: gyre/pipeline/lycoris.py:126-234)
    """
    def g(name):
        v = entry.get(name)
        return None if v is None else np.asarray(v, np.float32)

    if "diff" in entry:
        return g("diff")

    up, down = g("lora_up"), g("lora_down")
    if up is not None and down is not None:
        rank = down.shape[0]
        alpha = float(entry.get("alpha", rank))
        if down.ndim == 4:  # conv lora
            kh, kw = down.shape[2], down.shape[3]
            up2 = up.reshape(up.shape[0], -1)
            down2 = down.reshape(down.shape[0], -1)
            delta = (up2 @ down2).reshape(up.shape[0], down.shape[1], kh, kw)
        else:
            delta = up @ down
        return delta * (alpha / rank)

    w1a, w1b = g("hada_w1_a"), g("hada_w1_b")
    if w1a is not None:
        w2a, w2b = g("hada_w2_a"), g("hada_w2_b")
        rank = w1b.shape[0]
        alpha = float(entry.get("alpha", rank))
        m1 = w1a @ w1b
        m2 = w2a @ w2b
        delta = m1 * m2
        return delta * (alpha / rank)

    lokr_w1, lokr_w2 = g("lokr_w1"), g("lokr_w2")
    if lokr_w1 is not None or "lokr_w1_a" in entry:
        if lokr_w1 is None:
            lokr_w1 = g("lokr_w1_a") @ g("lokr_w1_b")
        if lokr_w2 is None and "lokr_w2_a" in entry:
            lokr_w2 = g("lokr_w2_a") @ g("lokr_w2_b")
        rank = entry.get("_rank", lokr_w1.shape[-1])
        alpha = float(entry.get("alpha", rank))
        delta = np.kron(lokr_w1, lokr_w2)
        return delta * (alpha / rank)
    return None


def group_modules(state: dict) -> dict[str, dict]:
    """Group flat checkpoint keys by module name."""
    groups: dict[str, dict] = defaultdict(dict)
    suffixes = {
        ".lora_up.weight": "lora_up", ".lora_down.weight": "lora_down",
        ".lora_B.weight": "lora_up", ".lora_A.weight": "lora_down",
        ".lora.up.weight": "lora_up", ".lora.down.weight": "lora_down",
        ".lora_linear_layer.up.weight": "lora_up",
        ".lora_linear_layer.down.weight": "lora_down",
        ".alpha": "alpha", ".hada_w1_a": "hada_w1_a",
        ".hada_w1_b": "hada_w1_b", ".hada_w2_a": "hada_w2_a",
        ".hada_w2_b": "hada_w2_b", ".lokr_w1": "lokr_w1",
        ".lokr_w2": "lokr_w2", ".lokr_w1_a": "lokr_w1_a",
        ".lokr_w1_b": "lokr_w1_b", ".lokr_w2_a": "lokr_w2_a",
        ".lokr_w2_b": "lokr_w2_b", ".diff": "diff",
    }
    for key, val in state.items():
        for suf, slot in suffixes.items():
            if key.endswith(suf):
                groups[key[: -len(suf)]][slot] = val
                break
    return dict(groups)


def resolve_path(module_name: str):
    """module name (any format) -> ('unet'|'te', tree path) or None."""
    if module_name.startswith("lora_unet_"):
        p = _kohya_unet_path(module_name)
        return ("unet", p) if p else None
    if module_name.startswith("lora_te"):
        p = _kohya_te_path(module_name)
        return ("te", p) if p else None
    if module_name.startswith(("unet.", "down_blocks", "up_blocks",
                               "mid_block")):
        p = _diffusers_unet_path(module_name)
        return ("unet", p) if p else None
    if module_name.startswith(("text_encoder.", "text_model.")):
        m = re.search(r"layers\.(\d+)\.(.+)", module_name)
        if m:
            tails = {
                "self_attn.q_proj": ("attn", "q"),
                "self_attn.k_proj": ("attn", "k"),
                "self_attn.v_proj": ("attn", "v"),
                "self_attn.out_proj": ("attn", "out"),
                "mlp.fc1": ("fc1",), "mlp.fc2": ("fc2",),
            }
            tail = tails.get(m.group(2))
            if tail:
                return ("te", ("blocks", int(m.group(1))) + tail)
    return None


def _tree_get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _tree_set(tree, path, value):
    """Functional set: returns a new tree with shared unmodified subtrees."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    if isinstance(tree, list):
        out = list(tree)
        out[head] = _tree_set(tree[head], rest, value)
        return out
    out = dict(tree)
    out[head] = _tree_set(tree[head], rest, value)
    return out


def apply_lora(unet_params, text_params_list, state: dict,
               scale: float | dict = 1.0):
    """Returns (unet_params', text_params_list') with deltas folded in.

    Deltas are computed host-side in f32 and added to the (possibly bf16)
    tree leaves on device; unmodified subtrees are shared, so memory cost
    is only the touched weights.

    `scale` may be a per-model dict keyed '*'/'unet'/'text_encoder'
    (proto Prompt.parameters.named_weights; reference resolves the same
    three keys and lets the named entry win,
    gyre/services/generate.py:835-847 + unified_pipeline.py:2221-2233).
    """
    if isinstance(scale, dict):
        wild = scale.get("*", 1.0)
        scales = {"unet": scale.get("unet", wild),
                  "text_encoder": scale.get("text_encoder", wild)}
    else:
        scales = {"unet": float(scale), "text_encoder": float(scale)}
    groups = group_modules(state)
    new_unet = unet_params
    new_te = list(text_params_list)
    applied = 0
    for mod_name, entry in groups.items():
        resolved = resolve_path(mod_name)
        if resolved is None:
            continue
        which, path = resolved
        scale = scales["unet" if which == "unet" else "text_encoder"]
        delta = _rebuild_delta(entry)
        if delta is None:
            continue
        # torch layout -> ours: linear [out,in] -> (in,out); conv OIHW->HWIO
        if delta.ndim == 4:
            delta_j = jnp.asarray(np.transpose(delta, (2, 3, 1, 0)))
        else:
            delta_j = jnp.asarray(delta.T)
        tree = new_unet if which == "unet" else new_te[0]
        try:
            leaf = _tree_get(tree, path + ("w",))
        except (KeyError, IndexError, TypeError):
            continue
        if leaf.shape != delta_j.shape:
            # conv lora on 1x1-projected attention etc: try squeezing
            if delta_j.ndim == 4 and leaf.ndim == 2:
                delta_j = delta_j[0, 0]
            if leaf.shape != delta_j.shape:
                continue
        new_leaf = (leaf.astype(jnp.float32) +
                    scale * delta_j).astype(leaf.dtype)
        if which == "unet":
            new_unet = _tree_set(new_unet, path + ("w",), new_leaf)
        else:
            new_te[0] = _tree_set(new_te[0], path + ("w",), new_leaf)
        applied += 1
    return new_unet, new_te, applied


# -------------------------------------------------------- textual inversion


def extract_ti_embeddings(state: dict) -> dict[str, np.ndarray]:
    """Token-embedding artifact -> {token: [n_vectors, dim]}.

    Supports the A1111 .pt layout ({'string_to_param': {'*': tensor}}),
    bare {'emb_params': ...}, and {token: tensor} safetensors.
    """
    out = {}
    if "string_to_param" in state:
        for tok, ten in state["string_to_param"].items():
            out[tok if tok != "*" else "<embedding>"] = np.asarray(ten)
        return out
    if "emb_params" in state:
        out["<embedding>"] = np.asarray(state["emb_params"])
        return out
    for key, val in state.items():
        arr = np.asarray(val)
        if arr.ndim == 1:
            arr = arr[None]
        if arr.ndim == 2:
            out[key] = arr
    return out


class TokenizerWithTI:
    """Wraps a tokenizer with added TI tokens mapping to appended embedding
    rows (the functional version of reference
    gyre/pipeline/textual_inversion.py's tokenizer/encoder resize)."""

    def __init__(self, base, added: dict[str, list[int]]):
        self.base = base
        self.added = added
        self.bos, self.eos, self.pad = base.bos, base.eos, base.pad

    def encode(self, text: str):
        import re as _re

        if not self.added:
            return self.base.encode(text)
        names = sorted(self.added, key=len, reverse=True)
        pattern = "(" + "|".join(_re.escape(n) for n in names) + ")"
        out: list[int] = []
        for part in _re.split(pattern, text):
            if part in self.added:
                out.extend(self.added[part])
            elif part:
                out.extend(self.base.encode(part))
        return out


def apply_textual_inversions(modelset, embeddings: dict[str, np.ndarray]):
    """Returns (new text_params list, wrapped tokenizer). Embedding rows
    are appended to tower 0's token table; token strings map to the new
    ids."""
    te = modelset.text_params[0]
    table = te["token_embedding"]
    added: dict[str, list[int]] = {}
    rows = []
    next_id = table.shape[0]
    for token, vecs in embeddings.items():
        vecs = np.asarray(vecs, np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None]
        if vecs.shape[-1] != table.shape[-1]:
            continue
        ids = list(range(next_id, next_id + len(vecs)))
        next_id += len(vecs)
        added[token] = ids
        rows.append(vecs)
    if not rows:
        return modelset.text_params, modelset.tokenizer
    new_table = jnp.concatenate(
        [table, jnp.asarray(np.concatenate(rows), table.dtype)], axis=0)
    new_te = dict(te)
    new_te["token_embedding"] = new_table
    return ([new_te] + list(modelset.text_params[1:]),
            TokenizerWithTI(modelset.tokenizer, added))
