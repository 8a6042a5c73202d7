"""engines.yaml loader: the templated engine-config DSL.

Re-implements the semantics of the reference's config system
(gyre/engines_yaml.py:40-435): `!include <glob>` file composition,
conditional `!include(flag)`, template inheritance via `template:` chains,
`{{var}}` / `{{var:default}}` substitution, `{{#flag}}...{{/flag}}` and
`{{^flag}}` sections, and deep-merging of entries by id/model_id.

Design difference: rather than custom YAML constructors mutating a node
tree, we parse plain YAML and run a pure post-pass (include resolution ->
template expansion -> variable substitution -> merge). Same config files,
simpler machine.
"""

from __future__ import annotations

import glob as globmod
import os
import re
from typing import Any

import yaml


class _IncludeTag:
    def __init__(self, pattern: str, flag: str | None = None):
        self.pattern = pattern
        self.flag = flag


def _include_constructor(loader, node):
    tag = node.tag  # !include or !include(flag)
    m = re.match(r"!include(?:\((\w+)\))?$", tag)
    flag = m.group(1) if m else None
    return _IncludeTag(loader.construct_scalar(node), flag)


def _none_constructor(loader, node):
    return None


class _Loader(yaml.SafeLoader):
    pass


_Loader.add_constructor("!none", _none_constructor)
for t in ["!include"]:
    _Loader.add_constructor(t, _include_constructor)
_Loader.add_multi_constructor(
    "!include(", lambda loader, suffix, node: _IncludeTag(
        loader.construct_scalar(node), suffix.rstrip(")")))


def _load_file(path: str, flags: dict[str, bool], seen: set[str]) -> list:
    """Load one yaml file, resolving !include tags depth-first."""
    rp = os.path.realpath(path)
    if rp in seen:
        raise ValueError(f"recursive include of {path}")
    seen = seen | {rp}
    with open(path) as fh:
        doc = yaml.load(fh, Loader=_Loader)
    return _resolve_includes(doc, os.path.dirname(path), flags, seen)


def _resolve_includes(node, base: str, flags, seen):
    if isinstance(node, _IncludeTag):
        if node.flag is not None and not flags.get(node.flag):
            return []
        out = []
        paths = sorted(globmod.glob(os.path.join(base, node.pattern)))
        for p in paths:
            sub = _load_file(p, flags, seen)
            if isinstance(sub, list):
                out.extend(sub)
            elif sub is not None:
                out.append(sub)
        return out
    if isinstance(node, list):
        out = []
        for item in node:
            r = _resolve_includes(item, base, flags, seen)
            if isinstance(item, _IncludeTag):
                out.extend(r if isinstance(r, list) else [r])
            else:
                out.append(r)
        return out
    if isinstance(node, dict):
        return {k: _resolve_includes(v, base, flags, seen)
                for k, v in node.items()}
    return node


# ------------------------------------------------------------- templating

_VAR_RE = re.compile(r"\{\{([#^/>]?)([\w.]+)(?::([^}]*))?\}\}")


def _render_str(s: str, vars: dict) -> Any:
    """Substitute {{var}} / {{var:default}} in a string; if the whole string
    is one variable reference, return the raw value (keeps types)."""
    m = _VAR_RE.fullmatch(s.strip())
    if m and not m.group(1):
        name, default = m.group(2), m.group(3)
        return vars.get(name, default if default is not None else "")

    def sub(mm):
        if mm.group(1):
            return mm.group(0)  # section tags handled structurally
        v = vars.get(mm.group(2), mm.group(3))
        return "" if v is None else str(v)

    return _VAR_RE.sub(sub, s)


def _render(node, vars: dict):
    """Recursive variable substitution + section handling.

    Dict keys of the form '{{#flag}}' / '{{^flag}}' gate their subtree on a
    truthy/falsy variable and splice the subtree's keys into the parent.
    """
    if isinstance(node, str):
        return _render_str(node, vars)
    if isinstance(node, list):
        return [_render(x, vars) for x in node]
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            m = _VAR_RE.fullmatch(str(k)) if isinstance(k, str) else None
            if m and m.group(1) in ("#", "^"):
                flag = bool(vars.get(m.group(2)))
                want = flag if m.group(1) == "#" else not flag
                if want and isinstance(v, dict):
                    out.update(_render(v, vars))
                continue
            out[_render_str(k, vars) if isinstance(k, str) else k] = \
                _render(v, vars)
        return out
    return node


def deep_merge(base, overlay):
    """Overlay wins; dicts merge recursively; lists replace."""
    if isinstance(base, dict) and isinstance(overlay, dict):
        out = dict(base)
        for k, v in overlay.items():
            out[k] = deep_merge(base.get(k), v) if k in base else v
        return out
    return overlay


def apply_templates(entries: list[dict]) -> list[dict]:
    """Expand `template: <id>` inheritance chains. Entries with
    `abstract: true` are templates only and removed from output.
    Variables in the child's `params:` dict render the parent's body."""
    by_id = {}
    for e in entries:
        if isinstance(e, dict) and "id" in e:
            by_id[e["id"]] = e

    def expand(e, depth=0):
        if depth > 16:
            raise ValueError("template chain too deep")
        tpl_id = e.get("template")
        if not tpl_id:
            return e
        parent = by_id.get(tpl_id)
        if parent is None:
            raise KeyError(f"unknown template {tpl_id!r}")
        parent = expand(parent, depth + 1)
        vars = dict(parent.get("params") or {})
        vars.update(e.get("params") or {})
        vars.setdefault("id", e.get("id"))
        body = _render({k: v for k, v in parent.items()
                        if k not in ("id", "abstract", "template", "params")},
                       vars)
        child = {k: v for k, v in e.items() if k not in ("template", "params")}
        merged = deep_merge(body, child)
        return merged

    out = []
    for e in entries:
        if not isinstance(e, dict):
            continue
        if e.get("abstract"):
            continue
        out.append(expand(e))
    return out


def merge_by_id(entries: list[dict]) -> list[dict]:
    """Later entries with the same id/model_id/hintset_id deep-merge into
    earlier ones (user overlay semantics, reference
    gyre/engines_yaml.py:258-288)."""
    keys = ("id", "model_id", "hintset_id")
    out: list[dict] = []
    index: dict[tuple, int] = {}
    for e in entries:
        k = next(((kk, e[kk]) for kk in keys if kk in e), None)
        if k is not None and k in index:
            out[index[k]] = deep_merge(out[index[k]], e)
        else:
            if k is not None:
                index[k] = len(out)
            out.append(e)
    return out


def check_and_update(dist_dir: str, user_dir: str,
                     attic_name: str = "_attic") -> list[str]:
    """Sync distributed config files into a user config dir: unedited user
    copies (content matches any previously-shipped hash) are updated in
    place; edited ones are left alone with the new dist file written
    alongside as `<name>.new`; obsolete unedited files retire to _attic
    (reference git-blob-hash auto-update, gyre/engines_yaml.py:381-435).

    Returns the list of updated/created file names."""
    import hashlib
    import shutil

    os.makedirs(user_dir, exist_ok=True)
    hashes_path = os.path.join(user_dir, ".dist_hashes")
    old_hashes: dict[str, str] = {}
    if os.path.exists(hashes_path):
        with open(hashes_path) as fh:
            for line in fh:
                h, _, name = line.strip().partition(" ")
                if name:
                    old_hashes[name] = h

    def digest(path):
        with open(path, "rb") as fh:
            return hashlib.sha1(fh.read()).hexdigest()

    def walk(d):
        for root, _dirs, files in os.walk(d):
            for f in sorted(files):
                yield os.path.relpath(os.path.join(root, f), d)

    changed = []
    new_hashes = {}
    for name in sorted(walk(dist_dir)):
        src = os.path.join(dist_dir, name)
        new_hashes[name] = digest(src)
        dst = os.path.join(user_dir, name)
        if not os.path.exists(dst):
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            shutil.copy2(src, dst)
            changed.append(name)
        elif digest(dst) == old_hashes.get(name):
            if digest(dst) != new_hashes[name]:
                shutil.copy2(src, dst)
                changed.append(name)
        elif digest(dst) != new_hashes[name]:
            shutil.copy2(src, dst + ".new")  # user-edited: don't clobber
    # retire unedited files no longer shipped
    for name, h in old_hashes.items():
        if name in new_hashes:
            continue
        dst = os.path.join(user_dir, name)
        if os.path.exists(dst) and digest(dst) == h:
            attic_dst = os.path.join(user_dir, attic_name, name)
            os.makedirs(os.path.dirname(attic_dst), exist_ok=True)
            shutil.move(dst, attic_dst)
    with open(hashes_path, "w") as fh:
        for name, h in new_hashes.items():
            fh.write(f"{h} {name}\n")
    return changed


def load(path: str, flags: dict[str, bool] | None = None,
         vars: dict | None = None) -> list[dict]:
    """Load an engines.yaml (with includes/templates/overlays resolved)."""
    flags = flags or {}
    doc = _load_file(path, flags, set())
    if isinstance(doc, dict):
        doc = [doc]
    entries = []
    for item in doc or []:
        if isinstance(item, list):
            entries.extend(item)
        elif item is not None:
            entries.append(item)
    if vars:
        entries = [_render(e, vars) for e in entries]
    entries = merge_by_id(entries)
    entries = apply_templates(entries)
    return entries
