"""engines.yaml DSL tests: includes, templates, overlays."""

import os
import textwrap

import pytest

from gyre_tpu.manager import engines_yaml


pytestmark = pytest.mark.smoke


def write(tmp_path, name, content):
    p = tmp_path / name
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_text(textwrap.dedent(content))
    return str(p)


def test_include_and_merge(tmp_path):
    write(tmp_path, "sub/one.yaml", """
    - id: engine-a
      name: A
    """)
    write(tmp_path, "sub/two.yaml", """
    - id: engine-b
      name: B
    - id: engine-a
      description: patched
    """)
    main = write(tmp_path, "main.yaml", """
    - !include sub/*.yaml
    """)
    entries = engines_yaml.load(main)
    by_id = {e["id"]: e for e in entries}
    assert set(by_id) == {"engine-a", "engine-b"}
    assert by_id["engine-a"]["name"] == "A"
    assert by_id["engine-a"]["description"] == "patched"


def test_conditional_include(tmp_path):
    write(tmp_path, "extra.yaml", "- id: extra-engine\n")
    main = write(tmp_path, "main.yaml", """
    - id: base
    - !include(extras) extra.yaml
    """)
    assert len(engines_yaml.load(main)) == 1
    assert len(engines_yaml.load(main, {"extras": True})) == 2


def test_template_expansion(tmp_path):
    main = write(tmp_path, "main.yaml", """
    - id: tpl
      abstract: true
      task: generate
      name: "{{name:Default Name}}"
      model: "{{model}}"
      options:
        sampler: k_euler
    - id: child
      template: tpl
      params:
        name: Child Engine
        model: preset/sd15
    - id: child2
      template: tpl
      params:
        model: preset/sd21
      options:
        sampler: ddim
    """)
    entries = engines_yaml.load(main)
    by_id = {e["id"]: e for e in entries}
    assert "tpl" not in by_id
    assert by_id["child"]["name"] == "Child Engine"
    assert by_id["child"]["model"] == "preset/sd15"
    assert by_id["child"]["options"]["sampler"] == "k_euler"
    assert by_id["child2"]["name"] == "Default Name"
    assert by_id["child2"]["options"]["sampler"] == "ddim"


def test_section_rendering(tmp_path):
    main = write(tmp_path, "main.yaml", """
    - id: tpl
      abstract: true
      options:
        "{{#fp32}}":
          dtype: float32
        "{{^fp32}}":
          dtype: bfloat16
    - id: a
      template: tpl
      params:
        fp32: true
    - id: b
      template: tpl
    """)
    by_id = {e["id"]: e for e in engines_yaml.load(main)}
    assert by_id["a"]["options"]["dtype"] == "float32"
    assert by_id["b"]["options"]["dtype"] == "bfloat16"


def test_recursion_guard(tmp_path):
    main = write(tmp_path, "loop.yaml", "- !include loop.yaml\n")
    with pytest.raises(ValueError):
        engines_yaml.load(main)


def test_check_and_update(tmp_path):
    dist = tmp_path / "dist"
    user = tmp_path / "user"
    dist.mkdir()
    (dist / "a.yaml").write_text("- id: a\n")
    (dist / "b.yaml").write_text("- id: b\n")
    changed = engines_yaml.check_and_update(str(dist), str(user))
    assert sorted(changed) == ["a.yaml", "b.yaml"]
    # user edits b; dist updates both
    (user / "b.yaml").write_text("- id: b\n  name: edited\n")
    (dist / "a.yaml").write_text("- id: a\n  name: v2\n")
    (dist / "b.yaml").write_text("- id: b\n  name: v2\n")
    changed = engines_yaml.check_and_update(str(dist), str(user))
    assert changed == ["a.yaml"]
    assert "v2" in (user / "a.yaml").read_text()          # auto-updated
    assert "edited" in (user / "b.yaml").read_text()      # preserved
    assert (user / "b.yaml.new").exists()                 # new version aside
    # a.yaml removed from dist: unedited copy retires to _attic
    (dist / "a.yaml").unlink()
    engines_yaml.check_and_update(str(dist), str(user))
    assert not (user / "a.yaml").exists()
    assert (user / "_attic" / "a.yaml").exists()


def test_engine_fallback():
    import jax.numpy as jnp

    from gyre_tpu.manager.manager import EngineManager

    m = EngineManager(
        [{"id": "broken", "model": "/nonexistent/path", "default": True,
          "fallback": "ok"},
         {"id": "ok", "model": "preset/test"}],
        compute_dtype=jnp.float32)
    ms = m.modelset("broken")
    assert ms.id.startswith("ok")


def test_dist_config_loads():
    root = os.path.join(os.path.dirname(__file__), "..", "config",
                        "engines.yaml")
    entries = engines_yaml.load(root)
    ids = [e.get("id") for e in entries]
    assert "stable-diffusion-v1-5" in ids
    assert "esrgan-x4" in ids
    assert any("hintset_id" in e for e in entries)
    # model registry: controlnet 1.1 zoo + t2i adapters present
    model_ids = {e.get("model_id") for e in entries}
    assert {"controlnet11-canny", "controlnet11-openpose",
            "t2i-adapter-style", "coadapter-fuser",
            "midas-dpt-large-384"} <= model_ids
    sd15 = next(e for e in entries if e.get("id") == "stable-diffusion-v1-5")
    assert sd15["model"] == "preset/sd15"
    assert sd15["default"] is True
    assert sd15["hintset"] == "hintset-sd15-common"
    assert all(not e.get("abstract") for e in entries)


def test_check_and_update_recursive(tmp_path):
    """Dist config trees (templates/, engines/) sync recursively; user
    edits write .new alongside instead of clobbering."""
    dist = tmp_path / "dist"
    (dist / "engines").mkdir(parents=True)
    (dist / "engines.yaml").write_text("- id: a\n")
    (dist / "engines" / "extra.yaml").write_text("- id: b\n")
    user = tmp_path / "user"

    changed = engines_yaml.check_and_update(str(dist), str(user))
    assert sorted(changed) == ["engines.yaml", "engines/extra.yaml"]
    assert (user / "engines" / "extra.yaml").read_text() == "- id: b\n"

    # user edit + dist update -> .new, not clobber
    (user / "engines" / "extra.yaml").write_text("- id: b\n  custom: 1\n")
    (dist / "engines" / "extra.yaml").write_text("- id: b2\n")
    engines_yaml.check_and_update(str(dist), str(user))
    assert "custom" in (user / "engines" / "extra.yaml").read_text()
    assert (user / "engines" / "extra.yaml.new").read_text() == "- id: b2\n"


def test_resolve_enginecfg_syncs_dist(tmp_path):
    """server.resolve_enginecfg runs check_and_update into user config
    dirs (reference gyre/server.py:1024-1026) without clobbering a
    pre-existing user engines.yaml."""
    from gyre_tpu.server import resolve_enginecfg

    user = tmp_path / "cfg"
    user.mkdir()
    (user / "engines.yaml").write_text("- id: mine\n  model: {preset: test}\n")
    path = resolve_enginecfg(str(user / "engines.yaml"))
    assert path == str(user / "engines.yaml")
    assert "mine" in (user / "engines.yaml").read_text()  # not clobbered
    # shipped dist templates arrived
    assert (user / "templates" / "stable-diffusion.yaml").exists()


def test_resolve_enginecfg_dir_and_dist(tmp_path):
    from gyre_tpu.server import resolve_enginecfg

    user = tmp_path / "cfg2"
    user.mkdir()
    path = resolve_enginecfg(str(user))
    assert path == str(user / "engines.yaml")
    assert (user / "engines.yaml").exists()  # dist copy arrived


def test_tag_template_dsl(tmp_path):
    """Reference tag-based template syntax (gyre/engines_yaml.py:26-345):
    !@template/<name> abstracts, !<tpl>/<id> instances, !params, partial
    splices {{> x}}, boolean sections with YAML defaults, and
    delete-on-None merge."""
    (tmp_path / "tpl.yaml").write_text("""
---
!@template/sd-family
- model_id: "{{id}}-base"
  "{{> source}}": _

- "{{#inpaint_source}}":
    - model_id: "{{id}}-inpaint"
      "{{> inpaint_source}}": _

- id: "{{id}}"
  name: "{{name}}"
  model: "@{{id}}-base"
  enabled: "{{enabled:False}}"
  overrides:
    vae: "{{vae:'@vae-common'}}"
""")
    (tmp_path / "eng.yaml").write_text("""
!sd-family/my-engine
name: "My engine"
enabled: True
source:
  model: "some/repo"
inpaint_source:
  model: "some/repo-inpaint"
""")
    (tmp_path / "engines.yaml").write_text(
        "- !include tpl.yaml\n- !include eng.yaml\n")
    entries = engines_yaml.load(str(tmp_path / "engines.yaml"))
    by_key = {e.get("id") or e.get("model_id"): e for e in entries}
    assert by_key["my-engine-base"]["model"] == "some/repo"
    assert by_key["my-engine-inpaint"]["model"] == "some/repo-inpaint"
    eng = by_key["my-engine"]
    assert eng["name"] == "My engine" and eng["enabled"] is True
    assert eng["model"] == "@my-engine-base"
    assert eng["overrides"]["vae"] == "@vae-common"  # yaml-parsed default


def test_tag_template_chain_and_params(tmp_path):
    """Abstract-extends-abstract chains with !params overrides and
    falsy-section suppression."""
    (tmp_path / "engines.yaml").write_text("""
---
!@template/base
- id: "{{id}}"
  kind: "{{kind:basic}}"
  "{{#extra}}":
    extras: "{{extra}}"
---
!@base/fancy
- !params
  kind: fancy
- id: "{{id}}"
  decorated: true
---
!fancy/thing
extra: ""
""")
    entries = engines_yaml.load(str(tmp_path / "engines.yaml"))
    (thing,) = [e for e in entries if e.get("id") == "thing"]
    assert thing["kind"] == "fancy" and thing["decorated"] is True
    assert "extras" not in thing  # falsy section suppressed


def test_merge_deletes_on_none():
    out = engines_yaml.deep_merge({"a": 1, "b": {"c": 2, "d": 3}},
                                  {"b": {"c": None}, "a": None, "e": 4})
    assert out == {"b": {"d": 3}, "e": 4}


def test_dist_config_inventory():
    """The shipped config tree carries the reference's out-of-box
    capability surface (VERDICT missing #6: extras zoo, clip.yaml,
    hintsets-sd21.yaml): every engine id from the reference extras +
    core engines, the clip model registry, and the sd21 hintsets."""
    entries = engines_yaml.load("config/engines.yaml", {})
    ids = {e.get("id") for e in entries if e.get("id")}
    mids = {e.get("model_id") for e in entries if e.get("model_id")}
    hids = {e.get("hintset_id") for e in entries if e.get("hintset_id")}

    # core engines
    assert {"stable-diffusion-v1-5", "stable-diffusion-v1-5-inpainting",
            "stable-diffusion-v2-1", "stable-diffusion-v2-depth",
            "stable-diffusion-xl-v1-0",
            "stable-diffusion-xl-refiner-v1-0"} <= ids
    # extras finetune zoo (reference config/extras/, 13 files)
    assert {"chillout", "deliberate", "dreamlike-diffusion",
            "dreamlike-photoreal-v2", "dreamlike-anime", "fish-mix",
            "old-fish", "inkpunk", "liberty", "dreamshaper",
            "neverendingdream", "mistoon-anime", "mistoon-ruby",
            "mistoon-amethyst", "orangemix-abyss2", "orangemix-abyss3",
            "realistic-vision-v2-0", "reality-engine",
            "waifu-diffusion-v1-3", "waifu-diffusion-v1-4", "yuzu-milk",
            "yuzu-chailatte", "yuzu-ginger"} <= ids
    # task engines
    assert {"midas-depth", "zoedepth", "openpose", "hed-edge",
            "dexined-edge", "segmentation", "background-removal",
            "bae-normal", "mlsd-lines", "esrgan-x4", "swinir-x4",
            "hat-x4", "upscaler-x2", "upscaler-x4", "codeformer"} <= ids
    # clip registry (reference config/models/clip.yaml)
    assert {"laion-clip-h", "laion-clip-g", "laion-clip-l",
            "laion-clip-b", "openai-clip-l", "openai-clip-b",
            "clip-common"} <= mids
    assert "orange-vae" in mids and "zoedepth-n" in mids
    # hintsets including the sd21 file
    assert {"hintset-sd15-common", "hintset-sd21-controlnet",
            "hintset-sd21-common"} <= hids


def test_user_config_overlay_chain():
    """Master config exposes the reference's user-override hooks
    (gyre/config/engines.yaml:25-29): custom/*.yaml, the conditional
    memory-limit overlay, and user_tweaks.yaml loaded last (wins)."""
    from gyre_tpu.manager import engines_yaml

    base = engines_yaml.load("config/engines.yaml")
    cc = [x for x in base if x.get("model_id") == "clip-common"]
    assert cc and cc[-1]["model"] == "@laion-clip-h"

    # hbm4 include flag swaps clip-common to the ViT-B tower
    lim = engines_yaml.load("config/engines.yaml", {"hbm4": True})
    cc = [x for x in lim if x.get("model_id") == "clip-common"]
    assert cc and cc[-1]["model"] == "@laion-clip-b"


def test_user_tweaks_wins_by_id(tmp_path):
    """A user_tweaks.yaml entry overlays core entries with the same id."""
    import shutil

    from gyre_tpu.manager import engines_yaml

    cfg = tmp_path / "config"
    shutil.copytree("config", cfg)
    (cfg / "user_tweaks.yaml").write_text(
        '- id: "zoedepth"\n  enabled: true\n')
    (cfg / "custom" / "extra.yaml").write_text(
        '- id: "my-custom-engine"\n  task: depth\n'
        '  model: "@zoedepth-n"\n')
    entries = engines_yaml.load(str(cfg / "engines.yaml"))
    zoe = [x for x in entries if x.get("id") == "zoedepth"]
    assert zoe and zoe[-1]["enabled"] is True
    assert any(x.get("id") == "my-custom-engine" for x in entries)
