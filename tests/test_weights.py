"""Weight-resolution chain tests (offline: local tiers + chain order)."""

import hashlib
import os

import pytest

from gyre_tpu.manager.weights import (WeightResolver, parse_civitai_ref,
                                      sha256_file, verify_sha256)


def test_civitai_url_parsing():
    assert parse_civitai_ref("https://civitai.com/models/1234")["model_id"] \
        == "1234"
    out = parse_civitai_ref("https://civitai.com/api/download/models/567")
    assert out["version_id"] == "567"
    assert parse_civitai_ref("https://example.com/x") is None


def test_sha256_verification(tmp_path):
    f = tmp_path / "w.safetensors"
    f.write_bytes(b"hello weights")
    expected = hashlib.sha256(b"hello weights").hexdigest()
    assert sha256_file(str(f)) == expected
    assert verify_sha256(str(f), expected.upper())
    assert not verify_sha256(str(f), "0" * 64)


def test_local_candidate_chain(tmp_path):
    base = tmp_path / "weights"
    fp16_dir = base / "runwayml--stable-diffusion-v1-5--fp16"
    fp16_dir.mkdir(parents=True)
    full_dir = base / "runwayml--stable-diffusion-v1-5"
    full_dir.mkdir()
    r = WeightResolver(local_dirs=[str(base)], allow_network=False)
    # fp16 preferred
    assert r.resolve("runwayml/stable-diffusion-v1-5") == str(fp16_dir)
    r2 = WeightResolver(local_dirs=[str(base)], prefer_fp16=False)
    assert r2.resolve("runwayml/stable-diffusion-v1-5") == str(full_dir)


def test_absolute_path_resolution(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    r = WeightResolver()
    assert r.resolve(str(d)) == str(d)


def test_missing_raises_with_chain(tmp_path):
    r = WeightResolver(local_dirs=[str(tmp_path)], allow_network=False)
    with pytest.raises(FileNotFoundError) as e:
        r.resolve("nobody/no-model")
    assert "hf_download" in str(e.value)


def test_hf_cache_tier(tmp_path):
    hub = tmp_path / "hub" / "models--org--model" / "snapshots" / "abc123"
    hub.mkdir(parents=True)
    r = WeightResolver(local_dirs=["/nonexistent"], hf_cache=str(tmp_path))
    assert r.resolve("org/model") == str(hub)
