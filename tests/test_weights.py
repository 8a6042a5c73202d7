"""Weight-resolution chain tests (offline: local tiers + chain order)."""

import hashlib
import os

import pytest

from gyre_tpu.manager.weights import (WeightResolver, parse_civitai_ref,
                                      sha256_file, verify_sha256)


pytestmark = pytest.mark.smoke


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


def test_select_repo_files_variant_heuristics():
    """HF snapshot selection: one weight per stem, safetensors over bin,
    fp16 variant preferred (reference gyre/manager.py:684-896)."""
    from gyre_tpu.manager.weights import select_repo_files

    files = [
        "model_index.json",
        "unet/config.json",
        "unet/diffusion_pytorch_model.bin",
        "unet/diffusion_pytorch_model.safetensors",
        "unet/diffusion_pytorch_model.fp16.safetensors",
        "vae/config.json",
        "vae/diffusion_pytorch_model.bin",
        "text_encoder/config.json",
        "text_encoder/model.fp16.bin",
        "text_encoder/model.safetensors",
        "tokenizer/merges.txt",
        "tokenizer/vocab.json",
        "safety_checker/model.onnx",
        "README.md",
    ]
    out = select_repo_files(files, prefer_fp16=True)
    assert "unet/diffusion_pytorch_model.fp16.safetensors" in out
    assert "unet/diffusion_pytorch_model.safetensors" not in out
    assert "unet/diffusion_pytorch_model.bin" not in out
    assert "vae/diffusion_pytorch_model.bin" in out  # only variant there
    # fp16 wins over extension preference when fp16 requested
    assert "text_encoder/model.fp16.bin" in out
    assert "tokenizer/merges.txt" in out and "model_index.json" in out
    assert not any(f.endswith((".onnx", ".md")) for f in out)

    out32 = select_repo_files(files, prefer_fp16=False)
    assert "unet/diffusion_pytorch_model.safetensors" in out32
    assert "text_encoder/model.safetensors" in out32


def test_hf_download_diffusers_snapshot(tmp_path):
    """Offline drive of the hub tier: listing -> selection -> download."""
    r = WeightResolver(local_dirs=[str(tmp_path / "nope")],
                       hf_cache=str(tmp_path / "hf"),
                       download_cache=str(tmp_path / "dl"),
                       allow_network=True)
    fetched = []
    r.fetch_json = lambda url: {
        "siblings": [{"rfilename": n} for n in [
            "model_index.json", "unet/config.json",
            "unet/diffusion_pytorch_model.safetensors",
            "unet/diffusion_pytorch_model.bin"]]}

    def fake_fetch(url, dest):
        fetched.append(url)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "wb") as fh:
            fh.write(b"x")
        return dest

    r.fetch_file = fake_fetch
    path = r.resolve("org/diffusers-repo")
    assert os.path.isdir(path)
    assert os.path.exists(os.path.join(path, "model_index.json"))
    assert os.path.exists(os.path.join(
        path, "unet", "diffusion_pytorch_model.safetensors"))
    assert not os.path.exists(os.path.join(
        path, "unet", "diffusion_pytorch_model.bin"))
    assert all("resolve/main/" in u for u in fetched)
    # second resolve hits the prior-download local tier, no refetch
    fetched.clear()
    assert r.resolve("org/diffusers-repo") == path
    assert fetched == []


def test_hf_download_single_checkpoint(tmp_path):
    r = WeightResolver(local_dirs=[str(tmp_path / "nope")],
                       hf_cache=str(tmp_path / "hf"),
                       download_cache=str(tmp_path / "dl"),
                       allow_network=True)
    r.fetch_json = lambda url: {"siblings": [
        {"rfilename": "README.md"},
        {"rfilename": "model.ckpt"},
        {"rfilename": "model.safetensors"}]}

    def fake_fetch(url, dest):
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "wb") as fh:
            fh.write(b"x")
        return dest

    r.fetch_file = fake_fetch
    path = r.resolve("org/ckpt-repo")
    assert path.endswith("model.safetensors") and os.path.exists(path)
    # prior-download tier resolves the FILE on the next call
    assert r.resolve("org/ckpt-repo") == path


def test_civitai_sha256_verify_and_retry(tmp_path):
    r = WeightResolver(download_cache=str(tmp_path / "dl"),
                       allow_network=True)
    good = b"trained weights"
    sha = hashlib.sha256(good).hexdigest()
    r.fetch_json = lambda url: {"files": [{
        "primary": True, "downloadUrl": "https://civitai.example/dl",
        "hashes": {"SHA256": sha.upper()}}]}
    attempts = []

    def flaky_fetch(url, dest):
        attempts.append(url)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "wb") as fh:
            fh.write(b"corrupt" if len(attempts) == 1 else good)
        return dest

    r.fetch_file = flaky_fetch
    path = r.resolve("https://civitai.com/api/download/models/999")
    assert len(attempts) == 2  # retried once after sha mismatch
    assert hashlib.sha256(open(path, "rb").read()).hexdigest() == sha


def test_civitai_sha256_hard_fail(tmp_path):
    r = WeightResolver(download_cache=str(tmp_path / "dl"),
                       allow_network=True)
    r.fetch_json = lambda url: {"files": [{
        "primary": True, "downloadUrl": "u",
        "hashes": {"SHA256": "0" * 64}}]}

    def bad_fetch(url, dest):
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        open(dest, "wb").write(b"junk")
        return dest

    r.fetch_file = bad_fetch
    with pytest.raises(OSError):
        r.resolve("https://civitai.com/models/42")


def test_refresh_skips_caches(tmp_path):
    """refresh=True forces the network tier even with a warm cache."""
    r = WeightResolver(local_dirs=[str(tmp_path / "nope")],
                       hf_cache=str(tmp_path / "hf"),
                       download_cache=str(tmp_path / "dl"),
                       allow_network=True)
    r.fetch_json = lambda url: {"siblings": [
        {"rfilename": "model.safetensors"}]}
    count = []

    def fetch(url, dest):
        count.append(url)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        open(dest, "wb").write(b"v%d" % len(count))
        return dest

    r.fetch_file = fetch
    p1 = r.resolve("org/m")
    p2 = r.resolve("org/m", refresh=True)  # forces a refetch over caches
    assert p1 == p2 and len(count) == 2
    assert open(p1, "rb").read() == b"v2"
