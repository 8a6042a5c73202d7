"""Weight resolution: candidate chains from model references to loadable
checkpoint directories/files (reference _get_weight_path_candidates,
gyre/manager.py:975-1022, HF repo heuristics :684-896, civitai
gyre/civitai.py:40-133 with SHA256 verification, generic URL cache
:924-973).

In zero-egress deployments only local candidates resolve; network tiers
activate with allow_network=True.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import re
from dataclasses import dataclass

logger = logging.getLogger(__name__)

_CIVITAI_URL = re.compile(
    r"https?://civitai\.com/(?:models/(?P<model>\d+)|"
    r"api/download/models/(?P<version>\d+))")


@dataclass
class Candidate:
    kind: str       # local | local_fp16 | hf_cache | hf_download | civitai | url
    path: str
    exists: bool = False


def parse_civitai_ref(url: str) -> dict | None:
    m = _CIVITAI_URL.match(url)
    if not m:
        return None
    return {"model_id": m.group("model"), "version_id": m.group("version")}


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while True:
            data = fh.read(chunk)
            if not data:
                break
            h.update(data)
    return h.hexdigest()


def verify_sha256(path: str, expected: str) -> bool:
    """Civitai publishes SHA256 per file; corrupt caches re-download
    (reference --refresh_on_error semantics)."""
    got = sha256_file(path)
    ok = got.lower() == expected.lower()
    if not ok:
        logger.warning("sha256 mismatch for %s: %s != %s", path, got,
                       expected)
    return ok


class WeightResolver:
    def __init__(self, local_dirs: list[str] | None = None,
                 hf_cache: str | None = None,
                 download_cache: str = "/tmp/gyre-weights",
                 allow_network: bool = False, prefer_fp16: bool = True):
        self.local_dirs = local_dirs or ["./weights"]
        self.hf_cache = hf_cache or os.environ.get(
            "HF_HOME", os.path.expanduser("~/.cache/huggingface"))
        self.download_cache = download_cache
        self.allow_network = allow_network
        self.prefer_fp16 = prefer_fp16

    def candidates(self, ref: str) -> list[Candidate]:
        """Ordered candidate chain for a model reference (local path,
        'org/repo' HF id, or URL)."""
        out: list[Candidate] = []
        if os.path.isabs(ref) or ref.startswith((".", "/")):
            out.append(Candidate("local", ref, os.path.exists(ref)))
            return out
        if ref.startswith(("http://", "https://")):
            civ = parse_civitai_ref(ref)
            cache_name = hashlib.sha1(ref.encode()).hexdigest()[:16] + \
                ".safetensors"
            cached = os.path.join(self.download_cache, cache_name)
            out.append(Candidate("url_cache", cached, os.path.exists(cached)))
            out.append(Candidate("civitai" if civ else "url", ref,
                                 self.allow_network))
            return out
        # HF-style "org/repo[@revision][/subfolder]"
        repo = ref.split("@")[0]
        for base in self.local_dirs:
            local = os.path.join(base, repo.replace("/", "--"))
            if self.prefer_fp16:
                out.append(Candidate("local_fp16", local + "--fp16",
                                     os.path.isdir(local + "--fp16")))
            out.append(Candidate("local", local, os.path.isdir(local)))
            plain = os.path.join(base, repo.split("/")[-1])
            out.append(Candidate("local", plain, os.path.isdir(plain)))
        snap = os.path.join(self.hf_cache, "hub",
                            "models--" + repo.replace("/", "--"),
                            "snapshots")
        if os.path.isdir(snap):
            revs = sorted(os.listdir(snap))
            if revs:
                out.append(Candidate("hf_cache",
                                     os.path.join(snap, revs[-1]), True))
        out.append(Candidate("hf_download", repo, self.allow_network))
        return out

    def resolve(self, ref: str) -> str:
        """First existing/fetchable candidate -> local path."""
        chain = self.candidates(ref)
        for cand in chain:
            if cand.exists and cand.kind in ("local", "local_fp16",
                                             "hf_cache", "url_cache"):
                logger.info("weights %s -> %s (%s)", ref, cand.path,
                            cand.kind)
                return cand.path
        for cand in chain:
            if cand.kind in ("civitai", "url", "hf_download") and \
                    cand.exists:
                return self._download(ref, cand)
        raise FileNotFoundError(
            f"no weight candidates for {ref!r}; tried " +
            ", ".join(f"{c.kind}:{c.path}" for c in chain))

    def _download(self, ref: str, cand: Candidate) -> str:
        if not self.allow_network:
            raise FileNotFoundError(f"network disabled; cannot fetch {ref}")
        os.makedirs(self.download_cache, exist_ok=True)
        import urllib.request

        name = hashlib.sha1(ref.encode()).hexdigest()[:16] + ".safetensors"
        dest = os.path.join(self.download_cache, name)
        logger.info("downloading %s -> %s", ref, dest)
        with urllib.request.urlopen(cand.path, timeout=600) as resp, \
                open(dest, "wb") as fh:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                fh.write(chunk)
        return dest
