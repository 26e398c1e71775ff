"""Model registry: save, list and resolve pretrained models by name.

Behavioral spec: reference ``models.py:1619-1937`` (``ModelManager`` /
``ModelRelease``: download from the MFA-models GitHub releases into
``~/Documents/MFA/pretrained_models/<type>/``, resolve CLI model-name
arguments to archives). This environment has no network egress, so the
registry is local-first: ``add``/``list``/``resolve`` work on the local
store; ``download`` reports the offline state and honors
``MFA_TPU_MODEL_MIRROR`` (a local directory mirror) when provided.
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Dict, List, Optional

MODEL_TYPES = (
    "acoustic",
    "g2p",
    "language_model",
    "ivector",
    "dictionary",
    "tokenizer",
)

EXTENSIONS = {
    "acoustic": ".zip",
    "g2p": ".zip",
    "language_model": ".zip",
    "ivector": ".npz",
    "dictionary": ".dict",
    "tokenizer": ".zip",
}

# extra accepted suffixes per type (mirror lookups and release assets):
# language models exist both as archives (large+medium+small, reference
# models.py:1258) and bare ARPA files
ALT_EXTENSIONS = {
    "language_model": (".zip", ".arpa", ".lm"),
}


def default_root() -> Path:
    return Path(
        os.environ.get(
            "MFA_TPU_MODEL_ROOT",
            Path.home() / "Documents" / "MFA-TPU" / "pretrained_models",
        )
    )


class ModelManager:
    def __init__(self, root: Optional[Path] = None):
        self.root = Path(root) if root else default_root()

    def _dir(self, model_type: str) -> Path:
        if model_type not in MODEL_TYPES:
            raise ValueError(f"unknown model type {model_type!r}")
        return self.root / model_type

    def add(self, model_type: str, path, name: Optional[str] = None) -> Path:
        """Register a local model archive under a name."""
        src = Path(path)
        name = name or src.stem
        dst = self._dir(model_type) / (name + src.suffix)
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(src, dst)
        return dst

    def list_models(self, model_type: Optional[str] = None) -> Dict[str, List[str]]:
        out: Dict[str, List[str]] = {}
        for mt in MODEL_TYPES:
            if model_type and mt != model_type:
                continue
            d = self._dir(mt)
            out[mt] = sorted(p.stem for p in d.glob("*")) if d.exists() else []
        return out

    def resolve(self, model_type: str, name_or_path) -> Path:
        """Resolve a CLI model argument: an existing path wins, otherwise a
        registered name (reference CLI behavior for model-name arguments)."""
        p = Path(name_or_path)
        if p.exists():
            return p
        d = self._dir(model_type)
        candidates = list(d.glob(f"{name_or_path}.*")) if d.exists() else []
        if candidates:
            return candidates[0]
        raise FileNotFoundError(
            f"no {model_type} model {name_or_path!r}: not a path and not in "
            f"{d} (register one with `mfa-tpu model add`)"
        )

    # the reference's registry (``models.py:1654`` ModelManager.base_url)
    GITHUB_API = (
        "https://api.github.com/repos/MontrealCorpusTools/mfa-models/releases"
    )

    def _http_get(self, url: str, timeout: float = 30.0) -> bytes:
        """One HTTP GET (urllib; honors GITHUB_TOKEN like the reference)."""
        import urllib.request

        headers = {"User-Agent": "mfa-tpu-model-manager"}
        token = os.environ.get("GITHUB_TOKEN")
        if token:
            headers["Authorization"] = f"Bearer {token}"
        req = urllib.request.Request(url, headers=headers)
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read()

    def find_release(
        self, model_type: str, name: str, version: Optional[str] = None,
        max_pages: int = 10,
    ) -> Optional[dict]:
        """Locate the MFA-models GitHub release for ``{type}-{name}``.

        Release tags follow ``{model_type}-{name}-v{version}``; with no
        version the newest matching tag wins (pages are release-date
        ordered). Returns the release JSON dict or None."""
        import json

        if version is not None:
            tag = f"{model_type}-{name}-v{version}"
            try:
                return json.loads(
                    self._http_get(f"{self.GITHUB_API}/tags/{tag}")
                )
            except Exception:
                return None
        prefix = f"{model_type}-{name}-v"
        for page in range(1, max_pages + 1):
            data = json.loads(
                self._http_get(f"{self.GITHUB_API}?per_page=100&page={page}")
            )
            if not data:
                break
            for release in data:
                if release.get("tag_name", "").startswith(prefix):
                    return release
        return None

    def download(
        self, model_type: str, name: str, version: Optional[str] = None
    ) -> Path:
        """Fetch a pretrained model: local mirror first
        (``MFA_TPU_MODEL_MIRROR``), then the MFA-models GitHub releases
        (reference ``models.py:1654``). Raises with guidance when neither
        is reachable (e.g. zero-egress images)."""
        mirror = os.environ.get("MFA_TPU_MODEL_MIRROR")
        exts = ALT_EXTENSIONS.get(model_type, (EXTENSIONS[model_type],))
        if mirror:
            for ext in exts:
                src = Path(mirror) / model_type / (name + ext)
                if src.exists():
                    return self.add(model_type, src, name)
        try:
            release = self.find_release(model_type, name, version)
            if release is not None:
                assets = release.get("assets", [])
                # no fallback to an arbitrary asset: saving checksums.md5
                # as <name>.zip would just fail confusingly at load time
                asset = next(
                    (
                        a
                        for a in assets
                        if a.get("name", "").endswith(tuple(exts))
                    ),
                    None,
                )
                if asset is not None:
                    ext = next(
                        (
                            e
                            for e in exts
                            if asset.get("name", "").endswith(e)
                        ),
                        EXTENSIONS[model_type],
                    )
                    data = self._http_get(asset["browser_download_url"])
                    dst = self._dir(model_type) / (name + ext)
                    dst.parent.mkdir(parents=True, exist_ok=True)
                    tmp = dst.with_suffix(dst.suffix + ".part")
                    tmp.write_bytes(data)
                    tmp.rename(dst)
                    return dst
                network_note = (
                    f"release {release.get('tag_name')!r} has no asset "
                    f"matching {'/'.join(exts)}"
                )
            else:
                network_note = f"no release found for {model_type}-{name}"
        except Exception as e:  # URLError, timeout, JSON errors, ...
            network_note = f"network unavailable ({e.__class__.__name__})"
        raise RuntimeError(
            f"could not download {model_type} model {name!r}: {network_note}. "
            "Set MFA_TPU_MODEL_MIRROR to a local mirror, or place the "
            f"archive manually and run: mfa-tpu model add {model_type} <path>"
        )
