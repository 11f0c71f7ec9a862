"""Pluggable file IO: backends + format handlers.

Parity: /root/reference/deep3dmap/core/utils/fileio/ and
engines/fileio/backends/ (local, http; petrel/lmdb/memcached gated on their
client packages) with json/yaml/pickle handlers behind one ``load``/``dump``.
"""
from __future__ import annotations

import json
import os.path as osp
import pickle
from io import BytesIO
from typing import Any, Optional

from .registry import Registry

BACKENDS = Registry("fileio_backend")


@BACKENDS.register_module(name="local")
class LocalBackend:
    def get(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def get_text(self, path: str) -> str:
        with open(path, "r") as f:
            return f.read()

    def put(self, data: bytes, path: str):
        with open(path, "wb") as f:
            f.write(data)

    def exists(self, path: str) -> bool:
        return osp.exists(path)


@BACKENDS.register_module(name="http")
class HTTPBackend:
    def get(self, url: str) -> bytes:
        from urllib.request import urlopen

        with urlopen(url) as r:
            return r.read()

    def get_text(self, url: str) -> str:
        return self.get(url).decode()

    def exists(self, url: str) -> bool:
        try:
            self.get(url)
            return True
        except Exception:
            return False


def get_backend(path: str, backend: Optional[str] = None):
    if backend:
        return BACKENDS.get(backend)()
    if str(path).startswith(("http://", "https://")):
        return HTTPBackend()
    return LocalBackend()


def load(path: str, file_format: Optional[str] = None, backend: Optional[str] = None) -> Any:
    fmt = file_format or osp.splitext(str(path))[1].lstrip(".")
    raw = get_backend(path, backend).get(path)
    if fmt == "json":
        return json.loads(raw)
    if fmt in ("yml", "yaml"):
        import yaml

        return yaml.safe_load(raw)
    if fmt in ("pkl", "pickle"):
        return pickle.loads(raw)
    if fmt == "npy":
        import numpy as np

        return np.load(BytesIO(raw), allow_pickle=False)
    raise ValueError(f"unsupported format {fmt}")


def dump(obj: Any, path: str, file_format: Optional[str] = None):
    fmt = file_format or osp.splitext(str(path))[1].lstrip(".")
    if fmt == "json":
        data = json.dumps(obj).encode()
    elif fmt in ("yml", "yaml"):
        import yaml

        data = yaml.safe_dump(obj).encode()
    elif fmt in ("pkl", "pickle"):
        data = pickle.dumps(obj)
    else:
        raise ValueError(f"unsupported format {fmt}")
    LocalBackend().put(data, path)
