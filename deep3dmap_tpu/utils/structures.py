"""Data-element containers: BaseDataElement / InstanceData / PixelData.

Capability parity with the reference's vendored engine structures
(/root/reference/deep3dmap/engines/structures/base_data_element.py:9,
instance_data.py, pixel_data.py): a container separating *metainfo*
(image shape, scale factor, ...) from *data* (labels, boxes, masks),
with dict-style access, new()/clone(), and device/dtype conversion.

TPU-native notes: leaves are numpy or jax arrays (pytrees elsewhere carry
tensors through jit); ``numpy()``/``jax()`` replace the torch .cpu()/.cuda()
family; InstanceData supports length-checked fields, indexing/masking, and
``cat`` like the mmengine original.
"""
from __future__ import annotations

from typing import Any, Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["BaseDataElement", "InstanceData", "PixelData"]


class BaseDataElement:
    def __init__(self, *, metainfo: Optional[dict] = None, **kwargs):
        object.__setattr__(self, "_metainfo_fields", set())
        object.__setattr__(self, "_data_fields", set())
        if metainfo is not None:
            self.set_metainfo(metainfo)
        if kwargs:
            self.set_data(kwargs)

    # -- setting ------------------------------------------------------------
    def set_metainfo(self, metainfo: dict) -> None:
        assert isinstance(metainfo, dict)
        for k, v in metainfo.items():
            if k in self._data_fields:
                raise AttributeError(f"`{k}` is already a data field")
            self._metainfo_fields.add(k)
            object.__setattr__(self, k, v)

    def set_data(self, data: dict) -> None:
        assert isinstance(data, dict)
        for k, v in data.items():
            setattr(self, k, v)

    def update(self, instance: "BaseDataElement") -> None:
        assert isinstance(instance, BaseDataElement)
        self.set_metainfo(dict(instance.metainfo_items()))
        self.set_data(dict(instance.items()))

    def __setattr__(self, name: str, value: Any):
        if name in ("_metainfo_fields", "_data_fields"):
            raise AttributeError(f"{name} is a private attribute")
        if name in self._metainfo_fields:
            raise AttributeError(
                f"`{name}` is a metainfo field; use set_metainfo to change it")
        self._set_field(name, value)

    def _set_field(self, name: str, value: Any):
        self._data_fields.add(name)
        object.__setattr__(self, name, value)

    def __delattr__(self, item: str):
        if item in ("_metainfo_fields", "_data_fields"):
            raise AttributeError(f"{item} is a private attribute")
        object.__delattr__(self, item)
        self._metainfo_fields.discard(item)
        self._data_fields.discard(item)

    __delitem__ = __delattr__

    def __getitem__(self, name: str):
        if isinstance(name, str):
            return getattr(self, name)
        raise TypeError(f"invalid key {name!r}")

    def get(self, key, default=None):
        return getattr(self, key, default)

    def pop(self, key, default=None):
        if key in self._data_fields or key in self._metainfo_fields:
            value = getattr(self, key)
            delattr(self, key)
            return value
        return default

    def __contains__(self, item: str) -> bool:
        return item in self._data_fields or item in self._metainfo_fields

    # -- views --------------------------------------------------------------
    def keys(self) -> List[str]:
        return list(self._data_fields)

    def metainfo_keys(self) -> List[str]:
        return list(self._metainfo_fields)

    def values(self) -> List[Any]:
        return [getattr(self, k) for k in self.keys()]

    def metainfo_values(self) -> List[Any]:
        return [getattr(self, k) for k in self.metainfo_keys()]

    def all_keys(self) -> List[str]:
        return self.metainfo_keys() + self.keys()

    def items(self) -> Iterator[Tuple[str, Any]]:
        for k in self.keys():
            yield k, getattr(self, k)

    def metainfo_items(self) -> Iterator[Tuple[str, Any]]:
        for k in self.metainfo_keys():
            yield k, getattr(self, k)

    def all_items(self) -> Iterator[Tuple[str, Any]]:
        for k in self.all_keys():
            yield k, getattr(self, k)

    @property
    def metainfo(self) -> dict:
        return dict(self.metainfo_items())

    # -- copies -------------------------------------------------------------
    def new(self, *, metainfo: Optional[dict] = None, **kwargs
            ) -> "BaseDataElement":
        new_data = self.__class__()
        new_data.set_metainfo(metainfo if metainfo is not None
                              else dict(self.metainfo_items()))
        new_data.set_data(kwargs if kwargs else dict(self.items()))
        return new_data

    def clone(self) -> "BaseDataElement":
        clone = self.__class__()
        clone.set_metainfo(dict(self.metainfo_items()))
        for k, v in self.items():
            if hasattr(v, "copy") and isinstance(v, np.ndarray):
                v = v.copy()
            clone.set_data({k: v})
        return clone

    # -- conversions --------------------------------------------------------
    def _map(self, fn) -> "BaseDataElement":
        out = self.new()
        for k, v in self.items():
            if hasattr(v, "shape"):
                out.set_data({k: fn(v)})
            elif isinstance(v, BaseDataElement):
                out.set_data({k: v._map(fn)})
        return out

    def numpy(self) -> "BaseDataElement":
        return self._map(np.asarray)

    def jax(self, device=None) -> "BaseDataElement":
        import jax
        import jax.numpy as jnp

        if device is None:
            return self._map(jnp.asarray)
        return self._map(lambda x: jax.device_put(jnp.asarray(x), device))

    def to_dict(self) -> dict:
        return {k: (v.to_dict() if isinstance(v, BaseDataElement) else v)
                for k, v in self.all_items()}

    def __repr__(self) -> str:
        def fmt(v):
            return (f"array{tuple(v.shape)}" if hasattr(v, "shape") else repr(v))

        meta = ", ".join(f"{k}={fmt(v)}" for k, v in self.metainfo_items())
        data = ", ".join(f"{k}={fmt(v)}" for k, v in self.items())
        return f"<{self.__class__.__name__}(metainfo: {meta}) {data}>"


class InstanceData(BaseDataElement):
    """Per-instance fields (boxes, labels, scores) with a shared length;
    supports int/slice/bool-mask indexing and concatenation."""

    def _set_field(self, name: str, value: Any):
        if hasattr(value, "__len__") and len(self._data_fields):
            n = len(self)
            if n is not None and len(value) != n:
                raise ValueError(
                    f"field `{name}` has length {len(value)}, but "
                    f"InstanceData holds instances of length {n}")
        super()._set_field(name, value)

    def __len__(self) -> Optional[int]:
        for k in self._data_fields:
            v = getattr(self, k)
            if hasattr(v, "__len__"):
                return len(v)
        return 0

    def __getitem__(self, item):
        if isinstance(item, str):
            return getattr(self, item)
        out = self.__class__(metainfo=dict(self.metainfo_items()))
        for k, v in self.items():
            if isinstance(item, np.ndarray) and item.dtype == bool:
                out.set_data({k: v[item]})
            else:
                out.set_data({k: v[item]})
        return out

    @classmethod
    def cat(cls, instances: List["InstanceData"]) -> "InstanceData":
        assert len(instances) > 0
        out = cls(metainfo=dict(instances[0].metainfo_items()))
        for k in instances[0].keys():
            vals = [np.asarray(inst[k]) for inst in instances]
            out.set_data({k: np.concatenate(vals, axis=0)})
        return out


class PixelData(BaseDataElement):
    """Per-pixel fields ((C, H, W) or (H, W)) with a shared spatial shape."""

    def _set_field(self, name: str, value: Any):
        if hasattr(value, "shape"):
            shp = tuple(value.shape[-2:])
            cur = self.shape
            if cur is not None and shp != cur:
                raise ValueError(
                    f"field `{name}` has spatial shape {shp}, expected {cur}")
        super()._set_field(name, value)

    @property
    def shape(self) -> Optional[Tuple[int, int]]:
        for k in self._data_fields:
            v = getattr(self, k)
            if hasattr(v, "shape"):
                return tuple(v.shape[-2:])
        return None
