"""String -> class registry with NAME-keyed construction.

Mirrors the public semantics of the reference registry
(``openpoints/utils/registry.py:8``): ``Registry.register_module`` decorates a
class, ``Registry.build(cfg)`` pops ``cfg.NAME``, merges ``default_args`` and
instantiates.  This rebuild keeps only the surface the framework actually uses
(no scope/children machinery).
"""
from __future__ import annotations

import copy
from collections.abc import Mapping
from typing import Any, Callable, Dict, Optional


def build_from_cfg(cfg: Dict[str, Any], registry: "Registry",
                   default_args: Optional[Dict[str, Any]] = None) -> Any:
    """Instantiate ``registry.get(cfg['NAME'])`` with the remaining cfg keys.

    Matches the reference's build_from_cfg: cfg entries override default_args;
    the ``NAME`` key selects the class and is not forwarded.
    """
    if not isinstance(cfg, Mapping):
        raise TypeError(f"cfg must be a mapping, got {type(cfg)}")
    if "NAME" not in cfg:
        if default_args is None or "NAME" not in default_args:
            raise KeyError(f'`cfg` or `default_args` must contain the key "NAME", got {cfg}')
    args = dict(default_args) if default_args else {}
    # cfg wins over default_args, as in the reference
    args.update(copy.deepcopy(dict(cfg)))
    name = args.pop("NAME")
    if isinstance(name, str):
        obj_cls = registry.get(name)
        if obj_cls is None:
            raise KeyError(f"{name} is not in the {registry.name} registry. "
                           f"Known: {sorted(registry.module_dict)}")
    elif callable(name):
        obj_cls = name
    else:
        raise TypeError(f"NAME must be a str or callable, got {type(name)}")
    try:
        return obj_cls(**args)
    except Exception as e:  # surface which class failed — invaluable for cfg debugging
        raise type(e)(f"{obj_cls.__name__}: {e}") from e


class Registry:
    def __init__(self, name: str, build_func: Optional[Callable] = None):
        self._name = name
        self._module_dict: Dict[str, Any] = {}
        self.build_func = build_func or build_from_cfg

    @property
    def name(self) -> str:
        return self._name

    @property
    def module_dict(self) -> Dict[str, Any]:
        return self._module_dict

    def __len__(self) -> int:
        return len(self._module_dict)

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def __repr__(self) -> str:
        return f"Registry(name={self._name}, items={sorted(self._module_dict)})"

    def get(self, key: str) -> Any:
        return self._module_dict.get(key)

    def build(self, cfg: Dict[str, Any], **default_args: Any) -> Any:
        return self.build_func(cfg, self, default_args or None)

    def _register(self, module_class: Any, module_name: Optional[str] = None,
                  force: bool = False) -> None:
        names = [module_name or module_class.__name__]
        for n in names:
            if not force and n in self._module_dict:
                raise KeyError(f"{n} is already registered in {self.name}")
            self._module_dict[n] = module_class

    def register_module(self, name: Optional[str] = None, force: bool = False,
                        module: Any = None):
        """Use as ``@REG.register_module()`` or ``REG.register_module(name=..., module=...)``."""
        if module is not None:
            self._register(module, name, force)
            return module

        def _decorator(cls):
            self._register(cls, name, force)
            return cls

        return _decorator
