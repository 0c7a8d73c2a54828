"""Layered YAML config with attribute access.

Same semantics as the reference ``EasyConfig``
(``openpoints/utils/config.py:18``): ``load(path, recursive=True)`` walks up
the directory tree merging every ``default.yaml`` found (parents first, so the
experiment yaml wins), and ``update(['k=v', 'a.b=v'])`` applies dotted
``key=value`` CLI overrides with ``ast.literal_eval`` parsing.  Re-implemented
without the ``multimethod`` dependency.
"""
from __future__ import annotations

import hashlib
import json
import os
from ast import literal_eval
from typing import Any, Dict, List


class EasyConfig(dict):
    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError:
            raise AttributeError(key)

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __delattr__(self, key: str) -> None:
        del self[key]

    def load(self, fpath: str, *, recursive: bool = False) -> None:
        import yaml

        if not os.path.exists(fpath):
            raise FileNotFoundError(fpath)
        fpaths = [fpath]
        if recursive:
            extension = os.path.splitext(fpath)[1]
            while os.path.dirname(fpath) != fpath:
                fpath = os.path.dirname(fpath)
                fpaths.append(os.path.join(fpath, "default" + extension))
        for p in reversed(fpaths):
            if os.path.exists(p):
                with open(p) as f:
                    loaded = yaml.safe_load(f)
                if loaded:
                    self.update(loaded)

    def reload(self, fpath: str, *, recursive: bool = False) -> None:
        self.clear()
        self.load(fpath, recursive=recursive)

    def update(self, other: Any) -> None:  # type: ignore[override]
        if isinstance(other, dict):
            self._update_dict(other)
        elif isinstance(other, (list, tuple)):
            self._update_opts(list(other))
        else:
            raise TypeError(f"cannot update EasyConfig from {type(other)}")

    def _update_dict(self, other: Dict[str, Any]) -> None:
        for key, value in other.items():
            if isinstance(value, dict):
                if key not in self or not isinstance(self[key], EasyConfig):
                    self[key] = EasyConfig()
                self[key]._update_dict(value)
            else:
                self[key] = value

    def _update_opts(self, opts: List[str]) -> None:
        index = 0
        while index < len(opts):
            opt = opts[index]
            if opt.startswith("--"):
                opt = opt[2:]
            if "=" in opt:
                key, value = opt.split("=", 1)
                index += 1
            else:
                key, value = opt, opts[index + 1]
                index += 2
            try:
                value = literal_eval(value)
            except Exception:
                pass
            current = self
            subkeys = key.split(".")
            for subkey in subkeys[:-1]:
                current = current.setdefault(subkey, EasyConfig())
            current[subkeys[-1]] = value

    def dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for key, value in self.items():
            if isinstance(value, EasyConfig):
                value = value.dict()
            out[key] = value
        return out

    def hash(self) -> str:
        buffer = json.dumps(self.dict(), sort_keys=True, default=str)
        return hashlib.sha256(buffer.encode()).hexdigest()

    def __str__(self) -> str:
        texts = []
        for key, value in self.items():
            sep = "\n" if isinstance(value, EasyConfig) else " "
            text = key + ":" + sep + str(value)
            lines = text.split("\n")
            for k, line in enumerate(lines[1:]):
                lines[k + 1] = "  " + line
            texts.extend(lines)
        return "\n".join(texts)


def print_args(args, printer=None):
    """Log every attribute of an argparse namespace / EasyConfig
    (reference ``openpoints/utils/config.py:11-15``)."""
    import logging

    printer = printer or logging.info
    printer("==========       args      =============")
    items = args.items() if isinstance(args, dict) else args.__dict__.items()
    for arg, content in items:
        printer("{}:{}".format(arg, content))
    printer("==========     args END    =============")
