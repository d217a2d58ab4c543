"""Model-definition registry.

Schema-compatible with the reference's defaults/*.json + finetunes/*.json
system (/root/reference/wgp.py:3152 init_model_def, :3170 refresh_model_defs;
defaults/ReadMe.txt inheritance rules):

  - every JSON file <model_type>.json holds {"model": {...}, **ui_settings}
  - "model.architecture" names the base model type that picks the family
    handler; a finetune file with the same stem as a default overrides it
    (model keys replace, settings keys merge)
  - "URLs"/"preload_URLs"/"modules" may name another model_type to borrow its
    value (get_model_recursive_prop, wgp.py:2849)
"""
from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, List, Optional

_BUILTIN_DEFAULTS = os.path.join(os.path.dirname(__file__), "defaults")


def get_base_model_type(model_def: Dict[str, Any], model_type: str) -> str:
    return model_def.get("architecture") or model_type


class ModelRegistry:
    def __init__(self, handlers: Optional[Dict[str, Any]] = None,
                 defaults_dirs: Optional[List[str]] = None,
                 finetunes_dir: Optional[str] = None):
        """handlers: {base_model_type: family_handler}."""
        self.handlers = dict(handlers or {})
        self.defaults_dirs = defaults_dirs or [_BUILTIN_DEFAULTS]
        self.finetunes_dir = finetunes_dir
        self.models_def: Dict[str, Dict[str, Any]] = {}
        self.parse_errors: List[str] = []
        self.refresh()

    # -- loading --------------------------------------------------------

    def refresh(self):
        self.models_def = {}
        self.parse_errors = []
        paths = []
        for d in self.defaults_dirs:
            paths.extend(sorted(glob.glob(os.path.join(d, "*.json"))))
        is_default = {p: True for p in paths}
        if self.finetunes_dir:
            ft = sorted(glob.glob(os.path.join(self.finetunes_dir, "*.json")))
            paths.extend(ft)
            is_default.update({p: False for p in ft})

        for path in paths:
            model_type = os.path.basename(path)[:-5]
            try:
                with open(path, "r", encoding="utf-8") as f:
                    json_def = json.load(f)
                model_def = json_def.pop("model")
                model_def["path"] = path
            except Exception as e:  # finetune parse errors are non-fatal
                msg = f"bad model definition {path}: {e}"
                if is_default[path]:
                    raise ValueError(msg) from e
                self.parse_errors.append(msg)
                continue
            existing = self.models_def.get(model_type)
            if existing is not None:
                # finetune overlay: same-stem file inherits & overrides
                existing.setdefault("settings", {}).update(json_def)
                existing.update(model_def)
            else:
                model_def = self._init_model_def(model_type, model_def)
                model_def["settings"] = json_def
                self.models_def[model_type] = model_def

    def _init_model_def(self, model_type, model_def):
        base = get_base_model_type(model_def, model_type)
        handler = self.handlers.get(base)
        if handler is None:
            model_def["visible"] = False
            return model_def
        arch_def = handler.query_model_def(base, model_def) or {}
        arch_def.update(model_def)
        return arch_def

    # -- queries ---------------------------------------------------------

    def model_types(self) -> List[str]:
        return list(self.models_def.keys())

    def get(self, model_type: str) -> Dict[str, Any]:
        return self.models_def[model_type]

    def base_model_type(self, model_type: str) -> str:
        return get_base_model_type(self.models_def[model_type], model_type)

    def handler_for(self, model_type: str):
        return self.handlers[self.base_model_type(model_type)]

    def get_recursive_prop(self, model_type: str, prop: str = "URLs",
                           _stack=()) -> Any:
        """Resolve props that reference another model_type (wgp.py:2849)."""
        if model_type in _stack:
            raise ValueError(f"circular {prop} reference via {model_type}")
        model_def = self.models_def.get(model_type, {})
        value = model_def.get(prop, [])
        if isinstance(value, str) and not value.startswith(("http", "/", ".")):
            return self.get_recursive_prop(value, prop,
                                           _stack=_stack + (model_type,))
        return value

    def default_settings(self, model_type: str) -> Dict[str, Any]:
        """UI/default generation settings for a model (merged over handler
        defaults)."""
        model_def = self.get(model_type)
        handler = self.handler_for(model_type)
        settings = dict(getattr(handler, "default_settings", lambda *_: {})(
            self.base_model_type(model_type)))
        settings.update(model_def.get("settings", {}))
        settings["model_type"] = model_type
        return settings
