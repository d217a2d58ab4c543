"""Plugin system: discovery, registration hooks, and runtime injection.

TPU-native lite analog of the reference's plugin framework
(/root/reference/shared/utils/plugins.py:273 WAN2GPPlugin: discovery from a
plugins dir, setup()/registration hooks, data hooks into the generation
flow, SAFE_MODE skip).  The Gradio-tab machinery is replaced by web-UI
route injection (runtime/webui.py) and the data hooks plug into
GenerationService.

A plugin is a python file (or package with __init__.py) inside a plugins
directory that defines `register(api)`.  The `api` object offers:
  api.register_settings_hook(fn)      settings dict -> settings dict,
                                      runs before each generation
  api.register_postprocess_hook(fn)   (output_paths, settings) -> paths,
                                      runs after each generation
  api.register_tool(name, fn)         callable exposed via
                                      PluginManager.tools
  api.register_route(path, handler)   web-UI route: handler(method,
                                      payload) -> (status, ctype, bytes)

Set WAN2GP_SAFE_MODE=1 to skip plugin loading entirely (reference
SAFE_MODE lock, wgp.py:141).
"""
from __future__ import annotations

import importlib.util
import os
import sys
import traceback
from typing import Any, Callable, Dict, List, Optional, Tuple


class PluginAPI:
    def __init__(self, manager: "PluginManager", name: str):
        self._m = manager
        self._name = name

    def register_settings_hook(self, fn: Callable):
        self._m.settings_hooks.append((self._name, fn))

    def register_postprocess_hook(self, fn: Callable):
        self._m.postprocess_hooks.append((self._name, fn))

    def register_tool(self, name: str, fn: Callable):
        self._m.tools[name] = fn

    def register_route(self, path: str, handler: Callable):
        self._m.routes[path] = handler


class PluginManager:
    def __init__(self):
        self.plugins: Dict[str, Any] = {}
        self.errors: Dict[str, str] = {}
        self.settings_hooks: List[Tuple[str, Callable]] = []
        self.postprocess_hooks: List[Tuple[str, Callable]] = []
        self.tools: Dict[str, Callable] = {}
        self.routes: Dict[str, Callable] = {}

    # -- discovery -------------------------------------------------------

    def load_directory(self, plugins_dir: str) -> List[str]:
        """Import every plugin module under plugins_dir and call its
        register(api).  A failing plugin is recorded, never fatal."""
        if os.environ.get("WAN2GP_SAFE_MODE", "") not in ("", "0"):
            return []
        if not os.path.isdir(plugins_dir):
            return []
        loaded = []
        for entry in sorted(os.listdir(plugins_dir)):
            path = os.path.join(plugins_dir, entry)
            if entry.startswith(("_", ".")):
                continue
            if os.path.isdir(path):
                path = os.path.join(path, "__init__.py")
                name = entry
                if not os.path.isfile(path):
                    continue
            elif entry.endswith(".py"):
                name = entry[:-3]
            else:
                continue
            if self._load_one(name, path):
                loaded.append(name)
        return loaded

    def _load_one(self, name: str, path: str) -> bool:
        try:
            spec = importlib.util.spec_from_file_location(
                f"wan2gp_plugin_{name}", path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[spec.name] = mod
            spec.loader.exec_module(mod)
            register = getattr(mod, "register", None)
            if register is None:
                self.errors[name] = "no register(api) function"
                return False
            register(PluginAPI(self, name))
            self.plugins[name] = mod
            return True
        except Exception:
            self.errors[name] = traceback.format_exc(limit=3)
            return False

    # -- hook application --------------------------------------------------

    def apply_settings_hooks(self, settings: Dict[str, Any]):
        for name, fn in self.settings_hooks:
            try:
                out = fn(dict(settings))
                if isinstance(out, dict):
                    settings = out
            except Exception:
                self.errors[name] = traceback.format_exc(limit=3)
        return settings

    def apply_postprocess_hooks(self, outputs: List[str],
                                settings: Dict[str, Any]) -> List[str]:
        for name, fn in self.postprocess_hooks:
            try:
                out = fn(list(outputs), settings)
                if isinstance(out, list):
                    outputs = out
            except Exception:
                self.errors[name] = traceback.format_exc(limit=3)
        return outputs
