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

    @property
    def service(self):
        """The owning GenerationService (None for a standalone manager) —
        the analog of the reference's request_global server-state access
        (shared/utils/plugins.py request_global)."""
        return self._m.service

    def register_settings_hook(self, fn: Callable):
        self._m.settings_hooks.append((self._name, fn))

    def register_postprocess_hook(self, fn: Callable):
        self._m.postprocess_hooks.append((self._name, fn))

    def register_tool(self, name: str, fn: Callable):
        self._m.tools[name] = fn

    def register_route(self, path: str, handler: Callable):
        self._m.routes[path] = handler


BUILTIN_PLUGINS_DIR = os.path.join(os.path.dirname(__file__),
                                   "builtin_plugins")


class PluginManager:
    def __init__(self, service=None, load_builtins: bool = False):
        self.service = service
        self.plugins: Dict[str, Any] = {}
        self.errors: Dict[str, str] = {}
        self.settings_hooks: List[Tuple[str, Callable]] = []
        self.postprocess_hooks: List[Tuple[str, Callable]] = []
        self.tools: Dict[str, Callable] = {}
        self.routes: Dict[str, Callable] = {}
        if load_builtins:
            # ship-with plugins (the reference's plugins/ built-ins)
            self.load_directory(BUILTIN_PLUGINS_DIR)

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


# ---------------------------------------------------------------------------
# Lifecycle: catalog / install / update / uninstall
# (reference shared/utils/plugins.py:351-1725 PluginManager — git-catalog
# discovery via plugins.json, install_plugin_from_url:1311, update:1189,
# uninstall:1168.  One policy deviation: the reference pip-installs a
# plugin's requirements.txt (:1225); this env is zero-egress and the
# framework never installs packages — missing deps are REPORTED instead.)
# ---------------------------------------------------------------------------

PROVENANCE_FILE = ".wan2gp_plugin.json"


def load_catalog(path: str) -> List[Dict[str, Any]]:
    """plugins.json catalog: list of {name, author, version, description,
    type, url} entries (reference plugins.json format)."""
    import json
    with open(path, "r", encoding="utf-8") as f:
        data = json.load(f)
    if not isinstance(data, list):
        raise ValueError("plugin catalog must be a JSON list")
    return [e for e in data if isinstance(e, dict) and e.get("url")]


def _plugin_name_from_source(source: str) -> str:
    base = source.rstrip("/").rsplit("/", 1)[-1]
    return base[:-4] if base.endswith(".git") else base


def _check_requirements(target_dir: str) -> List[str]:
    """Report (never install) a plugin's missing python deps."""
    req = os.path.join(target_dir, "requirements.txt")
    missing = []
    if os.path.isfile(req):
        with open(req, "r", encoding="utf-8") as f:
            for line in f:
                pkg = line.split("#")[0].strip()
                if not pkg:
                    continue
                mod = pkg.split("==")[0].split(">=")[0].split("<")[0] \
                    .strip().replace("-", "_")
                if importlib.util.find_spec(mod) is None:
                    missing.append(pkg)
    return missing


def install_plugin(source: str, plugins_dir: str,
                   name: Optional[str] = None) -> Dict[str, Any]:
    """Install from a git URL (clone) or a local directory (copy).

    Refuses under SAFE MODE (the reference's plugin manager is likewise
    gated when the startup crash sentinel tripped).  Returns an info dict
    {name, path, source, commit, missing_requirements}."""
    import json
    import shutil
    import subprocess
    if os.environ.get("WAN2GP_SAFE_MODE", "") not in ("", "0"):
        raise RuntimeError("SAFE MODE active: plugin install disabled")
    os.makedirs(plugins_dir, exist_ok=True)
    name = name or _plugin_name_from_source(source)
    target = os.path.join(plugins_dir, name)
    if os.path.exists(target):
        raise FileExistsError(f"plugin '{name}' already installed")
    commit = None
    if os.path.isdir(source):
        shutil.copytree(source, target,
                        ignore=shutil.ignore_patterns(".git"))
    elif source.startswith(("http://", "https://", "git@", "ssh://")):
        subprocess.check_call(["git", "clone", "--depth", "1",
                               source, target])
        try:
            commit = subprocess.check_output(
                ["git", "-C", target, "rev-parse", "HEAD"],
                text=True).strip()
        except Exception:
            commit = None
    else:
        raise ValueError(f"unsupported plugin source {source!r} "
                         "(git URL or local directory)")
    info = {"name": name, "path": target, "source": source,
            "commit": commit,
            "missing_requirements": _check_requirements(target)}
    with open(os.path.join(target, PROVENANCE_FILE), "w",
              encoding="utf-8") as f:
        json.dump({k: v for k, v in info.items() if k != "path"}, f,
                  indent=2)
    return info


def update_plugin(name: str, plugins_dir: str) -> Dict[str, Any]:
    """git-pull an installed plugin (reference update_plugin:1189).
    Local-directory installs re-copy from their recorded source."""
    import json
    import shutil
    import subprocess
    if os.environ.get("WAN2GP_SAFE_MODE", "") not in ("", "0"):
        raise RuntimeError("SAFE MODE active: plugin update disabled")
    target = os.path.join(plugins_dir, name)
    if not os.path.isdir(target):
        raise FileNotFoundError(f"plugin '{name}' is not installed")
    prov_path = os.path.join(target, PROVENANCE_FILE)
    prov = {}
    if os.path.isfile(prov_path):
        with open(prov_path, "r", encoding="utf-8") as f:
            prov = json.load(f)
    old = prov.get("commit")
    if os.path.isdir(os.path.join(target, ".git")):
        subprocess.check_call(["git", "-C", target, "pull", "--ff-only"])
        new = subprocess.check_output(
            ["git", "-C", target, "rev-parse", "HEAD"], text=True).strip()
    elif prov.get("source") and os.path.isdir(prov["source"]):
        shutil.rmtree(target)
        shutil.copytree(prov["source"], target,
                        ignore=shutil.ignore_patterns(".git"))
        with open(prov_path, "w", encoding="utf-8") as f:
            json.dump(prov, f, indent=2)
        new = None
    else:
        raise RuntimeError(f"plugin '{name}' has no updatable source")
    prov["commit"] = new
    with open(prov_path, "w", encoding="utf-8") as f:
        json.dump(prov, f, indent=2)
    return {"name": name, "old_commit": old, "new_commit": new,
            "missing_requirements": _check_requirements(target)}


def uninstall_plugin(name: str, plugins_dir: str) -> None:
    """Remove an installed plugin directory (reference :1168)."""
    import shutil
    target = os.path.join(plugins_dir, name)
    if not os.path.isdir(target):
        raise FileNotFoundError(f"plugin '{name}' is not installed")
    shutil.rmtree(target)


def list_installed(plugins_dir: str) -> List[Dict[str, Any]]:
    """Installed plugins with provenance (name, source, commit)."""
    import json
    out = []
    if not os.path.isdir(plugins_dir):
        return out
    for entry in sorted(os.listdir(plugins_dir)):
        target = os.path.join(plugins_dir, entry)
        if entry.startswith(("_", ".")):
            continue
        is_pkg = os.path.isfile(os.path.join(target, "__init__.py"))
        is_mod = entry.endswith(".py")
        if not (is_pkg or is_mod):
            continue
        info = {"name": entry[:-3] if is_mod else entry,
                "source": None, "commit": None}
        prov_path = os.path.join(target, PROVENANCE_FILE)
        if os.path.isdir(target) and os.path.isfile(prov_path):
            try:
                with open(prov_path, "r", encoding="utf-8") as f:
                    prov = json.load(f)
                info.update({k: prov.get(k) for k in ("source", "commit")})
            except Exception:
                pass
        out.append(info)
    return out
