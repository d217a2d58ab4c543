"""Models manager — checkpoint inventory / cleanup (reference
plugins/models_manager/plugin.py:18-1100: per-model expected-file
trees, disk-usage accounting, missing-file detection, delete with
shared-file protection).  The Gradio tree UI is replaced by a headless
API the web console and CLI can render.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Set, Tuple

from ..io.downloads import FileLocator


def _url_filename(url: str) -> str:
    return os.path.basename(str(url).split("?")[0])


def expected_files(registry, model_type: str) -> List[Dict[str, Any]]:
    """[{role, filename, urls}] for a model, from the handler's
    query_model_files (plugin.py:783-800
    _resolve_expected_entry_path)."""
    handler = registry.handler_for(model_type)
    base = registry.base_model_type(model_type)
    model_def = registry.get(model_type)
    out = []
    try:
        files = handler.query_model_files(base, model_def) or []
    except Exception:
        files = []
    for entry in files:
        urls = entry.get("urls") or []
        for u in urls:
            name = _url_filename(u)
            if name:
                out.append({"role": entry.get("role", "file"),
                            "filename": name, "url": u})
                break          # one variant per role is enough
    return out


def inventory(registry, locator: Optional[FileLocator] = None,
              model_types: Optional[List[str]] = None
              ) -> Dict[str, Dict[str, Any]]:
    """Per-model checkpoint status: expected / present (with sizes) /
    missing (plugin.py:687-830 _build_cache +
    _collect_expected_missing_files)."""
    locator = locator or FileLocator()
    out: Dict[str, Dict[str, Any]] = {}
    for mt in (model_types or registry.model_types()):
        entries = expected_files(registry, mt)
        present, missing = [], []
        total = 0
        for e in entries:
            path = locator.locate(e["filename"])
            if path:
                size = os.path.getsize(path)
                total += size
                present.append({**e, "path": path, "size": size})
            else:
                missing.append(e)
        out[mt] = {"expected": entries, "present": present,
                   "missing": missing, "size_bytes": total,
                   "complete": not missing and bool(entries)}
    return out


def shared_file_owners(inv: Dict[str, Dict[str, Any]]
                       ) -> Dict[str, Set[str]]:
    """filename -> model types that expect it (shared-file
    protection, plugin.py:665-686 _delete_files_for_node)."""
    owners: Dict[str, Set[str]] = {}
    for mt, rec in inv.items():
        for e in rec["expected"]:
            owners.setdefault(e["filename"], set()).add(mt)
    return owners


def delete_model_files(registry, model_type: str,
                       locator: Optional[FileLocator] = None,
                       delete_shared: bool = False,
                       inv: Optional[Dict] = None
                       ) -> Tuple[List[str], List[str]]:
    """Delete a model's present checkpoints; files expected by OTHER
    models are kept unless delete_shared.  Returns
    (deleted_paths, kept_shared_paths)."""
    locator = locator or FileLocator()
    inv = inv or inventory(registry, locator)
    owners = shared_file_owners(inv)
    deleted, kept = [], []
    for e in inv.get(model_type, {}).get("present", []):
        others = owners.get(e["filename"], set()) - {model_type}
        if others and not delete_shared:
            kept.append(e["path"])
            continue
        try:
            os.remove(e["path"])
            deleted.append(e["path"])
        except OSError:
            kept.append(e["path"])
    return deleted, kept


def storage_tree(inv: Dict[str, Dict[str, Any]],
                 registry=None) -> Dict[str, Any]:
    """Grouped disk-usage summary (the manager's tree view data):
    family -> models -> size; duplicates counted once at the top."""
    seen: Set[str] = set()
    families: Dict[str, Dict[str, int]] = {}
    total = 0
    for mt, rec in sorted(inv.items()):
        fam = mt.split("_")[0]
        if registry is not None:
            try:
                fam = registry.handler_for(mt).family
            except Exception:
                pass
        node = families.setdefault(fam, {})
        node[mt] = rec["size_bytes"]
        for e in rec["present"]:
            if e["path"] not in seen:
                seen.add(e["path"])
                total += e["size"]
    return {"total_bytes": total, "families": families}


def missing_report(inv: Dict[str, Dict[str, Any]]) -> List[Dict]:
    """Flat list of models with missing checkpoints + the URLs to
    fetch (feeds io/downloads.ensure)."""
    out = []
    for mt, rec in sorted(inv.items()):
        if rec["missing"]:
            out.append({"model_type": mt,
                        "missing": [m["filename"]
                                    for m in rec["missing"]],
                        "urls": [m["url"] for m in rec["missing"]]})
    return out
