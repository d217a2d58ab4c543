"""Declarative per-model custom settings (the reference's extra/custom
setting machinery).

Reference: wgp.py:697-945 (get_custom_setting_id :714, normalization
:760-781, typed parsing :860, collect_custom_settings_from_inputs :911)
and shared/extra_settings.py SettingDef.

A model def declares up to 5 custom settings either as the reference's
list form:
  "custom_settings": [{"id"/"name": ..., "label": ..., "type":
                       "int"|"float"|"text"|"dropdown",
                       "min"/"max"/"inc": ..., "choices": [...],
                       "default": ...}, ...]
or the compact dict form some defs in this repo use:
  "custom_settings": {"some_id": default_value, ...}
Task inputs may carry values either in "custom_settings" (id -> value)
or in positional "custom_setting_{N}" slots (reference UI form keys).
`collect_custom_settings` merges + validates both into one id->typed
value dict that families read.
"""
import re
from typing import Any, Dict, List, Optional, Tuple

CUSTOM_SETTINGS_MAX = 5
CUSTOM_SETTING_TYPES = {"int", "float", "text", "dropdown"}


def custom_setting_key(index: int) -> str:
    return f"custom_setting_{index + 1}"


def normalize_type(setting_type) -> str:
    parsed = str(setting_type or "text").strip().lower()
    return parsed if parsed in CUSTOM_SETTING_TYPES else "text"


def normalize_name(name) -> str:
    return re.sub(r"[^a-z0-9_]+", "_",
                  str(name or "").strip().lower()).strip("_")


def setting_id(setting_def: dict, index: int) -> str:
    explicit = setting_def.get("id")
    if explicit is not None and str(explicit).strip():
        norm = normalize_name(explicit)
        if norm:
            return norm
    for field in ("name", "param"):
        norm = normalize_name(setting_def.get(field, ""))
        if norm:
            return norm
    return custom_setting_key(index)


def dropdown_choices(setting_def) -> Optional[List[Tuple[str, Any]]]:
    if (not isinstance(setting_def, dict)
            or setting_def.get("type") != "dropdown"):
        return None
    choices = setting_def.get("choices", [])
    if not isinstance(choices, list):
        return None
    out: List[Tuple[str, Any]] = []
    for c in choices:
        if isinstance(c, (list, tuple)) and len(c) >= 2:
            out.append((str(c[0]), c[1]))
        else:
            out.append((str(c), c))
    return out or None


def slider_bounds(setting_def) -> Optional[Tuple]:
    """(min, max, inc) when the numeric def declares a full range."""
    if (not isinstance(setting_def, dict)
            or setting_def.get("type") not in {"int", "float"}
            or not all(k in setting_def for k in ("min", "max", "inc"))):
        return None
    try:
        lo, hi, inc = (float(setting_def["min"]), float(setting_def["max"]),
                       float(setting_def["inc"]))
    except Exception:
        return None
    if hi < lo or inc <= 0:
        return None
    if setting_def.get("type") == "int":
        if not (lo.is_integer() and hi.is_integer() and inc.is_integer()):
            return None
        return int(lo), int(hi), int(inc)
    return lo, hi, inc


def get_model_custom_settings(model_def: dict) -> List[dict]:
    """Normalized setting defs with unique ids (reference
    get_model_custom_settings, wgp.py:757-781).  Accepts the compact
    dict form by synthesizing text/float defs from the defaults."""
    raw = (model_def or {}).get("custom_settings", [])
    if isinstance(raw, dict):
        raw = [{"id": k, "label": k.replace("_", " ").title(),
                "type": ("float" if isinstance(v, (int, float))
                         and not isinstance(v, bool) else "text"),
                "default": v}
               for k, v in raw.items()]
    if not isinstance(raw, list):
        return []
    normalized, used = [], set()
    for idx, setting in enumerate(raw[:CUSTOM_SETTINGS_MAX]):
        if not isinstance(setting, dict):
            continue
        one = dict(setting)
        one["label"] = str(one.get("label",
                                   one.get("name",
                                           f"Custom Setting {idx + 1}")))
        one["type"] = normalize_type(one.get("type", "text"))
        if one["type"] == "dropdown" and dropdown_choices(one) is None:
            one["type"] = "text"
        sid = setting_id(one, idx)
        if sid in used:
            sid = custom_setting_key(idx)
        used.add(sid)
        one["id"] = sid
        normalized.append(one)
    return normalized


def parse_typed_value(raw_value, setting_type, setting_def=None
                      ) -> Tuple[Any, Optional[str]]:
    """(typed value, error).  Empty input parses to (None, None)."""
    if raw_value is None:
        return None, None
    if isinstance(raw_value, str):
        raw_value = raw_value.strip()
        if not raw_value:
            return None, None
    setting_type = normalize_type(setting_type)
    if setting_type == "dropdown":
        choices = dropdown_choices(setting_def)
        if choices is None:
            return str(raw_value).strip(), None
        for _, value in choices:
            if raw_value == value or str(raw_value) == str(value):
                return value, None
        return None, "Expected one of the dropdown choices."
    if setting_type == "int":
        if isinstance(raw_value, bool):
            return None, "Expected an integer value."
        if isinstance(raw_value, int):
            return raw_value, None
        if isinstance(raw_value, float):
            return ((int(raw_value), None) if raw_value.is_integer()
                    else (None, "Expected an integer value."))
        try:
            return int(str(raw_value)), None
        except Exception:
            try:
                f = float(str(raw_value))
                if f.is_integer():
                    return int(f), None
            except Exception:
                pass
            return None, "Expected an integer value."
    if setting_type == "float":
        if isinstance(raw_value, bool):
            return None, "Expected a float value."
        try:
            return float(raw_value), None
        except Exception:
            return None, "Expected a float value."
    return str(raw_value).strip(), None


def clamp_to_bounds(value, setting_def):
    bounds = slider_bounds(setting_def)
    if bounds is None or not isinstance(value, (int, float)) \
            or isinstance(value, bool):
        return value
    lo, hi, _ = bounds
    return min(max(value, lo), hi)


def collect_custom_settings(model_def: dict, inputs: dict,
                            strict: bool = False
                            ) -> Tuple[Optional[Dict[str, Any]],
                                       Optional[str]]:
    """Merge positional custom_setting_N slots + an existing id->value
    dict into one validated dict (reference
    collect_custom_settings_from_inputs, wgp.py:911-943).  strict=True
    returns (None, error) on the first type error; otherwise bad values
    pass through as raw text (reference lenient mode)."""
    existing = inputs.get("custom_settings")
    if not isinstance(existing, dict):
        existing = {}
    out: Dict[str, Any] = {}
    defs = get_model_custom_settings(model_def)
    for idx, sdef in enumerate(defs):
        sid = sdef["id"]
        raw = inputs.get(custom_setting_key(idx))
        if raw is None and sid in existing:
            raw = existing.get(sid)
        if raw is None and "default" in sdef:
            raw = sdef.get("default")
        value, error = parse_typed_value(raw, sdef.get("type", "text"),
                                         sdef)
        if error is not None:
            if strict:
                label = sdef.get("label", custom_setting_key(idx))
                return None, f"{label}: {error}"
            if raw is not None and not (isinstance(raw, str)
                                        and not raw.strip()):
                out[sid] = raw if not isinstance(raw, str) else raw.strip()
            continue
        if value is not None:
            out[sid] = clamp_to_bounds(value, sdef)
    # ids with no declared def still pass through untouched (repo
    # families read free-form keys, e.g. joyai_control_memory_positions)
    for sid, value in existing.items():
        out.setdefault(sid, value)
    return (out or None), None
