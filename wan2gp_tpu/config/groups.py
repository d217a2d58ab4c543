"""Config groups — selectable sub-configs inside one model definition.

Reference: shared/config_groups.py (CONFIG_KEYS :1-6, selection
split/serialize :13-19, normalize :22, selected_model_configs :30,
format :40) applied at load time in wgp.py load_models:3917-3921 as
`model_def.update(config_def)` per selected group.

A model def may carry up to four override dictionaries:
  "system_configs", "system_configs2", "system_configs3" (author-owned)
  "configs"                                              (user-owned)
Each maps config_id -> {model-def override keys...} plus optional
metadata entries "_name" (group label) and "_default_label".
A task's "config" setting is a comma-joined selection, one id per
group ("id1,,id3"); empty slots select that group's default (no
override).
"""
from typing import Dict, Iterator, List, Sequence, Tuple

SYSTEM_CONFIG_KEYS = ("system_configs", "system_configs2",
                      "system_configs3")
USER_CONFIG_KEY = "configs"
CONFIG_KEYS = SYSTEM_CONFIG_KEYS + (USER_CONFIG_KEY,)
CONFIG_NAME_KEY = "_name"
CONFIG_DEFAULT_LABEL_KEY = "_default_label"
CONFIG_METADATA_KEYS = {CONFIG_NAME_KEY, CONFIG_DEFAULT_LABEL_KEY}


def model_config_groups(model_def: dict) -> List[Dict]:
    """The four (possibly empty) group dicts of a model def."""
    out = []
    for key in CONFIG_KEYS:
        group = model_def.get(key) or {}
        out.append(group if isinstance(group, dict) else {})
    return out


def config_items(configs: Dict) -> List[Tuple[str, Dict]]:
    return [(cid, cdef) for cid, cdef in configs.items()
            if cid not in CONFIG_METADATA_KEYS]


def split_selection(selection) -> List[str]:
    values = str(selection or "").split(",")
    return (values + [""] * len(CONFIG_KEYS))[:len(CONFIG_KEYS)]


def serialize_selection(*values) -> str:
    return ",".join(str(v or "")
                    for v in values[:len(CONFIG_KEYS)]).rstrip(",")


def normalize_selection(config_groups: Sequence[Dict], selection) -> str:
    """Drop ids that no longer exist in their group (settings recalled
    from metadata may reference removed configs)."""
    values = split_selection(selection)
    for i, cid in enumerate(values):
        if cid not in config_groups[i] or cid in CONFIG_METADATA_KEYS:
            values[i] = ""
    return serialize_selection(*values)


def selected_configs(config_groups: Sequence[Dict], selection
                     ) -> Iterator[Tuple[int, str, Dict]]:
    """Yield (group_no, config_id, override_dict) for each non-empty
    slot; raises on an unknown id (reference raises ValueError too)."""
    for group, (configs, cid) in enumerate(
            zip(config_groups, split_selection(selection)), 1):
        if not cid:
            continue
        cdef = (None if cid in CONFIG_METADATA_KEYS
                else configs.get(cid))
        if cdef is None:
            raise ValueError(
                f"Config '{cid}' is not defined in the model definition")
        yield group, cid, cdef


def format_selection(config_groups: Sequence[Dict], selection) -> str:
    """Human summary like 'Variant=Turbo, Quality=High' for metadata."""
    parts = []
    for key, configs, cid in zip(CONFIG_KEYS, config_groups,
                                 split_selection(selection)):
        if not cid:
            continue
        cdef = (None if cid in CONFIG_METADATA_KEYS
                else configs.get(cid))
        group_label = configs.get(CONFIG_NAME_KEY) or key
        choice_label = ((cdef.get("name") or cid)
                        if isinstance(cdef, dict) else cid)
        parts.append(f"{group_label}={choice_label}")
    return ", ".join(parts)


def apply_config_selection(model_def: dict, selection) -> dict:
    """Return a copy of model_def with every selected group's override
    merged in (wgp.py load_models:3917-3921 semantics).  The original
    def is never mutated; an empty selection returns it unchanged."""
    if not selection:
        return model_def
    groups = model_config_groups(model_def)
    merged = model_def
    for _, _, cdef in selected_configs(groups, selection):
        if merged is model_def:
            merged = dict(model_def)
        merged.update(cdef)
    return merged
