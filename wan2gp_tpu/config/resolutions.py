"""Resolution governance — global/per-model resolution lists, tier
filtering, block alignment and closest-bucket snapping.

Reference: shared/resolutions.py (choice tables :11-75, tier thresholds
:77-99, closest_resolution :286, resolve_resolution_choices :312) and
shared/utils/utils.py calculate_new_dimensions :614.

TPU framing: every distinct (W, H) is a distinct XLA program.  Snapping
requests onto a finite bucket list is not just UX — it bounds the
compile-cache footprint and keeps shapes static, so this module is the
front door of shape governance for the whole service.  Model defs can
declare:
  "resolutions":            [["label", "WxH"], ...] explicit buckets
  "resolutions_categories": tier expressions ("<=720", ">=480&<=1080",
                            "540+720") filtering the global table
  "vae_block_size":         dimension alignment (default 16)
"""
import json
import math
import os
import re
from typing import Dict, List, Optional, Sequence, Tuple

Choice = Tuple[str, str]

# Global bucket tables (reference shared/resolutions.py:11-75).  Pixel
# counts cluster in tiers so compile-cache reuse across aspect ratios of
# one tier is maximal under padded-bucket batching.
RESOLUTION_CHOICES_4K: List[Choice] = [
    ("3840x2176 (16:9)", "3840x2176"), ("2176x3840 (9:16)", "2176x3840"),
    ("2880x2880 (1:1)", "2880x2880"), ("3840x1664 (21:9)", "3840x1664"),
    ("1664x3840 (9:21)", "1664x3840"), ("2048x2048 (1:1)", "2048x2048"),
    ("1920x1920 (1:1)", "1920x1920"), ("2560x1440 (16:9)", "2560x1440"),
    ("1440x2560 (9:16)", "1440x2560"), ("1920x1440 (4:3)", "1920x1440"),
    ("1440x1920 (3:4)", "1440x1920"), ("2160x1440 (3:2)", "2160x1440"),
    ("1440x2160 (2:3)", "1440x2160"), ("1456x1456 (1:1)", "1456x1456"),
    ("2688x1152 (21:9)", "2688x1152"), ("1152x2688 (9:21)", "1152x2688"),
]

RESOLUTION_CHOICES: List[Choice] = [
    ("1920x1088 (16:9)", "1920x1088"), ("1088x1920 (9:16)", "1088x1920"),
    ("1440x1440 (1:1)", "1440x1440"), ("1536x1024 (3:2)", "1536x1024"),
    ("1024x1536 (2:3)", "1024x1536"), ("1920x832 (21:9)", "1920x832"),
    ("832x1920 (9:21)", "832x1920"), ("2048x768 (8:3)", "2048x768"),
    ("1024x1792 (4:7)", "1024x1792"), ("1088x1088 (1:1)", "1088x1088"),
    ("1024x1024 (1:1)", "1024x1024"), ("1280x720 (16:9)", "1280x720"),
    ("720x1280 (9:16)", "720x1280"), ("1600x400 (4:1)", "1600x400"),
    ("1280x544 (21:9)", "1280x544"), ("544x1280 (9:21)", "544x1280"),
    ("1104x832 (4:3)", "1104x832"), ("832x1104 (3:4)", "832x1104"),
    ("960x960 (1:1)", "960x960"),
    ("960x544 (16:9)", "960x544"), ("544x960 (9:16)", "544x960"),
    ("832x624 (4:3)", "832x624"), ("624x832 (3:4)", "624x832"),
    ("720x720 (1:1)", "720x720"), ("832x480 (16:9)", "832x480"),
    ("480x832 (9:16)", "480x832"),
    ("672x384 (16:9)", "672x384"), ("384x672 (9:16)", "384x672"),
    ("512x512 (1:1)", "512x512"),
    ("576x320 (16:9)", "576x320"), ("320x576 (9:16)", "320x576"),
    ("448x448 (1:1)", "448x448"),
    ("448x256 (7:4)", "448x256"), ("256x448 (4:7)", "256x448"),
    ("320x320 (1:1)", "320x320"),
]

# tier name -> max pixel count of the tier (ordered low -> high)
GROUP_THRESHOLDS: Dict[str, int] = {
    "256p": 448 * 256, "320p": 448 * 448, "384p": 512 * 512,
    "480p": 832 * 624, "540p": 960 * 544, "720p": 1024 * 1024,
    "1080p": 1920 * 1088, "1440p": 2560 * 1440, "2160p": 3840 * 2176,
}
GROUP_TIERS: Dict[str, int] = {
    "256p": 256, "320p": 320, "384p": 384, "480p": 480, "540p": 540,
    "720p": 720, "1080p": 1080, "1440p": 1440, "2160p": 2160,
}
_CATEGORY_ALIASES = {"2k": 1440, "4k": 2160}

RESOLUTION_FILE = "resolutions.json"
_custom_resolutions: Optional[List[Choice]] = None


def is_resolution_value(value) -> bool:
    return (isinstance(value, str)
            and re.fullmatch(r"\d+x\d+", value.strip().lower()) is not None)


def parse_resolution(value: str) -> Tuple[int, int]:
    w, h = value.lower().split("x", 1)
    return int(w), int(h)


def normalize_choices(choices, source="resolutions") -> Optional[List[Choice]]:
    """Validate a [["label","WxH"], ...] list; None on malformed input."""
    if choices is None or not isinstance(choices, list):
        return None
    out: List[Choice] = []
    for tup in choices:
        if (not isinstance(tup, (list, tuple)) or len(tup) != 2
                or not isinstance(tup[0], str) or not isinstance(tup[1], str)
                or not is_resolution_value(tup[1])):
            return None
        out.append((tup[0], tup[1].lower()))
    return out


def load_custom_choices(path: str = RESOLUTION_FILE) -> List[Choice]:
    """User-extendable global buckets (reference resolutions.json)."""
    global _custom_resolutions
    if _custom_resolutions is not None:
        return _custom_resolutions
    if not os.path.isfile(path):
        return []
    try:
        with open(path, "r", encoding="utf-8") as f:
            raw = json.load(f)
    except Exception:
        return []
    normalized = normalize_choices(raw, path)
    if normalized is None:
        # don't cache a rejected file: the user can fix resolutions.json
        # and have it re-read in-process (reference leaves the cache
        # unset on failure and retries)
        return []
    _custom_resolutions = normalized
    return _custom_resolutions


def reset_custom_cache():
    global _custom_resolutions
    _custom_resolutions = None


def dedupe_choices(choices: Sequence[Choice]) -> List[Choice]:
    seen, out = set(), []
    for label, res in choices:
        if res not in seen:
            seen.add(res)
            out.append((label, res))
    return out


def align_dim(value: int, block: int) -> int:
    """Floor-align to the VAE/patch block, never below one block."""
    if block <= 1:
        return value
    return max(block, value // block * block)


def align_resolution(resolution: str, block: int) -> str:
    w, h = parse_resolution(resolution)
    return f"{align_dim(w, block)}x{align_dim(h, block)}"


def align_choices(choices: Sequence[Choice], block: int) -> List[Choice]:
    if block <= 1:
        return list(choices)
    out = []
    for label, res in choices:
        aligned = align_resolution(res, block)
        if aligned != res:
            label = re.sub(r"\d+x\d+", aligned, label, count=1)
        out.append((label, aligned))
    return dedupe_choices(out)


def categorize_resolution(resolution: str) -> str:
    px = math.prod(parse_resolution(resolution))
    for group, threshold in GROUP_THRESHOLDS.items():
        if px <= threshold:
            return group
    return next(reversed(GROUP_THRESHOLDS))


def _tier_value(token: str) -> Optional[int]:
    token = token.strip().lower()
    if token in _CATEGORY_ALIASES:
        return _CATEGORY_ALIASES[token]
    if token.endswith("p"):
        token = token[:-1]
    if not token.isdigit():
        return None
    tier = int(token)
    return tier if tier in GROUP_TIERS.values() else None


def tier_expression_allows(expression: str, tier: int) -> bool:
    """Tier filter DSL (reference match_archi.py semantics on resolution
    tiers): '<=' '<' '>=' '>' '=' prefix, '+' = OR, '&' = AND; bare
    tokens like '720p'/'4k' are equality."""
    def eval_one(cond: str) -> bool:
        cond = cond.strip()
        m = re.match(r"(>=|<=|>|<|=?)\s*([a-z0-9]+)$", cond)
        if not m:
            return False
        op, token = m.groups()
        val = _tier_value(token)
        if val is None:
            return False
        return {"": tier == val, "=": tier == val, ">=": tier >= val,
                "<=": tier <= val, ">": tier > val, "<": tier < val}[op]

    return any(
        all(eval_one(c) for c in or_clause.split("&"))
        for or_clause in str(expression).strip().lower().split("+")
        if or_clause.strip())


def filter_by_categories(choices: Sequence[Choice],
                         expressions) -> List[Choice]:
    if expressions is None:
        return list(choices)
    if isinstance(expressions, str):
        expressions = [expressions]
    if not isinstance(expressions, (list, tuple)) or not expressions:
        return list(choices)
    out = []
    for choice in choices:
        tier = GROUP_TIERS[categorize_resolution(choice[1])]
        if any(tier_expression_allows(e, tier) for e in expressions):
            out.append(choice)
    return out


def global_choices(enable_4k: bool = False) -> List[Choice]:
    base = (list(RESOLUTION_CHOICES_4K) if enable_4k else [])
    return dedupe_choices(base + list(RESOLUTION_CHOICES)
                          + load_custom_choices())


def closest_resolution(target: str, choices: Sequence[Choice]) -> str:
    """Snap onto the nearest bucket: nearest tier first, then minimal
    (|log aspect-ratio delta|, relative pixel delta) inside the tier —
    reference closest_resolution (shared/resolutions.py:286-309)."""
    choices = list(choices)
    if not choices:
        return target
    if not is_resolution_value(target or ""):
        return choices[0][1]
    tw, th = parse_resolution(target)
    t_ratio, t_px = tw / th, tw * th
    order = list(GROUP_THRESHOLDS)
    t_idx = order.index(categorize_resolution(target))
    grouped: Dict[str, List[Choice]] = {}
    for c in choices:
        grouped.setdefault(categorize_resolution(c[1]), []).append(c)
    best_group = min(
        grouped, key=lambda g: (abs(order.index(g) - t_idx),
                                abs(GROUP_THRESHOLDS[g]
                                    - GROUP_THRESHOLDS[order[t_idx]])))

    def score(choice: Choice):
        w, h = parse_resolution(choice[1])
        return (abs(math.log((w / h) / t_ratio)),
                abs(w * h - t_px) / t_px)

    return min(grouped[best_group], key=score)[1]


def model_choices(model_def: dict, enable_4k: bool = False,
                  block_size: Optional[int] = None) -> List[Choice]:
    """Bucket list for one model def (reference
    resolve_resolution_choices, shared/resolutions.py:312-331)."""
    explicit = model_def.get("resolutions")
    categories = model_def.get("resolutions_categories")
    if explicit is not None:
        choices = normalize_choices(explicit) or []
        if categories is not None:
            choices = dedupe_choices(
                choices + filter_by_categories(global_choices(True),
                                               categories))
    elif categories is not None:
        choices = filter_by_categories(global_choices(True), categories)
    else:
        choices = global_choices(enable_4k)
    block = (model_def.get("vae_block_size", 16)
             if block_size is None else block_size)
    return align_choices(choices, int(block))


def resolve_resolution(model_def: dict, requested: Optional[str],
                       enable_4k: bool = False,
                       block_size: Optional[int] = None) -> Optional[str]:
    """Final per-task resolution: snapped to the model's buckets when it
    declares any, else block-aligned as requested.  Returns None only
    when nothing was requested and the model declares no buckets."""
    declares = ("resolutions" in model_def
                or "resolutions_categories" in model_def)
    if declares:
        choices = model_choices(model_def, enable_4k, block_size)
        if not choices:
            return requested
        if requested is None or not any(requested == c[1] for c in choices):
            return closest_resolution(requested or "", choices)
        return requested
    if requested is None:
        return None
    # models that declare no buckets still get block alignment (reference
    # shared/resolutions.py:322 defaults block_size=16): unaligned
    # requests (e.g. 850x478) must never reach the VAE/patchify, or every
    # odd size becomes a fresh XLA compile.  Tests that need passthrough
    # pass block_size=1 explicitly.
    block = (model_def.get("vae_block_size", 16)
             if block_size is None else block_size)
    return align_resolution(requested, int(block)) if block else requested


def calculate_new_dimensions(canvas_height: int, canvas_width: int,
                             image_height: int, image_width: int,
                             fit_into_canvas, block_size: int = 16
                             ) -> Tuple[int, int]:
    """Image->canvas sizing (reference shared/utils/utils.py:614-627).
    fit modes: None/2 = use the canvas as-is; 1 = preserve aspect,
    scale so the image covers the canvas in its best orientation;
    0 = preserve aspect at the canvas's pixel BUDGET (sqrt scale).
    Outputs are block-aligned (rounded, not floored — reference
    behavior) so latent grids stay static-shaped."""
    if fit_into_canvas is None or fit_into_canvas == 2:
        return canvas_height, canvas_width
    if fit_into_canvas == 1:
        scale1 = min(canvas_height / image_height,
                     canvas_width / image_width)
        scale2 = min(canvas_width / image_height,
                     canvas_height / image_width)
        scale = max(scale1, scale2)
    else:  # 0: pixel budget
        scale = math.sqrt((canvas_height * canvas_width)
                          / (image_height * image_width))
    new_h = max(block_size, round(image_height * scale / block_size)
                * block_size)
    new_w = max(block_size, round(image_width * scale / block_size)
                * block_size)
    return new_h, new_w
