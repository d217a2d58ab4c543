"""Resolution governance, config groups, custom settings (SURVEY §5.6).

Reference behaviors: shared/resolutions.py (closest_resolution :286,
resolve_resolution_choices :312), shared/utils/utils.py
calculate_new_dimensions :614, shared/config_groups.py, wgp.py custom
settings :697-945.
"""
import pytest

from wan2gp_tpu.config import resolutions as R
from wan2gp_tpu.config import groups as G
from wan2gp_tpu.config import custom_settings as CS


# -- resolutions ----------------------------------------------------------

def test_parse_and_validate():
    assert R.is_resolution_value("832x480")
    assert not R.is_resolution_value("832×480")
    assert not R.is_resolution_value(832)
    assert R.parse_resolution("1280x720") == (1280, 720)


def test_categorize_tiers():
    assert R.categorize_resolution("832x480") == "480p"
    assert R.categorize_resolution("1280x720") == "720p"
    assert R.categorize_resolution("1920x1088") == "1080p"
    assert R.categorize_resolution("3840x2176") == "2160p"
    # above every threshold -> highest tier
    assert R.categorize_resolution("9000x9000") == "2160p"


def test_align():
    assert R.align_dim(833, 16) == 832
    assert R.align_dim(5, 16) == 16          # never below one block
    assert R.align_resolution("833x481", 16) == "832x480"
    assert R.align_resolution("833x481", 1) == "833x481"


def test_tier_expressions():
    assert R.tier_expression_allows("<=720", 480)
    assert not R.tier_expression_allows("<=720", 1080)
    assert R.tier_expression_allows(">=480&<=1080", 720)
    assert not R.tier_expression_allows(">=480&<=1080", 256)
    assert R.tier_expression_allows("480+1080", 1080)   # OR
    assert R.tier_expression_allows("720p", 720)        # bare tier
    assert R.tier_expression_allows("4k", 2160)         # alias
    assert not R.tier_expression_allows("nonsense", 720)


def test_filter_by_categories():
    choices = R.global_choices(enable_4k=True)
    only_small = R.filter_by_categories(choices, ["<=480"])
    assert only_small
    assert all(R.categorize_resolution(c[1]) in
               ("256p", "320p", "384p", "480p") for c in only_small)
    # None / empty = no filter
    assert R.filter_by_categories(choices, None) == list(choices)


def test_closest_resolution_prefers_tier_then_aspect():
    choices = [("a", "832x480"), ("b", "480x832"), ("c", "1280x720"),
               ("d", "720x1280")]
    # same tier, landscape target -> landscape choice
    assert R.closest_resolution("800x450", choices) == "832x480"
    assert R.closest_resolution("450x800", choices) == "480x832"
    # 720p-ish target -> the 720p group
    assert R.closest_resolution("1200x700", choices) == "1280x720"
    # malformed target -> first choice
    assert R.closest_resolution("", choices) == "832x480"
    assert R.closest_resolution("whatever", []) == "whatever"


def test_model_choices_explicit_and_categories():
    md = {"resolutions": [["Small", "832x480"], ["Big", "1280x720"]]}
    assert [c[1] for c in R.model_choices(md)] == ["832x480", "1280x720"]
    md2 = {"resolutions_categories": "<=320"}
    out = R.model_choices(md2)
    assert out and all(R.categorize_resolution(c[1]) in ("256p", "320p")
                       for c in out)
    # block alignment applied to declared buckets
    md3 = {"resolutions": [["Odd", "833x481"]], "vae_block_size": 32}
    assert R.model_choices(md3)[0][1] == "832x480"


def test_resolve_resolution_snaps_only_when_declared():
    # no declaration, no block size -> passthrough (tests use 64x64 etc.)
    assert R.resolve_resolution({}, "64x64") == "64x64"
    assert R.resolve_resolution({}, None) is None
    # declared block size -> aligned
    assert R.resolve_resolution({"vae_block_size": 32}, "833x481") \
        == "832x480"
    # declared buckets -> snapped to the closest one
    md = {"resolutions": [["A", "832x480"], ["B", "1280x720"]]}
    assert R.resolve_resolution(md, "840x470") == "832x480"
    assert R.resolve_resolution(md, "832x480") == "832x480"  # exact kept
    assert R.resolve_resolution(md, None) == "832x480"       # default


def test_calculate_new_dimensions():
    # None/2 -> canvas as-is
    assert R.calculate_new_dimensions(480, 832, 1000, 500, None) \
        == (480, 832)
    assert R.calculate_new_dimensions(480, 832, 1000, 500, 2) == (480, 832)
    # 0 -> pixel budget, aspect preserved, block-rounded
    h, w = R.calculate_new_dimensions(480, 832, 720, 1280, 0)
    assert h % 16 == 0 and w % 16 == 0
    assert abs((w / h) - (1280 / 720)) < 0.15
    assert abs(h * w - 480 * 832) / (480 * 832) < 0.2
    # 1 -> best-orientation cover scale
    h1, w1 = R.calculate_new_dimensions(480, 832, 480, 832, 1)
    assert (h1, w1) == (480, 832)


def test_custom_resolution_file(tmp_path):
    f = tmp_path / "resolutions.json"
    f.write_text('[["My Custom", "640x640"]]')
    R.reset_custom_cache()
    try:
        got = R.load_custom_choices(str(f))
        assert ("My Custom", "640x640") in got
    finally:
        R.reset_custom_cache()


# -- config groups --------------------------------------------------------

MD = {
    "dim": 1,
    "system_configs": {"_name": "Variant",
                       "turbo": {"name": "Turbo", "steps": 8},
                       "hq": {"name": "HQ", "steps": 40}},
    "configs": {"_name": "Style", "anime": {"style": "anime"}},
}


def test_split_serialize_roundtrip():
    assert G.split_selection("a,b") == ["a", "b", "", ""]
    assert G.serialize_selection("a", "", "", "") == "a"
    assert G.serialize_selection("a", "b") == "a,b"


def test_normalize_selection_drops_unknown():
    groups = G.model_config_groups(MD)
    assert G.normalize_selection(groups, "turbo,,,anime") == "turbo,,,anime"
    assert G.normalize_selection(groups, "missing,,,anime") == ",,,anime"
    # metadata keys are never selectable
    assert G.normalize_selection(groups, "_name") == ""


def test_apply_config_selection():
    out = G.apply_config_selection(MD, "turbo,,,anime")
    assert out["steps"] == 8 and out["style"] == "anime"
    assert "steps" not in MD            # original untouched
    assert G.apply_config_selection(MD, "") is MD
    with pytest.raises(ValueError):
        G.apply_config_selection(MD, "nope")


def test_format_selection():
    groups = G.model_config_groups(MD)
    txt = G.format_selection(groups, "turbo,,,anime")
    assert "Variant=Turbo" in txt and "Style=anime" in txt


# -- custom settings ------------------------------------------------------

CMD = {"custom_settings": [
    {"name": "Motion Strength", "type": "float", "min": 0, "max": 2,
     "inc": 0.1, "default": 1.0},
    {"id": "mode", "type": "dropdown",
     "choices": [["Fast", "fast"], ["Slow", "slow"]], "default": "fast"},
    {"label": "Note", "type": "text"},
]}


def test_model_custom_settings_ids():
    defs = CS.get_model_custom_settings(CMD)
    # id comes from id/name/param fields only (reference
    # get_custom_setting_id wgp.py:714); a label-only def gets the slot key
    assert [d["id"] for d in defs] == ["motion_strength", "mode",
                                       "custom_setting_3"]
    assert defs[0]["type"] == "float"
    # dict form (repo convention) synthesizes defs
    defs2 = CS.get_model_custom_settings(
        {"custom_settings": {"alpha": 0.5, "tag": "x"}})
    assert {d["id"] for d in defs2} == {"alpha", "tag"}
    assert next(d for d in defs2 if d["id"] == "alpha")["type"] == "float"


def test_parse_typed_values():
    assert CS.parse_typed_value("3", "int") == (3, None)
    assert CS.parse_typed_value("3.0", "int") == (3, None)
    assert CS.parse_typed_value("3.5", "int")[1] is not None
    assert CS.parse_typed_value("2.5", "float") == (2.5, None)
    assert CS.parse_typed_value(" hi ", "text") == ("hi", None)
    assert CS.parse_typed_value("", "text") == (None, None)
    sdef = CS.get_model_custom_settings(CMD)[1]
    assert CS.parse_typed_value("slow", "dropdown", sdef) == ("slow", None)
    assert CS.parse_typed_value("bogus", "dropdown", sdef)[1] is not None


def test_collect_custom_settings():
    # id->value dict + positional slot + default fill + bound clamp
    inputs = {"custom_settings": {"mode": "slow"},
              "custom_setting_1": "5.0"}     # clamped to max 2
    out, err = CS.collect_custom_settings(CMD, inputs)
    assert err is None
    assert out["motion_strength"] == 2.0
    assert out["mode"] == "slow"
    # strict mode propagates the error
    bad = {"custom_setting_1": "not a number"}
    out2, err2 = CS.collect_custom_settings(CMD, bad, strict=True)
    assert out2 is None and "Motion Strength" in err2
    # undeclared ids pass through (repo free-form convention)
    out3, _ = CS.collect_custom_settings(
        {}, {"custom_settings": {"free_key": "v"}})
    assert out3 == {"free_key": "v"}


def test_service_resolution_and_config_integration():
    """The service snap path: model def with buckets + config override."""
    from wan2gp_tpu.config.resolutions import resolve_resolution
    from wan2gp_tpu.config.groups import apply_config_selection
    md = {"resolutions": [["A", "832x480"]],
          "system_configs": {"fast": {"num_inference_steps": 4}}}
    md2 = apply_config_selection(md, "fast")
    assert md2["num_inference_steps"] == 4
    assert resolve_resolution(md2, "800x450") == "832x480"
