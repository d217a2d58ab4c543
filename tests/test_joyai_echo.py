"""JoyAI-Echo multi-window memory (reference models/ltx2/joyai_echo.py):
command/name parsing, control-memory positions, audio window selection,
memory-bank slot semantics (store/load/drop/evict/cache), and the
multi-window handler loop with memory conditioning."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.ltx2.joyai_echo import (
    JoyAIEchoMemoryBank, parse_joyai_window_commands,
    parse_control_memory_positions, validate_control_memory_positions,
    parse_store_mem_option, parse_load_mem_option,
    parse_drop_mem_option, duration_to_frames, audio_energy_mask,
    max_response_mel_bounds, select_audio_window_start,
    video_idx_from_audio_window)


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def test_window_command_parsing():
    text, opts = parse_joyai_window_commands(
        "[/duration=10s, /new_shot,/load_mem=man1,woman1,"
        "/store_mem=man2]ID_A speaks.")
    assert text == "ID_A speaks."
    assert opts["duration"] == "10s"
    assert opts["new_shot"] is True
    assert opts["load_mem"] == ["man1", "woman1"]
    assert opts["store_mem"] == ["man2"]
    # empty load_mem deactivates all memories
    _, o2 = parse_joyai_window_commands("[/load_mem=]x")
    assert o2["load_mem"] == []
    _, o3 = parse_joyai_window_commands("[/no_mem]x")
    assert o3["no_mem"] is True
    # non-command brackets are preserved
    text, _ = parse_joyai_window_commands("[Verse] la la [/duration=8]")
    assert text.startswith("[Verse]")


def test_duration_forms():
    assert duration_to_frames("121", 25.0, 500, 10) == 121
    assert duration_to_frames("5s", 25.0, 500, 10) == 125
    assert duration_to_frames("20%", 25.0, 500, 10) == 100
    assert duration_to_frames("", 25.0, 500, 10) == 10


def test_memory_name_validation():
    assert parse_store_mem_option("a,b-2,c.x") == ["a", "b-2", "c.x"]
    with pytest.raises(ValueError):
        parse_store_mem_option("")           # requires names
    with pytest.raises(ValueError):
        parse_drop_mem_option("bad name")    # space invalid
    with pytest.raises(ValueError):
        parse_store_mem_option("123")        # all digits invalid
    assert parse_load_mem_option("") == []   # empty allowed for load


def test_control_memory_positions():
    pos = parse_control_memory_positions("man=2s, woman=8s, 12", 25.0)
    assert pos == [("man", 50), ("woman", 200), (None, 11)]
    assert validate_control_memory_positions("2s, 5s", 25.0) is None
    err = validate_control_memory_positions("99s", 25.0)
    assert err and "beyond" in err


# ---------------------------------------------------------------------------
# audio selection
# ---------------------------------------------------------------------------

def test_audio_energy_mask_and_window():
    sr, spl = 16000, 640
    total = 50
    mono = np.zeros(total * spl, np.float32)
    mono[30 * spl:40 * spl] = np.sin(
        np.linspace(0, 3000, 10 * spl)).astype(np.float32)
    mask = audio_energy_mask(mono, spl, total)
    assert mask[32] and not mask[5]
    # silence-only audio -> no mask
    assert not audio_energy_mask(np.zeros(total * spl, np.float32),
                                 spl, total).any()
    start, length = select_audio_window_start(
        total, mono, sr, window_size=8)
    assert 0 <= start <= total - length
    assert mask[start:start + length].any()
    vi = video_idx_from_audio_window(13, total, start, length)
    assert 0 <= vi <= 12


def test_max_response_mel_bounds():
    mel = np.full((1, 4, 100), -8.0, np.float32)
    mel[..., 60:70] = 2.0
    s, e = max_response_mel_bounds(mel, 10)
    assert 55 <= s <= 65 and e == s + 9


# ---------------------------------------------------------------------------
# memory bank
# ---------------------------------------------------------------------------

def _entry(seed, c=4):
    rng = np.random.default_rng(seed)
    return {"video": rng.normal(size=(1, c, 1, 2, 2)).astype(np.float32),
            "audio": rng.normal(size=(1, 2, 6, 2)).astype(np.float32),
            "audio_len": 6}


def test_bank_store_load_drop_evict():
    bank = JoyAIEchoMemoryBank(max_size=2, audio_window_size=6)
    v = np.random.default_rng(0).normal(size=(1, 4, 12, 2, 2)) \
        .astype(np.float32)
    a = np.random.default_rng(1).normal(size=(1, 2, 40, 2)) \
        .astype(np.float32)
    stored, _ = bank.add_generation(v, a, store_selectors=["m1", "m2"])
    assert len(stored) == 2 and len(bank) == 2
    assert bank.paired_audio_memory()
    assert bank.video_latent().shape == (1, 4, 2, 2, 2)
    assert bank.audio_latent().shape[2] == sum(
        bank.audio_segment_lengths())
    # storing a third evicts the oldest (m1)
    stored, discarded = bank.add_generation(v, a,
                                            store_selectors=["m3"])
    assert any("m1" in d for d in discarded)
    names = {e.get("name") for e in bank.entries.values()}
    assert names == {"m2", "m3"}
    # m1 survives in the cache and can be re-loaded
    loaded, _ = bank.load(["m1"])
    assert any("m1" in l for l in loaded)
    # load with subset deactivates others but keeps cache
    bank.load(["m1"])
    assert {e.get("name") for e in bank.entries.values()} == {"m1"}
    assert "m2" in bank.cache
    # drop removes from cache too
    bank.drop(["m2"])
    assert "m2" not in bank.cache
    with pytest.raises(RuntimeError):
        bank.drop(["nope"])
    with pytest.raises(RuntimeError):
        bank.load(["missing"])


def test_bank_artificial_memory_names():
    bank = JoyAIEchoMemoryBank(max_size=4)
    video = np.zeros((1, 4, 3, 2, 2), np.float32)
    stored, _ = bank.add_artificial_memory(
        {"video": video, "audio": [], "names": ["man", None]})
    assert len(stored) == 3
    names = sorted(e.get("name") for e in bank.entries.values())
    assert names == ["control2", "control3", "man"]


def test_store_multi_selector_center_ratios():
    """Multiple /store_mem names sample different video frames
    (joyai_echo.py:392 center_ratios)."""
    bank = JoyAIEchoMemoryBank(max_size=4)
    v = np.arange(12, dtype=np.float32).reshape(1, 1, 12, 1, 1) \
        * np.ones((1, 4, 12, 2, 2), np.float32)
    bank.add_generation(v, None, store_selectors=["a", "b", "c"])
    frames = sorted(float(e["video"][0, 0, 0, 0, 0])
                    for e in bank.entries.values())
    assert len(set(frames)) == 3          # distinct sampled frames


# ---------------------------------------------------------------------------
# handler loop
# ---------------------------------------------------------------------------

def test_joyai_handler_multi_window(monkeypatch):
    from wan2gp_tpu.families.ltx2 import LTX2FamilyHandler, _ARCH
    monkeypatch.setitem(
        _ARCH, "ltx2_22B",
        dict(num_layers=2, num_heads=2, head_dim=16, in_channels=8,
             out_channels=8, caption_dim=12, audio_num_heads=2,
             audio_head_dim=8, audio_in_channels=8,
             audio_out_channels=8, gated_attention=True,
             cross_attention_adaln=True))
    pipe = LTX2FamilyHandler.load_model("joyai_echo", {},
                                        init_random=True,
                                        attn_backend="xla")
    md = {"architecture": "joyai_echo"}
    prompt = ("[/duration=17,/store_mem=man1]A magician.\n\n"
              "[/duration=17,/load_mem=man1]Bows.")
    ctrl = (np.random.default_rng(0).random((20, 64, 64, 3)) * 255) \
        .astype(np.uint8)
    out = LTX2FamilyHandler.generate_video(
        pipe, {"prompt": prompt, "model_type": "joyai_echo",
               "_model_def": md, "_control_video": ctrl,
               "custom_settings":
                   {"joyai_control_memory_positions": "guide=0s"},
               "guidance_scale": 1.0}, 64, 64, 49, 0)
    v = np.asarray(out["video"])
    assert v.shape[2] == 4                 # 3 + 3 - 2 overlap-trim
    assert np.isfinite(v).all()
    assert any("man1" in l for l in out["memory_labels"])
    # memory conditioning changes the second window
    out2 = LTX2FamilyHandler.generate_video(
        pipe, {"prompt": ("[/duration=17]A magician.\n\n"
                          "[/duration=17,/load_mem=]Bows."),
               "model_type": "joyai_echo", "_model_def": md,
               "guidance_scale": 1.0}, 64, 64, 49, 0)
    assert not np.allclose(v[:, :, -2:],
                           np.asarray(out2["video"])[:, :, -2:])


def test_paired_tail_cross_mask():
    from wan2gp_tpu.models.ltx2.joyai_echo import (
        build_paired_tail_cross_mask, build_paired_av_masks)
    m = build_paired_tail_cross_mask(4, 6, 3, 8, 2,
                                     kv_seg_lengths=(5, 3))
    assert m.shape == (10, 11)
    assert m[:4, :3].all()               # target <-> target
    assert not m[:4, 3:].any()           # target x memory blocked
    assert not m[4:, :3].any()
    # slot 0: video rows 4..7 (6 tokens / 2 slots), audio cols 3..8
    assert m[4:7, 3:8].all() and not m[4:7, 8:].any()
    assert m[7:10, 8:11].all() and not m[7:10, 3:8].any()
    vm, am = build_paired_av_masks(4, 6, 3, 8, 2,
                                   audio_segment_lengths=(5, 3))
    np.testing.assert_array_equal(am, vm.T)


def test_paired_memory_masks_in_generate(monkeypatch):
    """With paired memory the a2v/v2a attention is masked; the output
    differs from the unmasked run on the same inputs."""
    from wan2gp_tpu.families.ltx2 import LTX2FamilyHandler, _ARCH
    monkeypatch.setitem(
        _ARCH, "ltx2_22B",
        dict(num_layers=2, num_heads=2, head_dim=16, in_channels=8,
             out_channels=8, caption_dim=12, audio_num_heads=2,
             audio_head_dim=8, audio_in_channels=8,
             audio_out_channels=8, gated_attention=True,
             cross_attention_adaln=True))
    pipe = LTX2FamilyHandler.load_model("joyai_echo", {},
                                        init_random=True,
                                        attn_backend="xla")
    rng = np.random.default_rng(0)
    ref_v = jnp.asarray(rng.normal(size=(1, 8, 2, 2, 2)), jnp.float32)
    ref_a = jnp.asarray(rng.normal(size=(1, 12, 8)), jnp.float32)
    kw = dict(latent_grid=(2, 2, 2), audio_tokens=6, seed=3,
              ref_video_latent=ref_v, ref_audio_tokens=ref_a)
    base = pipe.generate(prompt="x", **kw)
    paired = pipe.generate(prompt="x", paired_memory={
        "num_slots": 2, "audio_segment_lengths": (6, 6)}, **kw)
    a = np.asarray(base["video_latent"])
    b = np.asarray(paired["video_latent"])
    assert a.shape == b.shape
    assert not np.allclose(a, b)
    assert np.isfinite(b).all()
