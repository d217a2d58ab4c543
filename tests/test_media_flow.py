"""Media Flow tests (reference plugins/media_flow/: frame planning,
timed prompt schedules, chunked execution with crash resume)."""
import numpy as np
import pytest

from wan2gp_tpu.runtime.media_flow import (
    parse_time_input, parse_prompt_schedule, resolve_prompt_for_chunk,
    align_requested_frames, plan_chunks, MediaFlowRunner)


def test_parse_time_input():
    assert parse_time_input(12) == 12.0
    assert parse_time_input("3.5") == 3.5
    assert parse_time_input("01:30") == 90.0
    assert parse_time_input("1:02:03.5") == 3723.5
    assert parse_time_input("", allow_empty=True) is None
    with pytest.raises(ValueError):
        parse_time_input("1:2:3:4")


def test_prompt_schedule_plain_text():
    assert parse_prompt_schedule("a calm shot") == [(0.0,
                                                     "a calm shot")]
    assert parse_prompt_schedule("") == [(0.0, "")]


def test_prompt_schedule_timed():
    text = "00:00\nopening\n\n00:30\ntense mood"
    sched = parse_prompt_schedule(text)
    assert sched == [(0.0, "opening"), (30.0, "tense mood")]
    assert resolve_prompt_for_chunk(sched, 0.0) == "opening"
    assert resolve_prompt_for_chunk(sched, 29.9) == "opening"
    assert resolve_prompt_for_chunk(sched, 30.0) == "tense mood"
    with pytest.raises(ValueError):
        parse_prompt_schedule("00:00\nx\n\nnot-a-time\ny")


def test_align_requested_frames():
    assert align_requested_frames(81, 4) == 81      # 4k+1 stays
    assert align_requested_frames(80, 4) == 81      # rounds up
    assert align_requested_frames(80, 4, round_up=False) == 77
    assert align_requested_frames(1, 4) == 1


def test_plan_chunks_cover_and_overlap():
    plans = plan_chunks(100, fps=16, chunk_seconds=2.0,
                        overlap_frames=4, frame_step=4)
    assert plans[0].start_frame == 0 and plans[0].overlap == 0
    # chunks after the first start `overlap` frames before the cursor
    for a, b in zip(plans, plans[1:]):
        assert b.start_frame == a.start_frame + a.frames - b.overlap
        assert b.overlap == 4
    assert plans[-1].start_frame + plans[-1].frames >= 97  # 4k+1 tail
    # frame counts are step-aligned
    for p in plans:
        assert p.frames == 1 or (p.frames - 1) % 4 == 0
    with pytest.raises(ValueError):
        plan_chunks(10, 16, 0.01)


def test_runner_end_to_end(tmp_path):
    video = np.random.default_rng(0).integers(
        0, 255, (40, 8, 8, 3)).astype(np.uint8)
    calls = []

    def proc(frames, prompt, i):
        calls.append((i, prompt, frames.shape[0]))
        return 255 - frames                 # invert

    runner = MediaFlowRunner(proc, str(tmp_path / "s1"))
    out = runner.run(video, fps=16, chunk_seconds=1.0,
                     overlap_frames=4,
                     prompt_text="00:00\nfirst\n\n00:01\nsecond")
    assert out.shape[0] == video.shape[0]
    assert calls[0][1] == "first"
    assert any(p == "second" for _, p, _ in calls)
    # non-overlap regions are exactly the processed frames
    np.testing.assert_array_equal(out[:4], 255 - video[:4])


def test_runner_resume(tmp_path):
    video = np.zeros((30, 4, 4, 3), np.uint8)
    count = {"n": 0}

    def flaky(frames, prompt, i):
        count["n"] += 1
        if count["n"] == 2:
            raise RuntimeError("crash")
        return frames + 1

    runner = MediaFlowRunner(flaky, str(tmp_path / "s2"))
    with pytest.raises(RuntimeError):
        runner.run(video, fps=16, chunk_seconds=0.6,
                   overlap_frames=0)
    first_calls = count["n"]

    def ok(frames, prompt, i):
        count["n"] += 1
        return frames + 1

    runner2 = MediaFlowRunner(ok, str(tmp_path / "s2"))
    out = runner2.run(video, fps=16, chunk_seconds=0.6,
                      overlap_frames=0)
    # chunk 0 was recovered from the session, not re-processed
    total_chunks = len(out) and count["n"]
    assert out.shape[0] == 30
    assert count["n"] < first_calls + 10
    state_calls = count["n"] - first_calls
    assert state_calls >= 1
    runner2.clear_session()
    import os
    assert not os.path.exists(
        str(tmp_path / "s2" / "media_flow_state.json"))


def test_runner_frame_mismatch_reconciled(tmp_path):
    video = np.zeros((20, 4, 4, 3), np.uint8)

    def short(frames, prompt, i):
        return frames[:-2] if frames.shape[0] > 2 else frames

    runner = MediaFlowRunner(short, str(tmp_path / "s3"))
    out = runner.run(video, fps=16, chunk_seconds=0.8,
                     overlap_frames=0)
    assert out.shape[0] == 20
