"""Conversation training-data ops (ops/conversations.py) vs brute
force: response-pair extraction and turn-window assembly."""

import pytest

from retriv_ray.ops.conversations import conversation_windows, response_pairs

TURNS = [
    # conv, turn, role, text
    ("c1", 0, "user", "u10"),
    ("c1", 1, "assistant", "a11"),
    ("c1", 2, "assistant", "a12"),  # same prompt as a11
    ("c1", 3, "user", "u13"),
    ("c1", 4, "user", "u14"),  # supersedes u13
    ("c1", 5, "assistant", "a15"),
    ("c2", 0, "assistant", "a20"),  # no preceding user -> dropped
    ("c2", 1, "user", "u21"),
    ("c2", 2, "assistant", "a22"),
    ("c3", 0, "user", "u30"),  # no assistant at all
]


@pytest.fixture(scope="module")
def turns_ds(ray_session):
    import ray.data

    return ray.data.from_items(
        [
            {"conv_id": c, "turn_idx": t, "role": r, "text": x}
            for c, t, r, x in TURNS
        ]
    )


def test_response_pairs_brute(turns_ds):
    got = sorted(
        (
            r["conv_id"],
            r["user_turn_idx"],
            r["assistant_turn_idx"],
            r["user_text"],
            r["assistant_text"],
        )
        for r in response_pairs(turns_ds).take_all()
    )
    assert got == [
        ("c1", 0, 1, "u10", "a11"),
        ("c1", 0, 2, "u10", "a12"),
        ("c1", 4, 5, "u14", "a15"),
        ("c2", 1, 2, "u21", "a22"),
    ]


def test_conversation_windows_brute(turns_ds):
    got = sorted(
        (
            r["conv_id"],
            r["window_idx"],
            r["start_turn_idx"],
            r["n_in_window"],
            r["text"],
        )
        for r in conversation_windows(
            turns_ds, n_turns=3, stride=2
        ).take_all()
    )
    assert got == [
        ("c1", 0, 0, 3, "u10\na11\na12"),
        ("c1", 1, 2, 3, "a12\nu13\nu14"),
        ("c2", 0, 0, 3, "a20\nu21\na22"),
        ("c3", 0, 0, 1, "u30"),  # keep_short whole-conv window
    ]


def test_conversation_windows_drop_short(turns_ds):
    got = conversation_windows(
        turns_ds, n_turns=3, stride=2, keep_short=False
    ).take_all()
    assert sorted({r["conv_id"] for r in got}) == ["c1", "c2"]


def test_conversation_windows_validates(turns_ds):
    with pytest.raises(ValueError):
        conversation_windows(turns_ds, n_turns=0)
