"""Conversation training-data ops (ops/conversations.py) vs brute
force: response-pair extraction and turn-window assembly."""

import pyarrow as pa
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


# -- conversation_filter ----------------------------------------------------


def _turns_table(convs):
    """convs: {conv_id: [(role, text), ...]}"""
    c, t, r, x = [], [], [], []
    for cid, turns in convs.items():
        for i, (role, text) in enumerate(turns):
            c.append(cid)
            t.append(i)
            r.append(role)
            x.append(text)
    return pa.table(
        {"conv_id": c, "turn_idx": pa.array(t, type=pa.int32()),
         "role": r, "text": x}
    )


@pytest.mark.parametrize("blocks", [1, 4])
def test_conversation_filter_rules(ray_session, blocks):
    import ray.data

    from retriv_ray.ops.conversations import conversation_filter

    convs = {
        1: [("user", "a b c"), ("assistant", "d e"), ("user", "f")],  # keep
        2: [("user", "one two")],                        # too few turns
        3: [("user", "a"), ("user", "b"), ("user", "c")],  # no assistant
        4: [("user", "x y"), ("assistant", "")],        # 2 turns, 2 tokens
        5: [("assistant", "a b c d"), ("user", "e f"), ("assistant", "g")],
    }
    ds = ray.data.from_arrow(_turns_table(convs)).repartition(blocks)
    out = (
        conversation_filter(
            ds, min_turns=2, max_turns=10, min_tokens=3,
            require_both_roles=True,
        )
        .to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    assert list(out["conv_id"]) == [1, 5]
    row1 = out[out.conv_id == 1].iloc[0]
    assert (row1.n_turns, row1.n_user_turns, row1.n_assistant_turns,
            row1.total_tokens) == (3, 2, 1, 6)


def test_conversation_filter_roles_optional(ray_session):
    import ray.data

    from retriv_ray.ops.conversations import conversation_filter

    convs = {7: [("user", "a b"), ("user", "c d")]}
    ds = ray.data.from_arrow(_turns_table(convs))
    out = conversation_filter(
        ds, min_turns=2, require_both_roles=False
    ).to_pandas()
    assert list(out["conv_id"]) == [7]


def test_sft_spans_offsets_and_mask(ray_session):
    """Prefix-sum offsets restart per conversation; empty turns span
    zero tokens; learn flags assistant turns only."""
    import ray.data

    from retriv_ray.ops.conversations import sft_spans

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello there"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hi"},
        {"conv_id": "c1", "turn_idx": 2, "role": "user", "text": "   "},
        {"conv_id": "c1", "turn_idx": 3, "role": "assistant", "text": "a b c"},
        {"conv_id": "c2", "turn_idx": 0, "role": "assistant", "text": "solo"},
    ]
    ds = ray.data.from_items(rows).repartition(3)
    out = sft_spans(ds).to_pandas()
    c1 = out[out.conv_id == "c1"]
    assert list(c1["n_tokens"]) == [2, 1, 0, 3]
    assert list(c1["tok_start"]) == [0, 2, 3, 3]
    assert list(c1["tok_end"]) == [2, 3, 3, 6]
    assert list(c1["learn"]) == [0, 1, 0, 1]
    c2 = out[out.conv_id == "c2"]
    assert list(c2["tok_start"]) == [0] and list(c2["learn"]) == [1]
