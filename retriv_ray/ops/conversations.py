"""Conversation / transcript training-data operators.

The engine's canonical input is multi-turn transcripts (conv_id,
turn_idx, role, text, ...). These operators produce the two shapes an
LLM training pipeline derives from them most often:

- :func:`response_pairs` — (user prompt, assistant response) pairs:
  every assistant turn joined to the LATEST user turn before it (the
  instruction-tuning extraction; assistant turns with no preceding
  user turn drop, runs of assistant turns all share the same prompt).
- :func:`conversation_windows` — overlapping fixed-size windows of
  consecutive turns per conversation (context assembly for
  long-context training; stride controls overlap).

Both are ONE conv-keyed shuffle (`groupby(conv).map_groups`) with all
per-group work vectorized; group size is bounded by conversation
length, which for transcripts is naturally capped (no key salting
needed — contrast sessionize's unbounded per-user event streams).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa


def response_pairs(
    ds,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
):
    """(conv_id, user_turn_idx, assistant_turn_idx, user_text,
    assistant_text) — one row per assistant turn that has at least one
    user turn before it in the same conversation; the latest such user
    turn supplies the prompt."""
    conv_type = dict(
        zip(ds.schema().names, ds.schema().types)
    )[conv_col]
    out_schema = pa.schema(
        [
            (conv_col, conv_type),
            ("user_turn_idx", pa.int64()),
            ("assistant_turn_idx", pa.int64()),
            ("user_text", pa.string()),
            ("assistant_text", pa.string()),
        ]
    )

    def pairs(group: pa.Table) -> pa.Table:
        ti = group.column(turn_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(ti, kind="stable")
        ti = ti[order]
        roles = np.asarray(
            group.column(role_col).to_pylist(), dtype=object
        )[order]
        texts = np.asarray(
            group.column(text_col).to_pylist(), dtype=object
        )[order]
        n = len(ti)
        pos = np.arange(n, dtype=np.int64)
        user_pos = np.where(roles == user_role, pos, -1)
        last_user = np.concatenate(
            ([np.int64(-1)], np.maximum.accumulate(user_pos)[:-1])
        )
        take = np.flatnonzero((roles == assistant_role) & (last_user >= 0))
        lu = last_user[take]
        conv_val = group.column(conv_col)[0]
        return pa.Table.from_arrays(
            [
                pa.array([conv_val.as_py()] * len(take), type=conv_type),
                pa.array(ti[lu]),
                pa.array(ti[take]),
                pa.array(texts[lu], type=pa.string()),
                pa.array(texts[take], type=pa.string()),
            ],
            names=out_schema.names,
        )

    return ds.groupby(conv_col).map_groups(pairs, batch_format="pyarrow")


def conversation_windows(
    ds,
    n_turns: int = 4,
    stride: int = 2,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
    keep_short: bool = True,
):
    """Overlapping windows of ``n_turns`` consecutive turns per
    conversation at starts 0, stride, 2*stride, ... (full windows
    only); a conversation with fewer than ``n_turns`` turns emits one
    whole-conversation window when ``keep_short``. Returns (conv_id,
    window_idx, start_turn_idx, n_in_window, text) with turns joined
    by ``sep`` in turn order."""
    if n_turns < 1 or stride < 1:
        raise ValueError("n_turns and stride must be >= 1")
    conv_type = dict(
        zip(ds.schema().names, ds.schema().types)
    )[conv_col]

    def windows(group: pa.Table) -> pa.Table:
        ti = group.column(turn_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(ti, kind="stable")
        ti = ti[order]
        texts = [
            t or ""
            for t in np.asarray(
                group.column(text_col).to_pylist(), dtype=object
            )[order]
        ]
        n = len(ti)
        w_idx: List[int] = []
        starts: List[int] = []
        counts: List[int] = []
        joined: List[str] = []
        if n < n_turns:
            if keep_short and n:
                w_idx, starts, counts = [0], [int(ti[0])], [n]
                joined = [sep.join(texts)]
        else:
            for k, s in enumerate(range(0, n - n_turns + 1, stride)):
                w_idx.append(k)
                starts.append(int(ti[s]))
                counts.append(n_turns)
                joined.append(sep.join(texts[s : s + n_turns]))
        conv_val = group.column(conv_col)[0].as_py()
        return pa.Table.from_arrays(
            [
                pa.array([conv_val] * len(w_idx), type=conv_type),
                pa.array(np.asarray(w_idx, dtype=np.int64)),
                pa.array(np.asarray(starts, dtype=np.int64)),
                pa.array(np.asarray(counts, dtype=np.int64)),
                pa.array(joined, type=pa.string()),
            ],
            names=[
                conv_col,
                "window_idx",
                "start_turn_idx",
                "n_in_window",
                "text",
            ],
        )

    return ds.groupby(conv_col).map_groups(windows, batch_format="pyarrow")


def conversation_filter(
    ds,
    min_turns: int = 2,
    max_turns: int = 10_000,
    min_tokens: int = 1,
    max_tokens: int = 1 << 30,
    require_both_roles: bool = True,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
):
    """Conversation-level quality gate for transcript corpora (the
    dialog analogue of the Gopher document rules): keep conversations
    with ``min_turns <= n_turns <= max_turns``, whitespace-token total
    within ``[min_tokens, max_tokens]``, and — when
    ``require_both_roles`` — at least one 'user' AND one 'assistant'
    turn. Returns (conv_id, n_turns, n_user_turns, n_assistant_turns,
    total_tokens) for the kept conversations; every emitted column is
    an integer count, so the op is bit-exact under any partitioning
    and SQL-checkable.

    Shuffle shape: a per-batch combiner reduces each block to one
    partial-count row per conversation present (5 ints), then one
    tiny groupby(conv).sum + filter — the corpus text never moves.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        conv = batch.column(conv_col)
        role = batch.column(role_col)
        ntok = pc.cast(
            pc.count_substring_regex(
                pc.cast(batch.column(text_col), pa.string()), pattern=r"\S+"
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        enc = conv.combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        is_user = pc.equal(role, "user").to_numpy(zero_copy_only=False)
        is_asst = pc.equal(role, "assistant").to_numpy(zero_copy_only=False)
        k = len(enc.dictionary)
        turns = np.bincount(codes, minlength=k)
        users = np.bincount(codes, weights=is_user, minlength=k)
        assts = np.bincount(codes, weights=is_asst, minlength=k)
        toks = np.bincount(codes, weights=ntok, minlength=k)
        return pa.Table.from_arrays(
            [
                enc.dictionary,
                pa.array(turns.astype(np.int64)),
                pa.array(users.astype(np.int64)),
                pa.array(assts.astype(np.int64)),
                pa.array(toks.astype(np.int64)),
            ],
            names=[conv_col, "n_turns", "n_user", "n_asst", "n_tok"],
        )

    agg = (
        ds.select_columns([conv_col, role_col, text_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(conv_col)
        .aggregate(
            Sum("n_turns", alias_name="n_turns"),
            Sum("n_user", alias_name="n_user_turns"),
            Sum("n_asst", alias_name="n_assistant_turns"),
            Sum("n_tok", alias_name="total_tokens"),
        )
    )

    def keep(batch: pa.Table) -> pa.Table:
        t = batch.column("n_turns").to_numpy()
        u = batch.column("n_user_turns").to_numpy()
        a = batch.column("n_assistant_turns").to_numpy()
        k_ = batch.column("total_tokens").to_numpy()
        m = (
            (t >= min_turns)
            & (t <= max_turns)
            & (k_ >= min_tokens)
            & (k_ <= max_tokens)
        )
        if require_both_roles:
            m &= (u > 0) & (a > 0)
        return batch.filter(pa.array(m))

    return agg.map_batches(keep, batch_format="pyarrow")


def sft_spans(
    ds,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    assistant_role: str = "assistant",
):
    """SFT loss-mask annotation: for each turn, its whitespace-token
    span [tok_start, tok_end) inside the conversation's concatenated
    token stream (turns in ``turn_idx`` order), plus ``learn`` = 1 on
    assistant turns — the spans a supervised-fine-tuning loader feeds
    to the loss mask, computed once at prep time instead of inside
    every trainer worker.

    One conv-keyed shuffle (``groupby(conv).map_groups``), per-group
    prefix sums fully vectorized; group size is bounded by
    conversation length. Returns (conv_id, turn_idx, role, n_tokens,
    tok_start, tok_end, learn) sorted by (conv_id, turn_idx).
    """
    conv_type = dict(zip(ds.schema().names, ds.schema().types))[conv_col]
    out_schema = pa.schema(
        [
            (conv_col, conv_type),
            (turn_col, pa.int64()),
            (role_col, pa.string()),
            ("n_tokens", pa.int64()),
            ("tok_start", pa.int64()),
            ("tok_end", pa.int64()),
            ("learn", pa.int64()),
        ]
    )

    def spans(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tix = group.column(turn_col).to_numpy(zero_copy_only=False)
        order = np.argsort(tix, kind="stable")
        group = group.take(pa.array(order))
        text = pc.cast(group.column(text_col), pa.string())
        n = pc.list_value_length(
            pc.split_pattern_regex(
                pc.utf8_trim_whitespace(pc.fill_null(text, "")), r"\s+"
            )
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        # an all-whitespace/empty turn has 0 tokens, but split gives [""]
        empty = pc.equal(
            pc.utf8_trim_whitespace(pc.fill_null(text, "")), ""
        ).to_numpy(zero_copy_only=False)
        n[empty] = 0
        cum = np.cumsum(n)
        start = cum - n
        role = group.column(role_col)
        learn = pc.cast(
            pc.equal(pc.cast(role, pa.string()), assistant_role), pa.int64()
        )
        return pa.Table.from_arrays(
            [
                group.column(conv_col),
                pc.cast(group.column(turn_col), pa.int64()),
                pc.cast(role, pa.string()),
                pa.array(n),
                pa.array(start),
                pa.array(cum),
                learn,
            ],
            names=out_schema.names,
        )

    return (
        ds.groupby(conv_col)
        .map_groups(spans, batch_format="pyarrow")
        .sort([conv_col, turn_col])
    )
