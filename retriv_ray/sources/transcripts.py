"""Deterministic synthetic transcript tables — the canonical input.

Schema (BASELINE.json input_hint / FIXTURES.md F1):

    conv_id:  string        zero-padded -> lexical order == numeric order
    turn_idx: int32         0-based, contiguous within conv_id
    role:     string        {"user","assistant"}
    text:     string        the only indexed field
    tool:     string        tool name or ""
    ts:       timestamp[us] monotone within conv_id

Generation is **per-conversation deterministic**: every value depends
only on ``(seed, conv_id)`` (each conversation gets its own
``np.random.default_rng([seed, conv])`` stream), so the same table
comes out regardless of batch split, parallelism, or call pattern —
the property the determinism tests rely on.

The token distribution is Zipf-ish with a deliberately hot head
(including true English stopwords, so stopword removal and hot-term
skew are both exercised), a stemmable mid-section, and rare tail
terms; a fraction of turns carries the normalizer edge cases from the
reference test-suite (``&``, acronyms ``a.b.c.``, curly quotes, mixed
case, punctuation — reference
retriv/sparse_retriever/preprocessing/normalization.py:7-41).
"""

from __future__ import annotations

import itertools
from typing import List

import numpy as np
import pyarrow as pa

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_EPOCH_US = np.int64(1704067200_000_000)  # 2024-01-01T00:00:00Z

# Vocabulary: hot head (stopwords + agent-transcript boilerplate),
# stemmable middle, long tail. Probabilities ~ 1/rank (Zipf s=1).
_HOT = (
    "the of and to a in is it you that was for on are with as this file "
    "error run test code line function the the and".split()
)
_MID = (
    "running jumped connection informational deployment searching "
    "analyzer processing distributed batches shuffling partition "
    "retrieval ranking scoring indexing tokenizer stemming quickly "
    "happily nationalize optimization configuration arguments".split()
)
_QUIRKS = [
    "A&B systems",
    "the u.s.a. report",
    "‘quoted’ “values”",
    "e.g. i.e. etc.",
    "foo.bar(x, y)",
    "CamelCase MixedUP",
    "semi;colons, commas!! and?? marks",
    "trailing.dots.",
]
_TOOLS = ["", "", "", "search", "python", "browser", "editor"]


def _vocab(rng_tail_size: int = 400) -> tuple[List[str], np.ndarray]:
    tail = [f"tok{i:04d}" for i in range(rng_tail_size)]
    vocab = _HOT + _MID + tail
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = 1.0 / ranks
    return vocab, p / p.sum()


_VOCAB, _P = _vocab()
_VOCAB_ARR = np.asarray(_VOCAB, dtype=object)

# "heavy" profile: realistic transcript shape — bigger vocabulary,
# role-dependent turn lengths (short user asks, long assistant
# answers, occasional tool dumps). Used by the bench harness so that
# compute, not fixed pipeline overhead, dominates the measured build.
_VOCAB_HEAVY, _P_HEAVY = _vocab(rng_tail_size=5000)
_VOCAB_HEAVY_ARR = np.asarray(_VOCAB_HEAVY, dtype=object)
_CUM_P_HEAVY = np.cumsum(_P_HEAVY)


def _conv_turns_heavy(conv: int, seed: int) -> dict:
    rng = np.random.default_rng([seed, conv, 7])
    n_turns = int(rng.integers(2, 21))
    conv_id = f"c{conv:09d}"
    roles = ["user" if t % 2 == 0 else "assistant" for t in range(n_turns)]
    n_tok = np.where(
        np.arange(n_turns) % 2 == 0,
        rng.integers(4, 40, size=n_turns),
        rng.integers(20, 200, size=n_turns),
    )
    # ~10% of assistant turns carry a big tool dump
    dump = (np.arange(n_turns) % 2 == 1) & (rng.random(n_turns) < 0.10)
    n_tok = np.where(dump, rng.integers(200, 600, size=n_turns), n_tok)
    total = int(n_tok.sum())
    # vectorized Zipf draw: inverse-CDF via searchsorted (≫ rng.choice)
    codes = np.searchsorted(_CUM_P_HEAVY, rng.random(total), side="right")
    words = _VOCAB_HEAVY_ARR[codes]
    bounds = np.cumsum(n_tok)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(words, bounds)]
    tools = [
        str(rng.choice(_TOOLS)) if roles[t] == "assistant" else ""
        for t in range(n_turns)
    ]
    ts = _EPOCH_US + np.int64(conv) * 3_600_000_000 + np.arange(n_turns, dtype=np.int64) * 30_000_000
    return {
        "conv_id": [conv_id] * n_turns,
        "turn_idx": np.arange(n_turns, dtype=np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    }


def conv_turns_table(conv: int, seed: int) -> dict:
    """All turns of one conversation as plain python/np columns."""
    rng = np.random.default_rng([seed, conv])
    n_turns = int(rng.integers(1, 13))
    conv_id = f"c{conv:09d}"
    texts = []
    for t in range(n_turns):
        n_tok = int(rng.integers(3, 40))
        toks = list(rng.choice(_VOCAB_ARR, size=n_tok, p=_P))
        if rng.random() < 0.15:
            toks.insert(int(rng.integers(0, len(toks))), str(rng.choice(_QUIRKS)))
        if rng.random() < 0.1:
            toks = [tok.upper() if rng.random() < 0.3 else tok for tok in toks]
        if rng.random() < 0.2:
            punct = str(rng.choice(list(".,;:!?")))
            toks = [tok + punct if rng.random() < 0.2 else tok for tok in toks]
        texts.append(" ".join(toks))
    roles = ["user" if t % 2 == 0 else "assistant" for t in range(n_turns)]
    tools = [
        str(rng.choice(_TOOLS)) if roles[t] == "assistant" else ""
        for t in range(n_turns)
    ]
    ts = _EPOCH_US + np.int64(conv) * 3_600_000_000 + np.arange(n_turns, dtype=np.int64) * 30_000_000
    return {
        "conv_id": [conv_id] * n_turns,
        "turn_idx": np.arange(n_turns, dtype=np.int32),
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": ts,
    }


def _convs_to_table(convs: np.ndarray, seed: int, profile: str = "light") -> pa.Table:
    gen = _conv_turns_heavy if profile == "heavy" else conv_turns_table
    cols = {name: [] for name in SCHEMA.names}
    for conv in convs:
        part = gen(int(conv), seed)
        for name in SCHEMA.names:
            cols[name].append(part[name])
    arrays = []
    for name, typ in zip(SCHEMA.names, SCHEMA.types):
        if name in ("turn_idx", "ts"):
            flat = np.concatenate(cols[name])
        else:
            flat = list(itertools.chain.from_iterable(cols[name]))
        if name == "ts":
            arrays.append(pa.array(flat, type=pa.timestamp("us")))
        else:
            arrays.append(pa.array(flat, type=typ))
    return pa.Table.from_arrays(arrays, schema=SCHEMA)


def transcripts_table(n_convs: int, seed: int = 42, profile: str = "light") -> pa.Table:
    """Local (no Ray) generator — same bytes as the Dataset path."""
    return _convs_to_table(np.arange(n_convs), seed, profile)


def make_transcripts_dataset(
    n_convs: int, seed: int = 42, parallelism: int = -1, profile: str = "light"
):
    """Distributed generator: ``ray.data.range(n_convs)`` ->
    ``map_batches`` where each batch expands its conv ids into turns.
    Content is identical to :func:`transcripts_table` for any
    parallelism (per-conv RNG streams)."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        return _convs_to_table(batch.column("id").to_numpy(), seed, profile)

    ds = ray.data.range(n_convs, override_num_blocks=parallelism if parallelism > 0 else None)
    return ds.map_batches(gen, batch_format="pyarrow")


def write_transcripts(
    path: str, n_convs: int, seed: int = 42, parallelism: int = -1,
    profile: str = "light",
) -> None:
    make_transcripts_dataset(n_convs, seed, parallelism, profile).write_parquet(path)


def shane_transcripts() -> pa.Table:
    """FIXTURES.md F2: the reference golden BM25 collection
    (tests/sparse_retriever/search_engine_test.py:12-20) mapped into
    the transcript schema, one turn per doc, enumeration order ==
    (conv_id, turn_idx) order."""
    docs = [
        "Shane",
        "Shane C",
        "Shane P Connelly",
        "Shane Connelly",
        "Shane Shane Connelly Connelly",
        "Shane Shane Shane Connelly Connelly Connelly",
    ]
    n = len(docs)
    return pa.Table.from_arrays(
        [
            pa.array([f"c{i + 1}" for i in range(n)]),
            pa.array(np.zeros(n, dtype=np.int32)),
            pa.array(["user"] * n),
            pa.array(docs),
            pa.array([""] * n),
            pa.array(_EPOCH_US + np.arange(n, dtype=np.int64), type=pa.timestamp("us")),
        ],
        schema=SCHEMA,
    )
