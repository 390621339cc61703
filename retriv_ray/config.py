"""SparseConfig — the index/query configuration surface.

Mirrors the constructor surface of the reference SparseRetriever
(retriv/sparse_retriever/sparse_retriever.py:27-122): model, min_df,
tokenizer/stemmer/stopwords, the five normalization toggles, and the
BM25 hyperparams (defaults b=0.75, k1=1.2, sparse_retriever.py:122).

The config is pickled into every Ray actor/task that tokenizes or
scores, and a JSON-safe form of it is stored in the index manifest so
a loaded index reproduces the exact build-time pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Set, Union


@dataclass
class SparseConfig:
    model: str = "bm25"
    min_df: int = 1
    tokenizer: Union[str, Callable, None] = "whitespace"
    stemmer: Union[str, Callable, None] = "english"
    stopwords: Union[str, List[str], Set[str], None] = "english"
    do_lowercasing: bool = True
    do_ampersand_normalization: bool = True
    do_special_chars_normalization: bool = True
    do_acronyms_normalization: bool = True
    do_punctuation_removal: bool = True
    hyperparams: Optional[Dict[str, float]] = None
    # Engine-side extras (not part of the reference surface):
    # score_dtype "float32" replicates the reference numba kernels
    # bit-for-bit; "float64" matches SQL oracles (DuckDB math).
    score_dtype: str = "float32"
    # Block-max pruned scoring (score-safe WAND variant,
    # retriv_ray/search/pruned.py). Exact by construction. Default
    # OFF: when an actor's segment slice fits in RAM, cached decoded
    # postings + contribution vectors beat per-query block decoding
    # (measured 78 vs 28 q/s on a 1.65M-doc index). Enable for cold /
    # larger-than-RAM serving where decode cost dominates — the
    # 10^12-doc regime the block metadata exists for.
    use_block_max: bool = False

    def __post_init__(self) -> None:
        assert self.model.lower() in {"bm25", "tf-idf"}
        assert self.min_df > 0, "`min_df` must be greater than zero."
        self.model = self.model.lower()
        if self.hyperparams is None:
            self.hyperparams = dict(b=0.75, k1=1.2)

    def to_json(self) -> Dict[str, Any]:
        """JSON-safe form for the index manifest. Callables are
        recorded as "<custom>" — an index built with custom callables
        can only be queried by passing the same config object."""

        def enc(v):
            if callable(v):
                return "<custom>"
            if isinstance(v, set):
                return sorted(v)
            return v

        return {
            "model": self.model,
            "min_df": self.min_df,
            "tokenizer": enc(self.tokenizer),
            "stemmer": enc(self.stemmer),
            "stopwords": enc(self.stopwords),
            "do_lowercasing": self.do_lowercasing,
            "do_ampersand_normalization": self.do_ampersand_normalization,
            "do_special_chars_normalization": self.do_special_chars_normalization,
            "do_acronyms_normalization": self.do_acronyms_normalization,
            "do_punctuation_removal": self.do_punctuation_removal,
            "hyperparams": dict(self.hyperparams),
            "score_dtype": self.score_dtype,
            "use_block_max": self.use_block_max,
        }

    @classmethod
    def from_json(cls, d: Dict[str, Any]) -> "SparseConfig":
        d = dict(d)
        for k in ("tokenizer", "stemmer", "stopwords"):
            if d.get(k) == "<custom>":
                raise ValueError(
                    f"Index was built with a custom {k}; pass the same "
                    f"SparseConfig object instead of loading from the manifest."
                )
        return cls(**d)
