"""The per-turn preprocessing chain — exact reference semantics.

Reference: retriv/sparse_retriever/preprocessing/__init__.py:31-63
(single) and :66-110 (the Multipipe process-pool variant; our
parallelism comes from Ray ``map_batches`` instead, so only the
single-composition order matters).

Order of operations (must be replicated verbatim for score parity):
  lowercase -> '&'->' and ' -> special-chars -> acronyms
  -> [whitespace tokenizer only: remove punctuation + collapse spaces]
  -> tokenize
  -> [non-whitespace tokenizer: per-token punctuation removal, drop '']
  -> stop-word filter -> stem

Two deliberate reference quirks are preserved:
- The stop-word list is STEMMED once at construction, but tokens are
  filtered BEFORE stemming (reference sparse_retriever.py:98 +
  preprocessing/__init__.py:61-63): e.g. "during" stems to "dure", so
  the stopword entry becomes "dure" and the literal token "during" is
  NOT removed.
- ``normalize_diacritics`` exists in the reference but is not wired
  into the chain (normalization.py:15-16); same here.

``TextPreprocessor`` is the stateful per-actor form: the stemmer memo
dict persists across batches (Zipfian vocab -> high hit rate), which
keeps the per-token Python cost to one dict lookup in the hot path.
"""

from __future__ import annotations

from typing import Callable, List

from retriv_ray.config import SparseConfig
from retriv_ray.text.normalization import (
    lowercasing,
    normalize_acronyms,
    normalize_ampersand,
    normalize_special_chars,
    remove_punctuation,
    strip_whitespaces,
)
from retriv_ray.text.stemmer import get_stemmer
from retriv_ray.text.stopwords import get_stopwords
from retriv_ray.text.tokenizer import get_tokenizer, is_whitespace

_SENTINEL = object()  # stem_or_none_many miss marker (None is a value)


def preprocessing(
    x: str,
    tokenizer: Callable,
    stopwords,
    stemmer: Callable,
    do_lowercasing: bool,
    do_ampersand_normalization: bool,
    do_special_chars_normalization: bool,
    do_acronyms_normalization: bool,
    do_punctuation_removal: bool,
) -> List[str]:
    """Single-string chain, reference preprocessing/__init__.py:31-63.

    ``stopwords`` here is the ALREADY-STEMMED collection (the caller
    replicates reference sparse_retriever.py:98).
    """
    if do_lowercasing:
        x = lowercasing(x)
    if do_ampersand_normalization:
        x = normalize_ampersand(x)
    if do_special_chars_normalization:
        x = normalize_special_chars(x)
    if do_acronyms_normalization:
        x = normalize_acronyms(x)

    ws = is_whitespace(tokenizer)
    if ws and do_punctuation_removal:
        x = remove_punctuation(x)
        x = strip_whitespaces(x)

    x = tokenizer(x)

    if not ws and do_punctuation_removal:
        x = [remove_punctuation(t) for t in x]
        x = [t for t in x if t]

    x = [t for t in x if t not in stopwords]

    return [stemmer(t) for t in x]


class TextPreprocessor:
    """Resolved, stateful form of the chain for use inside Ray stages.

    Construct once per actor (or once per task closure); call
    ``tokens(text)`` per turn or ``tokens_many(list)`` per batch.
    """

    def __init__(self, cfg: SparseConfig):
        self.cfg = cfg
        self.tokenizer = get_tokenizer(cfg.tokenizer)
        self._stem = get_stemmer(cfg.stemmer)
        # reference sparse_retriever.py:98 — the quirk: stem the list,
        # filter unstemmed tokens against it.
        self.stopwords = frozenset(
            self._stem(sw) for sw in get_stopwords(cfg.stopwords)
        )
        self._ws = is_whitespace(self.tokenizer)
        self._memo: dict = {}
        self._memo_or_none: dict = {}

    def tokens(self, x: str) -> List[str]:
        cfg = self.cfg
        if cfg.do_lowercasing:
            x = x.lower()
        if cfg.do_ampersand_normalization and "&" in x:
            x = x.replace("&", " and ")
        if cfg.do_special_chars_normalization:
            x = normalize_special_chars(x)
        if cfg.do_acronyms_normalization and "." in x:
            x = normalize_acronyms(x)

        if self._ws and cfg.do_punctuation_removal:
            x = remove_punctuation(x)
            # strip_whitespaces collapses runs of spaces; str.split()
            # below is insensitive to them, so the only observable
            # effect is none — but keep parity with the reference
            # chain, which applies it (preprocessing/__init__.py:48-49).
            toks = x.split()
        else:
            toks = self.tokenizer(x)
            if cfg.do_punctuation_removal:
                toks = [remove_punctuation(t) for t in toks]
                toks = [t for t in toks if t]

        sw = self.stopwords
        memo = self._memo
        stem = self._stem
        out = []
        for t in toks:
            if t in sw:
                continue
            s = memo.get(t)
            if s is None:
                s = stem(t)
                memo[t] = s
            out.append(s)
        return out

    def tokens_many(self, texts) -> List[List[str]]:
        f = self.tokens
        return [f(t) for t in texts]

    def raw_tokens(self, x: str) -> List[str]:
        """The chain UP TO tokenization + per-token punctuation (i.e.
        everything before the stopword filter and stemmer). Feed the
        unique raw tokens to :meth:`stem_or_none_many` — splitting the
        chain here lets batch callers run the Python-per-token tail
        over a batch's *unique* tokens (Zipf: ~2% of the flat count)
        instead of every token occurrence."""
        cfg = self.cfg
        if cfg.do_lowercasing:
            x = x.lower()
        if cfg.do_ampersand_normalization and "&" in x:
            x = x.replace("&", " and ")
        if cfg.do_special_chars_normalization:
            x = normalize_special_chars(x)
        if cfg.do_acronyms_normalization and "." in x:
            x = normalize_acronyms(x)
        if self._ws and cfg.do_punctuation_removal:
            return remove_punctuation(x).split()
        toks = self.tokenizer(x)
        if not self._ws and cfg.do_punctuation_removal:
            toks = [remove_punctuation(t) for t in toks]
            toks = [t for t in toks if t]
        return toks

    def raw_tokens_many(self, texts) -> List[List[str]]:
        f = self.raw_tokens
        return [f(t) for t in texts]

    @property
    def arrow_splittable(self) -> bool:
        """True when tokenization is plain whitespace split — callers
        may then split with ``pc.utf8_split_whitespace`` over an Arrow
        array of :meth:`normalized` strings (verified identical
        whitespace class; Arrow's leading/trailing/empty artifacts map
        to empty-string tokens, which :meth:`stem_or_none_many` drops
        the way ``str.split`` never emits them)."""
        return self._ws

    def normalized(self, x: str) -> str:
        """The string-level chain only (everything before the split),
        for the whitespace-tokenizer path: lower, ampersand, special
        chars, acronyms, punctuation. Feed to an Arrow-side whitespace
        split so token strings never materialize as Python objects."""
        cfg = self.cfg
        if cfg.do_lowercasing:
            x = x.lower()
        if cfg.do_ampersand_normalization and "&" in x:
            x = x.replace("&", " and ")
        if cfg.do_special_chars_normalization:
            x = normalize_special_chars(x)
        if cfg.do_acronyms_normalization and "." in x:
            x = normalize_acronyms(x)
        if cfg.do_punctuation_removal:
            x = remove_punctuation(x)
        return x

    def stem_or_none_many(self, raw_tokens) -> List:
        """Finish the chain for a list of (unique) raw tokens: None for
        stopwords (reference filters the UNSTEMMED token against the
        stemmed stopword list — the M12 quirk), else the stemmed term.
        Memoized per worker in a dict separate from the tokens() memo
        (that one never holds stopword entries)."""
        sw = self.stopwords
        memo = self._memo_or_none
        stem = self._stem
        out = []
        _MISS = _SENTINEL
        for t in raw_tokens:
            s = memo.get(t, _MISS)
            if s is _MISS:
                # "" = Arrow-split artifact (str.split never emits it)
                s = None if not t or t in sw else stem(t)
                memo[t] = s
            out.append(s)
        return out
