"""Stop-word lists.

The reference resolves ``stopwords="english"`` to NLTK's english
corpus list (reference retriv/sparse_retriever/preprocessing/
stopwords.py:38-43); that 179-word list is public and embedded here
verbatim so no corpus download is needed. Other languages are accepted
only as explicit user-provided lists/sets (reference supports 29 NLTK
languages; shipping every list is out of scope for v1 — pass your own).

Thirteen non-english languages (de/fr/es/it/pt/ru plus
da/no/sv/nl/fi/hu/ro) ship via
:mod:`retriv_ray.text.stopword_lists` (Snowball project lists and the
standard public Romanian function-word list). Remaining reference
languages are accepted only as explicit user-provided lists/sets.

``get_stopwords`` mirrors reference stopwords.py:46-56: str -> named
list, list/set -> as given, None -> [].
"""

from __future__ import annotations

from typing import List, Set, Union

from retriv_ray.text.stopword_lists import HINGLISH_HINDI as _HINGLISH_HINDI
from retriv_ray.text.stopword_lists import LISTS as _EXTRA_LISTS

ENGLISH = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few",
    "more", "most", "other", "some", "such", "no", "nor", "not",
    "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've",
    "now", "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren",
    "aren't", "couldn", "couldn't", "didn", "didn't", "doesn",
    "doesn't", "hadn", "hadn't", "hasn", "hasn't", "haven", "haven't",
    "isn", "isn't", "ma", "mightn", "mightn't", "mustn", "mustn't",
    "needn", "needn't", "shan", "shan't", "shouldn", "shouldn't",
    "wasn", "wasn't", "weren", "weren't", "won", "won't", "wouldn",
    "wouldn't",
]

_NAMED = {"english": ENGLISH, **_EXTRA_LISTS}

# NLTK's "hinglish" corpus is the english list plus romanized Hindi
# function words (reference stopwords.py:20 names it alongside the
# monolingual lists); compose it the same way.
_NAMED["hinglish"] = list(dict.fromkeys(ENGLISH + _HINGLISH_HINDI))


def get_stopwords(sw_list: Union[str, List[str], Set[str], None]) -> List[str]:
    """reference stopwords.py:46-56 (named set: all 29 reference
    languages embedded; see stopword_lists.py for sourcing caveats)."""
    if isinstance(sw_list, str):
        name = sw_list.lower()
        if name not in _NAMED:
            raise NotImplementedError(
                f"Named stop-word lists shipped with retriv_ray: "
                f"{sorted(_NAMED)}; pass an explicit list for {sw_list!r}."
            )
        return list(_NAMED[name])
    elif type(sw_list) is list and all(isinstance(x, str) for x in sw_list):
        return sw_list
    elif type(sw_list) is set:
        return list(sw_list)
    elif sw_list is None:
        return []
    else:
        raise NotImplementedError
