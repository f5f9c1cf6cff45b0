"""Grouping-key normalization (SURVEY.md §1.3; the semantic heart).

Implements the reference's key computations over (tokens, postags,
interval) parts:

- ``index_key_part``: drop determiner stop-tokens, stem each remaining
  token with its POS tag, join with spaces, lowercase
  (``models/.../ReVerbExtraction.scala:56-69,117``).
- ``frontend_key_part``: additionally strip modifier POS tags
  (JJ/JJR/JJS/RB/RBR/RBS/VBG/PRP$/WDT/WP) unless the token is in the
  keep-list (``:93-108,119-121``).
- ``head_part``: modifier-stripped but unstemmed (``:76-91``).

All functions operate on plain Python lists so they can be applied per
row inside a vectorized ``map_batches`` (the batch loop lives in
``stages/grouper.py``).
"""

from __future__ import annotations

from openie_backend_ray.functions.stemmer import stem

STRIPPED_DETERMINERS = frozenset(
    {"a", "an", "the", "these", "those", "this", "that", "which", "what"}
)

MODIFIER_TAGS_TO_STRIP = frozenset(
    {"JJ", "JJR", "JJS", "RB", "RBR", "RBS", "VBG", "PRP$", "WDT", "WP"}
)

MODIFIERS_TO_KEEP = frozenset(
    {"n't", "not", "no", "as", "rarely", "never", "none", "ought", "would",
     "could", "should", "all"}
)


def index_key_part(
    tokens: list[str], tags: list[str], start: int, end: int
) -> str:
    parts = []
    for i in range(start, end):
        w = tokens[i]
        if w.lower() in STRIPPED_DETERMINERS:
            continue
        parts.append(stem(w, tags[i]))
    return " ".join(parts)  # stem() already lowercases


def index_key(
    tokens: list[str],
    tags: list[str],
    arg1: tuple[int, int],
    rel: tuple[int, int],
    arg2: tuple[int, int],
) -> tuple[str, str, str]:
    return (
        index_key_part(tokens, tags, *arg1),
        index_key_part(tokens, tags, *rel),
        index_key_part(tokens, tags, *arg2),
    )


def key_string(key: tuple[str, str, str]) -> str:
    """``arg1Norm__relNorm__arg2Norm`` (``ScoobiReVerbGrouper.scala:51``)."""
    return "%s__%s__%s" % key


def _keep_for_frontend(word: str, tag: str) -> bool:
    wl = word.lower()
    if wl in STRIPPED_DETERMINERS:
        return False
    if tag in MODIFIER_TAGS_TO_STRIP and wl not in MODIFIERS_TO_KEEP:
        return False
    return True


def frontend_key_part(
    tokens: list[str], tags: list[str], start: int, end: int
) -> str:
    parts = []
    for i in range(start, end):
        if _keep_for_frontend(tokens[i], tags[i]):
            parts.append(stem(tokens[i], tags[i]))
    return " ".join(parts)


def frontend_key(
    tokens: list[str],
    tags: list[str],
    arg1: tuple[int, int],
    rel: tuple[int, int],
    arg2: tuple[int, int],
) -> tuple[str, str, str]:
    return (
        frontend_key_part(tokens, tags, *arg1),
        frontend_key_part(tokens, tags, *rel),
        frontend_key_part(tokens, tags, *arg2),
    )


def head_part(tokens: list[str], tags: list[str], start: int, end: int) -> str:
    """Modifier-stripped, unstemmed, original-case text (arg heads)."""
    return " ".join(
        tokens[i]
        for i in range(start, end)
        if _keep_for_frontend(tokens[i], tags[i])
    )
