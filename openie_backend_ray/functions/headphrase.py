"""Head-phrase extraction for entity linking (SURVEY.md M11).

Port of ``linker/.../entity/util/HeadPhraseFinder.scala:8-62``: POS-driven
head phrase of an argument — strip "(DT|CD|JJ|RBS) of" and "(DT)+ JJ of"
prefixes, truncate after the first punctuation/conjunction/preposition,
cut post-modifiers after the last noun, drop determiners/possessive
pronouns, then shrink from the left until the candidate index has
candidates for the remaining phrase."""

from __future__ import annotations

from collections.abc import Callable

_PUNCT_TAGS = frozenset({".", ",", ":", "``", "''", "-LRB-", "-RRB-", "$",
                         "#", "SYM"})


def _is_det(tag: str) -> bool:
    return tag == "DT"


def _is_noun(tag: str) -> bool:
    return tag in ("NN", "NNP", "NNS", "NNPS")


def head_phrase(
    tokens: list[str],
    tags: list[str],
    has_candidates: Callable[[str], bool],
) -> str:
    toks = list(zip(tokens, tags))
    head = toks

    # Strip "(DT | CD | JJ | RBS) of" from the beginning.
    if len(toks) >= 3 and toks[1][0] == "of":
        t0 = toks[0][1]
        if _is_det(t0) or t0 == "CD" or t0 == "JJ" or t0 == "RBS":
            head = head[2:]

    # Strip "(DT)+ JJ of" from the beginning.
    if len(toks) >= 4 and _is_det(toks[0][1]):
        dt_index = max(
            (i for i, (_, t) in enumerate(toks) if _is_det(t)), default=-1
        )
        if (
            len(toks) >= dt_index + 4
            and toks[dt_index + 1][1] == "JJ"
            and toks[dt_index + 2][0] == "of"
        ):
            head = toks[dt_index + 3:]

    # Truncate at first punctuation, conjunction, or preposition.
    trunc = next(
        (
            i
            for i, (_, t) in enumerate(head)
            if t in _PUNCT_TAGS or t == "CC" or t == "IN"
        ),
        -1,
    )
    if trunc != -1 and trunc + 1 < len(head):
        head = head[trunc + 1:]

    # Remove post modifiers after the last noun.
    last_noun = max(
        (i for i, (_, t) in enumerate(head) if _is_noun(t)), default=-1
    )
    if last_noun >= 0:
        head = head[: last_noun + 1]

    # Remove determiners and possessive pronouns.
    filtered = [(w, t) for (w, t) in head if not (_is_det(t) or t == "PRP$")]
    if filtered:
        head = filtered

    # Shrink from the left until the candidate index knows the phrase.
    drop = 0
    while drop < len(head) and not has_candidates(
        " ".join(w for w, _ in head[drop:])
    ):
        drop += 1
    if drop != len(head):
        head = head[drop:]
    return " ".join(w for w, _ in head)
