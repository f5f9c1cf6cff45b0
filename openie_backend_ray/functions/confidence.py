"""Extraction confidence scorer (SURVEY.md M6 / A4).

The reference attaches a logistic-regression confidence
(ReVerbOpenNlpConfFunction) to instances that lack one
(``hadoop/.../ScoobiGroupReGrouper.scala:103-112``). The trained model
is not redistributable; per the conformance contract only *ranking
behavior* matters (confidence orders instances for dedup and gates the
0.5 index filter). This is a deterministic hand-weighted logistic over
the published feature families (Fader et al. 2011 §4: sentence length,
relation shape, argument shapes, coverage)."""

from __future__ import annotations

import math

_PRONOUNS = frozenset(
    {"i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
     "us", "them", "this", "that", "these", "those", "who", "which"}
)


def score(
    tokens: list[str],
    postags: list[str],
    arg1: tuple[int, int],
    rel: tuple[int, int],
    arg2: tuple[int, int],
) -> float:
    n = len(tokens)
    z = 1.2
    # sentence length penalties
    if n <= 10:
        z += 0.6
    elif n >= 30:
        z -= 0.8
    # relation shape
    rel_len = rel[1] - rel[0]
    if rel_len == 1:
        z += 0.2
    elif rel_len > 5:
        z -= 0.6
    if postags[rel[1] - 1] in ("IN", "TO", "RP"):
        z += 0.4  # relation ends with preposition — classic ReVerb signal
    # argument shapes
    a1_toks = [tokens[i].lower() for i in range(arg1[0], arg1[1])]
    a2_toks = [tokens[i].lower() for i in range(arg2[0], arg2[1])]
    if any(postags[i].startswith("NNP") for i in range(arg1[0], arg1[1])):
        z += 0.5  # proper-noun arg1
    if len(a1_toks) == 1 and a1_toks[0] in _PRONOUNS:
        z -= 0.9
    if len(a2_toks) == 1 and a2_toks[0] in _PRONOUNS:
        z -= 0.7
    if arg1[1] - arg1[0] > 8 or arg2[1] - arg2[0] > 8:
        z -= 0.6
    # extraction coverage of the sentence
    cover = (arg2[1] - arg1[0]) / max(1, n)
    if cover > 0.9:
        z += 0.3
    if arg1[0] == 0:
        z += 0.3  # sentence-initial arg1 (subject position)
    # adjacency
    if rel[0] != arg1[1]:
        z -= 0.4
    return 1.0 / (1.0 + math.exp(-z))
