"""Extraction confidence scorer (SURVEY.md M6 / A4).

The reference attaches a logistic-regression confidence
(ReVerbOpenNlpConfFunction) to instances that lack one
(``hadoop/.../ScoobiGroupReGrouper.scala:103-112``). The trained model
is not redistributable, but the golden fixture instances carry the
confidences the reference model produced, so we fit our own ridge
logistic over the published feature families (Fader et al. 2011 §4:
sentence length, relation shape, argument shapes, coverage) to those
golden values — see ``scripts/fit_confidence.py``.  Fitted weights
live in ``data/conf_weights.json``; held-out Spearman vs the golden
confidences is ~0.55 (the legacy hand-tuned rules below score ~0.35).

``score()`` applies the fitted model (falling back to the hand-tuned
``score_rules()`` if the weights file is absent); per the conformance
contract only *ranking behavior* matters (confidence orders instances
for dedup and gates the 0.5 index filter)."""

from __future__ import annotations

import gzip
import json
import math
import os

# Bump whenever ``features()`` changes shape/meaning; stored alongside
# the weights so a stale weights file is detected instead of misapplied.
FEATURE_VERSION = 1

_PRONOUNS = frozenset(
    {"i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
     "us", "them", "this", "that", "these", "those", "who", "which"}
)

_BE_FORMS = frozenset({"is", "are", "was", "were", "been", "being", "be"})

_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "conf_weights.json"
)


def features(
    tokens: list[str],
    postags: list[str],
    arg1: tuple[int, int],
    rel: tuple[int, int],
    arg2: tuple[int, int],
) -> list[float]:
    """34-dim feature vector over the public ReVerb confidence families
    (Fader et al. 2011 §4): sentence length, relation shape, argument
    shapes, coverage/position, and punctuation context."""
    n = len(tokens)
    rel_len = rel[1] - rel[0]
    a1_toks = [tokens[i].lower() for i in range(arg1[0], arg1[1])]
    a2_toks = [tokens[i].lower() for i in range(arg2[0], arg2[1])]
    rel_toks = [tokens[i].lower() for i in range(rel[0], rel[1])]
    tags = postags
    return [
        1.0,
        1.0 if n <= 10 else 0.0,
        1.0 if n >= 30 else 0.0,
        math.log(max(1, n)),
        1.0 if rel_len == 1 else 0.0,
        1.0 if rel_len > 5 else 0.0,
        float(rel_len),
        1.0 if tags[rel[1] - 1] in ("IN", "TO", "RP") else 0.0,
        1.0 if tags[rel[0]].startswith("VB") else 0.0,
        1.0 if all(t.startswith("VB") or t in ("IN", "TO", "RP", "RB")
                   for t in tags[rel[0]:rel[1]]) else 0.0,
        1.0 if any(tags[i].startswith("NNP")
                   for i in range(arg1[0], arg1[1])) else 0.0,
        1.0 if any(tags[i].startswith("NNP")
                   for i in range(arg2[0], arg2[1])) else 0.0,
        1.0 if len(a1_toks) == 1 and a1_toks[0] in _PRONOUNS else 0.0,
        1.0 if len(a2_toks) == 1 and a2_toks[0] in _PRONOUNS else 0.0,
        1.0 if arg1[1] - arg1[0] > 8 else 0.0,
        1.0 if arg2[1] - arg2[0] > 8 else 0.0,
        float(arg1[1] - arg1[0]),
        float(arg2[1] - arg2[0]),
        (arg2[1] - arg1[0]) / max(1, n),
        1.0 if arg1[0] == 0 else 0.0,
        1.0 if rel[0] == arg1[1] else 0.0,
        1.0 if arg2[0] == rel[1] else 0.0,
        1.0 if any(tags[i] == "CC" for i in range(arg1[0], arg2[1])) else 0.0,
        1.0 if any(tags[i] == "IN" for i in range(arg2[0], arg2[1])) else 0.0,
        1.0 if any(t == "," for t in tokens[arg1[0]:arg2[1]]) else 0.0,
        1.0 if tokens[0][:1].isupper() else 0.0,
        1.0 if any(t in _BE_FORMS for t in rel_toks) else 0.0,
        1.0 if tags[arg2[1] - 1].startswith("NN") else 0.0,
        1.0 if tags[arg1[1] - 1].startswith("NN") else 0.0,
        1.0 if any(t in ("which", "who", "that") for t in a1_toks) else 0.0,
        1.0 if "(" in tokens or ")" in tokens else 0.0,
        1.0 if arg2[1] >= n - 1 else 0.0,
        1.0 if tags[arg1[0]] == "DT" else 0.0,
        1.0 if any(tags[i] == "CD" for i in range(arg2[0], arg2[1])) else 0.0,
    ]


_weights: list[float] | None = None
_weights_loaded = False


def _load_weights() -> list[float] | None:
    global _weights, _weights_loaded
    if not _weights_loaded:
        _weights_loaded = True
        for path, opener in ((_WEIGHTS_PATH, open),
                             (_WEIGHTS_PATH + ".gz", gzip.open)):
            if os.path.exists(path):
                with opener(path, "rt", encoding="utf-8") as f:
                    blob = json.load(f)
                if blob.get("version") == FEATURE_VERSION:
                    _weights = [float(x) for x in blob["weights"]]
                break
    return _weights


def score(
    tokens: list[str],
    postags: list[str],
    arg1: tuple[int, int],
    rel: tuple[int, int],
    arg2: tuple[int, int],
) -> float:
    """Fitted ridge-logistic confidence (falls back to ``score_rules``
    when the weights file is missing or version-mismatched)."""
    w = _load_weights()
    if w is None:
        return score_rules(tokens, postags, arg1, rel, arg2)
    f = features(tokens, postags, arg1, rel, arg2)
    z = 0.0
    for wi, fi in zip(w, f):
        z += wi * fi
    # clamp before exp: unbounded length features (rel/arg token
    # counts) times negative weights could push -z past exp's ~709
    # domain limit (OverflowError) on a degenerate multi-thousand-token
    # span.  +-700 stays inside the domain while leaving every
    # representable sigmoid value bit-identical — the clamp only
    # converts would-be crashes into the saturated 0.0/1.0
    z = max(-700.0, min(700.0, z))
    return 1.0 / (1.0 + math.exp(-z))


def score_rules(
    tokens: list[str],
    postags: list[str],
    arg1: tuple[int, int],
    rel: tuple[int, int],
    arg2: tuple[int, int],
) -> float:
    """Legacy hand-weighted logistic (the round-1/2 scorer); kept as
    the no-weights fallback and as the baseline ``fit_confidence.py``
    reports against."""
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
