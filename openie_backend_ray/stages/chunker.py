"""Sentence chunker stage (SURVEY.md M1/A1): an actor-pool stage.

The reference loads an OpenNLP chunker model once per JVM
(``hadoop/.../ScoobiSentenceChunker.scala:19``, lazy val) and maps
``[sentence, url]`` lines to token/POS/chunk layers. Our actor holds the
"model" state in ``__init__`` — a golden-layer lexicon broadcast via
``ray.put`` (zero-copy read per actor) plus a deterministic heuristic
tagger for out-of-lexicon sentences (the OpenNLP binary isn't available
in this environment; the heuristic is a clearly-documented stand-in
with the same interface and batch shape).

Use: ``ds.map_batches(ChunkerActor, fn_constructor_kwargs={"lexicon_ref":
ref}, batch_format="pyarrow", concurrency=N, batch_size=B)``.
"""

from __future__ import annotations

import re

import pyarrow as pa

# ---------------------------------------------------------------------------
# heuristic fallback tagger (deterministic, rule-based)
# ---------------------------------------------------------------------------

_CLOSED = {
    "the": "DT", "a": "DT", "an": "DT", "this": "DT", "that": "DT",
    "these": "DT", "those": "DT", "all": "DT", "some": "DT", "any": "DT",
    "no": "DT", "every": "DT", "each": "DT",
    "and": "CC", "or": "CC", "but": "CC", "nor": "CC",
    "of": "IN", "in": "IN", "on": "IN", "at": "IN", "by": "IN",
    "for": "IN", "with": "IN", "from": "IN", "as": "IN", "into": "IN",
    "about": "IN", "over": "IN", "under": "IN", "after": "IN",
    "before": "IN", "between": "IN", "through": "IN", "during": "IN",
    "against": "IN", "without": "IN", "within": "IN", "if": "IN",
    "because": "IN", "while": "IN", "although": "IN", "since": "IN",
    "to": "TO",
    "is": "VBZ", "are": "VBP", "was": "VBD", "were": "VBD", "be": "VB",
    "been": "VBN", "being": "VBG", "am": "VBP",
    "has": "VBZ", "have": "VBP", "had": "VBD",
    "do": "VBP", "does": "VBZ", "did": "VBD", "done": "VBN",
    "will": "MD", "would": "MD", "can": "MD", "could": "MD",
    "may": "MD", "might": "MD", "shall": "MD", "should": "MD",
    "must": "MD", "ought": "MD",
    "not": "RB", "n't": "RB", "never": "RB", "also": "RB", "very": "RB",
    "too": "RB", "then": "RB", "now": "RB", "here": "RB", "there": "EX",
    "i": "PRP", "you": "PRP", "he": "PRP", "she": "PRP", "it": "PRP",
    "we": "PRP", "they": "PRP", "me": "PRP", "him": "PRP", "her": "PRP$",
    "us": "PRP", "them": "PRP",
    "my": "PRP$", "your": "PRP$", "his": "PRP$", "its": "PRP$",
    "our": "PRP$", "their": "PRP$",
    "who": "WP", "whom": "WP", "whose": "WP$", "which": "WDT",
    "what": "WP", "when": "WRB", "where": "WRB", "why": "WRB",
    "how": "WRB",
    "'s": "POS",
}

_NUM = re.compile(r"^[\d.,:/$%+-]*\d[\d.,:/$%+-]*$")
_PUNCT = re.compile(r"^[^\w]+$", re.U)


def _tag_word(w: str, prev_tag: str) -> str:
    lw = w.lower()
    if lw in _CLOSED:
        return _CLOSED[lw]
    if _NUM.match(w):
        return "CD"
    if _PUNCT.match(w):
        return "." if w in ".!?" else ("," if w == "," else "SYM")
    if w[:1].isupper():
        return "NNPS" if lw.endswith("s") and not lw.endswith("ss") else "NNP"
    if lw.endswith("ly"):
        return "RB"
    if lw.endswith("ing"):
        return "VBG"
    if lw.endswith("ed"):
        return "VBN" if prev_tag in ("VBZ", "VBP", "VBD", "VB") else "VBD"
    if lw.endswith(("ous", "ful", "ive", "able", "ible", "al", "ic")):
        return "JJ"
    if lw.endswith("s") and not lw.endswith("ss"):
        return "VBZ" if prev_tag in ("PRP", "NN", "NNP", "WDT") else "NNS"
    return "NN"


def _chunk_tags(tags: list[str]) -> list[str]:
    out = []
    prev = "O"
    for t in tags:
        if t in ("DT", "PDT", "JJ", "JJR", "JJS", "CD", "PRP$") or t.startswith("NN") or t == "PRP" or t == "POS" or t in ("WP", "WDT", "EX"):
            c = "I-NP" if prev in ("B-NP", "I-NP") else "B-NP"
        elif t.startswith("VB") or t == "MD":
            c = "I-VP" if prev in ("B-VP", "I-VP") else "B-VP"
        elif t in ("IN", "TO"):
            c = "B-PP"
        elif t.startswith("RB"):
            c = "B-ADVP"
        else:
            c = "O"
        out.append(c)
        prev = c
    return out


def heuristic_layers(text: str) -> tuple[list[str], list[str], list[str]]:
    tokens = text.split(" ")
    tags = []
    prev = "O"
    for w in tokens:
        t = _tag_word(w, prev) if w else "SYM"
        tags.append(t)
        prev = t
    return tokens, tags, _chunk_tags(tags)


def model_layers(
    text: str, tagger=None, chunk_tagger=None
) -> tuple[list[str], list[str], list[str]]:
    """Out-of-lexicon layers from the trained averaged-perceptron POS
    and IOB-chunk models (``functions/postagger.py``; the
    OpenNLP-model analogue), falling back to the rule tagger / rule
    chunker only when the vendored weights are absent."""
    if tagger is None:
        from openie_backend_ray.functions.postagger import default_tagger

        tagger = default_tagger()
    if tagger is None:
        return heuristic_layers(text)
    if chunk_tagger is None:
        from openie_backend_ray.functions.postagger import default_chunker

        chunk_tagger = default_chunker()
    tokens = text.split(" ")
    tags = tagger.tag(tokens)
    chunks = (
        chunk_tagger.tag(tokens, tags)
        if chunk_tagger is not None
        else _chunk_tags(tags)
    )
    return tokens, tags, chunks


class ChunkerActor:
    """Actor-pool chunker: lexicon hit -> golden layers; miss -> the
    trained perceptron tagger (A1 model state, loaded once per actor),
    with a sentence-level memo so duplicated web sentences tag once."""

    _MEMO_CAP = 200_000

    def __init__(self, lexicon_ref=None, lexicon: pa.Table | None = None):
        import ray

        from openie_backend_ray.functions.postagger import default_tagger

        if lexicon is None and lexicon_ref is not None:
            lexicon = ray.get(lexicon_ref)
        self._lex: dict[str, tuple[list[str], list[str], list[str]]] = {}
        if lexicon is not None:
            sents = lexicon["sentence"].to_pylist()
            toks = lexicon["tokens"].to_pylist()
            tags = lexicon["postags"].to_pylist()
            chks = lexicon["chunks"].to_pylist()
            self._lex = {
                s: (t, p, c) for s, t, p, c in zip(sents, toks, tags, chks)
            }
        from openie_backend_ray.functions.postagger import default_chunker

        self._tagger = default_tagger()
        self._chunker = default_chunker()
        self._memo: dict[str, tuple[list[str], list[str], list[str]]] = {}

    def _layers(self, s: str):
        hit = self._lex.get(s)
        if hit is not None:
            return hit
        hit = self._memo.get(s)
        if hit is None:
            hit = model_layers(
                s, tagger=self._tagger, chunk_tagger=self._chunker
            )
            if len(self._memo) >= self._MEMO_CAP:
                self._memo.clear()  # epoch eviction, O(1) amortized
            self._memo[s] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        toks, tags, chks = [], [], []
        for s in texts:
            hit = self._layers(s)
            toks.append(hit[0])
            tags.append(hit[1])
            chks.append(hit[2])
        cols = {
            "doc_id": batch["doc_id"],
            "span_idx": batch["span_idx"],
            "tokens": pa.array(toks, pa.list_(pa.string())),
            "postags": pa.array(tags, pa.list_(pa.string())),
            "chunks": pa.array(chks, pa.list_(pa.string())),
        }
        # per-sentence provenance passes through when present (the
        # reference's [sentence, url] line input keeps the URL on every
        # record, ScoobiReVerb.scala:62-107)
        if "source_url" in batch.column_names:
            cols["source_url"] = batch["source_url"]
        return pa.table(cols)
