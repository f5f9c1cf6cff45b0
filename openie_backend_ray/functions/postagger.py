"""Averaged-perceptron POS tagger (SURVEY.md M1/A1 model fidelity).

The reference chunker runs an OpenNLP maxent POS model
(``hadoop/.../ScoobiSentenceChunker.scala:19``); the model binary is
not redistributable, so this is the standard public alternative: the
averaged structured perceptron with Honnibal's feature set (word,
pre/suffixes, previous two tags, +-2 context words — the design behind
nltk/textblob's ``PerceptronTagger``), trained on the repo's golden
tagged fixture sentences (public data from the reference's own test
resources) by ``scripts/train_pos_tagger.py`` and vendored as
``functions/data/pos_perceptron.json.gz``.

Inference is COMPILED to numpy after load/train: feature string -> row
id, weights as one (n_feats, n_classes) float64 matrix; tagging a
token = 14 dict lookups + one row-sum + argmax (~5x the pure-dict
implementation, measured).  Deterministic end to end: seeded training
shuffle, first-in-sorted-class-order tie-break in BOTH the dict and
compiled paths, pure inference.
"""

from __future__ import annotations

import gzip
import json
import os
import random
from collections import defaultdict

import numpy as np

_WEIGHTS_GZ = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "data", "pos_perceptron.json.gz",
)

_START = ["-START-", "-START2-"]
_END = ["-END-", "-END2-"]


def _normalize(word: str) -> str:
    if "-" in word and word[0] != "-":
        return "!HYPHEN"
    if word.isdigit():
        return "!YEAR" if len(word) == 4 else "!DIGITS"
    return word.lower()


def _feature_keys(i: int, word: str, context: list[str],
                  prev: str, prev2: str) -> list[str]:
    """Honnibal's feature templates as ready-joined key strings (all
    values are 1, so a list is the whole feature vector)."""
    i += 2  # len(_START)
    w = context[i]
    return [
        "bias",
        "i suffix " + word[-3:],
        "i pref1 " + word[0],
        "i-1 tag " + prev,
        "i-2 tag " + prev2,
        "i tag+i-2 tag " + prev + " " + prev2,
        "i word " + w,
        "i-1 tag+i word " + prev + " " + w,
        "i-1 word " + context[i - 1],
        "i-1 suffix " + context[i - 1][-3:],
        "i-2 word " + context[i - 2],
        "i+1 word " + context[i + 1],
        "i+1 suffix " + context[i + 1][-3:],
        "i+2 word " + context[i + 2],
    ]


class AveragedPerceptron:
    def __init__(self):
        # feature -> {tag -> weight}
        self.weights: dict[str, dict[str, float]] = {}
        self.classes: list[str] = []  # SORTED; tie-break = first max
        self._totals: dict[tuple[str, str], float] = defaultdict(float)
        self._tstamps: dict[tuple[str, str], int] = defaultdict(int)
        self.i = 0

    def predict(self, features: list[str]) -> str:
        scores: dict[str, float] = defaultdict(float)
        for feat in features:
            row = self.weights.get(feat)
            if row is None:
                continue
            for label, weight in row.items():
                scores[label] += weight
        # first maximal element of the sorted class list (matches the
        # compiled path's argmax-first semantics)
        return max(self.classes, key=scores.__getitem__)

    def update(self, truth: str, guess: str, features: list[str]):
        self.i += 1
        if truth == guess:
            return

        def upd(f, t, w, v):
            key = (f, t)
            self._totals[key] += (self.i - self._tstamps[key]) * w
            self._tstamps[key] = self.i
            self.weights[f][t] = w + v

        for f in features:
            weights = self.weights.setdefault(f, {})
            upd(f, truth, weights.get(truth, 0.0), 1.0)
            upd(f, guess, weights.get(guess, 0.0), -1.0)

    def average_weights(self):
        for feat, weights in self.weights.items():
            new = {}
            for tag, weight in weights.items():
                key = (feat, tag)
                total = self._totals[key]
                total += (self.i - self._tstamps[key]) * weight
                averaged = round(total / self.i, 3)
                if averaged:
                    new[tag] = averaged
            self.weights[feat] = new


class PerceptronTagger:
    """Train/predict wrapper with the unambiguous-word shortcut
    (frequent single-tag words bypass the classifier) and a compiled
    numpy scorer for inference."""

    def __init__(self):
        self.model = AveragedPerceptron()
        self.tagdict: dict[str, str] = {}
        self._feat_id: dict[str, int] | None = None
        self._W: np.ndarray | None = None
        self._classes: list[str] = []

    # -- inference ---------------------------------------------------------

    def _compile(self):
        """weights dict -> (feature -> row id, row matrix).  argmax over
        a row-sum with numpy's first-max tie-break == first maximal
        class in sorted order."""
        self._classes = list(self.model.classes)
        cid = {c: j for j, c in enumerate(self._classes)}
        self._feat_id = {}
        rows = []
        for feat, wrow in self.model.weights.items():
            self._feat_id[feat] = len(rows)
            r = np.zeros(len(self._classes), dtype=np.float64)
            for tag, w in wrow.items():
                r[cid[tag]] = w
            rows.append(r)
        self._W = (
            np.vstack(rows)
            if rows
            else np.zeros((0, len(self._classes)), dtype=np.float64)
        )

    def tag(self, tokens: list[str]) -> list[str]:
        prev, prev2 = _START
        out = []
        context = _START + [_normalize(w) for w in tokens] + _END
        fid = self._feat_id
        W = self._W
        get_tag = self.tagdict.get
        for i, word in enumerate(tokens):
            tag = get_tag(word)
            if tag is None:
                keys = _feature_keys(i, word, context, prev, prev2)
                if W is not None:
                    idxs = [fid[k] for k in keys if k in fid]
                    if idxs:
                        tag = self._classes[
                            int(np.argmax(W[idxs].sum(axis=0)))
                        ]
                    else:
                        tag = self._classes[0]
                else:
                    tag = self.model.predict(keys)
            out.append(tag)
            prev2 = prev
            prev = tag
        return out

    # -- training ----------------------------------------------------------

    def train(self, sentences: list[tuple[list[str], list[str]]],
              n_iter: int = 8, seed: int = 7):
        self._make_tagdict(sentences)
        self.model.classes = sorted(
            {t for _, tags in sentences for t in tags}
        )
        rng = random.Random(seed)
        order = list(range(len(sentences)))
        for _ in range(n_iter):
            rng.shuffle(order)
            for si in order:
                tokens, tags = sentences[si]
                prev, prev2 = _START
                context = (
                    _START + [_normalize(w) for w in tokens] + _END
                )
                for i, word in enumerate(tokens):
                    guess = self.tagdict.get(word)
                    if guess is None:
                        feats = _feature_keys(
                            i, word, context, prev, prev2
                        )
                        guess = self.model.predict(feats)
                        self.model.update(tags[i], guess, feats)
                    prev2 = prev
                    prev = guess
        self.model.average_weights()
        self._compile()

    def _make_tagdict(self, sentences, freq_thresh: int = 5,
                      ambiguity_thresh: float = 0.99):
        counts: dict[str, dict[str, int]] = defaultdict(
            lambda: defaultdict(int)
        )
        for tokens, tags in sentences:
            for w, t in zip(tokens, tags):
                counts[w][t] += 1
        for word, tag_freqs in counts.items():
            tag, mode = max(tag_freqs.items(), key=lambda kv: (kv[1], kv[0]))
            n = sum(tag_freqs.values())
            if n >= freq_thresh and mode / n >= ambiguity_thresh:
                self.tagdict[word] = tag

    # -- persistence -------------------------------------------------------

    def to_json(self) -> dict:
        return {
            "weights": self.model.weights,
            "tagdict": self.tagdict,
            "classes": list(self.model.classes),
        }

    @classmethod
    def from_json(cls, obj: dict) -> "PerceptronTagger":
        t = cls()
        t.model.weights = obj["weights"]
        t.model.classes = sorted(obj["classes"])
        t.tagdict = obj["tagdict"]
        t._compile()
        return t

    def save(self, path: str = _WEIGHTS_GZ):
        with gzip.open(path, "wt", encoding="utf-8") as f:
            json.dump(self.to_json(), f)

    @classmethod
    def load(cls, path: str = _WEIGHTS_GZ) -> "PerceptronTagger | None":
        if not os.path.exists(path):
            return None
        with gzip.open(path, "rt", encoding="utf-8") as f:
            return cls.from_json(json.load(f))


# ---------------------------------------------------------------------------
# chunker: averaged perceptron over (word, POS) -> IOB chunk tags
# ---------------------------------------------------------------------------

_CHUNK_WEIGHTS_GZ = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "data", "chunk_perceptron.json.gz",
)


def _chunk_feature_keys(i: int, words: list[str], poss: list[str],
                        prev: str, prev2: str) -> list[str]:
    """CoNLL-2000-baseline chunking templates: word/POS windows, POS
    n-grams, previous chunk tags."""
    i += 2
    return [
        "bias",
        "w " + words[i],
        "w-1 " + words[i - 1],
        "w+1 " + words[i + 1],
        "p " + poss[i],
        "p-1 " + poss[i - 1],
        "p-2 " + poss[i - 2],
        "p+1 " + poss[i + 1],
        "p+2 " + poss[i + 2],
        "p-1+p " + poss[i - 1] + " " + poss[i],
        "p+p+1 " + poss[i] + " " + poss[i + 1],
        "p-1+p+p+1 " + poss[i - 1] + " " + poss[i] + " " + poss[i + 1],
        "t-1 " + prev,
        "t-2 " + prev2,
        "t-1+p " + prev + " " + poss[i],
        "w+p " + words[i] + " " + poss[i],
    ]


class ChunkPerceptron:
    """IOB chunk tagger with the same averaged-perceptron machinery and
    compiled numpy inference as ``PerceptronTagger``."""

    def __init__(self):
        self.model = AveragedPerceptron()
        self._feat_id: dict[str, int] | None = None
        self._W: np.ndarray | None = None
        self._classes: list[str] = []

    def _compile(self):
        self._classes = list(self.model.classes)
        cid = {c: j for j, c in enumerate(self._classes)}
        self._feat_id = {}
        rows = []
        for feat, wrow in self.model.weights.items():
            self._feat_id[feat] = len(rows)
            r = np.zeros(len(self._classes), dtype=np.float64)
            for tag, w in wrow.items():
                r[cid[tag]] = w
            rows.append(r)
        self._W = (
            np.vstack(rows)
            if rows
            else np.zeros((0, len(self._classes)), dtype=np.float64)
        )

    def tag(self, tokens: list[str], postags: list[str]) -> list[str]:
        prev, prev2 = _START
        words = _START + [_normalize(w) for w in tokens] + _END
        poss = _START + list(postags) + _END
        fid = self._feat_id
        W = self._W
        out = []
        for i in range(len(tokens)):
            keys = _chunk_feature_keys(i, words, poss, prev, prev2)
            if W is not None:
                idxs = [fid[k] for k in keys if k in fid]
                tag = (
                    self._classes[int(np.argmax(W[idxs].sum(axis=0)))]
                    if idxs
                    else self._classes[0]
                )
            else:
                tag = self.model.predict(keys)
            out.append(tag)
            prev2 = prev
            prev = tag
        return out

    def train(
        self,
        sentences: list[tuple[list[str], list[str], list[str]]],
        n_iter: int = 8,
        seed: int = 11,
    ):
        """sentences: (tokens, gold_postags, gold_chunks)."""
        self.model.classes = sorted(
            {c for _, _, chks in sentences for c in chks}
        )
        rng = random.Random(seed)
        order = list(range(len(sentences)))
        for _ in range(n_iter):
            rng.shuffle(order)
            for si in order:
                tokens, postags, chunks = sentences[si]
                prev, prev2 = _START
                words = _START + [_normalize(w) for w in tokens] + _END
                poss = _START + list(postags) + _END
                for i in range(len(tokens)):
                    feats = _chunk_feature_keys(i, words, poss, prev, prev2)
                    guess = self.model.predict(feats)
                    self.model.update(chunks[i], guess, feats)
                    prev2 = prev
                    prev = guess
        self.model.average_weights()
        self._compile()

    def to_json(self) -> dict:
        return {
            "weights": self.model.weights,
            "classes": list(self.model.classes),
        }

    @classmethod
    def from_json(cls, obj: dict) -> "ChunkPerceptron":
        t = cls()
        t.model.weights = obj["weights"]
        t.model.classes = sorted(obj["classes"])
        t._compile()
        return t

    def save(self, path: str = _CHUNK_WEIGHTS_GZ):
        with gzip.open(path, "wt", encoding="utf-8") as f:
            json.dump(self.to_json(), f)

    @classmethod
    def load(cls, path: str = _CHUNK_WEIGHTS_GZ) -> "ChunkPerceptron | None":
        if not os.path.exists(path):
            return None
        with gzip.open(path, "rt", encoding="utf-8") as f:
            return cls.from_json(json.load(f))


_CACHED: PerceptronTagger | None = None
_CACHED_TRIED = False


def default_tagger() -> PerceptronTagger | None:
    """The vendored fixture-trained tagger, loaded once per process
    (actor ``__init__`` callers hold their own reference)."""
    global _CACHED, _CACHED_TRIED
    if not _CACHED_TRIED:
        _CACHED = PerceptronTagger.load()
        _CACHED_TRIED = True
    return _CACHED


_CACHED_CHUNK: ChunkPerceptron | None = None
_CACHED_CHUNK_TRIED = False


def default_chunker() -> ChunkPerceptron | None:
    """The vendored fixture-trained chunk tagger, loaded once per
    process."""
    global _CACHED_CHUNK, _CACHED_CHUNK_TRIED
    if not _CACHED_CHUNK_TRIED:
        _CACHED_CHUNK = ChunkPerceptron.load()
        _CACHED_CHUNK_TRIED = True
    return _CACHED_CHUNK
