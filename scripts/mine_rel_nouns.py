"""Mine the relation-noun lexicon for ReVerb's lexical constraint.

Collects nouns appearing *inside* golden relation phrases (between the
verb chain and the trailing preposition run) from the reference's golden
groups — the light-noun constructions the original corpus-derived
lexical constraint licensed ("is a great OPTION for", "sets a good
EXAMPLE for", "heard STORIES of"). Writes
``openie_backend_ray/functions/data/rel_nouns.txt``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from openie_backend_ray.fixtures.conformance import (  # noqa: E402
    clean_groups,
    instance_is_clean,
)

V = {"VB", "VBD", "VBG", "VBN", "VBP", "VBZ", "MD"}
P = {"IN", "TO", "RP"}

OUT = os.path.join(
    os.path.dirname(__file__), "..",
    "openie_backend_ray", "functions", "data", "rel_nouns.txt",
)


def main() -> None:
    nouns = set()
    for g in clean_groups():
        for i in g.instances:
            if not instance_is_clean(g, i):
                continue
            rs, re_ = i.rel
            tags = i.postags
            k = re_ - 1
            while k > rs and tags[k] in P:
                k -= 1
            j = rs
            while j <= k and (
                tags[j] in V or tags[j] == "RP" or tags[j].startswith("RB")
            ):
                j += 1
            for m in range(j, k + 1):
                if tags[m] in ("NN", "NNS"):
                    nouns.add(i.tokens[m].lower())
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("# nouns licensed inside relation W* spans; mined from the\n")
        f.write("# reference golden groups by scripts/mine_rel_nouns.py\n")
        for w in sorted(nouns):
            f.write(w + "\n")
    print(f"wrote {len(nouns)} relation nouns to {OUT}")


if __name__ == "__main__":
    main()
