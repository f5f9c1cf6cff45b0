"""Perceptron tagger robustness: empty-string tokens (whitespace runs
in real web text) and the averaged-away-bias compile guard."""

from __future__ import annotations

from openie_backend_ray.functions.postagger import (
    ChunkPerceptron,
    PerceptronTagger,
    default_chunker,
    default_tagger,
)
from openie_backend_ray.stages.chunker import heuristic_layers, model_layers


def test_tag_handles_empty_tokens():
    """text.split(' ') on consecutive/leading/trailing spaces yields ''
    tokens; tagging must not crash and must keep token alignment."""
    tagger = default_tagger()
    assert tagger is not None, "vendored weights missing"
    toks = ["Obama", "visited", "", "Paris", "today", "."]
    tags = tagger.tag(toks)
    assert len(tags) == len(toks)
    # dict path (un-compiled fallback) must survive too
    tags2 = tagger._tag_dictpath(toks)
    assert len(tags2) == len(toks)


def test_chunk_tag_handles_empty_tokens():
    chunker = default_chunker()
    assert chunker is not None, "vendored weights missing"
    tagger = default_tagger()
    toks = ["Obama", "visited", "", "Paris", "."]
    chunks = chunker.tag(toks, tagger.tag(toks))
    assert len(chunks) == len(toks)


def test_model_layers_whitespace_runs():
    """The exact ADVICE repro: consecutive spaces through the model
    path; layers stay aligned and match the heuristic path's shape."""
    text = "Obama visited  Paris today ."
    toks, tags, chunks = model_layers(text)
    assert toks == text.split(" ")
    assert len(tags) == len(toks) and len(chunks) == len(toks)
    h_toks, h_tags, h_chunks = heuristic_layers(text)
    assert h_toks == toks
    assert len(h_tags) == len(toks)


def test_normalize_query_part_whitespace():
    from openie_backend_ray.pipelines.query import normalize_query_part

    # double space inside a query must not crash the serving path
    out = normalize_query_part("barack  obama")
    assert isinstance(out, str)


def test_compile_survives_missing_bias():
    """A retrained model whose bias weights all average below the
    round-3 cutoff loses its 'bias' row; _compile must install a
    sentinel zero row instead of leaving _bias_id None."""
    for cls, tag_args in (
        (PerceptronTagger, (["hello", "world"],)),
        (ChunkPerceptron, (["hello", "world"], ["NN", "NN"])),
    ):
        t = cls()
        t.model.classes = ["NN", "VB"]
        t.model.weights = {"i word hello": {"NN": 1.0}}  # no "bias"
        t._compile()
        assert t._bias_id is not None
        # sentinel row is all-zero: tagging works and is score-neutral
        tags = t.tag(*tag_args)
        assert len(tags) == 2
