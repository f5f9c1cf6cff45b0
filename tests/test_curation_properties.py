"""Property tests (hypothesis) for the curation-op invariants the SQL
oracles rely on: winnowing matches a brute-force reference and honors
the coverage guarantee; packing equals the serial prefix sum for any
bucket_range; the PII scrub is idempotent; dup-coverage fractions are
the brute-force values. Batch-level kernels only — no Ray session, so
these stay fast and run anywhere in the suite."""

from __future__ import annotations

import hashlib

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

_TOK = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_DOC = st.lists(_TOK, min_size=1, max_size=24).map(" ".join)


def _batch(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(list(texts), pa.string())}
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_winnowing_matches_bruteforce(texts):
    from openie_backend_ray.ops.dedup import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints_batch,
    )

    out = winnow_fingerprints_batch(_batch(texts))
    got: dict[int, set] = {}
    for r in out.to_pylist():
        got.setdefault(r["doc_id"], set()).add(r["fp"])

    for did, text in enumerate(texts):
        toks = text.split()
        if len(toks) < WINNOW_K:
            hs = [hashlib.md5(" ".join(toks).encode()).hexdigest()]
        else:
            hs = [
                hashlib.md5(
                    " ".join(toks[i:i + WINNOW_K]).encode()
                ).hexdigest()
                for i in range(len(toks) - WINNOW_K + 1)
            ]
        if len(hs) <= WINNOW_W:
            want = {min(hs)}
        else:
            want = {
                min(hs[i:i + WINNOW_W])
                for i in range(len(hs) - WINNOW_W + 1)
            }
        assert got[did] == want
        # every fingerprint is one of the doc's gram hashes
        assert want <= set(hs)


@settings(max_examples=40, deadline=None)
@given(st.lists(_TOK, min_size=6, max_size=6),
       st.lists(_TOK, min_size=0, max_size=8),
       st.lists(_TOK, min_size=0, max_size=8))
def test_winnowing_coverage_guarantee(shared, pre, post):
    """Any two docs sharing a >= w+k-1 (=6) token run share a
    fingerprint, regardless of surrounding context."""
    from openie_backend_ray.ops.dedup import winnow_fingerprints_batch

    t = _batch([" ".join(shared),
                " ".join(pre + shared + post)])
    out = winnow_fingerprints_batch(t)
    fps: dict[int, set] = {0: set(), 1: set()}
    for r in out.to_pylist():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(1, 9), min_size=1, max_size=40),
       st.integers(1, 50), st.integers(2, 12))
def test_pack_sequences_prefix_property(lengths, bucket_range, budget):
    """Distributed packing == the serial exclusive prefix sum for any
    bucket_range (pure batch-level check of the same math the Ray op
    distributes; the Ray-level invariance test lives in
    test_curation.py)."""
    import numpy as np

    # emulate the op's math: bucketed exclusive prefix
    ids = np.arange(len(lengths))
    n = np.array(lengths)
    buckets = ids // bucket_range
    offsets = {}
    running = 0
    for b in sorted(set(buckets)):
        offsets[b] = running
        running += int(n[buckets == b].sum())
    before = np.concatenate([
        np.cumsum(n[buckets == b]) - n[buckets == b] + offsets[b]
        for b in sorted(set(buckets))
    ])
    serial = np.cumsum(n) - n
    assert (before == serial).all()
    assert ((before // budget) == (serial // budget)).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60),
    min_size=1, max_size=5))
def test_pii_redact_idempotent_property(texts):
    """For ANY printable input: a second scrub pass changes nothing
    (replacement tokens never re-match)."""
    from openie_backend_ray.ops.curation import pii_redact_batch

    once = pii_redact_batch(_batch(texts))
    again = pii_redact_batch(pa.table(
        {"doc_id": once["doc_id"], "text": once["clean_text"]}
    ))
    assert (again["clean_text"].to_pylist()
            == once["clean_text"].to_pylist())


@settings(max_examples=8, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_dup_ngram_coverage_bruteforce(ray_session, texts):
    """Few examples: each one runs a real two-shuffle Ray pipeline;
    the cheap gram math is covered per-example by the brute force."""
    from collections import Counter

    import ray

    from openie_backend_ray.ops.curation import dup_ngram_coverage

    k = 3
    out = dup_ngram_coverage(
        ray.data.from_arrow(_batch(texts)), k=k
    ).to_pandas()

    per_doc = {}
    for did, text in enumerate(texts):
        toks = text.split()
        grams = [" ".join(toks[i:i + k])
                 for i in range(len(toks) - k + 1)]
        if grams:
            per_doc[did] = Counter(grams)
    if not per_doc:
        # all docs shorter than k: empty result (columns are dropped by
        # Ray for a zero-group map_groups — the row count is the check)
        assert len(out) == 0
        return
    out = out.set_index("doc_id")
    docs_per_gram = Counter()
    for c in per_doc.values():
        docs_per_gram.update(set(c))
    assert set(out.index) == set(per_doc)
    for did, c in per_doc.items():
        total = sum(c.values())
        dup = sum(v for g, v in c.items() if docs_per_gram[g] > 1)
        assert out.loc[did, "n_grams"] == total
        assert out.loc[did, "dup_grams"] == dup
