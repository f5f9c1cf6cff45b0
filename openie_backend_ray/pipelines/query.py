"""Query path over the materialized triples table (SURVEY.md §3.3 —
the output contract of ``ParallelExtractionGroupFetcher``).

The reference serves queries from Lucene indexes with stemmed field
clauses, size-tiered fetching, instance budgets and a Success/Limited/
Timeout algebra (``backend/.../ExtractionGroupFetcher.scala:68-161``,
``QuerySpec.scala:81-150``). Our materialized store is the sorted,
partitioned Parquet triples table; the equivalent query is a PRUNED
read: normalized field clauses push down as Parquet filters (row-group
skipping on the sort key), results sort by group size desc with the
reference's maxGroups budget.
"""

from __future__ import annotations


def normalize_query_part(text: str, tags: list[str] | None = None) -> str:
    """User text -> normalized clause (same stem+strip as the grouping
    key; the reference stems query terms with the same TaggedStemmer,
    ``QuerySpec.scala:81-134``). Without POS tags, nouns are assumed."""
    from openie_backend_ray.functions.normalize import index_key_part

    toks = text.split()
    tags = tags or ["NN"] * len(toks)
    return index_key_part(toks, tags, 0, len(toks))


def query_triples(
    triples_dir: str,
    arg1: str | None = None,
    rel: str | None = None,
    arg2: str | None = None,
    max_groups: int = 1000,  # ExtractionGroupFetcher maxGroups budget
    columns: list[str] | None = None,
):
    """Fetch matching groups, largest first.

    Clauses are normalized exactly like index keys, pushed down as
    Parquet filters (``arg1_norm`` is the leading sort key of the
    materialized table, so arg1 clauses skip row groups at the read).
    """
    import pyarrow.compute as pc
    import ray.data

    clauses = []
    if arg1 is not None:
        clauses.append(pc.field("arg1_norm") == normalize_query_part(arg1))
    if rel is not None:
        clauses.append(pc.field("rel_norm") == normalize_query_part(rel))
    if arg2 is not None:
        clauses.append(pc.field("arg2_norm") == normalize_query_part(arg2))
    expr = None
    for c in clauses:
        expr = c if expr is None else (expr & c)
    ds = ray.data.read_parquet(
        triples_dir,
        filter=expr,
        columns=columns,
    )
    # the reference sorts results by group size desc
    # (ParallelExtractionGroupFetcher.scala:176) and caps at maxGroups
    return ds.sort("size", descending=True).limit(max_groups)
