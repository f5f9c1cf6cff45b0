"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 plus the training-data operators (dedup / similarity /
text-analysis / multimodal); ``oracle_sql()`` gives each
SQL-expressible query its DuckDB twin over the same parquet views.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.

Parity notes (why values hash-match across engines):
- every cross-engine hash uses md5 (python hashlib == DuckDB md5());
- ratios are single int/int float64 divisions (bit-identical IEEE),
  never round()ed (numpy half-even vs DuckDB half-up differ);
- money/value sums are int64 cents/micros (distributed-sum exact);
- cosine scores are round(x, 6) on BOTH sides (the only tolerated FP
  fuzz: summation order differs between numpy matmul and DuckDB).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"

# keep in sync with openie_backend_ray.ops.textstats.STOPWORDS
_STOP_SQL = (
    "['the','a','an','of','in','on','and','or','to','is','are','was',"
    "'for','with','by','at','as','that','this','it','be']"
)


def _read(sf_dir: str, table: str, columns=None):
    """Column-pruned parquet read, plus a SMALL-INPUT SPLIT: the sf
    test tables are single-row-group files, which Ray cannot split at
    read time — the fused read->map stage runs as ONE task and every
    per-doc op (minhash, winnowing, simhash) serializes.  When the
    file's row-group count is below the CPU count (a driver-side O(1)
    metadata check), repartition to ~2 blocks/CPU (measured 4.8x on
    minhash at sf0.1).  At production scale the input is thousands of
    files/row groups, the condition is false, and NO repartition
    happens — an unconditional repartition would be an all-to-all
    exchange of the whole corpus."""
    import ray
    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    ds = ray.data.read_parquet(path, columns=columns)
    try:
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        if meta.num_row_groups < cpus:
            target = min(2 * cpus, max(1, meta.num_rows // 64))
            if target > meta.num_row_groups:
                ds = ds.repartition(target)
    except Exception:
        pass
    return ds


def _interleaved_docs(sf_dir: str):
    from openie_backend_ray.sources.interleaved import interleave_flat

    return interleave_flat(_read(sf_dir, "documents", ["doc_id", "text"]))


# ---------------------------------------------------------------------------
# flagship KG pipeline
# ---------------------------------------------------------------------------

def _flagship(sf_dir: str):
    """Interleaved docs (from the flat table) + the golden fixture corpus
    -> extraction groups -> linked, deduped triples. The fixture corpus
    supplies linguistically real sentences (the sf documents are word
    salad); the sf docs still flow through every stage, exercising the
    span plumbing at scale."""
    import ray

    from openie_backend_ray.fixtures.corpus import (
        build_chunker_lexicon,
        documents_dataset,
    )
    from openie_backend_ray.fixtures.side_tables import build_side_tables
    from openie_backend_ray.pipelines.flagship import run_flagship

    sf_docs = _interleaved_docs(sf_dir)
    fixture_docs = documents_dataset(n_blocks=8)
    docs = sf_docs.union(fixture_docs)
    from openie_backend_ray.stages.linker import prepare_linker_tables

    lex_ref = ray.put(build_chunker_lexicon())
    st_ref = ray.put(prepare_linker_tables(build_side_tables()))
    groups = run_flagship(
        docs, lexicon_ref=lex_ref, side_tables_ref=st_ref, corpus="cw"
    )
    return groups


def _flagship_triples(sf_dir: str):
    """Projection without the nested provenance columns (stable scalar
    schema for the driver's rows-only check)."""
    import pyarrow as pa

    groups = _flagship(sf_dir)
    return groups.map_batches(
        lambda b: pa.table(
            {
                "arg1_norm": b["arg1_norm"],
                "rel_norm": b["rel_norm"],
                "arg2_norm": b["arg2_norm"],
                "size": b["size"],
                "arg1_linked": pa.array(
                    [e is not None for e in b["arg1_entity"].to_pylist()],
                    pa.bool_(),
                ),
                "arg2_linked": pa.array(
                    [e is not None for e in b["arg2_entity"].to_pylist()],
                    pa.bool_(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return _flagship_triples(SF_SMOKE)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    from openie_backend_ray.ops import dedup as D
    from openie_backend_ray.ops import multimodal as MM
    from openie_backend_ray.ops import relational as R
    from openie_backend_ray.ops import similarity as SIM
    from openie_backend_ray.ops import textstats as TS
    from openie_backend_ray.stages.sentences import explode_text_spans

    def q_explode_text_spans(sf_dir: str):
        return _interleaved_docs(sf_dir).map_batches(
            explode_text_spans, batch_format="pyarrow"
        )

    def q_media_spans(sf_dir: str):
        return _interleaved_docs(sf_dir).map_batches(
            MM.explode_media_spans, batch_format="pyarrow"
        )

    def q_token_stats(sf_dir: str):
        return TS.token_stats(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_quality_score(sf_dir: str):
        return TS.quality_score(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_lang_id(sf_dir: str):
        return TS.lang_id(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_fingerprint(sf_dir: str):
        return TS.fingerprint(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_vocab_stats(sf_dir: str):
        return TS.vocab_stats(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_top_tokens(sf_dir: str):
        return TS.top_tokens(
            _read(sf_dir, "documents", ["doc_id", "text"]), k=20
        )

    def q_repetition_stats(sf_dir: str):
        return TS.repetition_stats(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )

    def q_bpe_token_stats(sf_dir: str):
        return TS.bpe_token_stats(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )

    def q_quality_gate(sf_dir: str):
        return TS.quality_gate(
            _read(sf_dir, "documents", ["doc_id", "text"]), lang="en"
        )

    def q_dedup_exact(sf_dir: str):
        return D.exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_span_dedup(sf_dir: str):
        """C4-style sub-document span dedup: 10-token windows, first
        occurrence wins, documents reassemble from surviving spans."""
        return D.span_dedup(
            _read(sf_dir, "documents", ["doc_id", "text"]), span_tokens=10
        )

    def q_dedup_minhash_pairs(sf_dir: str):
        return D.minhash_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_winnow_fingerprints(sf_dir: str):
        return D.winnow_fingerprints(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )

    def q_winnow_pairs(sf_dir: str):
        return D.winnow_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )

    def q_delta_dedup(sf_dir: str):
        """Incremental ingest dedup: the doc_id % 10 == 0 split plays
        the incoming delta, the rest the existing store."""
        import pyarrow as pa

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def split(keep_delta: bool):
            def body(b):
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                return b.filter(pa.array((ids % 10 == 0) == keep_delta))
            return body

        return D.delta_dedup(
            docs.map_batches(split(True), batch_format="pyarrow"),
            docs.map_batches(split(False), batch_format="pyarrow"),
        )

    def q_ngram_jaccard(sf_dir: str):
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        return D.ngram_jaccard_pairs(ds, threshold=0.5)

    def q_clean_corpus(sf_dir: str):
        from openie_backend_ray.ops.clean_corpus import clean_corpus

        return clean_corpus(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_fuzzy_components(sf_dir: str):
        from openie_backend_ray.ops.components import connected_components

        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        return connected_components(D.ngram_jaccard_pairs(ds, threshold=0.5))

    def q_simhash(sf_dir: str):
        return D.simhash(_read(sf_dir, "documents", ["doc_id", "text"]))

    def q_simhash_pairs(sf_dir: str):
        return D.simhash_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=3
        )

    def q_embedding_pairs(sf_dir: str):
        import ray
        import pyarrow.parquet as pq

        emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
        mat_ref = ray.put(D.normalized_matrix(emb))
        return D.embedding_pairs(
            _read(sf_dir, "embeddings"), mat_ref, threshold=0.35
        )

    def q_embedding_pairs_ivf(sf_dir: str):
        import ray
        import pyarrow.parquet as pq

        emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
        c_ref = ray.put(SIM.centroid_matrix(emb))  # ceil(sqrt(n)) sampled
        return SIM.embedding_pairs_ivf(
            _read(sf_dir, "embeddings"), c_ref, threshold=0.35
        )

    def q_ann_topk(sf_dir: str):
        import ray
        import pyarrow.parquet as pq

        emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
        q_ref = ray.put(SIM.query_matrix(emb, 10))
        return SIM.ann_topk(_read(sf_dir, "embeddings"), q_ref, k=10)

    def q_ann_ivf(sf_dir: str):
        import ray
        import pyarrow.parquet as pq

        emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
        q_ref = ray.put(SIM.query_matrix(emb, 10))
        c_ref = ray.put(SIM.centroid_matrix(emb))  # ceil(sqrt(n)) sampled
        return SIM.ann_ivf(
            _read(sf_dir, "embeddings"), q_ref, c_ref, k=10, nprobe=4
        )

    def q_pricing_summary(sf_dir: str):
        return R.pricing_summary(_read(sf_dir, "lineitem"))

    def q_segment_revenue(sf_dir: str):
        import ray
        import pyarrow.parquet as pq

        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment"],
        )
        cust_ref = ray.put(R.customer_segment_map(cust))
        return R.segment_revenue(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]), cust_ref
        )

    def q_top_parts(sf_dir: str):
        return R.top_parts_by_quantity(
            _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]), k=10
        )

    def q_events_daily(sf_dir: str):
        return R.events_daily(
            _read(sf_dir, "events", ["user_id", "ts", "value"])
        )

    def q_events_sessions(sf_dir: str):
        return R.events_sessions(
            _read(sf_dir, "events", ["user_id", "ts"]), gap_minutes=30
        )

    def q_asof_orders(sf_dir: str):
        return R.asof_latest_order(
            _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
            _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]),
        )

    def q_orders_in_range(sf_dir: str):
        return R.orders_in_range(
            _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
            _read(sf_dir, "orders",
                  ["o_orderkey", "o_custkey", "o_orderdate"]),
            days=7,
        )

    def q_kmv_distinct_tokens(sf_dir: str):
        return TS.kmv_distinct_tokens(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )

    def q_hash_sample(sf_dir: str):
        return R.hash_sample(
            _read(sf_dir, "documents", ["doc_id", "text"]), key="doc_id"
        )

    def q_decontaminate(sf_dir: str):
        """Benchmark decontamination: the eval side is the deterministic
        doc_id % 37 == 0 split (a stand-in for a fixed benchmark suite);
        its distinct 5-grams are broadcast and probed per training
        batch. k=5 instead of the published 13 because fixture docs are
        10-99 tokens."""
        import ray
        import pyarrow as pa
        from openie_backend_ray.ops import curation as CU

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def split(keep_eval: bool):
            def body(b):
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                return b.filter(pa.array((ids % 37 == 0) == keep_eval))
            return body

        grams = CU.collect_eval_grams(
            docs.map_batches(split(True), batch_format="pyarrow"), k=5
        )
        return CU.decontaminate(
            docs.map_batches(split(False), batch_format="pyarrow"),
            ray.put(grams), k=5,
        )

    def q_pii_redact(sf_dir: str):
        """PII scrub over docs enriched with deterministic doc_id-derived
        contact strings (the sf word-salad has no digits; the enrichment
        is the same synthesize-from-the-table idiom as media_spans, and
        the oracle derives the identical strings in SQL)."""
        import pyarrow as pa
        from openie_backend_ray.ops import curation as CU

        def enrich(b):
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            out = []
            for i, t in zip(ids, b["text"].to_pylist()):
                i = int(i)
                if i % 7 == 0:
                    t += " contact user" + str(i) + "@example.com"
                if i % 5 == 0:
                    t += (" call 555-" + str(100 + i % 900)
                          + "-" + str(1000 + i % 9000))
                if i % 11 == 0:
                    t += (" from 10.0." + str(i % 256)
                          + "." + str(1 + i % 254))
                if i % 13 == 0:
                    t += (" ssn " + str(100 + i % 900) + "-"
                          + str(10 + i % 90) + "-" + str(1000 + i % 9000))
                out.append(t)
            return pa.table({"doc_id": b["doc_id"],
                             "text": pa.array(out, pa.string())})

        return CU.pii_redact(
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(enrich, batch_format="pyarrow")
        )

    def q_stratified_sample(sf_dir: str):
        from openie_backend_ray.ops import curation as CU

        return CU.stratified_sample(
            _read(sf_dir, "documents", ["doc_id", "lang"]),
            by="lang", target=50,
        )

    def q_mixture_resample(sf_dir: str):
        """Multilingual sqrt-flattening: lang is the skewed column in
        the sf data (en ~2.7x de), so the downsampling path actually
        executes; source is uniform by construction."""
        from openie_backend_ray.ops import curation as CU

        return CU.mixture_resample(
            _read(sf_dir, "documents", ["doc_id", "lang"]),
            by="lang",
        )

    def q_dup_ngram_coverage(sf_dir: str):
        from openie_backend_ray.ops import curation as CU

        return CU.dup_ngram_coverage(
            _read(sf_dir, "documents", ["doc_id", "text"]), k=5
        )

    def q_pack_sequences(sf_dir: str):
        from openie_backend_ray.ops import curation as CU

        return CU.pack_sequences(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            budget=2048, bucket_range=256,
        )

    def q_source_mix(sf_dir: str):
        from openie_backend_ray.ops import curation as CU

        return CU.source_mix(
            _read(sf_dir, "documents", ["doc_id", "text", "source"])
        )

    def q_media_features(sf_dir: str):
        return MM.media_features(_interleaved_docs(sf_dir))

    def q_media_frames(_sf_dir: str):
        """Frame sampling runs over the fixture corpus — the sf flat
        table synthesizes only image spans (rows-only check; the frame
        count derivation is unit-tested against the sha256 stream)."""
        from openie_backend_ray.fixtures.corpus import documents_dataset

        return MM.media_frames(documents_dataset(n_blocks=8), every=2)

    # -- post-group KG operators over the golden fixture groups table
    # (rows-only checks: the GROUPS input is not a SQL view) ---------
    def _fixture_groups_ds(_sf_dir: str):
        import ray.data

        from openie_backend_ray.fixtures.corpus import build_groups_table

        return ray.data.from_arrow(build_groups_table()).repartition(8)

    def q_extreme_filter(sf_dir: str):
        import pyarrow as pa

        from openie_backend_ray.stages.postgroup import extreme_filter

        out = extreme_filter(_fixture_groups_ds(sf_dir))
        return out.map_batches(
            lambda b: pa.table({"arg1_norm": b["arg1_norm"],
                                "rel_norm": b["rel_norm"],
                                "arg2_norm": b["arg2_norm"],
                                "size": b["size"]}),
            batch_format="pyarrow",
        )

    def q_dedup_groups(sf_dir: str):
        import pyarrow as pa

        from openie_backend_ray.stages.postprocess import (
            dedup_groups_batch,
        )

        out = _fixture_groups_ds(sf_dir).map_batches(
            dedup_groups_batch, batch_format="pyarrow"
        )
        return out.map_batches(
            lambda b: pa.table({"arg1_norm": b["arg1_norm"],
                                "rel_norm": b["rel_norm"],
                                "arg2_norm": b["arg2_norm"],
                                "size": b["size"]}),
            batch_format="pyarrow",
        )

    def q_filter_groups(sf_dir: str):
        import pyarrow as pa

        from openie_backend_ray.stages.postprocess import (
            filter_groups_batch,
        )

        out = _fixture_groups_ds(sf_dir).map_batches(
            filter_groups_batch, batch_format="pyarrow"
        )
        return out.map_batches(
            lambda b: pa.table({"arg1_norm": b["arg1_norm"],
                                "rel_norm": b["rel_norm"],
                                "arg2_norm": b["arg2_norm"],
                                "size": b["size"]}),
            batch_format="pyarrow",
        )

    def q_head_phrases(sf_dir: str):
        from openie_backend_ray.stages.postgroup import head_phrases

        return head_phrases(_fixture_groups_ds(sf_dir))

    def q_answer_projections(sf_dir: str):
        from openie_backend_ray.stages.postgroup import answer_projections

        return answer_projections(_fixture_groups_ds(sf_dir))

    def q_regroup(sf_dir: str):
        import pyarrow as pa

        from openie_backend_ray.stages.postgroup import regroup

        out = regroup(_fixture_groups_ds(sf_dir))
        return out.map_batches(
            lambda b: pa.table({"arg1_norm": b["arg1_norm"],
                                "rel_norm": b["rel_norm"],
                                "arg2_norm": b["arg2_norm"],
                                "size": b["size"]}),
            batch_format="pyarrow",
        )

    def q_inlink_ratio(sf_dir: str):
        from openie_backend_ray.stages.postgroup import inlink_ratio

        return inlink_ratio(_fixture_groups_ds(sf_dir))

    def q_arg_pairs(sf_dir: str):
        from openie_backend_ray.stages.postgroup import arg_pairs

        return arg_pairs(_fixture_groups_ds(sf_dir))

    def q_renormalize(sf_dir: str):
        import pyarrow as pa

        from openie_backend_ray.stages.postgroup import renormalize

        out = renormalize(_fixture_groups_ds(sf_dir))
        return out.map_batches(
            lambda b: pa.table({"arg1_norm": b["arg1_norm"],
                                "rel_norm": b["rel_norm"],
                                "arg2_norm": b["arg2_norm"],
                                "size": b["size"]}),
            batch_format="pyarrow",
        )

    def q_canonicalize(sf_dir: str):
        import pyarrow as pa

        from openie_backend_ray.stages.canonicalize import canonicalize

        out = canonicalize(_fixture_groups_ds(sf_dir))
        return out.map_batches(
            lambda b: pa.table(
                {"arg1_norm": b["arg1_norm"],
                 "rel_norm": b["rel_norm"],
                 "arg2_norm": b["arg2_norm"],
                 "size": b["size"],
                 "linked": pa.array(
                     [
                         (a is not None) or (c is not None)
                         for a, c in zip(
                             b["arg1_entity"].to_pylist(),
                             b["arg2_entity"].to_pylist(),
                         )
                     ],
                     pa.bool_(),
                 )}
            ),
            batch_format="pyarrow",
        )

    def q_openie4_triples(sf_dir: str):
        """OpenIE4 corpus path (M3/M4 -> G1): sf docs + fixture corpus
        -> chunk -> Relnoun T-extractions -> keyed -> grouped."""
        import pyarrow as pa
        import ray

        from openie_backend_ray.fixtures.corpus import (
            build_chunker_lexicon,
            documents_dataset,
        )
        from openie_backend_ray.stages.openie4 import (
            openie4_triples_from_documents,
        )

        docs = _interleaved_docs(sf_dir).union(documents_dataset(n_blocks=8))
        lex_ref = ray.put(build_chunker_lexicon())
        groups = openie4_triples_from_documents(
            docs, lexicon_ref=lex_ref, corpus="cw"
        )
        return groups.map_batches(
            lambda b: pa.table(
                {"arg1_norm": b["arg1_norm"],
                 "rel_norm": b["rel_norm"],
                 "arg2_norm": b["arg2_norm"],
                 "size": b["size"]}
            ),
            batch_format="pyarrow",
        )

    def _q_group_extractions(salted: bool):
        """G1 grouper hash-oracle (the extraction back half): Ray runs
        the REAL combiner + shuffle + merge over the materialized
        keyed-extractions view; DuckDB re-derives the grouping (dedup
        window, caps, top instance) from the same parquet.  The salted
        variant proves the two-phase skew path is output-identical."""
        import ray.data

        from openie_backend_ray.fixtures.views import (
            ensure_views,
            keyed_rows_from_view,
            project_blob_groups,
        )
        from openie_backend_ray.stages.grouper import (
            group_extractions,
            group_extractions_salted,
        )

        d = ensure_views()
        keyed = (
            ray.data.read_parquet(f"{d}/extractions.parquet")
            .repartition(8)  # multiple blocks -> real multi-partial merges
            .map_batches(keyed_rows_from_view, batch_format="pyarrow")
        )
        fn = group_extractions_salted if salted else group_extractions
        blob = fn(keyed, finalize=False)
        return blob.map_batches(project_blob_groups, batch_format="pyarrow")

    def q_group_extractions(_sf_dir: str):
        return _q_group_extractions(salted=False)

    def q_group_extractions_salted(_sf_dir: str):
        return _q_group_extractions(salted=True)

    def q_fetch_groups(_sf_dir: str):
        """S5/J5 serving path end-to-end: materialize the fixture
        GROUPS to a sorted partitioned triples table, then run the
        budgeted size-tiered fetch (stoplist on, budgets ample so the
        status is Success and the result set is every group)."""
        import os

        import pyarrow as pa

        from openie_backend_ray.pipelines.flagship import (
            materialize_triples,
        )
        from openie_backend_ray.pipelines.query import fetch_groups

        from openie_backend_ray.fixtures.views import views_dir

        out_dir = os.path.join(views_dir(), "triples_store")
        marker = os.path.join(out_dir, "_DONE")
        if not os.path.exists(marker):
            materialize_triples(_fixture_groups_ds(_sf_dir), out_dir)
            open(marker, "w").close()
        rs = fetch_groups(out_dir, max_groups=10_000,
                          max_instances=1_000_000)
        assert rs.status == "success"
        return pa.table(
            {
                "arg1_norm": pa.array(
                    [r["arg1_norm"] for r in rs.results], pa.string()),
                "rel_norm": pa.array(
                    [r["rel_norm"] for r in rs.results], pa.string()),
                "arg2_norm": pa.array(
                    [r["arg2_norm"] for r in rs.results], pa.string()),
                "size": pa.array(
                    [r["size"] for r in rs.results], pa.int32()),
            }
        )

    def q_type_predictions(sf_dir: str):
        from openie_backend_ray.stages.typer import (
            TyperSettings,
            predict_arg_types,
        )

        # fixture-scale thresholds (the production defaults need web
        # scale group counts per rel to fire)
        settings = TyperSettings(arg_field="arg1", min_share_score=2,
                                 min_rel_weight=0.05)
        preds = predict_arg_types(_fixture_groups_ds(sf_dir), settings)
        import pyarrow as pa

        return preds.map_batches(
            lambda b: pa.table({"arg_norm": b["arg_norm"],
                                "types": b["types"]}),
            batch_format="pyarrow",
        )

    # REGISTRATION ORDER IS A CONTRACT: the driver's correctness check
    # caps at the FIRST 50 entries, so the KG core (the operators the
    # reference exists for) registers first, then every entry whose
    # code changed recently (the dedup/similarity families this
    # round), then the rotation slots.  Round-5 rotation: the 8
    # textstats/media entries pushed out in round 4 rotate BACK into
    # the window (the round-4 verdict's ask — they must be
    # driver-verified again before their source is next edited); the
    # relational demo family + kmv rotate out, being (a) driver-green
    # in r02 AND r03 AND r04, (b) untouched since, and (c) outside
    # SURVEY §2's KG inventory.  ALL registered entries — including
    # the tail and the round-4-retired top_tokens/simhash re-added at
    # the very end — stay runnable locally via
    # ``scripts/check_oracles.py`` and the pytest oracle sweep, so
    # coverage loss from the window cap is driver-only.
    return {
        # -- KG core (SURVEY §2 G/M/S operators) — always in-window --
        "group_extractions": q_group_extractions,
        "group_extractions_salted": q_group_extractions_salted,
        "canonicalize": q_canonicalize,
        "type_predictions": q_type_predictions,
        "openie4_triples": q_openie4_triples,
        "fetch_groups": q_fetch_groups,
        "renormalize": q_renormalize,
        "inlink_ratio": q_inlink_ratio,
        "arg_pairs": q_arg_pairs,
        "regroup": q_regroup,
        "extreme_filter": q_extreme_filter,
        "dedup_groups": q_dedup_groups,
        "filter_groups": q_filter_groups,
        "head_phrases": q_head_phrases,
        "answer_projections": q_answer_projections,
        "flagship_triples": _flagship_triples,
        # -- dedup / similarity family (touched this round) ----------
        "dedup_exact": q_dedup_exact,
        "span_dedup": q_span_dedup,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "winnow_fingerprints": q_winnow_fingerprints,
        "winnow_pairs": q_winnow_pairs,
        "delta_dedup": q_delta_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "clean_corpus": q_clean_corpus,
        "fuzzy_components": q_fuzzy_components,
        "simhash_pairs": q_simhash_pairs,
        "embedding_pairs": q_embedding_pairs,
        "embedding_pairs_ivf": q_embedding_pairs_ivf,
        "ann_topk": q_ann_topk,
        "ann_ivf": q_ann_ivf,
        # -- curation family ------------------------------------------
        "decontaminate": q_decontaminate,
        "pii_redact": q_pii_redact,
        "stratified_sample": q_stratified_sample,
        "pack_sequences": q_pack_sequences,
        "source_mix": q_source_mix,
        "dup_ngram_coverage": q_dup_ngram_coverage,
        "mixture_resample": q_mixture_resample,
        "quality_gate": q_quality_gate,
        "hash_sample": q_hash_sample,
        # -- sources / multimodal --------------------------------------
        "explode_text_spans": q_explode_text_spans,
        "media_features": q_media_features,
        "media_frames": q_media_frames,
        "media_spans": q_media_spans,
        # -- textstats (rotated back in, round 5) -----------------------
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "vocab_stats": q_vocab_stats,
        "repetition_stats": q_repetition_stats,
        "bpe_token_stats": q_bpe_token_stats,
        # ---- position 51+: outside the driver window (see above) ----
        "kmv_distinct_tokens": q_kmv_distinct_tokens,
        "pricing_summary": q_pricing_summary,
        "segment_revenue": q_segment_revenue,
        "top_parts": q_top_parts,
        "events_daily": q_events_daily,
        "events_sessions": q_events_sessions,
        "asof_orders": q_asof_orders,
        "orders_in_range": q_orders_in_range,
        # round-4-retired entries re-registered for LOCAL verification
        # only (subsumed in-window by vocab_stats / simhash_pairs):
        "top_tokens": q_top_tokens,
        "simhash": q_simhash,
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_TOKS = r"regexp_split_to_array(text, '\s+')"

# dedup-family token source: the shingle separator chr(30) is stripped
# BEFORE tokenizing (mirrors ops.dedup._dedup_tokens — \x1e is not
# regex whitespace, so without the strip it would survive inside a
# token and fragment the packed shingle string)
_DTOKS = r"regexp_split_to_array(replace(text, chr(30), ''), '\s+')"

# doc -> distinct 3-token shingles (k matches ops.dedup.SHINGLE_K)
_SHINGLES_CTE = f"""
t AS (SELECT doc_id, {_DTOKS} AS toks FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
              ELSE list_distinct(list_transform(
                     range(1, len(toks) - 1),
                     i -> array_to_string(toks[i:i+2], ' ')))
         END AS shingles
  FROM t)
"""

# winnowing twin (ops.dedup.winnow_fingerprints_batch): k-gram md5s,
# distinct window-of-w minimums; short docs hash the whole text
_WINNOW_CTE = f"""
t AS (SELECT doc_id, {_DTOKS} AS toks FROM documents),
h AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 3
              THEN [md5(array_to_string(toks, ' '))]
              ELSE list_transform(range(1, len(toks) - 1),
                     i -> md5(array_to_string(toks[i:i+2], ' ')))
         END AS hs
  FROM t),
sel AS (
  SELECT doc_id,
         CASE WHEN len(hs) <= 4 THEN [list_min(hs)]
              ELSE list_distinct(list_transform(
                     range(1, len(hs) - 2),
                     i -> list_min(hs[i:i+3])))
         END AS fps
  FROM h)
"""

# shingles -> 12-perm minhash signature -> 4 LSH band buckets -> pairs.
# One md5 per shingle; permutations are universal hashes over its
# 52-bit prefix (ops.dedup._signature): h = int(md5[:13], 16) exactly
# reconstructed from hex digits (the KMV trick — (strpos-1) * 16^(13-i)
# products and their sum stay < 2^53, exact in the double intermediate),
# then min((A*p+1)*h + (B*p+7)) mod (2^61 - 1) in HUGEINT arithmetic;
# CAST(HUGEINT AS VARCHAR) == Python str(int) for the bucket concat.
_MINHASH_CTE = _SHINGLES_CTE + """,
shr AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
shi AS (
  SELECT doc_id,
         CAST((SELECT sum(
                 (strpos('0123456789abcdef',
                         substr(md5(shr.s), i.i, 1)) - 1)
                 * power(16.0, 13 - i.i))
               FROM (SELECT unnest(range(1, 14)) AS i) i)
              AS HUGEINT) AS h
  FROM shr),
sigp AS (
  SELECT doc_id, p.p AS p,
         min((CAST(2654435761 * p.p + 1 AS HUGEINT) * h
              + CAST(40503 * p.p + 7 AS HUGEINT))
             % CAST(2305843009213693951 AS HUGEINT)) AS v
  FROM shi CROSS JOIN (SELECT unnest(range(0, 12)) AS p) p
  GROUP BY doc_id, p.p),
sig AS (
  SELECT doc_id, list(CAST(v AS VARCHAR) ORDER BY p) AS sig
  FROM sigp GROUP BY doc_id),
bands AS (
  SELECT doc_id, b.b AS band,
         md5(sig[b.b*3+1] || '|' || sig[b.b*3+2] || '|' || sig[b.b*3+3])
           AS bucket
  FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b) b),
cand AS (
  -- chain + star pairs (ops.dedup._chain_star_pairs): each bucket
  -- member pairs with its sorted-by-id predecessor (chain: linear,
  -- run-connected) AND with the bucket's min-id anchor (star:
  -- anchor-adjacent recall); union deduped
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT prev AS doc_a, doc_id AS doc_b
    FROM (SELECT doc_id,
                 lag(doc_id) OVER (PARTITION BY band, bucket
                                   ORDER BY doc_id) AS prev
          FROM bands)
    WHERE prev IS NOT NULL
    UNION ALL
    SELECT anchor AS doc_a, doc_id AS doc_b
    FROM (SELECT doc_id,
                 first_value(doc_id) OVER (PARTITION BY band, bucket
                                           ORDER BY doc_id) AS anchor
          FROM bands)
    WHERE anchor <> doc_id))
"""

_EMB_D = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

# 64-bit SimHash in SQL: md5 bytes -> +-1 bits weighted by token
# multiplicity -> sign -> nibble hex (matches ops.dedup.simhash_batch
# bit-for-bit; validated over the full sf0.001 table)
_SIMHASH_CTE = r"""
tok AS (SELECT doc_id,
               unnest(regexp_split_to_array(text, '\s+')) AS token
        FROM documents),
th AS (SELECT doc_id, token, count(*) AS n, md5(token) AS h
       FROM tok GROUP BY doc_id, token),
bits AS (
  SELECT doc_id, b.bit,
     sum(n * (2 * (((16*(strpos('0123456789abcdef',
                                substr(h, (b.bit//8)*2+1, 1))-1)
                     + strpos('0123456789abcdef',
                              substr(h, (b.bit//8)*2+2, 1))-1)
                   >> (7 - (b.bit % 8))) & 1) - 1)) AS s
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS bit) b
  GROUP BY doc_id, b.bit),
nibs AS (SELECT doc_id, bit//4 AS ni,
                sum(CASE WHEN s > 0 THEN 1<<(3-(bit%4)) ELSE 0 END) AS nv
         FROM bits GROUP BY doc_id, bit//4),
sh64 AS (SELECT doc_id,
                string_agg(substr('0123456789abcdef',
                                  CAST(nv AS INT)+1, 1), ''
                           ORDER BY ni) AS simhash,
                CAST(sum(CASE WHEN nv > 0
                              THEN CAST(nv AS HUGEINT)
                                   << ((15 - ni) * 4)
                              ELSE 0 END) AS UBIGINT) AS v
         FROM nibs GROUP BY doc_id)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "explode_text_spans": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                        AS INTEGER) AS span_idx,
                   text
            FROM documents
        """,
        "media_spans": """
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   CAST(0 AS INTEGER) AS span_idx,
                   'image' AS kind,
                   'media://image/' || CAST(doc_id AS VARCHAR) AS media_ref
            FROM documents WHERE doc_id % 3 = 0
        """,
        "token_stats": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
                   CAST(len(list_filter(toks,
                          x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
                     / len(toks) AS stopword_ratio
            FROM t
        """,
        "quality_score": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
            s AS (
              SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CAST(length(text) - (len(toks) - 1) AS DOUBLE)
                       / len(toks) AS mean_token_len,
                     CAST(len(list_filter(toks,
                            x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
                       / len(toks) AS stopword_ratio
              FROM t)
            SELECT doc_id, n_tokens, mean_token_len, stopword_ratio,
                   (n_tokens >= 10 AND n_tokens <= 10000
                    AND stopword_ratio <= 0.5) AS keep
            FROM s
        """,
        "fingerprint": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   CASE WHEN len(toks) < 5
                        THEN md5(array_to_string(toks, ' '))
                        ELSE list_min(list_transform(
                               range(1, len(toks) - 3),
                               i -> md5(array_to_string(toks[i:i+4], ' '))))
                   END AS fingerprint
            FROM t
        """,
        "vocab_stats": f"""
            WITH tok AS (
              SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token
              FROM documents)
            SELECT count(*) AS n_tokens,
                   count(DISTINCT token) AS n_distinct
            FROM tok
        """,
        "top_tokens": f"""
            WITH tok AS (
              SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token
              FROM documents)
            SELECT token, count(*) AS n FROM tok
            GROUP BY token ORDER BY n DESC, token LIMIT 20
        """,
        # Gopher-style repetition signals (Rae et al. 2021 §A1.1):
        # top-bigram occupancy + duplicated-trigram occurrence fraction
        "repetition_stats": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            bgs AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i+1])) AS g
              FROM t),
            bcnt AS (SELECT doc_id, g, count(*) AS c
                     FROM bgs GROUP BY doc_id, g),
            btop AS (SELECT doc_id,
                            CAST(max(c) AS DOUBLE) / sum(c) AS f
                     FROM bcnt GROUP BY doc_id),
            tgs AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1]
                            || ' ' || toks[i+2])) AS g
              FROM t),
            tcnt AS (SELECT doc_id, g, count(*) AS c
                     FROM tgs GROUP BY doc_id, g),
            tdup AS (SELECT doc_id,
                            CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
                                 AS DOUBLE) / sum(c) AS f
                     FROM tcnt GROUP BY doc_id)
            SELECT t.doc_id,
                   COALESCE(b.f, 0.0) AS top_bigram_frac,
                   COALESCE(d.f, 0.0) AS dup_trigram_frac,
                   (COALESCE(b.f, 0.0) > 0.2
                    OR COALESCE(d.f, 0.0) > 0.3) AS repetitive
            FROM t
            LEFT JOIN btop b USING (doc_id)
            LEFT JOIN tdup d USING (doc_id)
        """,
        # composed cleaning gate: quality + repetition + lang twins
        # AND-ed exactly as ops.textstats.quality_gate_batch composes
        # the three batch kernels
        "quality_gate": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS} AS toks
                       FROM documents),
            q AS (
              SELECT doc_id,
                     (len(toks) >= 10 AND len(toks) <= 10000
                      AND CAST(len(list_filter(toks,
                            x -> list_contains({_STOP_SQL}, x))) AS DOUBLE)
                          / len(toks) <= 0.5) AS quality_ok
              FROM t),
            bgs AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks)),
                       i -> toks[i] || ' ' || toks[i+1])) AS g
              FROM t),
            bcnt AS (SELECT doc_id, g, count(*) AS c
                     FROM bgs GROUP BY doc_id, g),
            btop AS (SELECT doc_id,
                            CAST(max(c) AS DOUBLE) / sum(c) AS f
                     FROM bcnt GROUP BY doc_id),
            tgs AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1]
                            || ' ' || toks[i+2])) AS g
              FROM t),
            tcnt AS (SELECT doc_id, g, count(*) AS c
                     FROM tgs GROUP BY doc_id, g),
            tdup AS (SELECT doc_id,
                            CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
                                 AS DOUBLE) / sum(c) AS f
                     FROM tcnt GROUP BY doc_id),
            rep AS (
              SELECT t.doc_id,
                     (COALESCE(b.f, 0.0) > 0.2
                      OR COALESCE(d.f, 0.0) > 0.3) AS repetitive
              FROM t LEFT JOIN btop b USING (doc_id)
              LEFT JOIN tdup d USING (doc_id)),
            tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
            markers(lang, token) AS (VALUES {_lang_marker_values()}),
            sc AS (SELECT tok.doc_id, m.lang, count(*) AS c
                   FROM tok JOIN markers m ON m.token = tok.token
                   GROUP BY tok.doc_id, m.lang),
            best AS (SELECT doc_id, lang,
                            row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, lang) AS rn
                     FROM sc),
            lng AS (
              SELECT t.doc_id,
                     (COALESCE(b.lang, 'und') = 'en') AS lang_ok
              FROM t LEFT JOIN best b
                ON b.doc_id = t.doc_id AND b.rn = 1)
            SELECT t.doc_id, q.quality_ok, rep.repetitive, lng.lang_ok,
                   (q.quality_ok AND NOT rep.repetitive
                    AND lng.lang_ok) AS keep
            FROM t
            JOIN q USING (doc_id)
            JOIN rep USING (doc_id)
            JOIN lng USING (doc_id)
        """,
        # BPE pre-tokenizer twin: same RE2 pattern, apostrophes doubled
        # for the SQL literal (see ops.textstats.BPE_PRETOKEN_RE)
        "bpe_token_stats": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_split_to_array(text, '\s+'))
                          AS BIGINT) AS n_words,
                     CAST(len(regexp_extract_all(text,
                       '''s|''t|''re|''ve|''m|''ll|''d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+'
                     )) AS BIGINT) AS n_bpe_pieces
              FROM documents)
            SELECT doc_id, n_words, n_bpe_pieces,
                   CAST(n_bpe_pieces AS DOUBLE) / CAST(n_words AS DOUBLE)
                     AS pieces_per_word
            FROM t
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS doc_id, md5(text) AS text_md5
            FROM documents GROUP BY md5(text)
        """,
        "span_dedup": """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t
              FROM documents),
            src AS (
              SELECT doc_id, t,
                     greatest(1, CAST(ceil(len(t) / 10.0) AS BIGINT))
                       AS n_spans
              FROM toks),
            spans AS (
              SELECT doc_id, i AS span_idx, n_spans,
                     array_to_string(list_slice(t, i*10 + 1, i*10 + 10),
                                     ' ') AS span
              FROM src, UNNEST(range(n_spans)) AS u(i)),
            ranked AS (
              SELECT *, row_number() OVER (
                  PARTITION BY md5(span) ORDER BY doc_id, span_idx) AS rn
              FROM spans)
            SELECT doc_id,
                   string_agg(span, ' ' ORDER BY span_idx) AS text,
                   any_value(n_spans) AS n_spans,
                   count(*) AS n_kept
            FROM ranked WHERE rn = 1
            GROUP BY doc_id
        """,
        "dedup_minhash_pairs": f"""
            WITH {_MINHASH_CTE}
            SELECT doc_a, doc_b FROM cand
        """,
        # winnowing (k=3 grams, w=4 windows): selecting window-min by
        # VALUE makes the fingerprint set tie-rule-free, so list_min
        # over md5 hex == Python min over the same hex strings
        "winnow_fingerprints": f"""
            WITH {_WINNOW_CTE}
            SELECT doc_id, unnest(fps) AS fp FROM sel
        """,
        "winnow_pairs": f"""
            WITH {_WINNOW_CTE},
            e AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
            cand AS (
              SELECT DISTINCT doc_a, doc_b FROM (
                SELECT prev AS doc_a, doc_id AS doc_b
                FROM (SELECT doc_id,
                             lag(doc_id) OVER (PARTITION BY fp
                                               ORDER BY doc_id) AS prev
                      FROM e)
                WHERE prev IS NOT NULL
                UNION ALL
                SELECT anchor AS doc_a, doc_id AS doc_b
                FROM (SELECT doc_id,
                             first_value(doc_id) OVER (
                               PARTITION BY fp ORDER BY doc_id) AS anchor
                      FROM e)
                WHERE anchor <> doc_id))
            SELECT doc_a, doc_b FROM cand
        """,
        # delta-vs-store content dedup: per delta doc, how many of its
        # winnowed fingerprints exist anywhere in the store split
        "delta_dedup": f"""
            WITH {_WINNOW_CTE},
            e AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
            st AS (SELECT DISTINCT fp FROM e WHERE doc_id % 10 <> 0),
            dl AS (SELECT doc_id, fp FROM e WHERE doc_id % 10 = 0)
            SELECT dl.doc_id, CAST(count(*) AS BIGINT) AS n_shared
            FROM dl JOIN st USING (fp)
            GROUP BY dl.doc_id
        """,
        "ngram_jaccard": f"""
            WITH {_MINHASH_CTE}
            SELECT c.doc_a, c.doc_b,
                   CAST(len(list_intersect(sa.shingles, sb.shingles))
                        AS DOUBLE)
                     / len(list_distinct(sa.shingles || sb.shingles))
                     AS jaccard
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b
            WHERE CAST(len(list_intersect(sa.shingles, sb.shingles))
                       AS DOUBLE)
                    / len(list_distinct(sa.shingles || sb.shingles)) >= 0.5
        """,
        "clean_corpus": f"""
            WITH {_MINHASH_CTE},
            jac AS (
              SELECT c.doc_a, c.doc_b
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b
              WHERE CAST(len(list_intersect(sa.shingles, sb.shingles))
                         AS DOUBLE)
                      / len(list_distinct(sa.shingles || sb.shingles))
                      >= 0.5),
            exact_keep AS (
              SELECT min(doc_id) AS doc_id FROM documents
              GROUP BY md5(text)),
            near_losers AS (SELECT DISTINCT doc_b AS doc_id FROM jac),
            stats AS (
              -- quality gate tokenizes RAW text (textstats semantics),
              -- unlike the chr(30)-stripped dedup tokens in t
              SELECT doc_id,
                     CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                     CAST(len(list_filter({_TOKS},
                            x -> list_contains({_STOP_SQL}, x)))
                          AS DOUBLE) / len({_TOKS}) AS stopword_ratio
              FROM documents)
            SELECT s.doc_id, s.n_tokens
            FROM stats s
            JOIN exact_keep k ON k.doc_id = s.doc_id
            WHERE s.doc_id NOT IN (SELECT doc_id FROM near_losers)
              AND s.n_tokens >= 10 AND s.n_tokens <= 10000
              AND s.stopword_ratio <= 0.5
        """,
        # connected components of the Jaccard-verified pair graph:
        # component = min reachable doc_id (recursive transitive
        # closure; the Ray side runs the large-star/small-star
        # algorithm, ops/components.py)
        "fuzzy_components": f"""
            WITH RECURSIVE {_MINHASH_CTE},
            jac AS (
              SELECT c.doc_a, c.doc_b
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b
              WHERE CAST(len(list_intersect(sa.shingles, sb.shingles))
                         AS DOUBLE)
                      / len(list_distinct(sa.shingles || sb.shingles))
                      >= 0.5),
            sym AS (SELECT doc_a AS u, doc_b AS v FROM jac
                    UNION SELECT doc_b, doc_a FROM jac),
            reach AS (SELECT u, v FROM sym
                      UNION
                      SELECT r.u, s.v FROM reach r
                      JOIN sym s ON r.v = s.u)
            SELECT u AS doc_id, least(u, min(v)) AS component
            FROM reach GROUP BY u
        """,
        "embedding_pairs": f"""
            WITH v AS (SELECT vec_id, {_EMB_D} AS e FROM embeddings)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.e, b.e), 6) AS cosine
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.35
        """,
        "embedding_pairs_ivf": f"""
            WITH v AS (SELECT vec_id, {_EMB_D} AS e FROM embeddings),
            -- ceil(sqrt(n)) centroids sampled by md5(vec_id) order
            -- (ops.similarity.centroid_matrix)
            c AS (SELECT vec_id AS cid, e AS ce FROM v
                  QUALIFY row_number() OVER (
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                    <= CAST(ceil(sqrt((SELECT count(*) FROM v)))
                            AS BIGINT)),
            assign AS (
              SELECT vec_id, e, cid AS bucket FROM (
                SELECT v.vec_id, v.e, c.cid,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY round(list_cosine_similarity(v.e, c.ce),
                                        6) DESC, c.cid) AS rn
                FROM v CROSS JOIN c) WHERE rn = 1)
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.e, b.e), 6) AS cosine
            FROM assign a JOIN assign b
              ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.35
        """,
        "ann_topk": f"""
            WITH v AS (SELECT vec_id, {_EMB_D} AS e FROM embeddings),
            q AS (SELECT vec_id AS qvec_id, e AS qe FROM v
                  WHERE vec_id < 10),
            s AS (SELECT q.qvec_id, v.vec_id,
                         round(list_cosine_similarity(q.qe, v.e), 6)
                           AS score
                  FROM q CROSS JOIN v WHERE v.vec_id != q.qvec_id)
            SELECT qvec_id, vec_id,
                   CAST(row_number() OVER (
                     PARTITION BY qvec_id ORDER BY score DESC, vec_id)
                     AS INTEGER) AS rank,
                   score
            FROM s
            QUALIFY rank <= 10
        """,
        "ann_ivf": f"""
            WITH v AS (SELECT vec_id, {_EMB_D} AS e FROM embeddings),
            -- same sampled-sqrt(n) quantizer as embedding_pairs_ivf
            c AS (SELECT vec_id AS cid, e AS ce FROM v
                  QUALIFY row_number() OVER (
                      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
                    <= CAST(ceil(sqrt((SELECT count(*) FROM v)))
                            AS BIGINT)),
            q AS (SELECT vec_id AS qvec_id, e AS qe FROM v
                  WHERE vec_id < 10),
            assign AS (
              SELECT vec_id, e, cid AS bucket FROM (
                SELECT v.vec_id, v.e, c.cid,
                       row_number() OVER (PARTITION BY v.vec_id
                         ORDER BY round(list_cosine_similarity(v.e, c.ce),
                                        6) DESC, c.cid) AS rn
                FROM v CROSS JOIN c) WHERE rn = 1),
            probes AS (
              SELECT qvec_id, cid FROM (
                SELECT q.qvec_id, c.cid,
                       row_number() OVER (PARTITION BY q.qvec_id
                         ORDER BY round(list_cosine_similarity(q.qe, c.ce),
                                        6) DESC, c.cid) AS rn
                FROM q CROSS JOIN c) WHERE rn <= 4),
            s AS (
              SELECT q.qvec_id, a.vec_id,
                     round(list_cosine_similarity(q.qe, a.e), 6) AS score
              FROM q JOIN probes p ON p.qvec_id = q.qvec_id
                     JOIN assign a ON a.bucket = p.cid
              WHERE a.vec_id != q.qvec_id)
            SELECT qvec_id, vec_id,
                   CAST(row_number() OVER (
                     PARTITION BY qvec_id ORDER BY score DESC, vec_id)
                     AS INTEGER) AS rank,
                   score
            FROM s
            QUALIFY rank <= 10
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum(l_quantity) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS sum_price_cents,
                   count(*) AS row_count
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "segment_revenue": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS total_price_cents,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "top_parts": """
            SELECT l_partkey, sum(l_quantity) AS total_qty
            FROM lineitem GROUP BY l_partkey
            ORDER BY total_qty DESC, l_partkey LIMIT 10
        """,
        "events_daily": """
            SELECT user_id, date_trunc('day', ts) AS day,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                        AS BIGINT) AS sum_value_micros
            FROM events GROUP BY user_id, date_trunc('day', ts)
        """,
        "events_sessions": """
            WITH d AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 30 MINUTES
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (SELECT user_id, ts,
                         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
                  FROM d)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   min(ts) AS session_start, max(ts) AS session_end,
                   count(*) AS n_events
            FROM s GROUP BY user_id, session_id
        """,
        "asof_orders": """
            WITH cand AS (
              SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                     row_number() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC,
                                o.o_orderkey DESC) AS rn
              FROM events e JOIN orders o
                ON o.o_custkey = e.user_id
               AND o.o_orderdate <= CAST(e.ts AS DATE))
            SELECT e.event_id, e.user_id, e.ts, c.o_orderkey,
                   strftime(c.o_orderdate, '%Y-%m-%d') AS o_orderdate
            FROM events e
            LEFT JOIN cand c ON c.event_id = e.event_id AND c.rn = 1
        """,
        "orders_in_range": """
            WITH cnt AS (
              SELECT e.event_id, count(*) AS n
              FROM events e JOIN orders o
                ON o.o_custkey = e.user_id
               AND o.o_orderdate <= CAST(e.ts AS DATE)
               AND o.o_orderdate >= CAST(e.ts AS DATE) - 7
              GROUP BY e.event_id)
            SELECT e.event_id, e.user_id,
                   CAST(coalesce(c.n, 0) AS BIGINT) AS n_orders
            FROM events e LEFT JOIN cnt c USING (event_id)
        """,
        # KMV sketch: frac uses the first 13 hex chars (52 bits) so
        # every term and the sum are exactly representable in float64
        # on both engines
        "kmv_distinct_tokens": r"""
            WITH tok AS (
              SELECT DISTINCT
                     unnest(regexp_split_to_array(text, '\s+')) AS t
              FROM documents),
            hs AS (SELECT md5(t) AS h FROM tok ORDER BY h LIMIT 64),
            agg AS (SELECT max(h) AS kth_hash, count(*) AS n_hashes
                    FROM hs),
            fr AS (
              SELECT kth_hash, n_hashes,
                     (SELECT sum(
                        (strpos('0123456789abcdef',
                                substr(a.kth_hash, i.i, 1)) - 1)
                        * power(16.0, 13 - i.i))
                      FROM (SELECT unnest(range(1, 14)) AS i) i)
                     / power(2.0, 52) AS frac
              FROM agg a)
            SELECT CASE WHEN n_hashes < 64
                        THEN CAST(n_hashes AS DOUBLE)
                        ELSE 63 / frac END AS estimate,
                   kth_hash, n_hashes
            FROM fr
        """,
        "hash_sample": """
            SELECT doc_id, text FROM documents
            WHERE md5(CAST(doc_id AS VARCHAR)) < '4'
        """,
        # decontamination twin: distinct 5-grams per doc; eval split is
        # doc_id % 37 = 0; LEFT JOIN + count(non-null) = is_in probe
        "decontaminate": r"""
            WITH t AS (SELECT doc_id,
                              regexp_split_to_array(text, '\s+') AS toks
                       FROM documents),
            g AS (SELECT doc_id,
                         list_distinct(list_transform(
                           range(1, len(toks) - 3),
                           i -> array_to_string(toks[i:i+4], ' ')))
                           AS grams
                  FROM t),
            ev AS (SELECT DISTINCT unnest(grams) AS gram
                   FROM g WHERE doc_id % 37 = 0),
            tr AS (SELECT doc_id, unnest(grams) AS gram
                   FROM g WHERE doc_id % 37 <> 0),
            hits AS (SELECT tr.doc_id,
                            count(*) AS n_grams,
                            count(ev.gram) AS n_contaminated
                     FROM tr LEFT JOIN ev USING (gram)
                     GROUP BY tr.doc_id)
            SELECT doc_id,
                   CAST(n_grams AS BIGINT) AS n_grams,
                   CAST(n_contaminated AS BIGINT) AS n_contaminated,
                   CAST(n_contaminated AS DOUBLE) / n_grams
                     AS contamination_frac,
                   (CAST(n_contaminated AS DOUBLE) / n_grams >= 0.5)
                     AS contaminated
            FROM hits
        """,
        # PII twin: identical doc_id-derived enrichment, then the SAME
        # RE2 patterns counted + replaced in the same sequence (pyarrow
        # and DuckDB both embed RE2, so parity is byte-exact)
        "pii_redact": r"""
            WITH en AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR)
                             || '@example.com' ELSE '' END
                     || CASE WHEN doc_id % 5 = 0
                        THEN ' call 555-'
                             || CAST(100 + doc_id % 900 AS VARCHAR)
                             || '-'
                             || CAST(1000 + doc_id % 9000 AS VARCHAR)
                        ELSE '' END
                     || CASE WHEN doc_id % 11 = 0
                        THEN ' from 10.0.'
                             || CAST(doc_id % 256 AS VARCHAR) || '.'
                             || CAST(1 + doc_id % 254 AS VARCHAR)
                        ELSE '' END
                     || CASE WHEN doc_id % 13 = 0
                        THEN ' ssn ' || CAST(100 + doc_id % 900 AS VARCHAR)
                             || '-' || CAST(10 + doc_id % 90 AS VARCHAR)
                             || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                        ELSE '' END AS t0
              FROM documents),
            s1 AS (SELECT doc_id,
                          CAST(len(regexp_extract_all(t0,
                            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'
                          )) AS BIGINT) AS n_email,
                          regexp_replace(t0,
                            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g') AS t1
                   FROM en),
            s2 AS (SELECT doc_id, n_email,
                          CAST(len(regexp_extract_all(t1,
                            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'
                          )) AS BIGINT) AS n_ssn,
                          regexp_replace(t1,
                            '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b',
                            '<SSN>', 'g') AS t2
                   FROM s1),
            s3 AS (SELECT doc_id, n_email, n_ssn,
                          CAST(len(regexp_extract_all(t2,
                            '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b'
                          )) AS BIGINT) AS n_phone,
                          regexp_replace(t2,
                            '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b',
                            '<PHONE>', 'g') AS t3
                   FROM s2),
            s4 AS (SELECT doc_id, n_email, n_ssn, n_phone,
                          CAST(len(regexp_extract_all(t3,
                            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'
                          )) AS BIGINT) AS n_ip,
                          regexp_replace(t3,
                            '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                            '<IP>', 'g') AS t4
                   FROM s3)
            SELECT doc_id, t4 AS clean_text,
                   n_email, n_ssn, n_phone, n_ip
            FROM s4
        """,
        "stratified_sample": """
            SELECT lang, doc_id, sample_rank FROM (
              SELECT lang, doc_id,
                     CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ) AS BIGINT) AS sample_rank
              FROM documents)
            WHERE sample_rank <= 50
        """,
        # sqrt-temperature mixture resample twin: ONE int/int division
        # + ONE sqrt (both IEEE-correctly-rounded) per source; the
        # Bernoulli draw is the exact 52-bit md5 fraction (KMV trick)
        "mixture_resample": r"""
            WITH c AS (SELECT lang, count(*) AS n
                       FROM documents GROUP BY lang),
            m AS (SELECT min(n) AS nmin FROM c),
            r AS (SELECT lang,
                         sqrt(CAST((SELECT nmin FROM m) AS DOUBLE)
                              / CAST(n AS DOUBLE)) AS rate
                  FROM c),
            f AS (
              SELECT d.doc_id, d.lang, r.rate,
                     (SELECT sum(
                        (strpos('0123456789abcdef',
                           substr(md5(CAST(d.doc_id AS VARCHAR)),
                                  i.i, 1)) - 1)
                        * power(16.0, 13 - i.i))
                      FROM (SELECT unnest(range(1, 14)) AS i) i)
                     / power(2.0, 52) AS frac
              FROM documents d JOIN r USING (lang))
            SELECT doc_id, lang, rate FROM f WHERE frac < rate
        """,
        # duplicate-gram coverage twin: occurrence counts per (doc,
        # gram), gram multiplicity via a self-aggregate, per-doc sums
        "dup_ngram_coverage": r"""
            WITH t AS (SELECT doc_id,
                              regexp_split_to_array(text, '\s+') AS toks
                       FROM documents),
            g AS (SELECT doc_id,
                         unnest(list_transform(
                           range(1, len(toks) - 3),
                           i -> array_to_string(toks[i:i+4], ' ')))
                           AS gram
                  FROM t),
            oc AS (SELECT doc_id, gram, count(*) AS n_occ
                   FROM g GROUP BY doc_id, gram),
            gd AS (SELECT gram, count(*) AS n_docs
                   FROM oc GROUP BY gram)
            SELECT oc.doc_id,
                   CAST(sum(oc.n_occ) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN gd.n_docs > 1 THEN oc.n_occ
                                 ELSE 0 END) AS BIGINT) AS dup_grams,
                   CAST(sum(CASE WHEN gd.n_docs > 1 THEN oc.n_occ
                                 ELSE 0 END) AS DOUBLE)
                     / sum(oc.n_occ) AS dup_frac
            FROM oc JOIN gd USING (gram)
            GROUP BY oc.doc_id
        """,
        # concat-and-chop packing twin: the distributed prefix sum is a
        # window sum in SQL (ints end-to-end, no FP divergence)
        "pack_sequences": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_split_to_array(text, '\s+'))
                          AS BIGINT) AS n_tokens
              FROM documents),
            r AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS rb
              FROM t)
            SELECT doc_id, n_tokens,
                   CAST(rb // 2048 AS BIGINT) AS seq_id,
                   CAST(rb % 2048 AS BIGINT) AS offset_in_seq
            FROM r
        """,
        "source_mix": r"""
            WITH s AS (
              SELECT source,
                     CAST(count(*) AS BIGINT) AS n_docs,
                     CAST(sum(len(regexp_split_to_array(text, '\s+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY source)
            SELECT source, n_docs, n_tokens,
                   CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()
                     AS doc_share,
                   CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER ()
                     AS token_share
            FROM s
        """,
        "simhash": f"""
            WITH {_SIMHASH_CTE}
            SELECT doc_id, simhash FROM sh64
        """,
        "simhash_pairs": f"""
            WITH {_SIMHASH_CTE},
            blocks AS (
              SELECT s.doc_id, s.v, b.blk,
                     substr(s.simhash, b.blk*4+1, 4) AS bval
              FROM sh64 s CROSS JOIN
                   (SELECT unnest(range(0, 4)) AS blk) b),
            cand AS (
              -- chain + star pairs within each (block, value) bucket
              SELECT DISTINCT doc_a, doc_b FROM (
                SELECT prev AS doc_a, doc_id AS doc_b
                FROM (SELECT doc_id,
                             lag(doc_id) OVER (PARTITION BY blk, bval
                                               ORDER BY doc_id) AS prev
                      FROM blocks)
                WHERE prev IS NOT NULL
                UNION ALL
                SELECT anchor AS doc_a, doc_id AS doc_b
                FROM (SELECT doc_id,
                             first_value(doc_id) OVER (
                               PARTITION BY blk, bval
                               ORDER BY doc_id) AS anchor
                      FROM blocks)
                WHERE anchor <> doc_id))
            SELECT c.doc_a, c.doc_b
            FROM cand c
            JOIN sh64 va ON va.doc_id = c.doc_a
            JOIN sh64 vb ON vb.doc_id = c.doc_b
            WHERE bit_count(xor(va.v, vb.v)) <= 3
        """,
        "lang_id": f"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_split_to_array(text, '\\s+')) AS token
              FROM documents),
            markers(lang, token) AS (VALUES {_lang_marker_values()}),
            sc AS (SELECT t.doc_id, m.lang, count(*) AS c
                   FROM tok t JOIN markers m ON m.token = t.token
                   GROUP BY t.doc_id, m.lang),
            best AS (SELECT doc_id, lang,
                            row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, lang) AS rn
                     FROM sc)
            SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred
            FROM documents d
            LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
        """,
        # flagship_triples / openie4_triples: deliberately omitted (the
        # extraction pipelines themselves are not SQL-expressible;
        # their correctness gates are the pytest P/R fixtures) ->
        # driver records the weaker rows-only check.  The post-group KG
        # operators get their oracles from fixtures/oracles.py over
        # exploded parquet views of the same golden GROUPS fixture.
        **_kg_oracles(),
    }


def _lang_marker_values() -> str:
    from openie_backend_ray.ops.textstats import _LANG_MARKERS

    return ", ".join(
        f"('{lang}', '{tok}')"
        for lang in sorted(_LANG_MARKERS)
        for tok in sorted(_LANG_MARKERS[lang])
    )


def _kg_oracles() -> dict[str, str]:
    from openie_backend_ray.fixtures.oracles import kg_oracle_sql

    return kg_oracle_sql()
