"""Entity-linking stage (SURVEY.md A5, J3-J5, M11): an actor-pool stage.

The reference's linker bundle is per-thread state over scratch-disk
indexes: crosswikis Derby DB (anchor -> entity, cprob, count), fbid ->
(title, inlinks) sorted files, a Lucene MoreLikeThis context-similarity
index, and an fbid -> types index
(``linker/.../EntityLinker.scala:19-45``, ``CandidateFinder.java:35-53``,
``batch_match.java:60-72``; per-thread map
``ScoobiEntityLinker.scala:111-152``). Here the bundle is a dict of
SORTED single-chunk Arrow tables prepared ONCE driver-side
(``prepare_linker_tables``) and broadcast via ``ray.put``: each actor's
``ray.get`` returns zero-copy views into the plasma object store, so N
actors on a node share ONE physical copy, and lookups are binary
searches over the sorted key columns plus a small bounded per-actor hot
cache — the same shape as the reference's binary-searched sorted files
with an LRU front (``linker/.../SortedFileMap.java:83-152``), which it
used for exactly this reason at its 37 GB data scale
(``linker/README.md:30-32``). A tf-idf cosine (vectors precomputed into
an Arrow table at prepare time) replaces MoreLikeThis for the context
score.

Semantics mirrored:
- head-phrase candidate probing (HeadPhraseFinder, M11);
- crosswikis candidate cutoffs cprob >= 0.5, count >= 500
  (``CrosswikisCandidateFinder.java:25-36``, high-precision setting);
- best candidate by ``cprob * log(inlinks) * ctx``
  (``EntityLinker.scala:147-149``);
- type attach from the fbid -> types table (EntityTyper);
- the linker links arg1 and arg2 of the group's head instance, using
  all group sentences as context (``ScoobiEntityLinker.scala:66-108``).
  (The reference's 3-token min-arg-length check at
  ``ScoobiEntityLinker.scala:54`` is dead code — the expression value
  is discarded — so no length gate is applied here either.)
"""

from __future__ import annotations

import math
import os
import pickle
import re
from collections import Counter

import pyarrow as pa

from openie_backend_ray import schema as S
from openie_backend_ray.functions.headphrase import head_phrase
from openie_backend_ray.functions.lnrm import lnrm

# tf-idf context window: sentences of the first N (confidence-sorted)
# instances.  KNOWN CONFORMANCE DEVIATION (recorded in BASELINE.md):
# the reference ScoobiEntityLinker builds context from ALL group
# sentences; we cap to bound worst-case per-group work for degenerate
# 40k-instance head groups (multi-MB context strings otherwise).
# Fixture groups are far smaller, so golden links are unchanged
# (tests/test_linker_regression.py gates that).  Configurable per
# corpus via OPENIE_LINKER_CONTEXT_MAX (0 = uncapped reference
# semantics).
CONTEXT_MAX_SENTENCES = int(
    os.environ.get("OPENIE_LINKER_CONTEXT_MAX", "64") or "64"
)

CPROB_CUTOFF = 0.5
COUNT_CUTOFF = 500

_TOKEN = re.compile(r"[a-z0-9]+")


def _terms(text: str) -> Counter:
    return Counter(_TOKEN.findall(text.lower()))


def prepare_linker_tables(tables: dict) -> dict:
    """Raw side tables -> the prepared (sorted, single-chunk, derived)
    bundle the LinkerActor probes with binary search. Run ONCE on the
    driver (or as an offline job) and ``ray.put`` the result; every
    actor then shares the plasma copy zero-copy.

    Derivations (exactly the dicts the actor used to build per actor):
    - ``cw``: crosswikis filtered by the cprob/count cutoffs, sorted by
      anchor with original row order preserved within an anchor (the
      candidate iteration order determines strict-``>`` tie-breaks);
    - ``fbid_info``: (fbid, title, inlinks) sorted by fbid;
    - ``titles``: lowercased title -> first fbid in table order
      (StringMatchCandidateFinder exact probe);
    - ``title_tokens``: (token, fbid) pairs sorted, deduped (the
      token-intersection fallback index);
    - ``fbid_types`` sorted by fbid;
    - ``idf`` (term, idf) and ``ctx`` (fbid, terms, weights, norm):
      the tf-idf context index, precomputed so actors never hold the
      full term-vector dicts.

    At the reference's 37 GB data scale the crosswikis filter+sort is
    itself a Dataset job (``read_parquet -> filter -> sort ->
    write_parquet``) whose output parquet feeds this dict; at fixture
    scale the in-process path below is exact and instant.
    """
    if tables.get("prepared"):
        return tables
    import pyarrow.compute as pc

    def _sorted_stable(t: pa.Table, key: str) -> pa.Table:
        idx = pa.array(range(t.num_rows), pa.int64())
        t = t.append_column("_idx", idx)
        return t.sort_by([(key, "ascending"), ("_idx", "ascending")]).drop(
            ["_idx"]
        )

    cw = tables["crosswikis"]
    cw = cw.filter(
        pc.and_(
            pc.greater_equal(cw["cprob"], pa.scalar(float(CPROB_CUTOFF))),
            pc.greater_equal(
                pc.cast(cw["count"], pa.float64()),
                pa.scalar(float(COUNT_CUTOFF)),
            ),
        )
    )
    cw = _sorted_stable(cw, "anchor")

    fi = tables["fbid_title_inlinks"]
    fbids = fi["fbid"].to_pylist()
    titles_raw = fi["title"].to_pylist()
    fi_sorted = _sorted_stable(fi, "fbid")

    seen_titles: set[str] = set()
    t_lc, t_f = [], []
    tok_pairs: set[tuple[str, str]] = set()
    for f, t in zip(fbids, titles_raw):
        lt = t.lower()
        if lt not in seen_titles:
            seen_titles.add(lt)
            t_lc.append(lt)
            t_f.append(f)
        for w in lt.split():
            tok_pairs.add((w, f))
    titles = pa.table(
        {"title_lc": pa.array(t_lc, pa.string()),
         "fbid": pa.array(t_f, pa.string())}
    ).sort_by("title_lc")
    tok_rows = sorted(tok_pairs)
    title_tokens = pa.table(
        {"token": pa.array([w for w, _ in tok_rows], pa.string()),
         "fbid": pa.array([f for _, f in tok_rows], pa.string())}
    )

    ft = _sorted_stable(tables["fbid_types"], "fbid")

    # tf-idf context index (replaces the MoreLikeThis Lucene index)
    ec = tables["entity_context"]
    docs = {
        f: _terms(t)
        for f, t in zip(
            ec["fbid"].to_pylist(), ec["context_text"].to_pylist()
        )
    }
    df: Counter = Counter()
    for terms in docs.values():
        df.update(terms.keys())
    n_docs = max(1, len(docs))
    idf = {t: math.log(1.0 + n_docs / c) for t, c in df.items()}
    idf_rows = sorted(idf.items())
    idf_tbl = pa.table(
        {"term": pa.array([t for t, _ in idf_rows], pa.string()),
         "idf": pa.array([v for _, v in idf_rows], pa.float64())}
    )
    ctx_rows = sorted(docs.items())
    ctx_terms, ctx_weights, ctx_norms = [], [], []
    for _f, terms in ctx_rows:
        ts = list(terms.keys())
        ws = [(1.0 + math.log(terms[t])) * idf.get(t, 0.0) for t in ts]
        ctx_terms.append(ts)
        ctx_weights.append(ws)
        ctx_norms.append(math.sqrt(sum(w * w for w in ws)) or 1.0)
    ctx_tbl = pa.table(
        {
            "fbid": pa.array([f for f, _ in ctx_rows], pa.string()),
            "terms": pa.array(ctx_terms, pa.list_(pa.string())),
            "weights": pa.array(ctx_weights, pa.list_(pa.float64())),
            "norm": pa.array(ctx_norms, pa.float64()),
        }
    )

    return {
        "prepared": True,
        "cw": cw.combine_chunks(),
        "fbid_info": fi_sorted.combine_chunks(),
        "titles": titles.combine_chunks(),
        "title_tokens": title_tokens.combine_chunks(),
        "fbid_types": ft.combine_chunks(),
        "idf": idf_tbl.combine_chunks(),
        "ctx": ctx_tbl.combine_chunks(),
    }


class SortedArrowMap:
    """Binary-searched view over a key-sorted single-chunk Arrow table —
    the Ray analogue of the reference's ``SortedFileMap.java:83-152``:
    the table stays in the shared object store (one physical copy per
    node); only probe RESULTS are materialized, into the caller's
    bounded cache."""

    def __init__(self, table: pa.Table, key: str):
        self._t = table
        col = table.column(key)
        self._k = (
            col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
        )
        self._n = table.num_rows

    def range(self, x: str) -> pa.Table:
        """All rows with key == x (original row order); empty on miss."""
        k, n = self._k, self._n
        lo, hi = 0, n
        while lo < hi:
            mid = (lo + hi) // 2
            if k[mid].as_py() < x:
                lo = mid + 1
            else:
                hi = mid
        hi = lo
        while hi < n and k[hi].as_py() == x:
            hi += 1
        return self._t.slice(lo, hi - lo)


_MISS = object()


class LinkerActor:
    """map_batches callable over blob group rows -> GROUPS schema rows.

    Holds NO per-actor copies of the side tables: probes the shared
    prepared Arrow tables via ``SortedArrowMap`` with bounded hot
    caches (epoch-evicted dicts), so per-actor heap is O(cache), not
    O(side-table)."""

    _CACHE_CAP = 65_536

    def __init__(self, tables_ref=None, tables: dict | None = None):
        if tables is None and tables_ref is not None:
            import ray

            tables = ray.get(tables_ref)
        assert tables is not None
        if not tables.get("prepared"):
            # fixture-scale convenience (tests hand raw tables in);
            # production callers prepare ONCE driver-side and put the
            # prepared dict so this branch never runs per actor
            tables = prepare_linker_tables(tables)
        self._cw = SortedArrowMap(tables["cw"], "anchor")
        self._fi = SortedArrowMap(tables["fbid_info"], "fbid")
        self._titles = SortedArrowMap(tables["titles"], "title_lc")
        self._toks = SortedArrowMap(tables["title_tokens"], "token")
        self._ftypes = SortedArrowMap(tables["fbid_types"], "fbid")
        self._idf = SortedArrowMap(tables["idf"], "term")
        self._ctx = SortedArrowMap(tables["ctx"], "fbid")
        self._caches: list[dict] = [dict() for _ in range(6)]
        (self._c_cand, self._c_fi, self._c_idf, self._c_ctx,
         self._c_types, self._c_tok) = self._caches

    def _cached(self, cache: dict, key, fn):
        hit = cache.get(key, _MISS)
        if hit is not _MISS:
            return hit
        val = fn()
        if len(cache) >= self._CACHE_CAP:
            cache.clear()  # epoch eviction, O(1) amortized
        cache[key] = val
        return val

    # -- probe wrappers (dict semantics preserved exactly) -----------------
    def _candidates_of(self, anchor: str):
        def probe():
            t = self._cw.range(anchor)
            if t.num_rows == 0:
                return None
            return list(zip(
                t["fbid"].to_pylist(), t["title"].to_pylist(),
                t["cprob"].to_pylist(), t["count"].to_pylist(),
            ))

        return self._cached(self._c_cand, anchor, probe)

    def _fbid_info_of(self, fbid: str):
        def probe():
            t = self._fi.range(fbid)
            if t.num_rows == 0:
                return None
            return (t["title"][0].as_py(), t["inlinks"][0].as_py())

        return self._cached(self._c_fi, fbid, probe)

    def _title_fbid(self, title_lc: str):
        t = self._titles.range(title_lc)
        return t["fbid"][0].as_py() if t.num_rows else None

    def _token_fbids(self, token: str):
        def probe():
            t = self._toks.range(token)
            return t["fbid"].to_pylist() if t.num_rows else None

        return self._cached(self._c_tok, token, probe)

    def _types_of(self, fbid: str):
        def probe():
            t = self._ftypes.range(fbid)
            return list(t["types"][0].as_py()) if t.num_rows else []

        return self._cached(self._c_types, fbid, probe)

    def _idf_of(self, term: str) -> float:
        def probe():
            t = self._idf.range(term)
            return t["idf"][0].as_py() if t.num_rows else 0.0

        return self._cached(self._c_idf, term, probe)

    def _ctx_vec(self, fbid: str):
        def probe():
            t = self._ctx.range(fbid)
            if t.num_rows == 0:
                return None
            vec = dict(zip(t["terms"][0].as_py(), t["weights"][0].as_py()))
            return (vec, t["norm"][0].as_py())

        return self._cached(self._c_ctx, fbid, probe)

    # -- candidate probing ------------------------------------------------
    def has_candidates(self, phrase: str) -> bool:
        return self._candidates_of(lnrm(phrase)) is not None

    def _ctx_score(self, query_vec: dict[str, float], qnorm: float,
                   fbid: str) -> float:
        entry = self._ctx_vec(fbid)
        if entry is None:
            return 0.0
        vec, norm = entry
        dot = 0.0
        small, big = (query_vec, vec) if len(query_vec) < len(vec) else (vec, query_vec)
        for t, w in small.items():
            w2 = big.get(t)
            if w2:
                dot += w * w2
        return dot / (qnorm * norm)

    # -- string-match candidate fallback ----------------------------------
    def _match_level(self, title: str, arg: str) -> int:
        """StringMatchCandidateFinder.java:21-43: 5 = exact
        (case-insensitive), else max(1, 4 - wordDiff)."""
        if arg.lower() == title.lower():
            return 5
        return max(1, 4 - (len(title.split()) - len(arg.split())))

    def _string_match(self, phrase: str):
        """No-crosswikis-hit fallback (StringMatchCandidateFinder port):
        exact title match, leading-"the" strip retry, then
        token-intersection candidates (title words are a superset of the
        arg words), <= 5 senses.  Returns crosswikis-shaped candidate
        tuples with the match level / 5 as the prior."""
        arg = phrase.strip()
        if not arg:
            return []
        out, seen = [], set()

        def add(fbid: str, arg_s: str):
            info = self._fbid_info_of(fbid)
            if info is None or fbid in seen:
                return
            seen.add(fbid)
            out.append(
                (fbid, info[0], self._match_level(info[0], arg_s) / 5.0, 0)
            )

        fbid = self._title_fbid(arg.lower())
        if fbid is not None:
            add(fbid, arg)
        stripped = arg
        words = arg.split()
        if words and words[0].lower() == "the":
            stripped = arg[4:] if len(arg) >= 4 else ""
            if fbid is None and stripped:
                f2 = self._title_fbid(stripped.lower())
                if f2 is not None:
                    add(f2, stripped)
        # token-intersection: every arg token (len > 2) must hit the
        # title-token index; candidates present in ALL hit lists
        comps = [c for c in re.split(r"[,\s]+", stripped) if c]
        lists = []
        for comp in comps:
            hit = self._token_fbids(comp.lower())
            if hit is None:
                if len(comp) > 2:
                    return out  # fail: unknown content word (:134-139)
                continue  # short tokens may be skipped
            lists.append(hit)
        if lists:
            inter = set(lists[0])
            for li in lists[1:]:
                inter &= set(li)
            for cand in sorted(inter):  # deterministic sense order
                if len(seen) >= 5:
                    break
                add(cand, arg)
        return out

    def _link(self, toks: list[str], tags: list[str],
              query_vec: dict[str, float], qnorm: float):
        hp = head_phrase(toks, tags, self.has_candidates)
        cands = self._candidates_of(lnrm(hp))
        if not cands:
            # crosswikis miss -> string-match fallback on the raw arg
            # phrase (the reference tries finders in order,
            # EntityLinker.scala getBestFbidFromSources)
            cands = self._string_match(" ".join(toks))
        if not cands:
            return None, []
        best = None
        best_score = -math.inf
        for fbid, title, cprob, _count in cands:
            info = self._fbid_info_of(fbid)
            if info is None:
                continue
            _title, inlinks = info
            ctx = self._ctx_score(query_vec, qnorm, fbid)
            score = cprob * math.log(max(2, inlinks)) * ctx
            if score > best_score:
                best_score = score
                best = (title, fbid, score, float(inlinks))
        if best is None:
            return None, []
        types = self._types_of(best[1])
        return (
            {
                "name": best[0],
                "fbid": best[1],
                "score": best[2],
                "inlink_ratio": best[3],
            },
            types,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return S.GROUPS.empty_table()
        blobs = batch["instances_blob"].to_pylist()
        out = {
            "arg1_norm": batch["arg1_norm"].to_pylist(),
            "rel_norm": batch["rel_norm"].to_pylist(),
            "arg2_norm": batch["arg2_norm"].to_pylist(),
            "arg1_entity": [], "arg2_entity": [],
            "arg1_types": [], "arg2_types": [],
            "instances": [], "size": [], "corpora": [],
        }
        from openie_backend_ray.stages.grouper import _inst_unpack

        for blob in blobs:
            # blob-internal instances carry tokens/postags/chunks as
            # space-joined strings (grouper._inst_pack); the context
            # string concatenates them directly, and only the HEAD
            # instance needs the list form for interval slicing
            insts = pickle.loads(blob)
            head = _inst_unpack(insts[0])
            # context = the group's sentences (ScoobiEntityLinker.scala:
            # 66-108), CAPPED at the CONTEXT_MAX_SENTENCES
            # HIGHEST-CONFIDENCE instances.  Selected explicitly with
            # nlargest rather than relying on arrival order: the
            # grouper path ships conf-sorted blobs, but the incremental
            # relink path concatenates existing+delta row lists without
            # re-sorting, so position != confidence there.  Bounds the
            # per-row string/Counter build for degenerate 40k-instance
            # head groups (multi-MB context strings otherwise).
            if 0 < CONTEXT_MAX_SENTENCES < len(insts):
                import heapq

                ctx_insts = heapq.nlargest(
                    CONTEXT_MAX_SENTENCES, insts,
                    key=lambda i: (i["confidence"], i["tokens"])
                    if isinstance(i["tokens"], str)
                    else (i["confidence"], " ".join(i["tokens"])),
                )
            else:
                ctx_insts = insts
            sources = " ".join(
                i["tokens"] if isinstance(i["tokens"], str)
                else " ".join(i["tokens"])
                for i in ctx_insts
            )
            q = _terms(sources)
            qv = {
                t: (1.0 + math.log(c)) * self._idf_of(t)
                for t, c in q.items()
            }
            qn = math.sqrt(sum(w * w for w in qv.values())) or 1.0
            ents = []
            typs = []
            for which in ("arg1", "arg2"):
                iv = head[which]
                toks = head["tokens"][iv["start"]: iv["end"]]
                tags = head["postags"][iv["start"]: iv["end"]]
                ent, ts = self._link(toks, tags, qv, qn)
                ents.append(ent)
                typs.append(ts)
            out["arg1_entity"].append(ents[0])
            out["arg2_entity"].append(ents[1])
            out["arg1_types"].append(typs[0])
            out["arg2_types"].append(typs[1])
            out["instances"].append(
                [_inst_unpack(i) for i in insts]
            )
            out["size"].append(len(insts))
            out["corpora"].append(sorted({i["corpus"] for i in insts}))
        return pa.Table.from_pydict(out, schema=S.GROUPS)


def link_groups(
    blob_groups_ds,
    tables_ref,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 512,
):
    """blob group rows -> linked GROUPS rows (A5). The actor pool is the
    analogue of the reference's 4-replica scratch-disk linkers with
    random pick (``ScoobiEntityLinker.scala:127-143``) — Ray schedules
    the replicas and balances batches for free."""
    from openie_backend_ray.util import actor_cpus, auto_pool

    if concurrency is None:
        concurrency = auto_pool(0.25)
    return blob_groups_ds.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"tables_ref": tables_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=actor_cpus(),
    )
