"""Entity-linking stage (SURVEY.md A5, J3-J5, M11): an actor-pool stage.

The reference's linker bundle is per-thread state over scratch-disk
indexes: crosswikis Derby DB (anchor -> entity, cprob, count), fbid ->
(title, inlinks) sorted files, a Lucene MoreLikeThis context-similarity
index, and an fbid -> types index
(``linker/.../EntityLinker.scala:19-45``, ``CandidateFinder.java:35-53``,
``batch_match.java:60-72``; per-thread map
``ScoobiEntityLinker.scala:111-152``). Here the whole bundle is
in-memory dict shards built from Parquet side tables, broadcast once via
``ray.put`` and materialized per actor in ``__init__``; a tf-idf cosine
replaces MoreLikeThis for the context score.

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


class LinkerActor:
    """map_batches callable over blob group rows -> GROUPS schema rows."""

    def __init__(self, tables_ref=None, tables: dict | None = None):
        if tables is None and tables_ref is not None:
            import ray

            tables = ray.get(tables_ref)
        assert tables is not None
        cw = tables["crosswikis"]
        self.candidates: dict[str, list[tuple[str, str, float, int]]] = {}
        for anchor, fbid, title, cprob, count in zip(
            cw["anchor"].to_pylist(), cw["fbid"].to_pylist(),
            cw["title"].to_pylist(), cw["cprob"].to_pylist(),
            cw["count"].to_pylist(),
        ):
            if cprob >= CPROB_CUTOFF and count >= COUNT_CUTOFF:
                self.candidates.setdefault(anchor, []).append(
                    (fbid, title, cprob, count)
                )
        fi = tables["fbid_title_inlinks"]
        self.fbid_info = {
            f: (t, i)
            for f, t, i in zip(
                fi["fbid"].to_pylist(), fi["title"].to_pylist(),
                fi["inlinks"].to_pylist(),
            )
        }
        # string-match fallback indexes (StringMatchCandidateFinder):
        # lowercased title -> fbid, and title token -> sorted fbids
        self.title_map: dict[str, str] = {}
        self.token_index: dict[str, list[str]] = {}
        tok_sets: dict[str, set] = {}
        for f, (t, _i) in self.fbid_info.items():
            self.title_map.setdefault(t.lower(), f)
            for w in t.lower().split():
                tok_sets.setdefault(w, set()).add(f)
        self.token_index = {w: sorted(s) for w, s in tok_sets.items()}
        ft = tables["fbid_types"]
        self.fbid_types = {
            f: t
            for f, t in zip(ft["fbid"].to_pylist(), ft["types"].to_pylist())
        }
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
        self.idf = {
            t: math.log(1.0 + n_docs / c) for t, c in df.items()
        }
        self.ctx_vecs: dict[str, tuple[dict[str, float], float]] = {}
        for f, terms in docs.items():
            vec = {
                t: (1.0 + math.log(c)) * self.idf.get(t, 0.0)
                for t, c in terms.items()
            }
            norm = math.sqrt(sum(w * w for w in vec.values())) or 1.0
            self.ctx_vecs[f] = (vec, norm)

    # -- candidate probing ------------------------------------------------
    def has_candidates(self, phrase: str) -> bool:
        return lnrm(phrase) in self.candidates

    def _ctx_score(self, query_vec: dict[str, float], qnorm: float,
                   fbid: str) -> float:
        entry = self.ctx_vecs.get(fbid)
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
            info = self.fbid_info.get(fbid)
            if info is None or fbid in seen:
                return
            seen.add(fbid)
            out.append(
                (fbid, info[0], self._match_level(info[0], arg_s) / 5.0, 0)
            )

        fbid = self.title_map.get(arg.lower())
        if fbid is not None:
            add(fbid, arg)
        stripped = arg
        words = arg.split()
        if words and words[0].lower() == "the":
            stripped = arg[4:] if len(arg) >= 4 else ""
            if fbid is None and stripped:
                f2 = self.title_map.get(stripped.lower())
                if f2 is not None:
                    add(f2, stripped)
        # token-intersection: every arg token (len > 2) must hit the
        # title-token index; candidates present in ALL hit lists
        comps = [c for c in re.split(r"[,\s]+", stripped) if c]
        lists = []
        for comp in comps:
            hit = self.token_index.get(comp.lower())
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
        cands = self.candidates.get(lnrm(hp))
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
            info = self.fbid_info.get(fbid)
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
        types = list(self.fbid_types.get(best[1], []))
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
                t: (1.0 + math.log(c)) * self.idf.get(t, 0.0)
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
