"""Linker side tables synthesized from fixture entities (FIXTURES.md §5).

The reference linker's 37 GB support data (crosswikis Derby DB, fbid ->
(title, inlinks) sorted files, context-similarity Lucene index, fbid ->
types index; ``linker/README.md:30-32``) is proprietary-scale data we
don't have; the conformance contract synthesizes consistent side tables
from the entities appearing in ``test-groups.txt`` so the linker's
*mechanism* (crosswikis prior -> candidates, cprob x log(inlinks) x
context score ranking, type attach) reproduces the fixture links, with
lower-prior distractor entities added to exercise the ranking.
"""

from __future__ import annotations

import pyarrow as pa

from openie_backend_ray.fixtures.conformance import clean_groups
from openie_backend_ray.functions.headphrase import head_phrase
from openie_backend_ray.functions.lnrm import lnrm

CPROB_CORRECT = 0.9
COUNT_CORRECT = 1000
CPROB_DISTRACTOR = 0.55
COUNT_DISTRACTOR = 600


def build_side_tables() -> dict[str, pa.Table]:
    """Returns {crosswikis, fbid_title_inlinks, fbid_types,
    entity_context} Arrow tables."""
    crosswikis: dict[tuple[str, str], tuple[str, float, int]] = {}
    fbid_info: dict[str, tuple[str, int]] = {}
    fbid_types: dict[str, list[str]] = {}
    context: dict[str, list[str]] = {}

    def probe_all(_s: str) -> bool:
        return True  # synthesis-time head phrases keep their full form

    for g in clean_groups():
        for which, ent, types in (
            ("arg1", g.arg1_entity, g.arg1_types),
            ("arg2", g.arg2_entity, g.arg2_types),
        ):
            if ent is None:
                continue
            name, fbid, _score, inlinks = ent
            fbid_info.setdefault(fbid, (name, max(2, int(inlinks))))
            if types:
                fbid_types.setdefault(fbid, list(types))
            ctx = context.setdefault(fbid, [])
            for inst in g.instances:
                ctx.append(inst.sentence)
                iv = inst.arg1 if which == "arg1" else inst.arg2
                toks = inst.tokens[iv[0]: iv[1]]
                tags = inst.postags[iv[0]: iv[1]]
                hp = head_phrase(toks, tags, probe_all)
                anchor = lnrm(hp)
                if not anchor:
                    continue
                crosswikis.setdefault(
                    (anchor, fbid), (name, CPROB_CORRECT, COUNT_CORRECT)
                )

    # distractors: deterministic junk entity per 3rd anchor, lower prior,
    # lower inlinks, no shared context
    anchors = sorted({a for a, _ in crosswikis})
    for i, anchor in enumerate(anchors):
        if i % 3 != 0:
            continue
        dfbid = f"distract{i:05d}"
        crosswikis[(anchor, dfbid)] = (
            f"Distractor {i}", CPROB_DISTRACTOR, COUNT_DISTRACTOR
        )
        fbid_info[dfbid] = (f"Distractor {i}", 3)
        context[dfbid] = [f"unrelated filler text {i} about nothing"]

    cw_rows = sorted(crosswikis.items())
    cw = pa.table(
        {
            "anchor": [a for (a, _f), _ in cw_rows],
            "fbid": [f for (_a, f), _ in cw_rows],
            "title": [v[0] for _, v in cw_rows],
            "cprob": [v[1] for _, v in cw_rows],
            "count": [v[2] for _, v in cw_rows],
        }
    )
    fi_rows = sorted(fbid_info.items())
    fi = pa.table(
        {
            "fbid": [k for k, _ in fi_rows],
            "title": [v[0] for _, v in fi_rows],
            "inlinks": [v[1] for _, v in fi_rows],
        }
    )
    ft_rows = sorted(fbid_types.items())
    ft = pa.table(
        {
            "fbid": [k for k, _ in ft_rows],
            "types": pa.array([v for _, v in ft_rows], pa.list_(pa.string())),
        }
    )
    ctx_rows = sorted(context.items())
    ec = pa.table(
        {
            "fbid": [k for k, _ in ctx_rows],
            "context_text": [" ".join(v) for _, v in ctx_rows],
        }
    )
    return {
        "crosswikis": cw,
        "fbid_title_inlinks": fi,
        "fbid_types": ft,
        "entity_context": ec,
    }


def write_side_tables(out_dir: str) -> dict[str, str]:
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, tbl in build_side_tables().items():
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(tbl, p)
        paths[name] = p
    return paths
