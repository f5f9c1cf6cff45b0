"""Unlinkable-entity typer (SURVEY.md G7/G8/J2) + type attacher (G9).

Port of ``hadoop/.../UnlinkableEntityTyper.scala`` and
``hadoop/.../TypeAttacher.scala`` over the Arrow GROUPS table:

Phase one (``UnlinkableEntityTyper.scala:173-217``):
  (a) rel -> linked-arg entities (stoplist + typeless filtered, :101-105);
      per rel: read cap 5000, uniform-sample 150 (:85-86), weight =
      fraction of entity pairs sharing a type (:119-136); skip rel if
      len<=3 / len>100 / no entities / weight < 0.10 (:89, defaults
      :345-352);
  (b) rel -> argNorm pairs for UNLINKED args (arg filter: len>=4, no
      3+-digit number, no stop token, :73-78);
  (c) attach each rel's RelInfo to <=1000 distinct args (:195-215) —
      a co-group shuffle join like the reference's coGroup: RelInfo
      rows and (rel, arg) rows union and groupby(rel_norm), so rel
      cardinality never materializes anywhere (J2).

Phase two (:219-243): groupby argNorm; read <=20k relinfos; entity
weight = sum of 10^(4*relWeight) over rels containing it (:143); top-15
entities; predict types shared by >=10 of them, top-5 (:158-171).

Attacher (``TypeAttacher.scala:15-69``): left join groups with
TypePredictions on argNorm, attach only when the arg is currently
untyped (:37-40). The reference salts join keys shorter than 4 chars
with random(100) to break huge groups (:20,25); our broadcast probe has
no reduce-side groups, so no salt is needed — the salting idea lives in
the grouper's combiner (grouper.py).

Determinism: the reference's ``Random.shuffle(...).take(150)`` sample
is replaced by an md5-ordered sample (sort entities by
``md5(rel:fbid)``, take 150) — uniform-ish, reproducible across runs
and engines.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import pyarrow as pa

MIN_ARG_LENGTH = 4  # UnlinkableEntityTyper.scala:333
ARG_STOPLIST = frozenset(
    {"one", "two", "three", "four", "five", "some", "any", "all"}
)  # :74
import re

_NUM3 = re.compile(r"[0-9][0-9][0-9]+")  # :73


@dataclass
class TyperSettings:  # defaults: UnlinkableEntityTyper.scala:345-352
    arg_field: str = "arg1"  # "arg1" | "arg2"
    max_similar_entities: int = 15
    max_predicted_types: int = 5
    min_share_score: int = 10
    min_rel_weight: float = 0.10
    max_entities_read_per_rel: int = 5000
    max_entities_write_per_rel: int = 150
    max_rel_infos_read_per_arg: int = 20000
    max_args_per_rel_info: int = 1000
    entity_stoplist: frozenset = field(default_factory=frozenset)


def filter_arg_string(s: str) -> bool:
    """Arg filter M16 (:75-78)."""
    if len(s) < MIN_ARG_LENGTH:
        return False
    if _NUM3.search(s):
        return False
    return not any(tok in ARG_STOPLIST for tok in s.split())


# ---------------------------------------------------------------------------
# phase one
# ---------------------------------------------------------------------------

def rel_entity_pairs_batch(batch: pa.Table, settings: TyperSettings) -> pa.Table:
    """(a): rel -> (fbid, types) for linked, typed, non-stoplisted args."""
    ent_col = f"{settings.arg_field}_entity"
    typ_col = f"{settings.arg_field}_types"
    ents = batch[ent_col].to_pylist()
    typs = batch[typ_col].to_pylist()
    rels = batch["rel_norm"].to_pylist()
    out_rel, out_fbid, out_types = [], [], []
    for rel, ent, types in zip(rels, ents, typs):
        if ent is None or not types:
            continue
        if ent["fbid"] in settings.entity_stoplist:
            continue
        out_rel.append(rel)
        out_fbid.append(ent["fbid"])
        out_types.append(list(types))
    return pa.table(
        {
            "rel_norm": pa.array(out_rel, pa.string()),
            "fbid": pa.array(out_fbid, pa.string()),
            "types": pa.array(out_types, pa.list_(pa.string())),
        }
    )


def rel_arg_pairs_batch(batch: pa.Table, settings: TyperSettings) -> pa.Table:
    """(b): rel -> argNorm for args passing the filter."""
    args = batch[f"{settings.arg_field}_norm"].to_pylist()
    rels = batch["rel_norm"].to_pylist()
    keep = [(r, a) for r, a in zip(rels, args) if filter_arg_string(a)]
    return pa.table(
        {
            "rel_norm": pa.array([r for r, _ in keep], pa.string()),
            "arg_norm": pa.array([a for _, a in keep], pa.string()),
        }
    )


def _rel_weight(entities: list[tuple[str, tuple]]) -> float:
    """Pairwise type-overlap ratio (:119-136)."""
    n = len(entities)
    if n <= 1:
        return 0.0
    hits = 0
    sets = [frozenset(t) for _, t in entities]
    for i in range(n):
        for j in range(i + 1, n):
            if sets[i] & sets[j]:
                hits += 1
    return hits / (n * (n - 1) / 2.0)


def build_rel_info(group: pa.Table, settings: TyperSettings) -> pa.Table:
    """Per-rel reducer for (a): cap-read, md5-ordered sample, weight,
    skip rules. Emits one RelInfo row or nothing."""
    rel = group["rel_norm"][0].as_py()
    fbids = group["fbid"].to_pylist()[: settings.max_entities_read_per_rel]
    types = group["types"].to_pylist()[: settings.max_entities_read_per_rel]
    # dedupe per fbid; keep the min sorted type tuple (deterministic
    # regardless of shuffle arrival order — the reference keeps an
    # arbitrary first)
    seen: dict[str, tuple] = {}
    for f, t in zip(fbids, types):
        cand = tuple(sorted(set(t)))
        if f not in seen or cand < seen[f]:
            seen[f] = cand
    sampled = sorted(
        seen.items(),
        key=lambda kv: hashlib.md5(f"{rel}:{kv[0]}".encode()).hexdigest(),
    )[: settings.max_entities_write_per_rel]
    empty = pa.table(
        {
            "rel_norm": pa.array([], pa.string()),
            "weight": pa.array([], pa.float64()),
            "ent_fbids": pa.array([], pa.list_(pa.string())),
            "ent_types": pa.array([], pa.list_(pa.list_(pa.string()))),
        }
    )
    if len(rel) <= 3 or len(rel) > 100 or not sampled:
        return empty
    weight = _rel_weight(sampled)
    if weight < settings.min_rel_weight:
        return empty
    return pa.table(
        {
            "rel_norm": pa.array([rel], pa.string()),
            "weight": pa.array([weight], pa.float64()),
            "ent_fbids": pa.array([[f for f, _ in sampled]],
                                  pa.list_(pa.string())),
            "ent_types": pa.array([[sorted(t) for _, t in sampled]],
                                  pa.list_(pa.list_(pa.string()))),
        }
    )


# co-group row layout: RelInfo rows carry a null arg_norm, (rel, arg)
# rows carry null payload fields; one groupby(rel_norm) joins them
# (the reference's coGroup, UnlinkableEntityTyper.scala:195-215)
_JOINED = pa.schema(
    [
        ("rel_norm", pa.string()),
        ("arg_norm", pa.string()),
        ("weight", pa.float64()),
        ("ent_fbids", pa.list_(pa.string())),
        ("ent_types", pa.list_(pa.list_(pa.string()))),
    ]
)


def _pad_info(b: pa.Table) -> pa.Table:
    return pa.table(
        {
            "rel_norm": b["rel_norm"],
            "arg_norm": pa.nulls(b.num_rows, pa.string()),
            "weight": b["weight"],
            "ent_fbids": b["ent_fbids"],
            "ent_types": b["ent_types"],
        },
        schema=_JOINED,
    )


def _pad_args(b: pa.Table) -> pa.Table:
    return pa.table(
        {
            "rel_norm": b["rel_norm"],
            "arg_norm": b["arg_norm"],
            "weight": pa.nulls(b.num_rows, pa.float64()),
            "ent_fbids": pa.nulls(b.num_rows, pa.list_(pa.string())),
            "ent_types": pa.nulls(
                b.num_rows, pa.list_(pa.list_(pa.string()))
            ),
        },
        schema=_JOINED,
    )


def attach_rel_info_group(g: pa.Table, settings: TyperSettings) -> pa.Table:
    """(c) per-rel co-group reducer (J2): replicate the rel's RelInfo
    onto <= max_args_per_rel_info distinct args.  The reference takes an
    arbitrary 1000 (:195-215); we take the first 1000 in md5(rel|arg)
    order — deterministic across runs, partitionings and engines."""
    rel = g["rel_norm"][0].as_py()
    weights = g["weight"].to_pylist()
    info = next((i for i, w in enumerate(weights) if w is not None), None)
    if info is None:
        return _JOINED.empty_table()
    args = sorted(
        {a for a in g["arg_norm"].to_pylist() if a is not None},
        key=lambda a: hashlib.md5(f"{rel}|{a}".encode()).hexdigest(),
    )[: settings.max_args_per_rel_info]
    if not args:
        return _JOINED.empty_table()
    n = len(args)
    return pa.table(
        {
            "rel_norm": pa.array([rel] * n, pa.string()),
            "arg_norm": pa.array(args, pa.string()),
            "weight": pa.array([weights[info]] * n, pa.float64()),
            "ent_fbids": pa.array(
                [g["ent_fbids"][info].as_py()] * n, pa.list_(pa.string())
            ),
            "ent_types": pa.array(
                [g["ent_types"][info].as_py()] * n,
                pa.list_(pa.list_(pa.string())),
            ),
        },
        schema=_JOINED,
    )


# ---------------------------------------------------------------------------
# phase two
# ---------------------------------------------------------------------------

def predict_types_for_arg(
    arg: str, rel_infos: dict, settings: TyperSettings
) -> pa.Table:
    """Per-arg prediction (:219-243): top entities by 10^(4w) weight,
    types shared by >= min_share_score of them.  Rels iterate in sorted
    order and an entity's type set is the min over contributing rels —
    both deterministic regardless of shuffle arrival order."""
    rels = sorted(rel_infos)[: settings.max_rel_infos_read_per_arg]
    ent_weights: dict[str, int] = {}
    ent_types: dict[str, tuple] = {}
    total = 0
    for r in rels:
        info = rel_infos.get(r)
        if info is None:
            continue
        weight, fbids, typess = info
        # integer micro-weights: floor(10^(4w) * 1e6).  Summing int64
        # makes the accumulation order-independent (exact), so the
        # result is reproducible across partitionings and engines — a
        # float sum here would drift with Ray's reduction order.
        w = int(10.0 ** (4.0 * weight) * 1e6)
        for f, ts in zip(fbids, typess):
            ent_weights[f] = ent_weights.get(f, 0) + w
            cand = tuple(sorted(set(ts)))
            if f not in ent_types or cand < ent_types[f]:
                ent_types[f] = cand
            total += w
    empty = pa.table(
        {
            "arg_norm": pa.array([], pa.string()),
            "types": pa.array([], pa.list_(pa.string())),
            "share_scores": pa.array([], pa.list_(pa.int32())),
            "total_entity_weight": pa.array([], pa.int64()),
            "top_fbids": pa.array([], pa.list_(pa.string())),
        }
    )
    if not ent_weights:
        return empty
    top = sorted(ent_weights.items(), key=lambda kv: (-kv[1], kv[0]))[
        : settings.max_similar_entities
    ]
    counts: dict[str, int] = {}
    for f, _ in top:
        for t in ent_types.get(f, ()):
            counts[t] = counts.get(t, 0) + 1
    preds = sorted(
        ((t, c) for t, c in counts.items() if c >= settings.min_share_score),
        key=lambda kv: (-kv[1], kv[0]),
    )[: settings.max_predicted_types]
    if not preds:
        return empty
    return pa.table(
        {
            "arg_norm": pa.array([arg], pa.string()),
            "types": pa.array([[t for t, _ in preds]],
                              pa.list_(pa.string())),
            "share_scores": pa.array([[c for _, c in preds]],
                                     pa.list_(pa.int32())),
            "total_entity_weight": pa.array([total], pa.int64()),
            "top_fbids": pa.array([[f for f, _ in top[:5]]],
                                  pa.list_(pa.string())),
        }
    )


# ---------------------------------------------------------------------------
# drivers
# ---------------------------------------------------------------------------

def predict_arg_types(groups_ds, settings: TyperSettings | None = None):
    """GROUPS dataset -> TypePredictions dataset (G7+G8).

    Shuffle structure — nothing materializes on the driver:
    ONE groupby(rel_norm) builds RelInfos; a SECOND groupby(rel_norm)
    over the union of RelInfo rows and (rel, arg) rows co-groups them
    (the reference's coGroup, :195-215), replicating each rel's payload
    onto its args; ONE groupby(arg_norm) predicts.  Rel/arg cardinality
    can be unbounded — every step stays a Dataset.
    """
    settings = settings or TyperSettings()

    rel_ents = groups_ds.map_batches(
        lambda b: rel_entity_pairs_batch(b, settings),
        batch_format="pyarrow",
    )
    from openie_backend_ray.ops.partition import partition_map_groups

    rel_info_ds = partition_map_groups(
        rel_ents, "rel_norm", lambda g: build_rel_info(g, settings)
    )
    rel_args = groups_ds.map_batches(
        lambda b: rel_arg_pairs_batch(b, settings), batch_format="pyarrow"
    )
    joined = partition_map_groups(
        rel_info_ds.map_batches(_pad_info, batch_format="pyarrow")
        .union(rel_args.map_batches(_pad_args, batch_format="pyarrow")),
        "rel_norm",
        lambda g: attach_rel_info_group(g, settings),
    )

    def predict(g: pa.Table) -> pa.Table:
        arg = g["arg_norm"][0].as_py()
        rel_infos = {
            g["rel_norm"][i].as_py(): (
                g["weight"][i].as_py(),
                g["ent_fbids"][i].as_py(),
                g["ent_types"][i].as_py(),
            )
            for i in range(g.num_rows)
        }
        return predict_types_for_arg(arg, rel_infos, settings)

    return partition_map_groups(joined, "arg_norm", predict)


# attach join row layout: GROUPS columns + the prediction payload; pred
# rows carry null GROUPS fields, group rows a null payload
def _att_schema(arg_field: str) -> pa.Schema:
    from openie_backend_ray import schema as S

    return pa.schema(
        list(S.GROUPS) + [("ptypes", pa.list_(pa.string()))]
    )


def attach_types(groups_ds, preds_ds, arg_field: str = "arg1"):
    """GROUPS + TypePredictions -> GROUPS with types attached (G9), as a
    co-group shuffle join on argNorm (``TypeAttacher.scala:15-69``; the
    reference salts sub-4-char keys against huge reduce groups — here a
    groupby key is one argNorm whose group rows are already aggregated,
    so the group fan-in is the argNorm's distinct-triple count).
    Attaches only where the arg is currently untyped (:37-40)."""
    from openie_backend_ray import schema as S

    att = _att_schema(arg_field)
    key = f"{arg_field}_norm"
    typ_col = f"{arg_field}_types"

    def pad_groups(b: pa.Table) -> pa.Table:
        cols = {n: b[n] for n in S.GROUPS.names}
        cols["ptypes"] = pa.nulls(b.num_rows, pa.list_(pa.string()))
        return pa.table(cols, schema=att)

    def pad_preds(b: pa.Table) -> pa.Table:
        cols = {
            n: pa.nulls(b.num_rows, att.field(n).type)
            for n in S.GROUPS.names
        }
        cols[key] = b["arg_norm"]
        cols["ptypes"] = b["types"]
        return pa.table(cols, schema=att)

    def attach(g: pa.Table) -> pa.Table:
        sizes = g["size"].to_pylist()
        ptypes = g["ptypes"].to_pylist()
        pred = next((p for p in ptypes if p is not None), None)
        keep = [i for i, s in enumerate(sizes) if s is not None]
        if not keep:
            return S.GROUPS.empty_table()
        out = g.take(keep).drop_columns(["ptypes"])
        if pred is None:
            return out
        types = out[typ_col].to_pylist()
        new_types = [t if t else list(pred) for t in types]
        idx = out.column_names.index(typ_col)
        return out.set_column(
            idx, typ_col, pa.array(new_types, pa.list_(pa.string()))
        )

    from openie_backend_ray.ops.partition import partition_map_groups

    return partition_map_groups(
        groups_ds.map_batches(pad_groups, batch_format="pyarrow")
        .union(preds_ds.map_batches(pad_preds, batch_format="pyarrow")),
        key, attach,
    )
