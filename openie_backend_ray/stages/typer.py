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
      the reference coGroups; we BROADCAST the RelInfo table (small
      after filtering: <=150 entities x surviving rels) via ray.put
      into a map_batches probe (J2).

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


def _rel_weight(entities: list[tuple[str, frozenset]]) -> float:
    """Pairwise type-overlap ratio (:119-136)."""
    n = len(entities)
    if n <= 1:
        return 0.0
    hits = 0
    for i in range(n):
        ti = entities[i][1]
        for j in range(i + 1, n):
            if ti & entities[j][1]:
                hits += 1
    return hits / (n * (n - 1) / 2.0)


def build_rel_info(group: pa.Table, settings: TyperSettings) -> pa.Table:
    """Per-rel reducer for (a): cap-read, md5-ordered sample, weight,
    skip rules. Emits one RelInfo row or nothing."""
    rel = group["rel_norm"][0].as_py()
    fbids = group["fbid"].to_pylist()[: settings.max_entities_read_per_rel]
    types = group["types"].to_pylist()[: settings.max_entities_read_per_rel]
    # dedupe per fbid, keep first types seen
    seen: dict[str, frozenset] = {}
    for f, t in zip(fbids, types):
        seen.setdefault(f, frozenset(t))
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


class RelInfoAttacher:
    """(c): broadcast RelInfo probe — each (rel, arg) row picks up its
    rel's RelInfo; caps distinct args per rel at 1000 ACROSS the run by
    hashing (deterministic stand-in for the reference's arbitrary
    ``take(1000)``)."""

    def __init__(self, rel_infos_ref=None, rel_infos: dict | None = None,
                 max_args_per_rel_info: int = 1000):
        if rel_infos is None and rel_infos_ref is not None:
            import ray

            rel_infos = ray.get(rel_infos_ref)
        self.rel_infos = rel_infos or {}
        self.cap = max_args_per_rel_info

    def __call__(self, batch: pa.Table) -> pa.Table:
        rels = batch["rel_norm"].to_pylist()
        args = batch["arg_norm"].to_pylist()
        out_arg, out_rel = [], []
        for r, a in zip(rels, args):
            if r not in self.rel_infos:
                continue
            # per-rel arg cap via hash bucketing (deterministic)
            if int(hashlib.md5(f"{r}|{a}".encode()).hexdigest()[:8], 16) \
                    % 100000 >= self.cap * 100:
                continue
            out_arg.append(a)
            out_rel.append(r)
        return pa.table(
            {
                "arg_norm": pa.array(out_arg, pa.string()),
                "rel_norm": pa.array(out_rel, pa.string()),
            }
        )


# ---------------------------------------------------------------------------
# phase two
# ---------------------------------------------------------------------------

def predict_types_for_arg(
    group: pa.Table, rel_infos: dict, settings: TyperSettings
) -> pa.Table:
    """Per-arg reducer (:219-243): top entities by 10^(4w) weight, types
    shared by >= min_share_score of them."""
    arg = group["arg_norm"][0].as_py()
    rels = list(dict.fromkeys(group["rel_norm"].to_pylist()))[
        : settings.max_rel_infos_read_per_arg
    ]
    ent_weights: dict[str, int] = {}
    ent_types: dict[str, frozenset] = {}
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
            ent_types.setdefault(f, frozenset(ts))
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

    Shuffle structure: ONE groupby(rel_norm) to build RelInfos (small
    output, collected + broadcast), ONE groupby(arg_norm) to predict.
    """
    import ray

    settings = settings or TyperSettings()

    rel_ents = groups_ds.map_batches(
        lambda b: rel_entity_pairs_batch(b, settings),
        batch_format="pyarrow",
    )
    rel_info_ds = rel_ents.groupby("rel_norm").map_groups(
        lambda g: build_rel_info(g, settings), batch_format="pyarrow"
    )
    # RelInfo table is small by construction (<=150 entities per
    # surviving rel): collect once, broadcast to the probe + phase two.
    rel_info_tbl = rel_info_ds.take_all()
    rel_infos = {
        r["rel_norm"]: (r["weight"], r["ent_fbids"], r["ent_types"])
        for r in rel_info_tbl
    }
    rel_infos_ref = ray.put(rel_infos)

    rel_args = groups_ds.map_batches(
        lambda b: rel_arg_pairs_batch(b, settings), batch_format="pyarrow"
    )
    arg_rel = rel_args.map_batches(
        RelInfoAttacher,
        fn_constructor_kwargs={
            "rel_infos_ref": rel_infos_ref,
            "max_args_per_rel_info": settings.max_args_per_rel_info,
        },
        batch_format="pyarrow",
        concurrency=_pool(),
    )
    return arg_rel.groupby("arg_norm").map_groups(
        _predict_closure(rel_infos, settings), batch_format="pyarrow"
    )


def _predict_closure(rel_infos: dict, settings: TyperSettings):
    def fn(group: pa.Table) -> pa.Table:
        return predict_types_for_arg(group, rel_infos, settings)

    return fn


def _pool():
    from openie_backend_ray.util import auto_pool

    return auto_pool(0.5)


class TypeAttacherActor:
    """G9: broadcast TypePrediction probe over GROUPS rows — attach
    predicted types only where the arg is untyped."""

    def __init__(self, preds_ref=None, preds: dict | None = None,
                 arg_field: str = "arg1"):
        if preds is None and preds_ref is not None:
            import ray

            preds = ray.get(preds_ref)
        self.preds = preds or {}
        self.arg_field = arg_field

    def __call__(self, batch: pa.Table) -> pa.Table:
        typ_col = f"{self.arg_field}_types"
        args = batch[f"{self.arg_field}_norm"].to_pylist()
        types = batch[typ_col].to_pylist()
        new_types = [
            (self.preds.get(a) or t) if not t else t
            for a, t in zip(args, types)
        ]
        idx = batch.column_names.index(typ_col)
        return batch.set_column(
            idx, typ_col, pa.array(new_types, pa.list_(pa.string()))
        )


def attach_types(groups_ds, preds_ds, arg_field: str = "arg1"):
    """GROUPS + TypePredictions -> GROUPS with types attached (G9).
    The predictions side is collected + broadcast (it is the typer's
    small output); at 100 TB the same probe runs against a
    hash-partitioned prediction shard per actor."""
    import ray

    preds = {
        r["arg_norm"]: list(r["types"]) for r in preds_ds.take_all()
    }
    preds_ref = ray.put(preds)
    return groups_ds.map_batches(
        TypeAttacherActor,
        fn_constructor_kwargs={"preds_ref": preds_ref,
                               "arg_field": arg_field},
        batch_format="pyarrow",
        concurrency=_pool(),
    )
