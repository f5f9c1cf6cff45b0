"""Multimodal span plumbing: media spans as opaque binary/ref columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The image/audio decode libraries are not available in this container,
so the decode kernel is STUBBED: ``RealDecoder`` raises
``NotImplementedError`` where PIL/libav would be called, and
``FakeDecoder`` produces deterministic bytes from the media_ref so the
Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is real and tested end-to-end. Swap ``decoder_cls`` in
production.

Scale notes: media payloads are large blobs — batches must stay SMALL
(``batch_size`` 16-64) so batch x concurrency fits the worker heap, and
the stage must run as an actor pool so codec state loads once per
actor, not per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_FEATURES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("n_bytes", pa.int64()),
        ("feature", pa.list_(pa.float32())),  # fixed-dim embedding-ish
    ]
)

FEATURE_DIM = 16


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """documents -> one row per NON-text span (the media complement of
    ``stages.sentences.explode_text_spans``)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans)
    out = pa.table(
        {
            "doc_id": pc.take(batch["doc_id"], parent),
            "span_idx": pc.struct_field(flat, "offset"),
            "kind": pc.struct_field(flat, "kind"),
            "media_ref": pc.struct_field(flat, "media_ref"),
        }
    )
    return out.filter(pc.invert(pc.equal(pc.struct_field(flat, "kind"),
                                         pa.scalar("text"))))


class RealDecoder:
    """Production decode stub — the codec hook point."""

    def __init__(self):
        raise NotImplementedError(
            "media codecs (PIL/libav) are not available in this "
            "environment; use FakeDecoder for plumbing tests"
        )


class FakeDecoder:
    """Deterministic stand-in: bytes = sha256 stream keyed by media_ref;
    'features' = first FEATURE_DIM bytes scaled to [0,1)."""

    def __init__(self, payload_bytes: int = 256):
        self.payload_bytes = payload_bytes

    def fetch(self, media_ref: str) -> bytes:
        out = b""
        seed = media_ref.encode()
        while len(out) < self.payload_bytes:
            seed = hashlib.sha256(seed).digest()
            out += seed
        return out[: self.payload_bytes]

    def features(self, payload: bytes) -> np.ndarray:
        arr = np.frombuffer(payload[:FEATURE_DIM], dtype=np.uint8)
        return (arr / 256.0).astype(np.float32)


class MediaFeatureActor:
    """Actor-pool stage: decode + feature-extract media spans. Decoder
    constructed ONCE per actor (the model/codec load)."""

    def __init__(self, decoder_cls=FakeDecoder, **decoder_kwargs):
        self.decoder = decoder_cls(**decoder_kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        n_bytes, feats = [], []
        for ref in refs:
            payload = self.decoder.fetch(ref)
            n_bytes.append(len(payload))
            feats.append(self.decoder.features(payload))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "span_idx": batch["span_idx"],
                "kind": batch["kind"],
                "media_ref": batch["media_ref"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            },
            schema=MEDIA_FEATURES,
        )


def media_features(docs_ds, decoder_cls=FakeDecoder, batch_size: int = 64,
                   concurrency=None):
    """documents -> per-media-span features (actor pool, small batches:
    real payloads are MBs each, so batch x pool must fit the heap)."""
    from openie_backend_ray.util import auto_pool

    media = docs_ds.map_batches(explode_media_spans, batch_format="pyarrow")
    return media.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"decoder_cls": decoder_cls},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_pool(0.5),
    )


# ---------------------------------------------------------------------------
# resize + frame-sample stages (same actor-pool plumbing contract)
# ---------------------------------------------------------------------------

def resize_features(features_ds, out_dim: int = 4):
    """Feature resize/pool stage: FEATURE_DIM -> out_dim by block mean
    (the downsample-resize analogue; fully vectorized numpy per batch).
    In production this is where torchvision/PIL resize would run — the
    batch/schema plumbing is identical."""
    assert FEATURE_DIM % out_dim == 0
    block = FEATURE_DIM // out_dim

    def body(batch: pa.Table) -> pa.Table:
        feats = np.array(batch["feature"].to_pylist(), dtype=np.float32)
        pooled = feats.reshape(len(feats), out_dim, block).mean(axis=2)
        idx = batch.column_names.index("feature")
        return batch.set_column(
            idx, "feature",
            pa.array([f.tolist() for f in pooled], pa.list_(pa.float32())),
        )

    return features_ds.map_batches(body, batch_format="pyarrow")


MEDIA_FRAMES = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_ref", pa.string()),
    ]
)


class FrameSampler:
    """Actor-pool frame sampler for video spans: decode the container
    header (stubbed: frame count = 8 + first payload byte % 9, i.e.
    8..16 deterministic frames) and emit every ``every``-th frame as a
    (frame_idx, frame_ref) row.  Real libav frame extraction plugs in
    via ``decoder_cls`` exactly like MediaFeatureActor."""

    def __init__(self, decoder_cls=FakeDecoder, every: int = 2,
                 **decoder_kwargs):
        self.decoder = decoder_cls(**decoder_kwargs)
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {n: [] for n in MEDIA_FRAMES.names}
        for r in batch.to_pylist():
            payload = self.decoder.fetch(r["media_ref"])
            n_frames = 8 + payload[0] % 9
            for fi in range(0, n_frames, self.every):
                rows["doc_id"].append(r["doc_id"])
                rows["span_idx"].append(r["span_idx"])
                rows["media_ref"].append(r["media_ref"])
                rows["frame_idx"].append(fi)
                rows["frame_ref"].append(f"{r['media_ref']}#f{fi}")
        return pa.Table.from_pydict(rows, schema=MEDIA_FRAMES)


def media_frames(docs_ds, decoder_cls=FakeDecoder, every: int = 2,
                 batch_size: int = 64, concurrency=None):
    """documents -> sampled frame rows for VIDEO spans (small batches:
    real video payloads are large; actor pool so codec state loads once
    per actor)."""
    from openie_backend_ray.util import auto_pool

    media = docs_ds.map_batches(explode_media_spans, batch_format="pyarrow")
    video = media.filter(expr="kind == 'video'")
    return video.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"decoder_cls": decoder_cls, "every": every},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_pool(0.5),
    )
