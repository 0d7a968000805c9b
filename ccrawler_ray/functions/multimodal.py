"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels (PIL/ffmpeg/soundfile) are NOT in this container —
the decode step is STUBBED behind an import-try with a deterministic
fake (clearly marked), while the Ray-side plumbing (binary schema,
actor-pool stage, batch sizing for large payloads, output layout) is
real and tested.

Pattern for large payloads: small ``batch_size`` (payload bytes ×
batch × concurrency must fit worker heap), ``batch_format="pyarrow"``
(binary columns do NOT round-trip pandas cleanly), decode state in an
actor's ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ccrawler_ray.scale import read_docs

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),     # "image" | "audio"
        ("payload", pa.binary()),
        ("n_bytes", pa.int64()),
    ]
)


def synth_media(sf_dir: str):
    """Deterministic binary payloads derived from the documents table
    (stands in for real image/audio bytes; byte-stable)."""
    ds = read_docs(sf_dir, ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        payloads = [x.encode("utf-8") for x in texts]
        mtypes = ["image" if i % 2 == 0 else "audio" for i in ids]
        return pa.Table.from_arrays(
            [
                t.column("doc_id"),
                pa.array(mtypes, pa.string()),
                pa.array(payloads, pa.binary()),
                pa.array(np.array([len(p) for p in payloads], dtype=np.int64)),
            ],
            schema=MEDIA_SCHEMA,
        )

    return ds.map_batches(f, batch_format="pyarrow")


class MediaDecoder:
    """Actor-pool decode stage. Real decoder loaded once per actor in
    __init__ when available; otherwise a DETERMINISTIC FAKE decode
    (marked in the output) that derives (width, height) / (sr, n_samp)
    from the payload hash. Swap in PIL/soundfile by installing them —
    the Ray plumbing does not change."""

    def __init__(self):
        try:  # pragma: no cover - not installed in this container
            from PIL import Image  # noqa: F401

            self.real = True
        except ImportError:
            self.real = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real:  # pragma: no cover
            raise NotImplementedError("real decode path requires PIL/soundfile")
        payloads = batch.column("payload").to_pylist()
        mtypes = batch.column("media_type").to_pylist()
        widths = np.zeros(len(payloads), dtype=np.int64)
        heights = np.zeros(len(payloads), dtype=np.int64)
        for i, (p, mt) in enumerate(zip(payloads, mtypes)):
            h = hashlib.blake2b(p, digest_size=4).digest()
            # FAKE decode: dims derived deterministically from content
            widths[i] = 64 + h[0]
            heights[i] = 64 + h[1] if mt == "image" else 1
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_type": batch.column("media_type"),
                "n_bytes": batch.column("n_bytes"),
                "width": pa.array(widths),
                "height": pa.array(heights),
                "decoder": pa.array(["fake"] * len(payloads), pa.string()),
            }
        )


def decode_media_meta(sf_dir: str):
    """synth → decode (actor pool, small batches for binary payloads)."""
    media = synth_media(sf_dir)
    return media.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=64, concurrency=2
    )


def resize_stage(batch: pa.Table, max_dim: int = 96) -> pa.Table:
    """Resize plumbing: rescales the (fake-)decoded dims so the longer
    side is <= max_dim, preserving aspect. Metadata-only here — with a
    real decoder the payload bytes would be transformed in the same
    batch pass."""
    w = batch.column("width").to_numpy(zero_copy_only=False).astype(np.float64)
    h = batch.column("height").to_numpy(zero_copy_only=False).astype(np.float64)
    scale = np.minimum(1.0, max_dim / np.maximum(w, h))
    out = batch.drop_columns(["width", "height"])
    out = out.append_column("width", pa.array((w * scale).astype(np.int64)))
    out = out.append_column("height", pa.array((h * scale).astype(np.int64)))
    return out


def frame_sample(batch: pa.Table, every_n_bytes: int = 64) -> pa.Table:
    """Frame-sampling plumbing (video analog): one output row per
    sampled 'frame' (every_n_bytes window of the payload) — the
    explode/flat-map shape a real frame sampler uses, with
    deterministic fake frame ids."""
    n_bytes = batch.column("n_bytes").to_numpy(zero_copy_only=False)
    n_frames = np.maximum(1, n_bytes // every_n_bytes).astype(np.int64)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    rep = np.repeat(np.arange(len(doc_ids)), n_frames)
    frame_idx = np.concatenate([np.arange(c) for c in n_frames])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[rep], pa.int64()),
            "frame": pa.array(frame_idx, pa.int64()),
            "offset_bytes": pa.array(frame_idx * every_n_bytes, pa.int64()),
        }
    )


def media_pipeline(sf_dir: str):
    """synth → decode (actor pool) → resize → frame-sample: the full
    multimodal chain (schemas/batch-sizing real; decode faked)."""
    decoded = decode_media_meta(sf_dir)
    resized = decoded.map_batches(resize_stage, batch_format="pyarrow", batch_size=64)
    return resized.map_batches(frame_sample, batch_format="pyarrow", batch_size=64)


def media_byte_stats(sf_dir: str):
    """Payload byte accounting per media type (SQL-checkable:
    n_bytes == octet_length(encode(text)))."""
    from ray.data.aggregate import Count, Sum

    media = synth_media(sf_dir).drop_columns(["payload"])
    return media.groupby("media_type").aggregate(
        Count(alias_name="n_docs"), Sum("n_bytes", alias_name="total_bytes")
    )


def media_dedup_exact(sf_dir: str):
    """Exact dedup over the BINARY payload column: one row per
    distinct (media_type, md5(payload)) with the smallest doc_id kept
    and the copy count — D3 for opaque media bytes. Map-side combine
    (per-batch group to partials) bounds the shuffle to one row per
    distinct payload per block; the payload itself never crosses the
    shuffle, only its 32-char digest."""
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    media = synth_media(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(p).hexdigest()
                for p in t.column("payload").to_pylist()]
        df = pd.DataFrame(
            {"media_type": t.column("media_type").to_pylist(),
             "payload_md5": md5s,
             "doc_id": t.column("doc_id").to_numpy(zero_copy_only=False)})
        g = df.groupby(["media_type", "payload_md5"], as_index=False).agg(
            keep_doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return pa.table(
            {"media_type": pa.array(g["media_type"], pa.string()),
             "payload_md5": pa.array(g["payload_md5"], pa.string()),
             "keep_doc_id": pa.array(g["keep_doc_id"].astype("int64")),
             "n_copies": pa.array(g["n_copies"].astype("int64"))})

    return (media.map_batches(partial, batch_format="pyarrow")
            .groupby(["media_type", "payload_md5"])
            .aggregate(Min("keep_doc_id", alias_name="keep_doc_id"),
                       Sum("n_copies", alias_name="n_copies")))


# ---------------------------------------------------------------------------
# Media NEAR-dup: byte-shingle SimHash over the opaque binary payload.
# The payload is never decoded — 8-byte rolling windows (distinct,
# splitmix64-mixed so low-entropy byte streams still vote on all 64
# bits) vote a 64-bit SimHash per payload; pairing reuses the
# radius-derived blocking + in-bucket hamming verify of the text
# SimHash kernel (functions.dedup._simhash_pairs). Payload bytes never
# cross the shuffle — only (doc_id, simhash).
# ---------------------------------------------------------------------------

MEDIA_SHINGLE_BYTES = 8


def _byte_shingle_simhash(payloads) -> np.ndarray:
    """FROZEN kernel (mirrored by serial_ref.media_dedup_near): uint64
    SimHash over DISTINCT little-endian 8-byte windows; payloads
    shorter than a window hash as one zero-padded shingle; empty
    payloads hash to 0."""
    from ccrawler_ray.functions.dedup import _BIT_WEIGHTS
    from ccrawler_ray.functions.graph import _splitmix64

    W = MEDIA_SHINGLE_BYTES
    out = np.zeros(len(payloads), dtype=np.uint64)
    for i, p in enumerate(payloads):
        if len(p) == 0:
            continue
        if len(p) < W:
            sh = np.array([int.from_bytes(p, "little")], dtype=np.uint64)
        else:
            arr = np.frombuffer(p, dtype=np.uint8)
            wins = np.lib.stride_tricks.sliding_window_view(arr, W)
            v = np.zeros(len(wins), dtype=np.uint64)
            for j in range(W):
                v |= wins[:, j].astype(np.uint64) << np.uint64(8 * j)
            sh = np.unique(v)
        hs = _splitmix64(sh)
        bits = ((hs[:, None] & _BIT_WEIGHTS[None, :]) != 0).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(hs)
        out[i] = ((votes > 0) * _BIT_WEIGHTS).sum(dtype=np.uint64)
    return out


def media_simhash(sf_dir: str):
    """doc_id → byte-shingle SimHash of the media payload."""
    media = synth_media(sf_dir)

    def f(batch: pa.Table) -> pa.Table:
        sh = _byte_shingle_simhash(batch.column("payload").to_pylist())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(sh, pa.uint64())})

    # small batches: payload bytes × batch × concurrency in worker heap
    return media.map_batches(f, batch_format="pyarrow", batch_size=256)


def media_dedup_near(sf_dir: str, max_hamming: int = 3):
    """(doc_a, doc_b, hamming): near-duplicate media payloads within
    the hamming radius — the binary-column analog of dedup_simhash
    (100% recall at the radius by pigeonhole blocking)."""
    from ccrawler_ray.functions.dedup import _simhash_pairs

    return _simhash_pairs(media_simhash(sf_dir).materialize(), max_hamming)
