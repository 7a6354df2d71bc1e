"""Multimodal columns: opaque binary payloads + typed metadata, with
actor-pool decode / feature-extract / resize / frame-sample stages.

The image/audio codec libraries are not available in this environment,
so the *decode kernels* are stubbed: ``backend="fake"`` (default) runs a
deterministic pure-numpy stand-in; ``backend="pil"`` / ``"librosa"``
raise ``NotImplementedError`` with a clear message. Everything around
the kernel — the Arrow schema, binary-column handling, per-actor model
setup, small-batch sizing for large payloads, output layout — is real
and tested, so swapping in a real decoder is a one-function change.

Scale notes: binary payloads make rows wide — stages use small
``batch_size`` (payload_bytes x batch_size x concurrency must fit the
worker heap) and ``batch_format="pyarrow"`` throughout (binary columns
round-trip Arrow zero-copy; pandas would object-box them).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("payload", pa.binary()),
    ("width", pa.int32()),       # image/video
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),  # audio
    ("duration_ms", pa.int32()),  # audio/video
])


def make_fake_media(n: int, seed: int = 0, kind: str = "image") -> pa.Table:
    """Deterministic synthetic media table (payload = seeded bytes with a
    12-byte header carrying the fake dimensions)."""
    rng = np.random.default_rng((seed, kind == "audio", kind == "video"))
    rows = {k: [] for k in ("media_id", "kind", "payload", "width", "height",
                            "sample_rate", "duration_ms")}
    for i in range(n):
        w = int(rng.integers(16, 256))
        h = int(rng.integers(16, 256))
        sr = int(rng.integers(8000, 48000))
        dur = int(rng.integers(100, 10_000))
        body = rng.integers(0, 256, size=int(rng.integers(64, 2048)),
                            dtype=np.uint8).tobytes()
        header = w.to_bytes(4, "little") + h.to_bytes(4, "little") + \
            sr.to_bytes(4, "little")
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(header + body)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["sample_rate"].append(sr)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _payload_matrix(col: pa.Array) -> list[np.ndarray]:
    return [np.frombuffer(b, dtype=np.uint8) for b in col.to_pylist()]


class MediaDecoder:
    """map_batches actor: payload -> fixed-size feature vector.

    ``backend="fake"``: deterministic feature = 64 means over byte-value
    histogram windows (stands in for a CNN/audio embedding).
    Real backends raise ``NotImplementedError`` until their libraries
    are installed — the surrounding plumbing is identical.
    """

    FEATURE_DIM = 64

    def __init__(self, backend: str = "fake"):
        if backend in ("pil", "torchvision"):
            raise NotImplementedError(
                f"backend {backend!r}: image codec libraries are not "
                "installed in this environment; use backend='fake' or "
                "install the codec and implement _decode_real()"
            )
        if backend in ("librosa", "torchaudio"):
            raise NotImplementedError(
                f"backend {backend!r}: audio libraries are not installed; "
                "use backend='fake'"
            )
        if backend != "fake":
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    def _features(self, payloads: list[np.ndarray]) -> np.ndarray:
        out = np.zeros((len(payloads), self.FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            if p.size == 0:
                continue
            hist = np.bincount(p, minlength=256).astype(np.float32)
            out[i] = hist.reshape(self.FEATURE_DIM, -1).sum(axis=1) / p.size
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = self._features(_payload_matrix(batch.column("payload")))
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "embedding": pa.array(list(feats), type=pa.list_(pa.float32())),
        })


class ImageResizer:
    """Resize stage: stub kernel recomputes header dims; plumbing
    (binary in -> binary out, per-actor setup) is real."""

    def __init__(self, max_side: int = 64, backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError("image codecs unavailable; backend='fake'")
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payloads = []
        out_w, out_h = [], []
        for b in batch.column("payload").to_pylist():
            w = int.from_bytes(b[0:4], "little")
            h = int.from_bytes(b[4:8], "little")
            scale = min(1.0, self.max_side / max(w, h, 1))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            # stub: keep payload bytes, rewrite header (a real backend
            # would re-encode pixels here)
            nb = nw.to_bytes(4, "little") + nh.to_bytes(4, "little") + b[8:]
            out_payloads.append(nb)
            out_w.append(nw)
            out_h.append(nh)
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": pa.array(out_payloads, type=pa.binary()),
            "width": pa.array(out_w, type=pa.int32()),
            "height": pa.array(out_h, type=pa.int32()),
        })


class FrameSampler:
    """Video frame sampling: emits one row per sampled frame (flat-map
    shape: one input row -> k output rows)."""

    def __init__(self, every_ms: int = 1000, backend: str = "fake"):
        if backend != "fake":
            raise NotImplementedError("video codecs unavailable; backend='fake'")
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, ts_ms, payloads = [], [], [], []
        for mid, dur, b in zip(
            batch.column("media_id").to_pylist(),
            batch.column("duration_ms").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            n_frames = max(1, int(dur) // self.every_ms)
            chunks = np.array_split(np.frombuffer(b, dtype=np.uint8), n_frames)
            for j, ch in enumerate(chunks):
                ids.append(mid)
                frame_idx.append(j)
                ts_ms.append(j * self.every_ms)
                payloads.append(ch.tobytes())
        return pa.table({
            "media_id": pa.array(ids, type=pa.int64()),
            "frame_idx": pa.array(frame_idx, type=pa.int32()),
            "ts_ms": pa.array(ts_ms, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        })


def decode_features(ds, backend: str = "fake", concurrency: int = 4,
                    batch_size: int = 64):
    """Dataset(media) -> Dataset(media_id, kind, embedding). Small
    batch_size: payloads are wide binary rows."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(backend=backend),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, every_ms: int = 1000, concurrency: int = 4,
                  batch_size: int = 32):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(every_ms=every_ms),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
