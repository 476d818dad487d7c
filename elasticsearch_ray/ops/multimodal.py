"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque ``binary`` columns with typed metadata; the
decode / feature-extract kernels run as ACTOR-POOL ``map_batches`` stages
with small batch sizes (large payloads x concurrency must fit worker heaps —
SURVEY prompt 'Memory-aware').

``mode='strict'`` uses a REAL image codec (PIL) when it is importable in
the runtime; when no codec is present (this sandbox ships none) it raises
``NotImplementedError`` at actor construction — the documented integration
point.  ``mode='fake'`` produces a deterministic byte-histogram
pseudo-feature so the Ray-side plumbing — schema, actor signature, batch
sizing, output layout — is real and tested end-to-end either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 16


def _try_import_pil():
    """PIL.Image when importable, else None (never raises): strict-mode
    actors decide at __init__ whether a real codec backs them."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


class BinaryFeatureExtractor:
    """Actor-pool stage: binary payload -> fixed-dim float feature vector.

    Stateful setup (a real model / codec handle) belongs in ``__init__`` —
    loaded once per actor, never per batch.
    """

    def __init__(self, payload_col: str = "payload", mode: str = "fake",
                 feature_dim: int = FEATURE_DIM):
        self.payload_col = payload_col
        self.mode = mode
        self.feature_dim = feature_dim
        self._Image = None
        if mode == "strict":
            self._Image = _try_import_pil()
            if self._Image is None:
                raise NotImplementedError(
                    "mode='strict' needs a real image codec and PIL is not "
                    "importable in this environment; install Pillow or use "
                    "mode='fake'"
                )
        elif mode != "fake":  # a typo must not silently select the stub path
            raise ValueError(f"unknown mode {mode!r}; expected 'fake' or 'strict'")
        # 'model' state: fixed projection seeded deterministically
        rng = np.random.default_rng(42)
        self._proj = rng.normal(size=(256, feature_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        payloads = batch.column(self.payload_col).to_pylist()
        feats = np.zeros((len(payloads), self.feature_dim), dtype=np.float32)
        sizes = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            sizes[i] = len(p)
            if not p:
                continue
            if self._Image is not None:
                # real decode: grayscale pixel histogram -> projection
                img = self._Image.open(io.BytesIO(p)).convert("L")
                px = np.asarray(img, dtype=np.uint8).ravel()
                hist = np.bincount(px, minlength=256).astype(np.float32)
                feats[i] = (hist / max(1, px.size)) @ self._proj
            else:
                hist = np.bincount(
                    np.frombuffer(p, dtype=np.uint8), minlength=256
                ).astype(np.float32)
                feats[i] = (hist / max(1, len(p))) @ self._proj
        out = batch.drop_columns([self.payload_col])
        return out.append_column(
            "payload_bytes", pa.array(sizes)
        ).append_column(
            "feature", pa.array(list(feats), pa.list_(pa.float32(), self.feature_dim))
        )


class ImageResizeStub:
    """Actor-pool resize stage.  ``mode='strict'`` decodes + resizes with
    PIL when importable (grayscale ``target x target`` thumbnail bytes) and
    raises at construction when no codec is present; ``mode='fake'`` emits
    a deterministic pseudo-thumbnail: the payload byte stream
    average-pooled into a ``target x target`` uint8 grid — same schema,
    same batch plumbing."""

    def __init__(self, payload_col: str = "payload", target: int = 8,
                 mode: str = "fake"):
        self._Image = None
        if mode == "strict":
            self._Image = _try_import_pil()
            if self._Image is None:
                raise NotImplementedError(
                    "mode='strict' needs PIL for decode+resize; install "
                    "Pillow or use mode='fake'"
                )
        elif mode != "fake":
            raise ValueError(f"unknown mode {mode!r}; expected 'fake' or 'strict'")
        self.payload_col = payload_col
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        t = self.target
        thumbs = []
        for p in batch.column(self.payload_col).to_pylist():
            if self._Image is not None:
                if not p:
                    # null/empty payload: placeholder thumbnail (the fake
                    # path tolerates these rows; strict must not kill the
                    # whole map_batches task over a missing payload —
                    # corrupt NON-empty bytes still raise)
                    thumbs.append(bytes(t * t))
                    continue
                img = self._Image.open(io.BytesIO(p)).convert("L")
                thumbs.append(
                    np.asarray(img.resize((t, t)), dtype=np.uint8).tobytes()
                )
                continue
            p = p or b"\x00"
            arr = np.frombuffer(p, dtype=np.uint8)
            cells = np.array_split(arr, t * t)
            thumb = np.array(
                [int(c.mean()) if c.size else 0 for c in cells], dtype=np.uint8
            )
            thumbs.append(thumb.tobytes())
        return batch.drop_columns([self.payload_col]).append_column(
            "thumbnail", pa.array(thumbs, pa.binary())
        )


class FrameSampleStub:
    """Actor-pool video frame-sampling stage (stubbed decode): every
    ``stride``-th fixed-size byte window stands in for a decoded frame;
    output is ``frames: list<binary>`` — the schema a real ffmpeg-backed
    sampler would produce."""

    def __init__(self, payload_col: str = "payload", frame_bytes: int = 64,
                 stride: int = 4, max_frames: int = 8, mode: str = "fake"):
        if mode == "strict":
            raise NotImplementedError("plug ffmpeg frame extraction here")
        if mode != "fake":
            raise ValueError(f"unknown mode {mode!r}; expected 'fake' or 'strict'")
        self.payload_col = payload_col
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames_col = []
        for p in batch.column(self.payload_col).to_pylist():
            p = p or b""
            frames = [
                p[i : i + self.frame_bytes]
                for i in range(
                    0, len(p), self.frame_bytes * self.stride
                )
            ][: self.max_frames]
            frames_col.append(frames)
        return batch.drop_columns([self.payload_col]).append_column(
            "frames", pa.array(frames_col, pa.list_(pa.binary()))
        )


def extract_binary_features(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    mode: str = "fake",
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Actor-pool feature extraction over a binary column.

    ``batch_size`` is deliberately small: payload bytes x batch x actor count
    bounds worker heap usage (images/audio are orders larger than text rows).
    """
    return ds.map_batches(
        BinaryFeatureExtractor,
        fn_constructor_kwargs=dict(payload_col=payload_col, mode=mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
