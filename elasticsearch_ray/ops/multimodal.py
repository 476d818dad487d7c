"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque ``binary`` columns with typed metadata; the
decode / feature-extract kernels run as ACTOR-POOL ``map_batches`` stages
with small batch sizes (large payloads x concurrency must fit worker heaps —
SURVEY prompt 'Memory-aware').

``mode='strict'`` runs a REAL decode: Pillow when it is importable in the
runtime, else the dependency-free PNG/BMP codec in
``elasticsearch_ray.functions.imagecodec`` — so the strict path executes
in any environment (this sandbox ships no image libraries).  The video
stage's strict mode parses real YUV4MPEG2 (Y4M) streams.  ``mode='fake'``
produces a deterministic byte-histogram pseudo-feature so schema/batch
plumbing can be exercised without synthesizing valid containers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from elasticsearch_ray.functions import imagecodec

FEATURE_DIM = 16


def _try_import_pil():
    """PIL.Image when importable, else None (never raises): strict-mode
    actors pick the codec once at __init__."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _make_gray_decoder():
    """One grayscale decode callable chosen once per actor: Pillow when
    present, else the pure PNG/BMP codec.  Returns ``(decode, backend)``
    where decode(payload_bytes) -> (H, W) uint8."""
    Image = _try_import_pil()
    if Image is not None:
        import io

        def decode(p: bytes) -> np.ndarray:
            img = Image.open(io.BytesIO(p)).convert("L")
            return np.asarray(img, dtype=np.uint8)

        return decode, "pillow"

    def decode(p: bytes) -> np.ndarray:
        return imagecodec.to_gray(imagecodec.decode_image(p))

    return decode, "imagecodec"


class BinaryFeatureExtractor:
    """Actor-pool stage: binary payload -> fixed-dim float feature vector.

    Stateful setup (the codec handle and the projection 'model') belongs
    in ``__init__`` — loaded once per actor, never per batch.
    """

    def __init__(self, payload_col: str = "payload", mode: str = "fake",
                 feature_dim: int = FEATURE_DIM):
        self.payload_col = payload_col
        self.mode = mode
        self.feature_dim = feature_dim
        self._decode = None
        if mode == "strict":
            self._decode, self.backend = _make_gray_decoder()
        elif mode != "fake":  # a typo must not silently select the stub path
            raise ValueError(f"unknown mode {mode!r}; expected 'fake' or 'strict'")
        # 'model' state: fixed projection seeded deterministically
        rng = np.random.default_rng(42)
        self._proj = rng.normal(size=(256, feature_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        feats = np.zeros((len(payloads), self.feature_dim), dtype=np.float32)
        sizes = np.zeros(len(payloads), dtype=np.int64)
        for i, p in enumerate(payloads):
            p = p or b""
            sizes[i] = len(p)
            if not p:
                continue
            if self._decode is not None:
                # real decode: grayscale pixel histogram -> projection
                px = self._decode(p).ravel()
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


class ImageDecodeMeta:
    """Actor-pool decode stage: binary image payload -> (width, height,
    mean luma).  Always a REAL decode (strict only) — the entry-level
    proof that bytes round-trip through an actual codec, oracle-twinned
    against the generative formula of the synthesized corpus."""

    def __init__(self, payload_col: str = "payload"):
        self.payload_col = payload_col
        self._decode, self.backend = _make_gray_decoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws, hs, means = [], [], []
        for p in batch.column(self.payload_col).to_pylist():
            if not p:
                # null/empty payload: zero-size placeholder row (strict
                # must not kill the whole map_batches task over a
                # missing payload — corrupt NON-empty bytes still raise)
                ws.append(0)
                hs.append(0)
                means.append(0)
                continue
            px = self._decode(p)
            h, w = px.shape
            ws.append(w)
            hs.append(h)
            # micro-units, floor(x+0.5): the repo-wide hash-safe convention
            means.append(
                int(np.floor(px.astype(np.int64).sum() / px.size * 1e6 + 0.5))
            )
        return batch.drop_columns([self.payload_col]).append_column(
            "width", pa.array(ws, pa.int64())
        ).append_column(
            "height", pa.array(hs, pa.int64())
        ).append_column(
            "mean_luma_u", pa.array(means, pa.int64())
        )


class ImageResize:
    """Actor-pool resize stage.  ``mode='strict'`` decodes + resizes for
    real — Pillow when importable, else the pure PNG/BMP codec with
    area-average resampling (``imagecodec.resize_area``); the two
    backends are NOT pixel-identical (different resample kernels), which
    callers needing cross-environment determinism get by pinning one.
    ``mode='fake'`` emits a deterministic pseudo-thumbnail: the payload
    byte stream average-pooled into a ``target x target`` uint8 grid —
    same schema, same batch plumbing."""

    def __init__(self, payload_col: str = "payload", target: int = 8,
                 mode: str = "fake"):
        self._Image = None
        self._pure = False
        if mode == "strict":
            self._Image = _try_import_pil()
            self._pure = self._Image is None
        elif mode != "fake":
            raise ValueError(f"unknown mode {mode!r}; expected 'fake' or 'strict'")
        self.payload_col = payload_col
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        import io

        t = self.target
        thumbs = []
        for p in batch.column(self.payload_col).to_pylist():
            if self._Image is not None or self._pure:
                if not p:
                    # null/empty payload: placeholder thumbnail (strict
                    # must not kill the whole map_batches task over a
                    # missing payload — corrupt NON-empty bytes still
                    # raise)
                    thumbs.append(bytes(t * t))
                    continue
                if self._Image is not None:
                    img = self._Image.open(io.BytesIO(p)).convert("L")
                    thumbs.append(
                        np.asarray(img.resize((t, t)), dtype=np.uint8)
                        .tobytes()
                    )
                else:
                    gray = imagecodec.to_gray(imagecodec.decode_image(p))
                    thumbs.append(
                        imagecodec.resize_area(gray, t, t).tobytes()
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


# round-4 name, kept for callers; the decode is no longer a stub
ImageResizeStub = ImageResize


class FrameSample:
    """Actor-pool video frame-sampling stage.  ``mode='strict'`` parses a
    REAL container: YUV4MPEG2 (Y4M) streams via ``imagecodec.y4m_parse``
    — every ``stride``-th luma frame is emitted as raw ``(H, W)`` bytes,
    capped at ``max_frames``, with the frame geometry alongside.
    ``mode='fake'`` keeps the old byte-window pseudo-frames (no container
    needed); output schema is ``frames: list<binary>`` either way."""

    def __init__(self, payload_col: str = "payload", frame_bytes: int = 64,
                 stride: int = 4, max_frames: int = 8, mode: str = "fake"):
        if mode not in ("fake", "strict"):
            raise ValueError(f"unknown mode {mode!r}; expected 'fake' or 'strict'")
        self.mode = mode
        self.payload_col = payload_col
        self.frame_bytes = frame_bytes
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames_col = []
        meta_w, meta_h, meta_n = [], [], []
        for p in batch.column(self.payload_col).to_pylist():
            p = p or b""
            if self.mode == "strict":
                params, frames = imagecodec.y4m_parse(p)
                sampled = frames[:: self.stride][: self.max_frames]
                frames_col.append([f.tobytes() for f in sampled])
                meta_w.append(params["width"])
                meta_h.append(params["height"])
                meta_n.append(len(frames))
            else:
                frames_col.append(
                    [
                        p[i : i + self.frame_bytes]
                        for i in range(
                            0, len(p), self.frame_bytes * self.stride
                        )
                    ][: self.max_frames]
                )
                meta_w.append(self.frame_bytes)
                meta_h.append(1)
                meta_n.append(-(-len(p) // self.frame_bytes) if p else 0)
        return batch.drop_columns([self.payload_col]).append_column(
            "frames", pa.array(frames_col, pa.list_(pa.binary()))
        ).append_column(
            "frame_width", pa.array(meta_w, pa.int64())
        ).append_column(
            "frame_height", pa.array(meta_h, pa.int64())
        ).append_column(
            "total_frames", pa.array(meta_n, pa.int64())
        )


# round-4 name, kept for callers; strict mode now parses real Y4M
FrameSampleStub = FrameSample


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


def decode_image_meta(
    ds: ray.data.Dataset,
    payload_col: str = "payload",
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Actor-pool REAL image decode -> (width, height, mean_luma_u)."""
    return ds.map_batches(
        ImageDecodeMeta,
        fn_constructor_kwargs=dict(payload_col=payload_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
