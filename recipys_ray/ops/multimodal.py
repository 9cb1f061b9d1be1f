"""Multimodal (image/audio/video) column stages.

Media are opaque ``binary`` columns plus typed metadata columns. The Ray-side
plumbing — schema, actor-pool signatures, batch sizing, output layout — is
real and tested; the codec calls themselves are STUBBED because no
image/audio library exists in this environment:

- ``DecodeImage(fake=True)`` produces deterministic fake decodes (metadata
  derived from a stable content hash) so pipelines are testable end-to-end;
- ``DecodeImage(fake=False)`` raises ``NotImplementedError`` at construction,
  marking exactly where PIL/libvips would be loaded once per actor.

Batch-size guidance at scale: with ~1 MiB payloads use ``batch_size≈32`` and
raise ``DataContext.target_max_block_size`` so Arrow doesn't split blocks
absurdly small; binary columns must stay in ``batch_format="pyarrow"``
(pandas would object-box them).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stable_u64(data: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(data).astype(np.uint64)


class DecodeImage:
    """Actor-pool stage: binary image column → (width, height, mode) metadata
    + a fixed-length feature vector.

    Real path (``fake=False``): load PIL once in ``__init__`` (once per
    actor), decode per batch. Stubbed here — no codec libs in this sandbox.
    """

    def __init__(self, binary_col: str = "image", fake: bool = True):
        self.binary_col = binary_col
        if not fake:
            raise NotImplementedError(
                "Image decoding requires PIL/libvips, not available in this "
                "environment. Construct with fake=True for deterministic "
                "fake decodes (pipeline plumbing is identical)."
            )

    def __call__(self, tbl: pa.Table) -> pa.Table:
        col = tbl.column(self.binary_col)
        payloads = col.to_pylist()
        h = _stable_u64(
            np.array([p if p is not None else b"" for p in payloads], dtype=object)
        )
        width = (h % 1920 + 1).astype(np.int32)
        height = ((h >> np.uint64(16)) % 1080 + 1).astype(np.int32)
        nbytes = np.array(
            [len(p) if p is not None else 0 for p in payloads], dtype=np.int64
        )
        tbl = tbl.append_column("img_width", pa.array(width))
        tbl = tbl.append_column("img_height", pa.array(height))
        tbl = tbl.append_column("img_bytes", pa.array(nbytes))
        return tbl


class ByteHistogramFeatures:
    """REAL (non-stub) feature extraction on binary payloads: a 16-bin byte
    histogram per row, vectorized via numpy frombuffer — the honest
    stand-in for learned embeddings over media bytes."""

    def __init__(self, binary_col: str = "image", bins: int = 16):
        self.binary_col = binary_col
        self.bins = bins

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column(self.binary_col).to_pylist()
        out = np.zeros((len(payloads), self.bins), dtype=np.float32)
        width = 256 // self.bins
        for i, p in enumerate(payloads):
            if p:
                arr = np.frombuffer(p, dtype=np.uint8)
                out[i] = np.bincount(arr // width, minlength=self.bins)[
                    : self.bins
                ] / max(1, len(arr))
        return tbl.append_column(
            "byte_hist", pa.array(list(out))
        )


class SampleFrames:
    """Video frame sampling stub: emits one row per sampled frame index with
    the real flat_map-style row-multiplication plumbing; actual frame
    extraction would live where ``NotImplementedError`` marks it."""

    def __init__(self, binary_col: str = "video", every_n: int = 30,
                 max_frames: int = 8, fake: bool = True):
        self.binary_col = binary_col
        self.every_n = every_n
        self.max_frames = max_frames
        if not fake:
            raise NotImplementedError(
                "Frame extraction requires ffmpeg/pyav, not available here."
            )

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column(self.binary_col).to_pylist()
        n_frames = np.array(
            [
                min(self.max_frames, max(1, (len(p) if p else 0) // (self.every_n * 1024) + 1))
                for p in payloads
            ],
            dtype=np.int64,
        )
        idx = np.repeat(np.arange(len(payloads)), n_frames)
        frame_no = np.concatenate([np.arange(k) for k in n_frames])
        base = tbl.take(pa.array(idx))
        return base.append_column(
            "frame_no", pa.array(frame_no.astype(np.int32))
        )


def decode_images(ds, binary_col: str = "image", concurrency: int = 4,
                  batch_size: int = 32, fake: bool = True):
    """Actor-pool decode stage with media-appropriate batch sizing."""
    return ds.map_batches(
        DecodeImage,
        fn_constructor_kwargs={"binary_col": binary_col, "fake": fake},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
