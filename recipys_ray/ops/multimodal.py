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
        col = tbl.column(self.binary_col).combine_chunks()
        chunk = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        n = len(chunk)
        out = np.zeros((n, self.bins), dtype=np.float32)
        width = 256 // self.bins
        if n:
            # zero-copy over the Arrow buffers: one frombuffer for the whole
            # batch + a segmented bincount via np.add.at on (row, bin) —
            # never boxes payload bytes into Python objects
            odt = (
                np.int64 if pa.types.is_large_binary(chunk.type)
                else np.int32
            )
            offs = np.frombuffer(
                chunk.buffers()[1], dtype=odt, count=n + 1 + chunk.offset
            )[chunk.offset:].astype(np.int64)
            data_buf = chunk.buffers()[2]
            if data_buf is not None and offs[-1] > offs[0]:
                data = np.frombuffer(data_buf, dtype=np.uint8)[
                    offs[0]:offs[-1]
                ]
                lens = np.diff(offs)
                rows = np.repeat(np.arange(n), lens)
                flat = rows * self.bins + (data // width)
                counts = np.bincount(flat, minlength=n * self.bins)
                out = (
                    counts.reshape(n, self.bins).astype(np.float32)
                    / np.maximum(lens, 1)[:, None]
                )
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


# --------------------------------------------------------------------- #
# WebDataset-style tar shard source
# --------------------------------------------------------------------- #
def read_webdataset(paths, suffixes=None, meta_suffixes=("txt", "json", "cls")):
    """Read WebDataset-style tar shards into a Dataset of samples.

    The WebDataset convention (public format): a shard is a POSIX tar whose
    members are named ``<key>.<suffix>`` — all members sharing a key form
    one sample (e.g. ``000123.jpg`` + ``000123.txt``). This reader composes
    Ray's ``read_binary_files`` (one task per shard, streams shard bytes
    through the object store) with a stdlib ``tarfile`` flat_map: each task
    parses ITS shard only, so shards are the unit of parallelism and
    resume, exactly like the sharded-parquet layout elsewhere in the repo.

    Output columns: ``__key__`` (string), ``__shard__`` (source path), one
    ``binary`` column per payload suffix, one ``string`` column per
    ``meta_suffixes`` entry found. Missing members are null.

    ``suffixes``: restrict which payload suffixes become columns (default:
    every suffix encountered in the shard).
    """
    import io as _io
    import tarfile

    import ray.data as rd

    src = rd.read_binary_files(paths, include_paths=True)

    def parse_shard(row: dict):
        shard_path = row["path"]
        samples: dict[str, dict] = {}
        with tarfile.open(fileobj=_io.BytesIO(row["bytes"])) as tf:
            for member in tf.getmembers():
                if not member.isfile():
                    continue
                name = member.name.rsplit("/", 1)[-1]
                if "." not in name:
                    continue
                key, suffix = name.split(".", 1)
                suffix = suffix.lower()
                if suffixes is not None and suffix not in set(
                    suffixes
                ) | set(meta_suffixes):
                    continue
                data = tf.extractfile(member).read()
                samples.setdefault(key, {})[suffix] = data
        out = []
        for key in sorted(samples):
            rec = {"__key__": key, "__shard__": shard_path}
            for suffix, data in samples[key].items():
                if suffix in meta_suffixes:
                    rec[suffix] = data.decode("utf-8", "replace")
                else:
                    rec[suffix] = data
            out.append(rec)
        return out

    return src.flat_map(parse_shard)
