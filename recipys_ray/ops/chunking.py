"""Document chunking: split long documents into fixed-size character
windows with optional overlap — the standard pre-tokenization step for
training-window construction (each chunk becomes one training example).

Pure flat-map shape (rows multiply, no shuffle, no state): the 100-TB cost
is exactly one streaming pass. Vectorized as one
``pc.utf8_slice_codeunits`` kernel call per CHUNK POSITION over the whole
batch (a handful of iterations), never a per-document Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def chunk_documents(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    overlap: int = 0,
    out_col: str = "chunk_text",
    batch_size: int = 4096,
):
    """Split each document into chunks of ``chunk_chars`` characters whose
    starts step by ``chunk_chars - overlap``. Every document yields at
    least one chunk (empty/null text → one empty chunk), so no rows are
    silently dropped. Output: (id_col, chunk_no:int64, out_col).

    Chunk count: ``max(1, ceil((len - overlap) / step))`` — integer-exact
    on both the Ray and the SQL oracle side.
    """
    if overlap >= chunk_chars:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_chars "
            f"({chunk_chars})"
        )
    step = chunk_chars - overlap

    def fn(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(tbl.column(text_col), "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = tbl.column(id_col)
        lens = pc.utf8_length(texts).to_numpy().astype(np.int64)
        # ceil((len - overlap) / step) in pure ints; <=0 → 1
        n_chunks = np.maximum(1, -(-(lens - overlap) // step))
        max_chunks = int(n_chunks.max()) if len(n_chunks) else 0
        id_parts: list[pa.Array] = []
        text_parts: list[pa.Array] = []
        no_parts: list[np.ndarray] = []
        for k in range(max_chunks):
            live = np.flatnonzero(n_chunks > k)
            idx = pa.array(live)
            sliced = pc.utf8_slice_codeunits(
                texts.take(idx), start=k * step, stop=k * step + chunk_chars
            )
            id_parts.append(
                ids.take(idx).combine_chunks()
                if isinstance(ids, pa.ChunkedArray) else ids.take(idx)
            )
            text_parts.append(sliced)
            no_parts.append(np.full(len(live), k, dtype=np.int64))
        if not id_parts:
            return pa.table({
                id_col: ids.slice(0, 0),
                "chunk_no": pa.array([], pa.int64()),
                out_col: pa.array([], pa.string()),
            })
        return pa.table({
            id_col: pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in id_parts]
            ),
            "chunk_no": pa.array(np.concatenate(no_parts)),
            out_col: pa.concat_arrays(
                [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p
                 for p in text_parts]
            ),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def chunk_sentences(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = r"[.!?]\s+",
    out_col: str = "sentence",
):
    """Sentence-boundary chunking: split each document on ``pattern``
    (default: terminal punctuation + whitespace; the delimiter is
    consumed, matching SQL ``string_split_regex`` exactly — verified
    equal edge semantics incl. trailing-empty segments). Output rows:
    (id_col, sent_idx:int64 — the 0-based SPLIT position, empty segments
    filtered on both sides — out_col, n_chars:int64).

    Same flat-map shape as :func:`chunk_documents`: one streaming pass,
    one RE2 split kernel + one flatten per batch, rows multiply, no
    shuffle, no state.
    """

    def fn(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(tbl.column(text_col), "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        split = pc.split_pattern_regex(texts, pattern=pattern)
        flat = pc.list_flatten(split)
        lens = pc.list_value_length(split).to_numpy().astype(np.int64)
        idx = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(lens) - lens, lens
        )
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        rep_ids = np.repeat(ids, lens)
        keep = pc.not_equal(flat, "")
        out = pa.table(
            {
                id_col: pa.array(rep_ids),
                "sent_idx": pa.array(idx, pa.int64()),
                out_col: flat,
                "n_chars": pc.utf8_length(flat).cast(pa.int64()),
            }
        )
        return out.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")
