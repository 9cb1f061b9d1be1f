"""End-to-end document-curation pipeline — the ops composed the way a
training-data run actually chains them.

``curate_corpus``: normalize → length filter → exact dedup on the
NORMALIZED text → benchmark n-gram decontamination → deterministic
train/val/test split. Every stage is one of the engine's individually
oracled ops, and the whole composition stays a single streaming lazy plan:
the only exchange is exact_dedup's hash-partition on the 8-byte content
hash; normalization, filtering, contamination flagging and splitting are
shuffle-free map_batches stages, so the pipeline runs end-to-end with one
shuffle regardless of corpus size. The driver query ``curate_corpus``
replays the COMPOSITION in one SQL statement (CTE chain of the individual
stage oracles), so stage-interaction bugs — not just per-op bugs — fail
the contract.
"""

from __future__ import annotations


def curate_corpus(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 30,
    bench_mod: int = 97,
    ngram: int = 5,
    splits: dict | None = None,
):
    """See module docstring. ``bench_mod``: documents with
    ``id % bench_mod == 0`` form the held-out benchmark whose n-grams must
    not leak into training data (stand-in for an external eval set).
    Returns a Dataset of (id_col, split) for the surviving documents."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from recipys_ray.ops.decontaminate import decontaminate
    from recipys_ray.ops.dedup import exact_dedup
    from recipys_ray.ops.sampling import hash_split
    from recipys_ray.ops.text import normalize_text

    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}

    norm = normalize_text(docs, text_col=text_col, out_col="norm_text")

    def pick_bench(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        return tbl.filter(pa.array(ids % bench_mod == 0))

    bench = norm.map_batches(pick_bench, batch_format="pyarrow")

    def length_filter(tbl: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            pc.utf8_length(tbl.column("norm_text")), min_chars
        )
        return tbl.filter(pc.fill_null(keep, False))

    kept = norm.map_batches(length_filter, batch_format="pyarrow")
    deduped = exact_dedup(kept, text_col="norm_text", id_col=id_col)
    clean = decontaminate(
        deduped, bench, text_col="norm_text", n=ngram, mode="drop"
    )
    out = hash_split(clean, id_col, splits)

    def project(tbl: pa.Table) -> pa.Table:
        return tbl.select([id_col, "split"])

    return out.map_batches(project, batch_format="pyarrow")
