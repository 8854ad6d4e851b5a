"""Document chunking for training-window preparation.

Splits each document into fixed-size character chunks with overlap — the
standard pre-tokenization step for LLM training pipelines (context-window
packing) and for chunked embedding/retrieval indexes.

Pure map-side: ``sequence → transform → explode`` runs inside the scan
stage projection; no shuffle, no Python. A 100 TB corpus chunks at scan
throughput, and the output inherits the input's partitioning (chunks of a
document stay in its partition — downstream per-doc ops need no
re-shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_chars: int = 200,
    overlap_chars: int = 50,
) -> DataFrame:
    """Explode each document into overlapping character chunks.

    Chunk ``i`` starts at ``1 + i·(chunk_chars − overlap_chars)`` (1-based)
    and spans ``chunk_chars``; starts walk the text while they are ≤
    ``len`` so every character lands in ≥1 chunk and consecutive chunks
    share ``overlap_chars`` characters. Empty text still yields one empty
    chunk (a document never disappears from the output).

    Output: ``(doc_id, chunk_idx, chunk_start, n_chunk_chars, chunk_text)``
    with ``chunk_idx`` 0-based.
    """
    if overlap_chars >= chunk_chars:
        raise ValueError("overlap_chars must be < chunk_chars")
    step = chunk_chars - overlap_chars
    t = F.col(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1)), F.lit(step))
    chunks = F.transform(
        starts,
        lambda pos, i: F.struct(
            i.alias("chunk_idx"),
            pos.alias("chunk_start"),
            t.substr(pos, F.lit(chunk_chars)).alias("chunk_text"),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        "c.chunk_idx",
        "c.chunk_start",
        F.length("c.chunk_text").alias("n_chunk_chars"),
        "c.chunk_text",
    )
