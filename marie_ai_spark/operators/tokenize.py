"""Batch tokenization of cleaned text into deterministic token-id sequences.

The reference's analog is TrOCR batch recognition — fragments batched by
free memory, decoded by a tokenizer (marie/document/trocr_ocr_processor.py:
251-300) — and LMDX token-budget chunking (marie/extract/lmdx/pipeline.py:
111-181). Here the model is replaced (per the north star) by a
deterministic, vocabulary-free scheme so tests are hermetic:

  - BPE-ish pretokenization regex (word / number / punctuation pieces,
    leading-space aware — the GPT-2 pattern family, public knowledge)
  - token id = stable 32-bit bucket of the piece's md5 (vocab-free hashing
    trick, as in hashing vectorizers)

Runs as one Arrow-batched mapInPandas stage; chunking is a JVM-side
posexplode of slices — no Python in the chunk fan-out.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-style pretokenizer, simplified to stdlib `re`
_PRETOK = re.compile(
    r" ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

VOCAB_BITS = 32


def encode_text(text: str) -> list[int]:
    """Deterministic token ids for one document (shared with tests)."""
    if not text:
        return []
    out = []
    for piece in _PRETOK.findall(text):
        h = hashlib.md5(piece.encode("utf-8", "surrogatepass")).digest()
        out.append(int.from_bytes(h[:4], "big"))
    return out


TOKENIZED_SCHEMA = (
    "conv_id string, turn_idx int, token_ids array<long>, n_tokens int"
)


def tokenize_extracted(extracted: DataFrame) -> DataFrame:
    """extracted(conv_id, turn_idx, clean_text, ...) -> token id arrays.
    Narrow Arrow-batched map; batch size bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [encode_text(t) for t in pdf["clean_text"]]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    "turn_idx": pdf["turn_idx"].astype("int32").values,
                    "token_ids": ids,
                    "n_tokens": pd.Series(
                        [len(x) for x in ids], dtype="int32"
                    ),
                }
            )

    return extracted.select("conv_id", "turn_idx", "clean_text").mapInPandas(
        fn, schema=TOKENIZED_SCHEMA
    )


def chunk_tokens(
    tokenized: DataFrame, max_len: int = 512, overlap: int = 64
) -> DataFrame:
    """Split token arrays into fixed-budget chunks with overlap (the LMDX
    chunking semantics), JVM-side: sequence + transform + posexplode."""
    stride = max_len - overlap
    # a start is only useful while it adds uncovered tokens: start+overlap
    # must lie inside the doc, else the trailing chunk is wholly contained
    # in the previous one (duplicate training content)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("token_ids") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts, lambda s: F.slice(F.col("token_ids"), s + 1, max_len)
    )
    return (
        tokenized.filter(F.size("token_ids") > 0)
        .select(
            "conv_id",
            "turn_idx",
            F.posexplode(chunks).alias("chunk_idx", "chunk"),
        )
        .withColumn("chunk_len", F.size("chunk"))
    )
