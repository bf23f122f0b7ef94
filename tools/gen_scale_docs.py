"""Deterministic large-scale synthetic documents for the dedup scale bench.

A corpus with realistic duplicate structure: 85% unique base docs (40–120
words from a 5k-word vocabulary), ~7.5% exact copies of a base doc, ~7.5%
near-duplicates (a base doc with 3 word substitutions — high but not
perfect n-gram Jaccard). Fully seeded: same (n_docs, seed) ⇒ identical
file. Written in chunks through pyarrow so peak memory stays ~one chunk.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache"
)


def generate(
    n_docs: int = 100_000,
    seed: int = 7,
    vocab_size: int = 5_000,
    out_dir: str = DEFAULT_DIR,
    chunk: int = 25_000,
) -> str:
    """Write (or reuse) the synthetic corpus; returns the parquet path."""
    tag = f"scale_docs_{n_docs}_s{seed}"
    path = os.path.join(out_dir, f"{tag}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(vocab_size)])

    n_base = int(n_docs * 0.85)
    base_texts: list[str] = []
    writer = None
    doc_id = 0
    try:
        # base docs
        for start in range(0, n_base, chunk):
            n = min(chunk, n_base - start)
            texts = []
            for _ in range(n):
                length = int(rng.integers(40, 121))
                texts.append(" ".join(vocab[rng.integers(0, vocab_size, length)]))
            base_texts.extend(texts)
            tbl = pa.table(
                {
                    "doc_id": pa.array(
                        range(doc_id, doc_id + n), type=pa.int64()
                    ),
                    "text": pa.array(texts, type=pa.string()),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(path, tbl.schema)
            writer.write_table(tbl)
            doc_id += n

        # duplicates: half exact copies, half 3-word substitutions
        n_dup = n_docs - n_base
        texts = []
        src = rng.integers(0, n_base, n_dup)
        for i in range(n_dup):
            words = base_texts[int(src[i])].split(" ")
            if i % 2 == 1:
                for pos in rng.integers(0, len(words), 3):
                    words[int(pos)] = str(vocab[int(rng.integers(0, vocab_size))])
            texts.append(" ".join(words))
        tbl = pa.table(
            {
                "doc_id": pa.array(range(doc_id, doc_id + n_dup), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
            }
        )
        if writer is None:
            writer = pq.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()
    return path


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    print(generate(n))
