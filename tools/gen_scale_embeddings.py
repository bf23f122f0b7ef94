"""Deterministic large-scale synthetic embeddings for the scaled bench.

Mirrors the reference's bench fixture generator (reference:
benches/bench_util.rs:12-58 — 1M x 1024 seeded random vectors written once
and reused) with one deliberate difference: rows are a seeded
mixture-of-Gaussians (1024 latent centers + noise) rather than i.i.d.
uniform. Real embedding spaces are clustered — that is the regime IVF
exists for — and i.i.d. uniform high-dim data has no neighbor structure to
recall. Fully seeded: same (rows, dim, centers, seed) => identical file.

Written in chunks through pyarrow so peak memory stays ~one chunk.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")


def generate(
    n_rows: int = 1_000_000,
    dim: int = 256,
    n_centers: int = 1024,
    seed: int = 1234,
    noise: float = 0.15,
    out_dir: str = DEFAULT_DIR,
    chunk: int = 100_000,
    point_seed: int | None = None,
    start_id: int = 0,
) -> str:
    """Write (or reuse) the synthetic table; returns the parquet path.

    ``point_seed`` draws the point mixture from a DIFFERENT stream while
    keeping the latent centers from ``seed`` — fresh rows from the SAME
    distribution, the append scenario (new data arriving for an index
    whose centroids were trained before it existed). ``start_id`` offsets
    ``vec_id`` so an appended table's ids continue the original's."""
    tag = f"scale_emb_{n_rows}x{dim}_c{n_centers}_s{seed}"
    if point_seed is not None:
        tag += f"_p{point_seed}"
    if start_id:
        tag += f"_o{start_id}"
    path = os.path.join(out_dir, f"{tag}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, dim)).astype(np.float32)
    if point_seed is not None:
        rng = np.random.default_rng(point_seed)
    tmp = path + ".tmp"
    writer = None
    try:
        for start in range(0, n_rows, chunk):
            m = min(chunk, n_rows - start)
            ids = rng.integers(0, n_centers, size=m)
            pts = centers[ids] + rng.normal(scale=noise, size=(m, dim)).astype(np.float32)
            tbl = pa.table(
                {
                    "vec_id": pa.array(
                        range(start_id + start, start_id + start + m),
                        type=pa.int64(),
                    ),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(pts.reshape(-1), type=pa.float32()), dim
                    ).cast(pa.list_(pa.float32())),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(tmp, tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer is not None:
            writer.close()
    os.rename(tmp, path)
    return path


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    print(generate(n, d))
