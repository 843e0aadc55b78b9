"""Deterministic scale-rehearsal corpus generator (documents + embeddings).

The driver's bench tables use a FIXED 31-word vocabulary at every scale
factor, which makes the OUTPUT of any set-similarity self-join grow
quadratically with corpus size — a data property that would mask the
algorithmic scaling we want to measure. This generator instead grows the
vocabulary by Heaps' law (V ~ sqrt(total tokens), the web-text shape) with
a Zipf rank-frequency draw, so pair counts grow the way they do on a real
crawl and the sf0.1 -> sf1 scaling exponent of each operator reflects the
OPERATOR, not the corpus.

Same schema as /root/testdata (documents: doc_id,text,lang,source,n_chars;
embeddings: vec_id,embedding float[64],label), same planted-structure
rates: exact duplicates every 625th row, one-token near-duplicates every
200th row, embedding near-duplicates every 100th row. Seeded PCG64 —
byte-identical across runs and machines for a given n.

Usage: python tools/gen_scale.py OUT_DIR N_DOCS
Writes OUT_DIR/documents.parquet and OUT_DIR/embeddings.parquet
(n_embeddings = 0.4 * n_docs, matching the driver's ratio).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

AVG_TOKENS = 55
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def heaps_vocab(n_docs: int) -> int:
    return max(64, int(8 * np.sqrt(n_docs * AVG_TOKENS)))


def gen_documents(n_docs: int, seed: int = 42) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    vsize = heaps_vocab(n_docs)
    ranks = np.arange(1, vsize + 1, dtype=np.float64)
    p = 1.0 / ranks**1.05
    p /= p.sum()
    lengths = rng.integers(10, 101, size=n_docs)
    total = int(lengths.sum())
    toks = rng.choice(vsize, size=total, p=p)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    words = np.array([f"w{t}" for t in range(vsize)])
    texts: list[str] = []
    for i in range(n_docs):
        seq = toks[offs[i] : offs[i + 1]]
        if i % 625 == 624 and i > 0:
            texts.append(texts[i - 1])  # exact duplicate
            continue
        if i % 200 == 199 and i > 0:
            prev = texts[i - 1].split()
            prev[len(prev) // 2] = f"w{int(seq[0])}"  # one-token near-dup
            texts.append(" ".join(prev))
            continue
        texts.append(" ".join(words[seq]))
    lang_idx = rng.choice(len(LANGS), size=n_docs, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array([LANGS[j] for j in lang_idx]),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_embeddings(n_vecs: int, dim: int = 64, seed: int = 43) -> pa.Table:
    rng = np.random.Generator(np.random.PCG64(seed))
    mat = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    for i in range(99, n_vecs, 100):  # planted near-dups
        mat[i] = mat[i - 1] + rng.standard_normal(dim).astype(np.float32) * 1e-3
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
            "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
            "label": pa.array(
                (np.arange(n_vecs) % 10).astype(np.int32)
            ),
        }
    )


def main() -> None:
    out_dir, n_docs = sys.argv[1], int(sys.argv[2])
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        gen_documents(n_docs), os.path.join(out_dir, "documents.parquet")
    )
    pq.write_table(
        gen_embeddings(int(n_docs * 0.4)),
        os.path.join(out_dir, "embeddings.parquet"),
    )
    print(f"wrote {out_dir}: {n_docs} docs, {int(n_docs * 0.4)} embeddings")


if __name__ == "__main__":
    main()
