"""Boundary semantics of train_doc_chunking (round 6): overlapping
context windows [96k, 96k+128) over whitespace tokens, map-side only."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from datafusion_ballista_spark.inventory.pipeline_train import train_doc_chunking


@pytest.fixture(scope="module")
def chunk_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunk_docs")
    docs = [
        (0, ""),  # empty text -> split yields [''] -> one 1-token chunk
        (1, " ".join(f"t{i}" for i in range(96))),  # exactly one stride
        (2, " ".join(f"t{i}" for i in range(97))),  # one token past it
        (3, " ".join(f"t{i}" for i in range(300))),  # 4 windows
        (4, "solo"),
    ]
    pd.DataFrame(
        [(i, t, "xx", "synthetic", len(t)) for i, t in docs],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


def test_chunk_boundaries(spark, chunk_sf):
    rows = train_doc_chunking(spark, chunk_sf).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: '' splits to [''], n=1 -> single chunk of 1 token
    assert [(r["chunk_idx"], r["n_chunk_tok"]) for r in by_doc[0]] == [(0, 1)]
    # doc 1: 96 tokens -> starts {0}; start 96 would be == n, excluded
    assert [(r["tok_start"], r["n_chunk_tok"]) for r in by_doc[1]] == [(0, 96)]
    # doc 2: 97 tokens -> second window starts at 96 with 1 token
    assert [(r["tok_start"], r["n_chunk_tok"]) for r in by_doc[2]] == [
        (0, 97),
        (96, 1),
    ]
    # doc 3: 300 tokens -> starts 0/96/192/288; middle windows are full
    assert [(r["tok_start"], r["n_chunk_tok"]) for r in by_doc[3]] == [
        (0, 128), (96, 128), (192, 108), (288, 12),
    ]
    # every token index is covered by at least one window
    covered = set()
    for r in by_doc[3]:
        covered.update(range(r["tok_start"], r["tok_start"] + r["n_chunk_tok"]))
    assert covered == set(range(300))
    # fingerprints of identical windows are equal across docs: docs 1 and
    # 2 share the first 96 tokens, but doc 2's first window has 97 ->
    # different hash; its second window ('t96') matches nothing else
    h1 = by_doc[1][0]["chunk_h48"]
    assert h1 != by_doc[2][0]["chunk_h48"]
