"""Pure-Python pieces of the measurement tools (tools/serial_floor.py):
the interval-union helper IS the instrument behind PERF.md's serial
floor decomposition — pin its merge semantics so a regression can't
silently skew the exec/floor split.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from serial_floor import _merged_window_sec  # noqa: E402


def _job(sub: str, comp: str) -> dict:
    return {"submissionTime": sub, "completionTime": comp}


def _ts(sec: float) -> str:
    # Spark REST format: 2026-08-14T21:00:SS.mmmGMT
    whole = int(sec)
    frac = int(round((sec - whole) * 1000))
    return f"2026-08-14T21:00:{whole:02d}.{frac:03d}GMT"


def test_merged_window_disjoint_sums():
    jobs = [_job(_ts(1), _ts(2)), _job(_ts(5), _ts(7))]
    assert abs(_merged_window_sec(jobs) - 3.0) < 1e-6


def test_merged_window_overlap_not_double_counted():
    # [1,4] and [2,6] overlap: union = 5, naive sum = 7
    jobs = [_job(_ts(1), _ts(4)), _job(_ts(2), _ts(6))]
    assert abs(_merged_window_sec(jobs) - 5.0) < 1e-6


def test_merged_window_contained_interval():
    jobs = [_job(_ts(1), _ts(10)), _job(_ts(3), _ts(4))]
    assert abs(_merged_window_sec(jobs) - 9.0) < 1e-6


def test_merged_window_skips_incomplete_jobs():
    jobs = [_job(_ts(1), _ts(2)), {"submissionTime": _ts(5)}]
    assert abs(_merged_window_sec(jobs) - 1.0) < 1e-6


def test_merged_window_empty():
    assert _merged_window_sec([]) == 0.0


def test_spill_probe_corpus_derivation(tmp_path):
    """tools/spill_probe.py build_corpus: FACTOR perturbed copies with
    shifted ids, per-copy text suffix (copy 0 byte-identical), and a
    first-dim embedding offset — the planted-clique construction the
    §22 memory-pressure numbers depend on."""
    import pyarrow.parquet as pq
    from spill_probe import build_corpus

    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "derived")
    build_corpus(src, out, factor=3)

    docs0 = pq.read_table(f"{src}/documents.parquet").to_pydict()
    docs = pq.read_table(f"{out}/documents.parquet").to_pydict()
    n = len(docs0["doc_id"])
    assert len(docs["doc_id"]) == 3 * n
    # copy 0 byte-identical; copy k id-shifted with suffixed text
    assert docs["doc_id"][:n] == docs0["doc_id"]
    assert docs["text"][:n] == docs0["text"]
    assert docs["doc_id"][n : 2 * n] == [i + 10_000_000 for i in docs0["doc_id"]]
    assert all(
        t is None or t.endswith(" rev1") for t in docs["text"][n : 2 * n]
    )

    emb0 = pq.read_table(f"{src}/embeddings.parquet").to_pydict()
    emb = pq.read_table(f"{out}/embeddings.parquet").to_pydict()
    m = len(emb0["vec_id"])
    assert len(emb["vec_id"]) == 3 * m
    v0, v2 = emb0["embedding"][0], emb["embedding"][2 * m]
    # embeddings are float32 on disk — compare at float32 resolution
    assert abs(v2[0] - (v0[0] + 2e-3)) < 1e-6 and list(v2[1:]) == list(v0[1:])
    # relational tables linked through so query preambles resolve
    assert os.path.exists(f"{out}/lineitem.parquet")
