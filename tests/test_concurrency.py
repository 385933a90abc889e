"""Race-safety stress tests for the shared serving state.

The reference's thread safety was by convention (SURVEY.md §5 — fresh client
per thread, main-thread-only mutation); here the index store and batcher are
shared across request threads, so hammer them concurrently.
"""

import threading

import numpy as np

from vision_compression_project_tpu.index import IndexStore
from vision_compression_project_tpu.serve import BatchingQueue


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_index_store_concurrent_add_and_search(tmp_path):
    store = IndexStore(tmp_path / "idx", dim=32)
    rng = np.random.default_rng(0)
    errors = []

    def writer(doc):
        try:
            for i in range(5):
                emb = _unit(rng.standard_normal((4, 32)))
                store.add(
                    emb,
                    [
                        {"doc_id": doc, "page": i * 4 + j + 1, "content": f"{doc}-{i}-{j}"}
                        for j in range(4)
                    ],
                )
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def reader():
        try:
            for _ in range(20):
                q = _unit(rng.standard_normal((1, 32)))
                store.search(q, top_k=3)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(f"doc{i}",)) for i in range(4)]
    threads += [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert store.index.count == 4 * 5 * 4
    # Every doc's rows are all present and filterable.
    for i in range(4):
        q = _unit(rng.standard_normal((1, 32)))
        results = store.search(q, top_k=50, doc_id=f"doc{i}")[0]
        assert len(results) == 20
    # Persisted state reloads consistently.
    store2 = IndexStore(tmp_path / "idx", dim=32)
    assert store2.index.count == 80


def test_batching_queue_many_concurrent_waves():
    def fn(batch):
        return [x + 1 for x in batch]

    bq = BatchingQueue(fn, max_batch=8, max_wait_ms=2)
    results = {}
    lock = threading.Lock()

    def worker(v):
        r = bq.submit(v, timeout=10)
        with lock:
            results[v] = r

    threads = [threading.Thread(target=worker, args=(v,)) for v in range(64)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == {v: v + 1 for v in range(64)}
    bq.close()
