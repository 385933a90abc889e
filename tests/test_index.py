import numpy as np

from vision_compression_project_tpu.index import IndexStore, VectorIndex


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _make_index(n=32, dim=64, docs=("a", "b"), seed=0):
    rng = np.random.default_rng(seed)
    emb = _unit(rng.standard_normal((n, dim)))
    index = VectorIndex(dim=dim, capacity=8)  # force capacity growth
    records = [
        {"doc_id": docs[i % len(docs)], "page": i + 1, "content": f"page {i+1} text"}
        for i in range(n)
    ]
    ids = index.add(emb, records)
    return index, emb, ids


def test_add_search_exact_match():
    index, emb, ids = _make_index()
    results = index.search(emb[5], top_k=3)[0]
    assert results[0]["id"] == ids[5]
    assert results[0]["score"] > 0.999
    assert results[0]["metadata"]["page"] == 6
    assert results[0]["content"] == "page 6 text"


def test_doc_id_filter():
    index, emb, ids = _make_index()
    results = index.search(emb[0], top_k=32, doc_id="b")[0]
    assert results, "doc b should have results"
    for r in results:
        assert r["metadata"]["doc_id"] == "b"
    # doc "a" row 0 must not appear even though it's the best overall match
    assert all(r["id"] != ids[0] for r in results)


def test_topk_larger_than_doc():
    index, emb, _ = _make_index(n=6, docs=("solo",))
    results = index.search(emb[0], top_k=50, doc_id="solo")[0]
    assert len(results) == 6


def test_unknown_doc_returns_empty():
    index, emb, _ = _make_index()
    assert index.search(emb[0], top_k=5, doc_id="missing")[0] == []


def test_save_load_roundtrip(tmp_path):
    index, emb, ids = _make_index()
    index.save(tmp_path / "idx")
    loaded = VectorIndex.load(tmp_path / "idx")
    assert loaded.count == index.count
    results = loaded.search(emb[7], top_k=1)[0]
    assert results[0]["id"] == ids[7]


def test_search_sharded_matches_replicated(mesh_dp):
    index, emb, ids = _make_index(n=64)
    want = index.search(emb[3], top_k=5, doc_id="a")[0]
    got = index.search_sharded(mesh_dp, emb[3], top_k=5, doc_id="a")[0]
    assert [r["id"] for r in got] == [r["id"] for r in want]


def test_search_sharded_multiquery_and_incremental_add(mesh_dp):
    """Sharded search is multi-query and stays correct across adds (the
    sharded residency + incremental mask caches must invalidate/update)."""
    index, emb, ids = _make_index(n=32)
    # Warm both cache layers.
    index.search(emb[0], top_k=3)
    index.search_sharded(mesh_dp, emb[:4], top_k=3, doc_id="a")
    # Grow the index past capacity-padding boundaries.
    rng = np.random.default_rng(9)
    extra = _unit(rng.standard_normal((40, emb.shape[1])))
    new_ids = index.add(
        extra,
        [{"doc_id": "a" if i % 2 else "znew", "page": 100 + i, "content": f"x{i}"}
         for i in range(40)],
    )
    for qi in range(3):
        want = index.search(extra[qi], top_k=5, doc_id="a")[0]
        got = index.search_sharded(mesh_dp, extra[qi], top_k=5, doc_id="a")[0]
        assert [r["id"] for r in got] == [r["id"] for r in want]
    # New doc is findable through both paths.
    want = index.search(extra[0], top_k=4, doc_id="znew")[0]
    got = index.search_sharded(mesh_dp, extra[0], top_k=4, doc_id="znew")[0]
    assert want and [r["id"] for r in got] == [r["id"] for r in want]


def test_index_store_routes_sharded(tmp_path, mesh_dp):
    """A store with a data>1 mesh attached serves retrieval through the
    sharded path (VERDICT r1 item 9: built != integrated)."""
    from unittest import mock

    rng = np.random.default_rng(4)
    emb = _unit(rng.standard_normal((12, 32)))
    store = IndexStore(tmp_path / "store", dim=32, mesh=mesh_dp)
    store.add(
        emb, [{"doc_id": "d", "page": i, "content": str(i)} for i in range(12)]
    )
    with mock.patch.object(
        store.index, "search_sharded", wraps=store.index.search_sharded
    ) as spy:
        res = store.search(emb[5], top_k=3, doc_id="d")[0]
    assert spy.called, "store.search did not route through search_sharded"
    assert res[0]["metadata"]["page"] == 5


def test_index_store_autosave(tmp_path):
    rng = np.random.default_rng(1)
    emb = _unit(rng.standard_normal((4, 32)))
    store = IndexStore(tmp_path / "store", dim=32)
    store.add(emb, [{"doc_id": "d", "page": i, "content": str(i)} for i in range(4)])
    store2 = IndexStore(tmp_path / "store", dim=32)
    assert store2.index.count == 4
    res = store2.search(emb[2], top_k=1, doc_id="d")[0]
    assert res[0]["metadata"]["page"] == 2
