#!/usr/bin/env python3
"""Vector-index scale measurement (VERDICT r2 item 9).

Ingests --n synthetic page embeddings in --batch chunks and reports, as one
JSON line: add() wall-time percentiles (first/p50/max — amortized doubling
means the max is a reallocation event, the p50 is the steady state), search
p50/p95 at checkpoints of growing corpus size (so p50-vs-size is visible),
and sharded-search p50 with the rebuild counter (proving the residency is
maintained incrementally, not re-uploaded per add).

Run on an otherwise-idle machine; on TPU the index rows live in HBM.
"""

import argparse
import json
import time

import _bootstrap  # noqa: F401
import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--batch", type=int, default=4096)
    parser.add_argument("--queries", type=int, default=32)
    parser.add_argument("--topk", type=int, default=8)
    args = parser.parse_args()

    import jax

    from vision_compression_project_tpu.index.vector_index import VectorIndex
    from vision_compression_project_tpu.parallel import local_mesh

    rng = np.random.default_rng(0)

    def unit_rows(n):
        rows = rng.standard_normal((n, args.dim)).astype(np.float32)
        return rows / np.linalg.norm(rows, axis=1, keepdims=True)

    queries = unit_rows(args.queries)

    def search_ms(fn, reps=5):
        fn()  # warm / compile
        times = []
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            times.append((time.perf_counter() - t) * 1e3)
        return float(np.percentile(times, 50)), float(np.percentile(times, 95))

    index = VectorIndex(dim=args.dim, capacity=args.batch)
    add_times = []
    checkpoints = {}
    marks = sorted({args.n // 10, args.n // 2, args.n})
    added, doc_i = 0, 0
    t_total = time.perf_counter()
    while added < args.n:
        n = min(args.batch, args.n - added)
        rows = unit_rows(n)
        t = time.perf_counter()
        index.add(rows, [{"doc_id": f"doc{doc_i}", "page": i} for i in range(n)])
        jax.block_until_ready(index._rows)
        add_times.append((time.perf_counter() - t) * 1e3)
        added += n
        doc_i += 1
        if any(m <= added < m + args.batch for m in marks):
            p50, p95 = search_ms(
                lambda: np.asarray(
                    index.search(queries, top_k=args.topk)[0][0]["score"]
                )
            )
            checkpoints[added] = {"search_p50_ms": p50, "search_p95_ms": p95}
    ingest_s = time.perf_counter() - t_total

    mesh = local_mesh()  # honors VCP_MESH_*
    sh_p50, sh_p95 = search_ms(
        lambda: index.search_sharded(mesh, queries, top_k=args.topk)
    )
    rebuilds_before = index.shard_rebuilds
    probe = unit_rows(4)
    ids = index.add(probe, [{"doc_id": "probe", "page": i} for i in range(4)])
    t = time.perf_counter()
    hits = index.search_sharded(mesh, probe[:1], top_k=1)
    post_add_ms = (time.perf_counter() - t) * 1e3
    assert hits[0][0]["id"] == ids[0]
    assert index.shard_rebuilds == rebuilds_before, "add forced a full rebuild"

    print(json.dumps({
        "n_rows": args.n, "dim": args.dim, "batch": args.batch,
        "platform": jax.devices()[0].platform,
        "n_devices": len(jax.devices()),
        "ingest_total_s": round(ingest_s, 2),
        "ingest_rows_per_s": round(args.n / ingest_s),
        "add_ms_first": round(add_times[0], 2),
        "add_ms_p50": round(float(np.percentile(add_times, 50)), 2),
        "add_ms_max": round(max(add_times), 2),
        "search_p50_by_size": checkpoints,
        "sharded_search_p50_ms": round(sh_p50, 2),
        "sharded_search_p95_ms": round(sh_p95, 2),
        "sharded_search_after_add_ms": round(post_add_ms, 2),
        "shard_rebuilds": index.shard_rebuilds,
    }))


if __name__ == "__main__":
    main()
