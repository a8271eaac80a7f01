"""Benchmark: serving/retrieval throughput at Amazon-Baby scale.

Two shapes (serve/engine.py — net-new, the reference has no serving story;
its only inference is the in-training eval pool,
``MMSSL/utility/batch_test.py:112-169``):

  - request path (``recommend``): per-batch dispatch + per-batch [B, k]
    fetch — fetch-bound on a relay-attached chip (~29 ms RTT/batch).
  - fused offline path (``recommend_all``, VERDICT r3 #8): the WHOLE user
    list as one scanned dispatch and ONE packed [N, 2k] fetch — the batch-
    job shape, mirroring the evaluator's fused scan.

Prints one JSON line with both throughputs and the speedup.
"""

import json
import os
import sys
import time

import jax

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
sys.path.insert(0, _ROOT)

import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import bench
    from mmssl_tpu.serve import RecommendEngine

    ds = bench.get_dataset()
    log(f"bench_serve: {ds.stats_str()}")
    d, k = 64, 20
    key = jax.random.key(0)
    u_emb = jax.random.normal(jax.random.fold_in(key, 0), (ds.n_users, d), jnp.float32)
    i_emb = jax.random.normal(jax.random.fold_in(key, 1), (ds.n_items, d), jnp.float32)
    train_pad, _ = ds.padded_split("train")
    eng = RecommendEngine(u_emb, i_emb, train_pad=train_pad, batch_size=2048)
    users = list(range(ds.n_users))

    t0 = time.time()
    ids_a, _ = eng.recommend_all(k=k)
    log(f"bench_serve: fused warmup (incl. compile) {time.time()-t0:.1f}s")
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        ids_a, _ = eng.recommend_all(k=k)
    fused_ups = ds.n_users / ((time.time() - t0) / reps)
    log(f"bench_serve: fused ids+scores {fused_ups:,.0f} users/s")

    # Candidate-generation shape: ids only, narrowest integer fetch.
    t0 = time.time()
    ids_i, _ = eng.recommend_all(k=k, return_scores=False)
    log(f"bench_serve: ids-only warmup (incl. compile) {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(reps):
        ids_i, _ = eng.recommend_all(k=k, return_scores=False)
    ids_ups = ds.n_users / ((time.time() - t0) / reps)
    log(f"bench_serve: fused ids-only {ids_ups:,.0f} users/s")
    assert np.array_equal(ids_a, ids_i), "ids-only path disagrees"

    t0 = time.time()
    ids_r, _ = eng.recommend(users, k=k)
    log(f"bench_serve: request-path warmup (incl. compile) {time.time()-t0:.1f}s")
    t0 = time.time()
    ids_r, _ = eng.recommend(users, k=k)
    req_ups = ds.n_users / (time.time() - t0)
    log(f"bench_serve: request path {req_ups:,.0f} users/s")
    assert np.array_equal(ids_a, ids_r), "fused and request paths disagree"

    print(json.dumps({
        "metric": "serve_users_per_sec",
        "value": round(ids_ups, 1),
        "unit": "users/s",
        "fused_with_scores_users_per_sec": round(fused_ups, 1),
        "request_path_users_per_sec": round(req_ups, 1),
        "fused_speedup": round(ids_ups / req_ups, 2),
        "k": k,
    }))


if __name__ == "__main__":
    main()
