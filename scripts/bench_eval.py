"""Benchmark: full-catalog evaluation throughput at Amazon-Baby scale.

The reference's eval harness computes U @ I^T on device, ships every
[2048, n_items] score block to the host, and ranks per user in a forked
``multiprocessing.Pool`` (``MMSSL/utility/batch_test.py:112-169``) — its
biggest bottleneck (SURVEY.md §3.4).  Ours scores, masks train items, top-Ks,
and reduces the metrics entirely on device as ONE scanned program
(``eval/evaluator._eval_all_batches``); the host fetches one packed vector.

Prints one JSON line: evaluated users/second over the full test split
(19,445 users x 7,050 items ranking at Ks=(10, 20, 50)).

Reference-estimate baseline: the host pool ranks ~2-4k users/s on a typical
16-core box (heapq top-50 over 7k items per user, ~0.25-0.5 ms/user/core),
plus the device->host transfer of n_users x n_items floats (548 MB at Baby
scale).  We use 4,000 users/s as the documented estimate.
"""

import json
import os
import sys
import time

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

BASELINE_USERS_PER_SEC = 4000.0


def main() -> None:
    import bench
    from mmssl_tpu.config import EvalConfig
    from mmssl_tpu.eval.evaluator import Evaluator

    ds = bench.get_dataset()
    print(f"bench_eval: {ds.stats_str()}", file=sys.stderr, flush=True)
    cfg = EvalConfig(ks=(10, 20, 50), user_batch_size=2048)
    ev = Evaluator(ds, cfg)

    d = 64
    key = jax.random.key(0)
    u_emb = jax.random.normal(jax.random.fold_in(key, 0), (ds.n_users, d), jnp.float32)
    i_emb = jax.random.normal(jax.random.fold_in(key, 1), (ds.n_items, d), jnp.float32)

    n_users = len(ds.users_of_split("test"))
    t0 = time.time()
    m = ev.evaluate(u_emb, i_emb, "test")  # compile + run
    print(f"bench_eval: warmup (incl. compile) {time.time()-t0:.1f}s "
          f"recall@20={m['recall'][1]:.4f}", file=sys.stderr, flush=True)

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        m = ev.evaluate(u_emb, i_emb, "test")
    dt = (time.time() - t0) / reps
    ups = n_users / dt
    print(f"bench_eval: {n_users} users ranked over {ds.n_items} items in "
          f"{dt*1000:.0f} ms -> {ups:,.0f} users/s", file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "eval_users_per_sec",
        "value": round(ups, 1),
        "unit": "users/s",
        "vs_baseline": round(ups / BASELINE_USERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
