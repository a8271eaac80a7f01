"""Worker process for the two-process distributed test (run via subprocess,
NOT collected by pytest — see test_multiprocess.py).

Each of the 2 OS processes owns 4 virtual CPU devices, joins the shared
jax.distributed cluster over localhost, builds the SAME (4, 2) mesh over all
8 global devices, and drives the real multi-host path end to end:

  1. GlobalBatchLoader: each process samples its half of the global batch;
     the assembled global array must equal the host-side reference
     construction (per-process folded RNG streams).
  2. Three sharded MMSSL train steps on FIXED (seed-derived, identical in
     every process) batches: plain, densification-rebuild, and the
     post-rebuild use_init_static=False program.
  3. One sharded Trainer.evaluate (catalog-sharded top-k + scan).
  4. Checkpoint save (all processes participate), restore into a FRESH
     2-process trainer, one more fixed step — metrics must continue exactly.

Results are dumped as JSON for the driver to cross-check between processes
and against its own single-process 8-device run of the identical programs.
"""

import json
import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    data_root = sys.argv[3]
    out_dir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    from mmssl_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4 and jax.device_count() == 8

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mmssl_tpu.config import preset
    from mmssl_tpu.data import NegativeSampler, load_dataset
    from mmssl_tpu.config import DataConfig
    from mmssl_tpu.parallel.mesh import make_mesh
    from mmssl_tpu.train.trainer import Trainer
    from mmssl_tpu.utils.logging import MetricLogger

    mesh = make_mesh(8, mesh_shape=(4, 2))
    cfg = preset("tiny", "mmssl", **{
        "data.data_path": data_root,
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "train.checkpoint_dir": os.path.join(out_dir, "ckpt"),
        "eval.ks": (3, 5, 10),
    })
    tr = Trainer(cfg, logger=MetricLogger(quiet=True), mesh=mesh)
    ds = tr.ds
    result = {"process_id": proc_id}

    # Replicate any global output so this process can fetch all of it.
    replicate = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))

    # ---- 1. GlobalBatchLoader: global batch == reference construction ----
    users_g, pos_g, neg_g = tr.batch_loader.next()
    got = [np.asarray(replicate(a)) for a in (users_g, pos_g, neg_g)]
    exp = []
    for pid in range(2):
        s = NegativeSampler(ds, batch_size=8, seed=cfg.train.seed)
        exp.append(s.sample(np.random.default_rng((cfg.train.seed, pid))))
    expected = [np.concatenate([exp[0][k], exp[1][k]]) for k in range(3)]
    loader_ok = all(np.array_equal(g, e) for g, e in zip(got, expected))
    result["loader_ok"] = bool(loader_ok)
    result["loader_users"] = got[0].tolist()

    # ---- 2. three fixed-batch sharded train steps ----
    data_sh = NamedSharding(mesh, P("data"))

    def globalize(x: np.ndarray) -> jax.Array:
        half = x.shape[0] // jax.process_count()
        local = x[proc_id * half : (proc_id + 1) * half]
        return jax.make_array_from_process_local_data(data_sh, local, x.shape)

    def fixed_step(trainer, i: int, rebuild: bool):
        u, p, n = trainer.sampler.sample(np.random.default_rng(1000 + i))
        step = trainer._sharded_step_noinit if trainer._densified else trainer._sharded_step
        trainer.state, m = step(
            trainer.state, trainer.consts,
            globalize(u), globalize(p), globalize(n), jnp.asarray(rebuild),
        )
        trainer._densified = trainer._densified or rebuild
        return np.asarray(replicate(m)).tolist()

    result["step_metrics"] = [
        fixed_step(tr, 0, False),
        fixed_step(tr, 1, True),   # densification rebuild on the mesh
        fixed_step(tr, 2, False),  # post-rebuild use_init_static=False program
    ]
    assert tr._densified and not bool(np.asarray(replicate(tr.state.use_init)))

    # Fused-epoch program (lax.scan + on-device sampling) across processes:
    # exercises global_device_put of the sampler consts and the scanned
    # collectives; the on-device PRNG stream is part of the global state, so
    # the chunk metrics must also agree with the single-process run.
    chunk = np.asarray(replicate(tr.train_chunk(3, 2)))
    assert np.isfinite(chunk).all()
    result["chunk_metrics"] = chunk.tolist()

    # ---- 3. sharded evaluation (both reference test modes) ----
    val = tr.evaluate("val")
    result["eval"] = {k: np.asarray(v).reshape(-1).tolist() for k, v in val.items()}
    import dataclasses

    from mmssl_tpu.eval.evaluator import Evaluator

    ev_full = Evaluator(ds, dataclasses.replace(cfg.eval, test_flag="full"), mesh=mesh)
    u_emb, i_emb = tr.eval_embeddings()
    full = ev_full.evaluate(u_emb, i_emb, "val")
    result["eval_full_auc"] = float(np.asarray(full["auc"]))

    # ---- 4. checkpoint across processes: save, restore fresh, continue ----
    tr.save_checkpoint(3, {"epoch": 0, "proc_test": True})
    tr2 = Trainer(cfg, logger=MetricLogger(quiet=True), mesh=mesh)
    extra = tr2.resume()
    assert extra["proc_test"] is True
    assert tr2._densified  # use_init mirror re-derived from restored state
    m_orig = fixed_step(tr, 3, False)
    m_restored = fixed_step(tr2, 3, False)
    np.testing.assert_allclose(m_orig, m_restored, rtol=1e-5, atol=1e-6)
    result["post_resume_metrics"] = m_restored

    # ---- 5. zoo SPMD across processes: LATTICE's build step carries the
    # n_items^2 kNN + learned item graph (global_device_put of item_state /
    # original_adjs across process boundaries), then a carried step and a
    # fused chunk on the same buffers.
    cfg_l = preset("tiny", "lattice", **{
        "data.data_path": data_root,
        "data.batch_size": 16,
        "model.embed_size": 16,
        "eval.ks": (3, 5, 10),
    })
    tl = Trainer(cfg_l, logger=MetricLogger(quiet=True), mesh=mesh)

    def fixed_simple_step(trainer, i: int, build: bool):
        u, p, n = trainer.sampler.sample(np.random.default_rng(2000 + i))
        trainer.state, m = trainer._sharded_simple[build](
            trainer.state, trainer.consts, globalize(u), globalize(p), globalize(n)
        )
        return np.asarray(replicate(m)).tolist()

    result["lattice_metrics"] = [
        fixed_simple_step(tl, 0, True),   # kNN + learned-graph build
        fixed_simple_step(tl, 1, False),  # carried-graph step
    ]
    lat_chunk = np.asarray(replicate(tl.train_chunk(2, 2)))
    assert np.isfinite(lat_chunk).all()
    result["lattice_chunk"] = lat_chunk.tolist()

    # ---- 6. user-facing Trainer.fit() with MMSSL across processes
    # (VERDICT r3 #3): the epoch loop's chunk+tail cadence (spd=20 against a
    # larger n_batch -> one fused chunk THEN per-batch GlobalBatchLoader
    # tail), densification inside the chunk, eval-on-improvement, and
    # checkpoint_every=1 all execute through the public fit() path under 2
    # processes.  Both processes must report identical summaries.
    cfg_f = preset("tiny", "mmssl", **{
        "data.data_path": data_root,
        "data.batch_size": 8,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "train.steps_per_dispatch": 20,
        "train.epochs": 2,
        "train.eval_every": 1,
        "train.checkpoint_every": 1,
        "train.checkpoint_dir": os.path.join(out_dir, "fit_ckpt"),
        "eval.ks": (3, 5, 10),
    })
    trf = Trainer(cfg_f, logger=MetricLogger(quiet=True), mesh=mesh)
    # The geometry must exercise BOTH dispatch paths: a fused chunk and a
    # nonempty per-batch tail driven by GlobalBatchLoader.
    spd_f = trf._effective_spd()
    assert 0 < spd_f <= trf.n_batch and trf.n_batch % spd_f != 0, (trf.n_batch, spd_f)
    resf = trf.fit()
    assert trf._densified
    result["fit"] = {
        "best_val_recall": resf.best_val_recall,
        "best_epoch": resf.best_epoch,
        "epochs_run": resf.epochs_run,
        "test_recall": np.asarray(resf.test_metrics["recall"]).reshape(-1).tolist(),
        "history_loss": [row["loss"] for row in resf.history],
    }
    # fit()'s periodic (portable) checkpoint restores into a fresh 2-process
    # trainer and evaluates identically.
    trf2 = Trainer(cfg_f, logger=MetricLogger(quiet=True), mesh=mesh)
    extra_f = trf2.resume()
    assert extra_f["epoch"] == resf.epochs_run - 1
    assert trf2._densified
    val_f = trf2.evaluate("val")
    result["fit_resumed_val_recall"] = np.asarray(val_f["recall"]).reshape(-1).tolist()

    # ---- 6b. fully-fused fit(): batch size 4 makes the whole epoch ONE
    # on-device-sampled scan, so the batch stream is carried PRNG state and
    # identical at ANY cluster geometry — the driver compares these summaries
    # against its single-process 8-device fit() of the same config.
    cfg_g = preset("tiny", "mmssl", **{
        "data.data_path": data_root,
        "data.batch_size": 4,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "train.densify_period": 2,
        "train.steps_per_dispatch": 64,
        "train.epochs": 2,
        "train.eval_every": 1,
        "eval.ks": (3, 5, 10),
    })
    trg = Trainer(cfg_g, logger=MetricLogger(quiet=True), mesh=mesh)
    assert trg._effective_spd() == trg.n_batch  # whole epoch fuses, zero tail
    resg = trg.fit()
    result["fit_fused"] = {
        "best_val_recall": resg.best_val_recall,
        "test_recall": np.asarray(resg.test_metrics["recall"]).reshape(-1).tolist(),
        "history_loss": [row["loss"] for row in resg.history],
    }

    # ---- 7. restore a checkpoint WRITTEN SINGLE-PROCESS (no mesh) into the
    # 2-process (4,2)-mesh trainer: the geometry-portable format crosses
    # process counts AND mesh geometries (VERDICT r3 #1 done-criterion).
    sp_dir = os.path.join(out_dir, "sp_ckpt")
    if os.path.isdir(sp_dir):
        cfg_sp = preset("tiny", "mmssl", **{
            "data.data_path": data_root,
            "data.batch_size": 16,
            "model.embed_size": 16,
            "train.m_topk_rate": 0.1,
            "train.densify_period": 2,
            "train.checkpoint_dir": sp_dir,
            "eval.ks": (3, 5, 10),
        })
        tsp = Trainer(cfg_sp, logger=MetricLogger(quiet=True), mesh=mesh)
        tsp.resume()
        assert tsp._densified
        result["sp_restore_metrics"] = fixed_step(tsp, 3, False)

    with open(os.path.join(out_dir, f"result_{proc_id}.json"), "w") as f:
        json.dump(result, f)
    print(f"[worker {proc_id}] OK", flush=True)


if __name__ == "__main__":
    main()
