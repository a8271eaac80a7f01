"""Programmatic (non-CLI) use of mmssl_tpu, end to end on synthetic data.

Covers the library API surface a user needs beyond `python -m mmssl_tpu.cli`:
typed config + presets, dataset loading, training with checkpoints, direct
evaluation, and batch retrieval. Runs in ~1 minute on CPU:

    python examples/library_quickstart.py
"""

import os
import sys
import tempfile

# Runnable straight from a checkout (python examples/library_quickstart.py)
# without an editable install: put the repo root on sys.path if needed.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

import jax

# Library runs on whatever jax platform is active; force CPU for the demo.
jax.config.update("jax_platforms", "cpu")

import numpy as np

from mmssl_tpu.config import preset
from mmssl_tpu.data import load_dataset, write_synthetic_dataset
from mmssl_tpu.serve import RecommendEngine
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.logging import MetricLogger


def main() -> None:
    root = tempfile.mkdtemp()
    ckpt = tempfile.mkdtemp()

    # 1. A dataset in the reference's on-disk contract (train/val/test.json +
    #    <modality>_feat.npy). Real datasets load the same way.
    write_synthetic_dataset(root, "demo", n_users=300, n_items=150, seed=0)

    # 2. Typed config: dataset/model presets + dotted-path overrides.
    cfg = preset(
        "demo", "mmssl",
        **{
            "data.data_path": root,
            "data.batch_size": 64,
            "model.embed_size": 32,
            "train.epochs": 8,
            "train.checkpoint_dir": ckpt,
            "train.checkpoint_every": 2,
            "eval.ks": (5, 10, 20),
        },
    )

    # 3. Train with the full protocol (per-epoch val eval, model selection on
    #    val Recall@Ks[1], early stopping, checkpoints).
    ds = load_dataset(cfg.data)
    trainer = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True))
    result = trainer.fit()
    print(f"best val recall@10 = {result.best_val_recall:.4f} "
          f"(epoch {result.best_epoch}, {result.epochs_run} epochs run)")
    print("test recall:", np.round(result.test_metrics["recall"], 4))

    # 4. Resume from the checkpoint in a fresh trainer (crash recovery).
    trainer2 = Trainer(cfg, dataset=ds, logger=MetricLogger(quiet=True))
    extra = trainer2.resume()
    print("resumed at epoch", extra.get("epoch"))

    # 5. Evaluate directly.
    metrics = trainer2.evaluate("test")
    print("resumed test recall:", np.round(metrics["recall"], 4))

    # 6. Serve: batched top-k retrieval over materialized embeddings.
    engine = RecommendEngine.from_trainer(trainer2, batch_size=64)
    ids, scores = engine.recommend([0, 1, 2], k=5)
    for u, (row, sc) in enumerate(zip(ids, scores)):
        print(f"user {u}: items {row.tolist()} scores {np.round(sc, 3).tolist()}")


if __name__ == "__main__":
    main()
