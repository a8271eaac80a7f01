"""Measure the reference MMSSL trainer's seed-to-seed trajectory spread.

Sizes the trajectory-parity bands of tests/test_training_parity.py from
MEASUREMENT instead of guesses (VERDICT r2 Weak #1): runs the live reference
Trainer (/root/reference/MMSSL/main.py) at several seeds on the shared
synthetic dataset, reconstructs the per-epoch discriminator loss (the
reference accumulates it only into a local list, main.py:315,361 — here it is
rebuilt from wrapped D.forward / gradient_penalty calls:
loss_D = mean predf - mean predr + gp_rate * gp, main.py:346-357), and prints
per-epoch relative spreads for every compared quantity.

Usage: python scripts/measure_parity_spread.py [epochs] [seed ...]
"""

import os
import sys
import tempfile

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

import test_training_parity as tp
from mmssl_tpu.data.synthetic import write_synthetic_dataset

_FLOAT = tp._FLOAT


def run_reference(root: str, seed: int, epochs: int):
    argv = [
        "--debug", "--data_path", root + "/", "--dataset", "tiny",
        "--batch_size", str(tp.BATCH), "--embed_size", str(tp.EMBED),
        "--head_num", "2", "--drop_rate", "0", "--G_drop1", "0", "--G_drop2", "0",
        "--epoch", str(epochs), "--Ks", tp.KS, "--m_topk_rate", "0.1", "--T", "2",
        "--verbose", "1",
    ]
    with tp._ref_env("MMSSL", argv) as main_mod:
        main_mod.set_seed(seed)
        trainer = main_mod.Trainer(data_config={})
        d_means, gps = tp.attach_d_loss_capture(trainer)
        import sys as _s

        n_train = _s.modules["utility.batch_test"].data_generator.n_train
        n_batch = n_train // tp.BATCH + 1
        lines = []
        orig = trainer.logger.logging
        trainer.logger.logging = lambda s: (lines.append(str(s)), orig(s))[1]
        trainer.train()
        gp_rate = main_mod.args.gp_rate
    rows = tp._parse_epochs(lines, (
        rf"Epoch (\d+) \[[^\]]*\]: train==\[{_FLOAT}={_FLOAT} \+ {_FLOAT} \+ {_FLOAT}\],"
        rf" recall=\[{_FLOAT}, {_FLOAT}, {_FLOAT}, {_FLOAT}\]"
    ))
    d_epochs = tp.d_loss_per_epoch(d_means, gps, gp_rate, n_batch, epochs)
    return {
        "loss": [r[1] for r in rows],
        "mf": [r[2] for r in rows],
        "emb": [r[3] for r in rows],
        "recall20": [r[6] for r in rows],
        "loss_d": d_epochs,
    }


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    seeds = [int(s) for s in sys.argv[2:]] or [2022, 123, 7]
    root = tempfile.mkdtemp(prefix="parity_spread_")
    write_synthetic_dataset(root, "tiny", n_users=tp.N_USERS, n_items=tp.N_ITEMS,
                            interactions_per_user=(4, 9), seed=1)
    runs = {}
    for seed in seeds:
        runs[seed] = run_reference(root, seed, epochs)
        print(f"seed {seed}: " + " | ".join(
            f"{k}=" + ",".join(f"{v:.4f}" for v in vals) for k, vals in runs[seed].items()
        ))

    base = runs[seeds[0]]
    print("\nmax per-epoch relative deviation vs seed", seeds[0], "(and mean-of-epochs dev):")
    for key in base:
        per_epoch, mean_dev = 0.0, 0.0
        for seed in seeds[1:]:
            a, b = np.asarray(runs[seed][key], float), np.asarray(base[key], float)
            per_epoch = max(per_epoch, float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-8))))
            mean_dev = max(mean_dev, abs(a.mean() - b.mean()) / max(abs(b.mean()), 1e-8))
        print(f"  {key:8s}: per-epoch {per_epoch:.4f}   mean {mean_dev:.4f}")


if __name__ == "__main__":
    main()
