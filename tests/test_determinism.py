"""PRNG determinism and parity-toggle behavior (SURVEY.md §5.2 / §8.1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mmssl_tpu.config import ParityConfig, preset
from mmssl_tpu.train.trainer import Trainer
from mmssl_tpu.utils.logging import MetricLogger


def _mk(tiny_dataset, **ov):
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16,
        "model.embed_size": 16,
        "train.m_topk_rate": 0.1,
        "eval.ks": (3, 5),
        **ov,
    })
    return Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))


def test_same_seed_same_trajectory(tiny_dataset):
    """Identical seeds -> bit-identical losses and parameters (no hidden
    host/device nondeterminism)."""
    runs = []
    for _ in range(2):
        tr = _mk(tiny_dataset)
        losses = [float(tr.train_batch(i)[0]) for i in range(4)]
        runs.append((losses, np.asarray(tr.state.params["user_emb"])))
    assert runs[0][0] == runs[1][0]
    np.testing.assert_array_equal(runs[0][1], runs[1][1])


def test_different_seed_differs(tiny_dataset):
    a = _mk(tiny_dataset, **{"train.seed": 1})
    b = _mk(tiny_dataset, **{"train.seed": 2})
    la = float(a.train_batch(0)[0])
    lb = float(b.train_batch(0)[0])
    assert la != lb


def test_parity_quirks_toggle(tiny_dataset):
    """Disabling the quirk ledger ('fixed' mode) changes the math but still
    trains: softmax-on-last-layer off, K != Q attention, real LeakyReLU."""
    fixed = ParityConfig(
        attention_k_equals_q=False,
        discard_attention_rescale=False,
        softmax_last_gcn_layer=False,
        discriminator_identity_leak=False,
    )
    cfg = preset("tiny", "mmssl", **{
        "data.batch_size": 16, "model.embed_size": 16,
        "train.m_topk_rate": 0.1, "eval.ks": (3, 5),
    })
    cfg = dataclasses.replace(cfg, parity=fixed)
    tr = Trainer(cfg, dataset=tiny_dataset, logger=MetricLogger(quiet=True))
    m = tr.train_batch(0)
    assert np.isfinite(float(m[0]))
    # And the quirk actually matters: outputs differ from parity mode.
    tr_parity = _mk(tiny_dataset)
    u_fixed, _ = tr.eval_embeddings()
    u_par, _ = tr_parity.eval_embeddings()
    assert not np.allclose(np.asarray(u_fixed), np.asarray(u_par))
