"""Numerical parity vs the ACTUAL reference implementation.

Imports the read-only reference PyTorch models (mounted at /root/reference),
copies their randomly-initialized weights into our JAX models, runs both
forwards on identical inputs, and compares outputs.  This pins the quirk
ledger (SURVEY.md §8.1) against ground truth rather than against our reading
of the code.

Torch is CPU-only here; the reference's .cuda() calls are monkeypatched to
no-ops, and module-level ``parse_args()`` is satisfied with an empty argv.
"""

import os
import sys

import numpy as np
import pytest
import scipy.sparse as sp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mmssl_tpu.config import ModelConfig, ParityConfig
from mmssl_tpu.models.mmssl import (
    BipartiteGraphs,
    apply_discriminator,
    apply_mmssl,
    init_discriminator,
    init_mmssl,
)
from mmssl_tpu.ops.sparse import SparseGraph, csr_norm


@pytest.fixture(scope="module")
def ref_models():
    """Import /root/reference/MMSSL/Models.py with patched argv and .cuda."""
    # .cuda() no-ops (CPU-only torch).
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    argv = sys.argv
    sys.argv = ["parity_test"]
    saved = {k: sys.modules.get(k) for k in ("Models", "utility", "utility.parser", "utility.norm")}
    sys.path.insert(0, os.path.join(REF, "MMSSL"))
    try:
        import Models as ref_models_mod  # noqa
    finally:
        sys.argv = argv
    return ref_models_mod


N_USERS, N_ITEMS, D = 24, 16, 8
FEAT_DIMS = {"image": 12, "text": 6}


def _setup_graphs(rng):
    R = sp.csr_matrix((rng.random((N_USERS, N_ITEMS)) < 0.3).astype(np.float32))
    ui_norm = csr_norm(R, mean_flag=True)
    iu_norm = csr_norm(R.T, mean_flag=True)

    def to_torch(m):
        coo = sp.coo_matrix(m)
        ix = torch.from_numpy(np.vstack([coo.row, coo.col]).astype(np.int64))
        return torch.sparse_coo_tensor(ix, torch.from_numpy(coo.data), coo.shape).float()

    ui_t, iu_t = to_torch(ui_norm), to_torch(iu_norm)
    ui_j = SparseGraph.from_scipy(ui_norm)
    iu_j = SparseGraph.from_scipy(iu_norm)
    return ui_t, iu_t, ui_j, iu_j


def test_mmssl_forward_parity(ref_models):
    rng = np.random.default_rng(0)
    feats = {m: rng.normal(size=(N_ITEMS, d)).astype(np.float32) for m, d in FEAT_DIMS.items()}

    # Reference args for tiny shapes.
    a = ref_models.args
    a.embed_size = D
    a.head_num = 2
    a.layers = 1
    a.drop_rate = 0.0  # dropout off for determinism (eval-mode comparison)
    ref = ref_models.MMSSL(
        N_USERS, N_ITEMS, D, [D, D], [0.1, 0.1], feats["image"], feats["text"]
    )
    ref.eval()

    ui_t, iu_t, ui_j, iu_j = _setup_graphs(rng)
    with torch.no_grad():
        ref_out = ref(ui_t, iu_t, ui_t, iu_t, ui_t, iu_t)
    (ru, ri, r_img_item, r_txt_item, r_img_user, r_txt_user,
     _, _, r_img_uid, r_txt_uid, r_img_iid, r_txt_iid) = [t.detach().numpy() for t in ref_out]

    # Copy reference weights into our param tree ([out,in] -> [in,out]).
    params = init_mmssl(jax.random.key(0), N_USERS, N_ITEMS, FEAT_DIMS, ModelConfig(embed_size=D, head_num=2))
    params["user_emb"] = jnp.asarray(ref.user_id_embedding.weight.detach().numpy())
    params["item_emb"] = jnp.asarray(ref.item_id_embedding.weight.detach().numpy())
    params["w_q"] = jnp.asarray(ref.weight_dict["w_q"].detach().numpy())
    params["w_k"] = jnp.asarray(ref.weight_dict["w_k"].detach().numpy())
    params["w_cat"] = jnp.asarray(ref.weight_dict["w_self_attention_cat"].detach().numpy())
    params["proj"]["image"] = {
        "w": jnp.asarray(ref.image_trans.weight.detach().numpy().T),
        "b": jnp.asarray(ref.image_trans.bias.detach().numpy()),
    }
    params["proj"]["text"] = {
        "w": jnp.asarray(ref.text_trans.weight.detach().numpy().T),
        "b": jnp.asarray(ref.text_trans.bias.detach().numpy()),
    }

    cfg = ModelConfig(embed_size=D, head_num=2, drop_rate=0.0,
                      model_cat_rate=a.model_cat_rate, id_cat_rate=a.id_cat_rate)
    graphs = BipartiteGraphs(ui=ui_j, iu=iu_j,
                             mod_ui={m: ui_j for m in feats}, mod_iu={m: iu_j for m in feats})
    out = apply_mmssl(params, graphs, {m: jnp.asarray(f) for m, f in feats.items()},
                      cfg, ParityConfig(), train=False)

    np.testing.assert_allclose(np.asarray(out.user_emb), ru, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.item_emb), ri, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.mm_item_feats["image"]), r_img_item, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.mm_user_feats["text"]), r_txt_user, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.mm_user_id["image"]), r_img_uid, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.mm_item_id["text"]), r_txt_iid, rtol=2e-4, atol=2e-5)


def test_discriminator_parity(ref_models):
    a = ref_models.args
    a.G_drop1 = 0.0  # dropout off; train-mode batchnorm compares batch stats
    a.G_drop2 = 0.0
    n = 32
    ref_d = ref_models.Discriminator(n)
    ref_d.train()

    params = init_discriminator(jax.random.key(1), n, ModelConfig())
    # Copy torch weights ([out,in] -> [in,out]); BN gamma/beta defaults match.
    layers = [m for m in ref_d.net if isinstance(m, torch.nn.Linear)]
    for key, lin in zip(("l1", "l2", "l3"), layers):
        params[key] = {
            "w": jnp.asarray(lin.weight.detach().numpy().T),
            "b": jnp.asarray(lin.bias.detach().numpy()),
        }
    rng = np.random.default_rng(3)
    x = rng.normal(size=(16, n)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_d(torch.from_numpy(x)).numpy()
    cfg = ModelConfig(g_drop1=0.0, g_drop2=0.0)
    got = np.asarray(apply_discriminator(params, jnp.asarray(x), cfg, ParityConfig(), train=True))
    np.testing.assert_allclose(got, ref_out, rtol=2e-4, atol=2e-4)


def _import_ref_codebase(subdir: str):
    """Import a reference codebase's Models module in isolation (each of
    MMSSL/LATTICE/MICRO has its own ``utility`` package and ``Models``)."""
    import importlib

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    argv = sys.argv
    sys.argv = ["parity_test"]
    purge = [k for k in sys.modules if k == "Models" or k == "utility" or k.startswith("utility.")]
    saved = {k: sys.modules.pop(k) for k in purge}
    path = os.path.join(REF, subdir)
    sys.path.insert(0, path)
    try:
        mod = importlib.import_module("Models")
        mod = importlib.reload(mod) if getattr(mod, "__file__", "").startswith(path) is False else mod
    finally:
        sys.argv = argv
        sys.path.remove(path)
    # leave the fresh modules out of the cache for the next isolation round
    for k in [k for k in sys.modules if k == "Models" or k == "utility" or k.startswith("utility.")]:
        sys.modules.pop(k)
    sys.modules.update(saved)
    return mod


def test_lattice_forward_parity():
    ref_mod = _import_ref_codebase("LATTICE/codes")
    a = ref_mod.args
    rng = np.random.default_rng(7)
    feats = {m: rng.normal(size=(N_ITEMS, d)).astype(np.float32) for m, d in FEAT_DIMS.items()}
    import tempfile

    a.data_path = tempfile.mkdtemp() + "/"
    a.topk = 3
    a.lambda_coeff = 0.9
    a.cf_model = "lightgcn"
    a.n_layers = 1
    a.feat_embed_dim = D
    ref = ref_mod.LATTICE(N_USERS, N_ITEMS, D, [D, D], [0.1, 0.1], feats["image"], feats["text"])
    ref.eval()

    # Joint normalized adjacency (D^-1 (A+I)).
    from mmssl_tpu.ops.sparse import joint_adj

    R = sp.csr_matrix((rng.random((N_USERS, N_ITEMS)) < 0.3).astype(np.float32))
    _, norm_adj, _ = joint_adj(R, N_USERS, N_ITEMS)
    coo = sp.coo_matrix(norm_adj)
    ix = torch.from_numpy(np.vstack([coo.row, coo.col]).astype(np.int64))
    adj_t = torch.sparse_coo_tensor(ix, torch.from_numpy(coo.data), coo.shape).float()
    with torch.no_grad():
        ru, ri = ref(adj_t, build_item_graph=True)
    ru, ri = ru.detach().numpy(), ri.detach().numpy()

    # Ours with copied weights.
    from mmssl_tpu.models.lattice import apply_lattice, build_original_adjs, init_lattice

    cfg = ModelConfig(embed_size=D, knn_topk=3, lambda_coeff=0.9, cf_model="lightgcn",
                      n_item_layers=1, n_ui_layers=2)
    params = init_lattice(jax.random.key(2), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    params["user_emb"] = jnp.asarray(ref.user_embedding.weight.detach().numpy())
    params["item_emb"] = jnp.asarray(ref.item_id_embedding.weight.detach().numpy())
    params["modal_weight"] = jnp.asarray(ref.modal_weight.detach().numpy())
    for m, lin in (("image", ref.image_trs), ("text", ref.text_trs)):
        params["trs"][m] = {
            "w": jnp.asarray(lin.weight.detach().numpy().T),
            "b": jnp.asarray(lin.bias.detach().numpy()),
        }
    jfeats = {m: jnp.asarray(f) for m, f in feats.items()}
    orig = build_original_adjs(jfeats, 3)
    joint = SparseGraph.from_scipy(norm_adj)
    out = apply_lattice(params, joint, jfeats, orig, jnp.zeros((N_ITEMS, N_ITEMS)),
                        cfg, ParityConfig(), build_item_graph=True, train=False)
    np.testing.assert_allclose(np.asarray(out.user_emb), ru, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.item_emb), ri, rtol=2e-4, atol=2e-5)


def test_micro_forward_parity():
    ref_mod = _import_ref_codebase("MICRO/codes")
    a = ref_mod.args
    rng = np.random.default_rng(8)
    feats = {m: rng.normal(size=(N_ITEMS, d)).astype(np.float32) for m, d in FEAT_DIMS.items()}
    a.topk = 3
    a.lambda_coeff = 0.9
    a.cf_model = "lightgcn"
    a.layers = 1
    a.sparse = 0  # dense path (torch_scatter is absent in this image)
    a.norm_type = "sym"
    a.embed_size = D
    ref = ref_mod.MICRO(N_USERS, N_ITEMS, D, [D, D], [0.1, 0.1], feats["image"], feats["text"])
    ref.eval()

    from mmssl_tpu.ops.sparse import joint_adj

    R = sp.csr_matrix((rng.random((N_USERS, N_ITEMS)) < 0.3).astype(np.float32))
    _, norm_adj, _ = joint_adj(R, N_USERS, N_ITEMS)
    coo = sp.coo_matrix(norm_adj)
    ix = torch.from_numpy(np.vstack([coo.row, coo.col]).astype(np.int64))
    adj_t = torch.sparse_coo_tensor(ix, torch.from_numpy(coo.data), coo.shape).float()
    with torch.no_grad():
        ru, ri, r_img, r_txt, r_fused = ref(adj_t, build_item_graph=True)

    from mmssl_tpu.models.micro import apply_micro, build_original_adjs_dense, init_micro

    cfg = ModelConfig(embed_size=D, knn_topk=3, lambda_coeff=0.9, cf_model="lightgcn",
                      n_item_layers=1, n_ui_layers=2, norm_type="sym")
    params = init_micro(jax.random.key(3), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    params["user_emb"] = jnp.asarray(ref.user_embedding.weight.detach().numpy())
    params["item_emb"] = jnp.asarray(ref.item_id_embedding.weight.detach().numpy())
    for m, lin in (("image", ref.image_trs), ("text", ref.text_trs)):
        params["trs"][m] = {
            "w": jnp.asarray(lin.weight.detach().numpy().T),
            "b": jnp.asarray(lin.bias.detach().numpy()),
        }
    q1, q2 = ref.query[0], ref.query[2]
    params["query1"] = {
        "w": jnp.asarray(q1.weight.detach().numpy().T),
        "b": jnp.asarray(q1.bias.detach().numpy()),
    }
    params["query2_w"] = jnp.asarray(q2.weight.detach().numpy().T)
    jfeats = {m: jnp.asarray(f) for m, f in feats.items()}
    orig = build_original_adjs_dense(jfeats, 3, "sym")
    joint = SparseGraph.from_scipy(norm_adj)
    out = apply_micro(params, joint, jfeats, orig, orig, cfg, ParityConfig(),
                      build_item_graph=True, sparse=False, train=False)
    np.testing.assert_allclose(np.asarray(out.user_emb), ru.detach().numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.item_emb), ri.detach().numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.fusion), r_fused.detach().numpy(), rtol=2e-4, atol=2e-5)


def test_infonce_parity(ref_models):
    # Models.py batched_contrastive_loss: tau=0.5, eps=0 variant.
    from mmssl_tpu.losses.contrastive import infonce

    rng = np.random.default_rng(4)
    z1 = rng.normal(size=(20, D)).astype(np.float32)
    z2 = rng.normal(size=(20, D)).astype(np.float32)
    a = ref_models.args
    a.embed_size = D
    a.head_num = 2
    a.drop_rate = 0.0
    feats = {m: rng.normal(size=(N_ITEMS, d)).astype(np.float32) for m, d in FEAT_DIMS.items()}
    ref = ref_models.MMSSL(N_USERS, N_ITEMS, D, [D, D], [0.1, 0.1], feats["image"], feats["text"])
    with torch.no_grad():
        ref_loss = float(ref.batched_contrastive_loss(torch.from_numpy(z1), torch.from_numpy(z2), batch_size=7))
    got = float(infonce(jnp.asarray(z1), jnp.asarray(z2), tau=0.5, eps=0.0, row_chunk=7))
    assert got == pytest.approx(ref_loss, rel=1e-5)
