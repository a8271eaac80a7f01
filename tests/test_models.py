"""Model zoo: shape/grad sanity + structural invariants of the quirky math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from mmssl_tpu.config import ModelConfig, ParityConfig
from mmssl_tpu.models import (
    BipartiteGraphs,
    apply_discriminator,
    apply_lattice,
    apply_lightgcn,
    apply_mf,
    apply_micro,
    apply_mmssl,
    apply_ngcf,
    init_discriminator,
    init_lattice,
    init_lightgcn,
    init_mf,
    init_micro,
    init_mmssl,
    init_ngcf,
)
from mmssl_tpu.models.lattice import build_original_adjs
from mmssl_tpu.models.micro import build_original_adjs_dense, build_original_adjs_sparse
from mmssl_tpu.models.mmssl import modality_attention
from mmssl_tpu.ops.sparse import SparseGraph, csr_norm, joint_adj

N_USERS, N_ITEMS, D = 20, 12, 8
FEAT_DIMS = {"image": 16, "text": 10}


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    R = sp.csr_matrix((rng.random((N_USERS, N_ITEMS)) < 0.3).astype(np.float32))
    ui = SparseGraph.from_scipy(csr_norm(R, mean_flag=True))
    iu = SparseGraph.from_scipy(csr_norm(R.T, mean_flag=True))
    _, norm_adj, _ = joint_adj(R, N_USERS, N_ITEMS)
    joint = SparseGraph.from_scipy(norm_adj)
    feats = {
        m: jnp.asarray(rng.normal(size=(N_ITEMS, dim)).astype(np.float32))
        for m, dim in FEAT_DIMS.items()
    }
    cfg = ModelConfig(embed_size=D, n_ui_layers=2, head_num=2, knn_topk=3)
    return R, ui, iu, joint, feats, cfg


def test_mf_lightgcn_ngcf_shapes(setup):
    _, _, _, joint, _, cfg = setup
    key = jax.random.key(0)
    out = apply_mf(init_mf(key, N_USERS, N_ITEMS, cfg))
    assert out.user_emb.shape == (N_USERS, D) and out.item_emb.shape == (N_ITEMS, D)
    out = apply_lightgcn(init_lightgcn(key, N_USERS, N_ITEMS, cfg), joint, cfg)
    assert out.user_emb.shape == (N_USERS, D)
    out = apply_ngcf(init_ngcf(key, N_USERS, N_ITEMS, cfg), joint, cfg)
    assert out.user_emb.shape == (N_USERS, D * (cfg.n_ui_layers + 1))  # concat variant


def test_lightgcn_matches_dense_math(setup):
    R, _, _, joint, _, cfg = setup
    params = init_lightgcn(jax.random.key(1), N_USERS, N_ITEMS, cfg)
    out = apply_lightgcn(params, joint, cfg)
    # Dense re-computation: ego stack mean of joint-adj powers.
    _, norm_adj, _ = joint_adj(R, N_USERS, N_ITEMS)
    A = np.asarray(norm_adj.todense())
    ego = np.concatenate([np.asarray(params["user_emb"]), np.asarray(params["item_emb"])])
    stack = [ego]
    h = ego
    for _ in range(cfg.n_ui_layers):
        h = A @ h
        stack.append(h)
    mean = np.mean(stack, axis=0)
    np.testing.assert_allclose(np.asarray(out.user_emb), mean[:N_USERS], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.item_emb), mean[N_USERS:], rtol=1e-4, atol=1e-5)


def test_attention_collapse_invariant(setup):
    # Because softmax over the source-modality axis multiplies a V broadcast
    # over that axis, the faithful attention must equal concat_h(V) @ w_cat
    # regardless of w_q (SURVEY.md Q1/Q2 discussion).
    *_, cfg = setup
    params = init_mmssl(jax.random.key(2), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    rng = np.random.default_rng(3)
    stack = jnp.asarray(rng.normal(size=(2, 5, D)).astype(np.float32))
    parity = ParityConfig()
    out = modality_attention(params, stack, cfg.head_num, parity, 0.55)
    w_cat = np.asarray(params["w_cat"])  # [H*D, D]
    w_eff = sum(w_cat[h * D : (h + 1) * D] for h in range(cfg.head_num))
    want = np.asarray(stack) @ w_eff
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
    # And changing w_q must not change the output under parity.
    params2 = dict(params, w_q=params["w_q"] * 3.0)
    out2 = modality_attention(params2, stack, cfg.head_num, parity, 0.55)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-5, atol=1e-6)


def test_attention_algebraic_matches_faithful(setup):
    """impl='algebraic' (the default) equals the faithful reference formula
    in value AND gradient: w_q/w_k get exactly zero gradient in the faithful
    form (softmax VJP of an s-constant cotangent vanishes)."""
    *_, cfg = setup
    params = init_mmssl(jax.random.key(5), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    rng = np.random.default_rng(7)
    stack = jnp.asarray(rng.normal(size=(2, 6, D)).astype(np.float32))
    for parity in (ParityConfig(), ParityConfig(attention_k_equals_q=False,
                                                discard_attention_rescale=False)):
        def loss(p, s, impl):
            z = modality_attention(p, s, cfg.head_num, parity, 0.55, impl)
            return jnp.sum(jnp.sin(z))  # nonlinear scalarization

        for impl_pair in [("faithful", "algebraic")]:
            (va, (gpa, gsa)) = jax.value_and_grad(loss, argnums=(0, 1))(params, stack, impl_pair[0])
            (vb, (gpb, gsb)) = jax.value_and_grad(loss, argnums=(0, 1))(params, stack, impl_pair[1])
            np.testing.assert_allclose(float(va), float(vb), rtol=1e-5)
            np.testing.assert_allclose(np.asarray(gsa), np.asarray(gsb), rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(gpa["w_cat"]), np.asarray(gpb["w_cat"]), rtol=1e-4, atol=1e-5
            )
            # faithful w_q/w_k grads are identically ~zero
            assert float(jnp.max(jnp.abs(gpa["w_q"]))) < 1e-5
            assert float(jnp.max(jnp.abs(gpa["w_k"]))) < 1e-5


def test_mmssl_forward(setup):
    _, ui, iu, _, feats, cfg = setup
    params = init_mmssl(jax.random.key(4), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    graphs = BipartiteGraphs(ui=ui, iu=iu, mod_ui={m: ui for m in feats}, mod_iu={m: iu for m in feats})
    parity = ParityConfig()
    out = apply_mmssl(params, graphs, feats, cfg, parity, train=False)
    assert out.user_emb.shape == (N_USERS, D)
    assert out.item_emb.shape == (N_ITEMS, D)
    for m in feats:
        assert out.mm_user_feats[m].shape == (N_USERS, D)
        assert out.mm_item_id[m].shape == (N_ITEMS, D)
    assert bool(jnp.isfinite(out.user_emb).all())
    # Eval forward is deterministic; train forward with dropout differs.
    out2 = apply_mmssl(params, graphs, feats, cfg, parity, train=False)
    np.testing.assert_allclose(np.asarray(out.user_emb), np.asarray(out2.user_emb))
    out3 = apply_mmssl(params, graphs, feats, cfg, parity, train=True, rng=jax.random.key(1))
    assert not np.allclose(np.asarray(out.user_emb), np.asarray(out3.user_emb))


def test_mmssl_grad_flows(setup):
    _, ui, iu, _, feats, cfg = setup
    params = init_mmssl(jax.random.key(5), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    graphs = BipartiteGraphs(ui=ui, iu=iu, mod_ui={m: ui for m in feats}, mod_iu={m: iu for m in feats})
    parity = ParityConfig()

    def loss(p):
        out = apply_mmssl(p, graphs, feats, cfg, parity, train=False)
        return jnp.sum(out.user_emb**2) + jnp.sum(out.item_emb**2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["user_emb"]).sum()) > 0
    assert float(jnp.abs(g["proj"]["image"]["w"]).sum()) > 0
    assert float(jnp.abs(g["w_cat"]).sum()) > 0
    # Q1/Q2 make w_q gradient-free (attention output independent of att).
    assert float(jnp.abs(g["w_q"]).sum()) == pytest.approx(0.0, abs=1e-5)


def test_mmssl_split_vjp_grad_equivalence(setup):
    # The train step computes the dropout-free branch once via jax.vjp and
    # pulls gradients back explicitly; must equal differentiating the
    # monolithic forward.
    from mmssl_tpu.models.mmssl import (
        mmssl_combine,
        mmssl_deterministic_branch,
        mmssl_modality_feats,
    )

    _, ui, iu, _, feats, cfg = setup
    params = init_mmssl(jax.random.key(11), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    graphs = BipartiteGraphs(ui=ui, iu=iu, mod_ui={m: ui for m in feats}, mod_iu={m: iu for m in feats})
    parity = ParityConfig()
    modalities = tuple(sorted(feats))

    def loss_mono(p):
        out = apply_mmssl(p, graphs, feats, cfg, parity, train=False)
        return jnp.sum(out.user_emb ** 2) + jnp.sum(out.mm_user_id["image"] ** 2)

    def split_grads(p):
        det, det_vjp = jax.vjp(
            lambda q: mmssl_deterministic_branch(q, graphs, cfg, parity, modalities), p
        )

        def g(q, det_in):
            fu, fi = mmssl_modality_feats(q, graphs, feats, cfg, False, None)
            ua, _ = mmssl_combine(det_in, fu, fi, cfg)
            return jnp.sum(ua ** 2) + jnp.sum(det_in.mm_user_id["image"] ** 2)

        direct, det_g = jax.grad(g, argnums=(0, 1))(p, det)
        (from_det,) = det_vjp(det_g)
        return jax.tree.map(jnp.add, direct, from_det)

    g_mono = jax.grad(loss_mono)(params)
    g_split = split_grads(params)
    for key in ("user_emb", "item_emb", "w_cat"):
        np.testing.assert_allclose(
            np.asarray(g_mono[key]), np.asarray(g_split[key]), rtol=1e-4, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(g_mono["proj"]["image"]["w"]),
        np.asarray(g_split["proj"]["image"]["w"]),
        rtol=1e-4, atol=1e-5,
    )


def test_mmssl_fused_forward_shared_draw_matches_equal_keys(setup):
    """shared_draw=True (TrainConfig.shared_fwd_draw fast path) must equal
    the unshared program fed the SAME key for both draws: the narrowed
    [d + M*d] stack is the identical math with the duplicate columns
    removed.  rng_g must be None under shared_draw (and a key otherwise) —
    a meaningful G key would be silently ignored (ADVICE r4)."""
    from mmssl_tpu.models.mmssl import mmssl_fused_forward

    _, ui, iu, _, feats, cfg = setup
    params = init_mmssl(jax.random.key(3), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    graphs = BipartiteGraphs(ui=ui, iu=iu, mod_ui={m: ui for m in feats}, mod_iu={m: iu for m in feats})
    parity = ParityConfig()
    k = jax.random.key(7)
    ref = mmssl_fused_forward(params, graphs, feats, cfg, parity, k, k, train=True)
    shared = mmssl_fused_forward(
        params, graphs, feats, cfg, parity, k, None, train=True, shared_draw=True
    )
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(shared)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)
    # The shared outputs really are one draw (d == g aliases).
    for m in feats:
        assert shared.d_user_feats[m] is shared.g_user_feats[m]
    # The ignored-key and missing-key misuses are refused, not silent.
    with pytest.raises(AssertionError, match="rng_g=None"):
        mmssl_fused_forward(params, graphs, feats, cfg, parity, k,
                            jax.random.key(99), train=True, shared_draw=True)
    with pytest.raises(AssertionError, match="needs a G draw key"):
        mmssl_fused_forward(params, graphs, feats, cfg, parity, k, None, train=True)


def test_discriminator(setup):
    *_, cfg = setup
    n = 32
    params = init_discriminator(jax.random.key(6), n, cfg)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(6, n)).astype(np.float32))
    out = apply_discriminator(params, x, cfg, ParityConfig(), train=True, rng=jax.random.key(0))
    assert out.shape == (6,)
    assert bool(((out >= 0) & (out <= 100)).all())  # Q8 bounded output
    # Q14: identity leak -> with slope 1.0 the pre-BN activation is linear.
    out_eval = apply_discriminator(params, x, cfg, ParityConfig(), train=False)
    assert out_eval.shape == (6,)


def test_lattice_forward_and_state(setup):
    _, _, _, joint, feats, cfg = setup
    params = init_lattice(jax.random.key(8), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    orig = build_original_adjs(feats, cfg.knn_topk)
    adj0 = jnp.zeros((N_ITEMS, N_ITEMS))
    out = apply_lattice(params, joint, feats, orig, adj0, cfg, ParityConfig(), build_item_graph=True)
    assert out.user_emb.shape == (N_USERS, D)
    assert out.item_adj.shape == (N_ITEMS, N_ITEMS)
    assert float(jnp.abs(out.item_adj).sum()) > 0
    # Reuse carried state without rebuild: same output embeddings.
    out2 = apply_lattice(params, joint, feats, orig, out.item_adj, cfg, ParityConfig(), build_item_graph=False)
    np.testing.assert_allclose(np.asarray(out.item_emb), np.asarray(out2.item_emb), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("sparse", [True, False])
def test_micro_forward(setup, sparse):
    _, _, _, joint, feats, cfg = setup
    params = init_micro(jax.random.key(9), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    if sparse:
        orig = build_original_adjs_sparse(feats, cfg.knn_topk, cfg.norm_type)
    else:
        orig = build_original_adjs_dense(feats, cfg.knn_topk, cfg.norm_type)
    out = apply_micro(
        params, joint, feats, orig, orig, cfg, ParityConfig(), build_item_graph=True, sparse=sparse
    )
    assert out.user_emb.shape == (N_USERS, D)
    assert out.fusion.shape == (N_ITEMS, D)
    assert set(out.mm_item_embeds) == set(feats)
    out2 = apply_micro(
        params, joint, feats, orig, out.mod_adjs, cfg, ParityConfig(), build_item_graph=False, sparse=sparse
    )
    np.testing.assert_allclose(np.asarray(out.item_emb), np.asarray(out2.item_emb), rtol=1e-5, atol=1e-6)


def test_micro_sparse_dense_agree(setup):
    _, _, _, joint, feats, cfg = setup
    params = init_micro(jax.random.key(10), N_USERS, N_ITEMS, FEAT_DIMS, cfg)
    out_s = apply_micro(
        params, joint, feats,
        build_original_adjs_sparse(feats, cfg.knn_topk, cfg.norm_type),
        {}, cfg, ParityConfig(), build_item_graph=True, sparse=True,
    )
    out_d = apply_micro(
        params, joint, feats,
        build_original_adjs_dense(feats, cfg.knn_topk, cfg.norm_type),
        {}, cfg, ParityConfig(), build_item_graph=True, sparse=False,
    )
    np.testing.assert_allclose(
        np.asarray(out_s.item_emb), np.asarray(out_d.item_emb), rtol=1e-4, atol=1e-5
    )


def test_disc_lowrank_matches_direct(setup):
    """disc_z1_lowrank == linear(l1, u_sim rows) — values AND gradients.

    The low-rank factorization (ModelConfig.disc_lowrank) is a pure
    reassociation: in f32 on tiny shapes both the layer-1 affine and the
    gradients w.r.t. U / I / W1 must agree to fp tolerance."""
    from mmssl_tpu.models.common import linear
    from mmssl_tpu.train.steps_mmssl import (
        disc_z1_lowrank,
        fake_row_parts,
        interaction_rows,
        u_sim,
    )

    rng = np.random.default_rng(3)
    B, H, MAXDEG = 6, 7, 4
    key = jax.random.key(1)
    u_emb = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    i_emb = jnp.asarray(rng.normal(size=(N_ITEMS, D)).astype(np.float32))
    l1 = {
        "w": jnp.asarray(rng.normal(size=(N_ITEMS, H)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(H,)).astype(np.float32)),
    }
    # per-row unique train items, one row fully padded (cold user)
    item_rows = np.full((B, MAXDEG), -1, np.int32)
    for b in range(B - 1):
        deg = int(rng.integers(1, MAXDEG + 1))
        item_rows[b, :deg] = rng.choice(N_ITEMS, size=deg, replace=False)
    item_rows = jnp.asarray(item_rows)
    u_ui = interaction_rows(item_rows, N_ITEMS)

    def direct(u_emb, i_emb, w):
        sim = u_sim(u_emb, i_emb, u_ui)
        return linear({"w": w, "b": l1["b"]}, sim)

    def lowrank(u_emb, i_emb, w):
        parts = fake_row_parts(u_emb, i_emb, u_ui, item_rows)
        return disc_z1_lowrank({"w": w, "b": l1["b"]}, parts)

    zd = direct(u_emb, i_emb, l1["w"])
    zl = lowrank(u_emb, i_emb, l1["w"])
    np.testing.assert_allclose(np.asarray(zl), np.asarray(zd), rtol=2e-5, atol=2e-5)

    # sim rows themselves identical (GP interpolates / densify top-k reuse them)
    parts = fake_row_parts(u_emb, i_emb, u_ui, item_rows)
    np.testing.assert_allclose(
        np.asarray(parts.sim), np.asarray(u_sim(u_emb, i_emb, u_ui)), rtol=1e-6, atol=1e-7
    )

    cot = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    loss_d = lambda *a: jnp.sum(direct(*a) * cot)
    loss_l = lambda *a: jnp.sum(lowrank(*a) * cot)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(u_emb, i_emb, l1["w"])
    gl = jax.grad(loss_l, argnums=(0, 1, 2))(u_emb, i_emb, l1["w"])
    for a, b_, name in zip(gd, gl, ("dU", "dI", "dW1")):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=3e-4, atol=3e-5, err_msg=name
        )
