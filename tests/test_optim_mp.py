"""Mixed-precision machinery: low-precision Adam moments and bf16-cotangent
matmul backward (the bench fast path's optimizer/backward contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mmssl_tpu.models.common import matmul
from mmssl_tpu.train.optim import make_discriminator_optimizer, scale_by_adam_moments


def _tree_allclose(a, b, **kw):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(x, y, **kw), a, b)


def test_adam_moments_f32_matches_optax():
    """moment_dtype=None reproduces optax.scale_by_adam step for step."""
    params = {"w": jnp.array([1.0, -2.0, 3.0]), "b": jnp.array([[0.5, 0.1]])}
    ours = scale_by_adam_moments(b1=0.5, b2=0.9, eps=1e-8)
    ref = optax.scale_by_adam(b1=0.5, b2=0.9, eps=1e-8)
    s_o, s_r = ours.init(params), ref.init(params)
    key = jax.random.key(0)
    for i in range(5):
        key, k = jax.random.split(key)
        g = jax.tree.map(
            lambda p: jax.random.normal(jax.random.fold_in(k, p.size), p.shape), params
        )
        u_o, s_o = ours.update(g, s_o)
        u_r, s_r = ref.update(g, s_r)
        _tree_allclose(u_o, u_r, rtol=1e-6, atol=1e-7)
    _tree_allclose(s_o.mu, s_r.mu, rtol=1e-6, atol=1e-7)
    _tree_allclose(s_o.nu, s_r.nu, rtol=1e-6, atol=1e-7)


def test_adam_moments_bf16_storage_and_accuracy():
    """bf16 moments: state is stored bf16, updates track f32 Adam closely."""
    params = {"w": jnp.ones((64, 32))}
    lowp = scale_by_adam_moments(b1=0.5, b2=0.9, moment_dtype=jnp.bfloat16)
    ref = optax.scale_by_adam(b1=0.5, b2=0.9)
    s_l, s_r = lowp.init(params), ref.init(params)
    assert s_l.mu["w"].dtype == jnp.bfloat16
    assert s_l.nu["w"].dtype == jnp.bfloat16
    key = jax.random.key(1)
    for i in range(10):
        key, k = jax.random.split(key)
        g = {"w": jax.random.normal(k, (64, 32))}
        u_l, s_l = lowp.update(g, s_l)
        u_r, s_r = ref.update(g, s_r)
    # bf16 carries ~3 decimal digits; the normalized Adam step stays within
    # a couple percent of the f32 trajectory over 10 steps.
    np.testing.assert_allclose(u_l["w"], u_r["w"], rtol=0.05, atol=0.01)


def test_make_discriminator_optimizer_dtypes():
    params = {"w": jnp.ones((4, 4))}
    f32 = make_discriminator_optimizer(3e-4, (0.5, 0.9), moment_dtype="float32")
    bf16 = make_discriminator_optimizer(3e-4, (0.5, 0.9), moment_dtype="bfloat16")
    s32, sbf = f32.init(params), bf16.init(params)
    g = {"w": jnp.full((4, 4), 0.25)}
    u32, _ = f32.update(g, s32, params)
    ubf, _ = bf16.update(g, sbf, params)
    np.testing.assert_allclose(u32["w"], ubf["w"], rtol=1e-2)


def test_mp_matmul_backward_matches_default_bf16():
    """Both the default-bwd and mp-bwd bf16 paths track the exact f32 grads
    within bf16 epsilon, and agree with each other to the same tolerance.
    (The default dot transpose already rounds operand cotangents to the
    primal bf16 dtype before the convert back to f32, so mp_bwd changes
    which side of the dot gets rounded, not whether rounding happens.)"""
    key = jax.random.key(2)
    x = jax.random.normal(jax.random.fold_in(key, 0), (16, 32))
    y = jax.random.normal(jax.random.fold_in(key, 1), (32, 8))

    def f(kind):
        def inner(x, y):
            if kind == "f32":
                return jnp.sum(matmul(x, y))
            return jnp.sum(matmul(x, y, jnp.bfloat16, mp_bwd=(kind == "mp")))
        return inner

    v_d, g_d = jax.value_and_grad(f("default"), argnums=(0, 1))(x, y)
    v_m, g_m = jax.value_and_grad(f("mp"), argnums=(0, 1))(x, y)
    _, g_f = jax.value_and_grad(f("f32"), argnums=(0, 1))(x, y)
    np.testing.assert_allclose(v_d, v_m, rtol=1e-6)
    for i in range(2):
        np.testing.assert_allclose(g_m[i], g_f[i], rtol=2e-2, atol=1e-2)
        np.testing.assert_allclose(g_d[i], g_m[i], rtol=2e-2, atol=1e-2)


def test_mp_matmul_backward_rounds_cotangent():
    """With a non-trivial cotangent the mp path rounds it to bf16: grads stay
    within bf16 relative error of the f32-cotangent default path."""
    key = jax.random.key(3)
    x = jax.random.normal(jax.random.fold_in(key, 0), (8, 16))
    y = jax.random.normal(jax.random.fold_in(key, 1), (16, 4))
    w = jax.random.normal(jax.random.fold_in(key, 2), (8, 4))

    def loss(fn):
        def inner(x, y):
            out = fn(x, y)
            return jnp.sum((out * w) ** 2)
        return inner

    g_d = jax.grad(loss(lambda x, y: matmul(x, y, jnp.bfloat16)), argnums=(0, 1))(x, y)
    g_m = jax.grad(loss(lambda x, y: matmul(x, y, jnp.bfloat16, mp_bwd=True)), argnums=(0, 1))(x, y)
    # two independent bf16 roundings can land a small-magnitude element a
    # couple of ulps apart; bound by absolute error at the grad scale
    np.testing.assert_allclose(g_d[0], g_m[0], rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(g_d[1], g_m[1], rtol=2e-2, atol=2e-2)


def test_gp_second_order_still_works_with_mp_step():
    """The full adversarial step (mp_bwd towers + default-bwd GP tower)
    differentiates: grad-of-grad through the gradient penalty coexists with
    custom_vjp on the first-order towers."""
    from mmssl_tpu.config import preset
    from mmssl_tpu.models.mmssl import apply_discriminator, init_discriminator
    from mmssl_tpu.train.steps_mmssl import gradient_penalty

    cfg = preset("baby", "mmssl", **{"model.compute_dtype": "bfloat16"})
    n_items = 32
    d_params = init_discriminator(jax.random.key(0), n_items, cfg.model)
    xr = jax.random.normal(jax.random.key(1), (4, n_items))
    xf = jax.random.normal(jax.random.key(2), (4, n_items))

    def d_loss(d_params):
        predf = apply_discriminator(
            d_params, xf, cfg.model, cfg.parity, train=False, mp_bwd=True
        )
        gp = gradient_penalty(d_params, xr, xf, jax.random.key(3), cfg)
        return jnp.mean(predf) + gp

    grads = jax.grad(d_loss)(d_params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in flat)
