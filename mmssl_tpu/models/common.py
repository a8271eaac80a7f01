"""Shared neural-net primitives for the model zoo.

Plain-pytree functional modules (init fns returning nested dicts of arrays +
pure apply fns).  Initializer and normalization semantics follow the torch
defaults the reference relies on, so parity runs start from the same
distribution family:

  - ``xavier_uniform``: U(-a, a), a = sqrt(6 / (fan_in + fan_out))
    (nn.init.xavier_uniform_, used for all embedding tables and projectors,
    e.g. MMSSL/Models.py:30-31,44-45)
  - ``kaiming_normal``: N(0, sqrt(2 / fan_in)) (nn.init.kaiming_normal_,
    applied to the discriminator Linears via weights_init, MMSSL/main.py:135)
  - ``l2_normalize``: x / max(||x||_2, 1e-12) (torch F.normalize defaults)
  - ``batchnorm``: biased variance, eps 1e-5, batch statistics (the reference
    discriminator never enters eval mode so running stats are never consumed)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jnp.ndarray:
    fan_in, fan_out = shape[0], shape[-1]
    a = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def kaiming_normal(key: jax.Array, shape: Tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """[in, out] weight with std sqrt(2/fan_in) (torch fan_in mode)."""
    std = (2.0 / shape[0]) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def torch_linear_default(key: jax.Array, shape: Tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """torch nn.Linear default weight init: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for an [in, out] weight.  LATTICE/MICRO
    leave their feature projectors at this default (no explicit xavier)."""
    bound = 1.0 / (shape[0] ** 0.5)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch nn.Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, (fan_out,), dtype, minval=-bound, maxval=bound)


def init_linear(key: jax.Array, fan_in: int, fan_out: int, w_init=xavier_uniform) -> dict:
    kw, kb = jax.random.split(key)
    return {"w": w_init(kw, (fan_in, fan_out)), "b": torch_linear_bias(kb, fan_in, fan_out)}


def resolve_dtype(name: str):
    """ModelConfig.compute_dtype string -> matmul() dtype arg (None = f32)."""
    return None if name in ("float32", "f32", "") else jnp.dtype(name)


# Transpose-free contraction helpers live in ops/sparse (the lower layer:
# ops must not import models); re-exported here for the model-level VJPs.
from mmssl_tpu.ops.sparse import dot_t_left, dot_t_right  # noqa: E402


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mp_matmul(x: jnp.ndarray, y: jnp.ndarray, dtype) -> jnp.ndarray:
    return jnp.matmul(x.astype(dtype), y.astype(dtype), preferred_element_type=jnp.float32)


def _mp_matmul_fwd(x, y, dtype):
    return _mp_matmul(x, y, dtype), (x, y)


def _mp_matmul_bwd(dtype, res, g):
    # Cast the incoming cotangent to the forward compute dtype before the
    # transposed products.  The default autodiff of `cast -> dot` keeps the
    # cotangent f32 and the VJP dots run mixed f32xbf16 at half MXU rate;
    # casting both VJP operands is the standard AMP backward contract (the
    # forward already rounds its operands to the same dtype).  Accumulation
    # stays f32, and gradients are cast back to the primal dtypes (weight
    # gradients re-emerge f32 for the optimizer).
    x, y = res
    gc = g.astype(dtype)
    dx = dot_t_right(gc, y.astype(dtype)).astype(x.dtype)
    dy = dot_t_left(x.astype(dtype), gc).astype(y.dtype)
    return dx, dy


_mp_matmul.defvjp(_mp_matmul_fwd, _mp_matmul_bwd)


def matmul(x: jnp.ndarray, y: jnp.ndarray, dtype=None, mp_bwd: bool = False) -> jnp.ndarray:
    """MXU matmul with optional low-precision inputs and f32 accumulation.

    With ``dtype=jnp.bfloat16`` both operands are cast to bf16 (XLA fuses the
    casts into the matmul's operand reads) and the product accumulates in
    f32 via ``preferred_element_type`` — ~2x MXU throughput and half the HBM
    bytes per operand vs f32.  ``dtype=None`` is a plain f32 matmul (the
    parity default).

    ``mp_bwd=True`` additionally rounds the backward cotangent to ``dtype``
    (custom VJP) so the two transposed gradient dots also run at the bf16 MXU
    rate instead of mixed f32xbf16.  custom_vjp functions cannot be
    differentiated twice — only use on strictly first-order paths (the WGAN
    gradient-penalty tower must keep the default backward)."""
    if dtype is None:
        return x @ y
    if mp_bwd:
        return _mp_matmul(x, y, dtype)
    return jnp.matmul(x.astype(dtype), y.astype(dtype), preferred_element_type=jnp.float32)


def linear(p: dict, x: jnp.ndarray, dtype=None, mp_bwd: bool = False) -> jnp.ndarray:
    return matmul(x, p["w"], dtype, mp_bwd) + p["b"]


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """torch F.normalize(p=2): x / max(||x||, 1e-12).

    Implemented as x / sqrt(max(sum(x^2), 1e-24)) so the gradient at x == 0
    is 1/eps (clamped branch, zero grad through the norm) instead of the nan
    that jnp.linalg.norm produces — matching torch's clamp_min semantics.
    Zero rows occur naturally (users with no interactions propagate zeros).
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, 1e-24))


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Inverted dropout matching torch semantics (scale by 1/(1-p) in train)."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def init_batchnorm(dim: int) -> dict:
    return {"gamma": jnp.ones((dim,)), "beta": jnp.zeros((dim,))}


def batchnorm(p: dict, x: jnp.ndarray, eps: float = 1e-5, axis_name: Optional[str] = None) -> jnp.ndarray:
    """Train-mode BatchNorm1d over axis 0 (biased variance, torch eps).

    When ``axis_name`` is given the batch statistics are reduced across that
    mesh axis so data-parallel training matches single-device numerics.
    """
    xf = x.astype(jnp.float32)  # stats always accumulate in f32
    # (Computing these column sums as a ones-row MXU dot was tried and
    # measured neutral at [2048, 1762] — the BN fusions' cost is the
    # normalize/activation traffic, not the reduction.)
    mean = jnp.mean(xf, axis=0)
    mean_sq = jnp.mean(xf * xf, axis=0)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean_sq = jax.lax.pmean(mean_sq, axis_name)
    var = mean_sq - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    return (xf - mean) * inv * p["gamma"] + p["beta"]


def leaky_relu(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)
