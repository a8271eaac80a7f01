"""Mesh-geometry-portable checkpoint transforms (VERDICT r3 #1).

Catalog tables are GEOMETRY-PADDED in the live training state: on a
model-axis mesh the Trainer pads user/item row counts to mesh multiples so
row sharding holds at any dataset scale (Trainer._build_mmssl).  A
checkpoint that stored the padded tables would therefore be pinned to the
mesh geometry it was written under — restart-after-preemption on a
different slice shape (the §5.4 recovery story; net-new, the reference's
--isload/--loadModelPath flags are dead, MMSSL/utility/parser.py:43-45)
would be refused.

This module converts between the live state and a PORTABLE form that
depends only on the dataset's REAL row counts:

  - catalog-axis tensors (user_emb / item_emb wherever they appear — the
    params dicts AND every optimizer-moment mirror of them — plus the
    discriminator's [n_items, h1] l1.w) are sliced to real rows on save and
    zero-re-padded to the restoring trainer's multiples.  Exact: pad rows
    are zeros and stay zeros (zero graph pad rows/cols, zero gradients,
    zero optimizer moments — see the _build_mmssl padding invariant).
  - SparseGraph state (the MMSSL densified modality graphs, MICRO's carried
    item graphs) is stored as plain {rows, cols, vals} dicts with the
    padding sentinel (row == n_rows_padded) remapped to the real row count;
    real entries always index real rows/cols, so the remap is exact.
    MICRO's fixed-capacity 2*n_items*k layout (learned ‖ original halves,
    models/micro._mix_sparse) is sliced per half and re-expanded with the
    same zero-value pad-row entries a fresh padded build produces
    (top_k over an all-zero masked row -> cols arange(k), vals 0).
  - LATTICE / MICRO-dense carried item graphs ([n_items, n_items]) slice /
    re-pad on BOTH axes (pad rows and columns are exact zeros: the kNN
    builders mask pad columns below any real cosine and zero pad rows,
    ops/knn.mask_sim_padding).

Everything is pure jnp (works on sharded multi-process arrays: every
process executes the identical program).  The portable form's pytree
structure is produced identically by the saving and restoring trainer, so
it doubles as the orbax restore template.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from mmssl_tpu.ops.sparse import SparseGraph
from mmssl_tpu.train.steps_mmssl import MMSSLTrainState
from mmssl_tpu.train.steps_simple import SimpleTrainState


def _slice0(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return x[:n]


def _pad0(x: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _is_table_dict(x: Any) -> bool:
    return isinstance(x, dict) and "user_emb" in x and "item_emb" in x


def _is_disc_dict(x: Any) -> bool:
    return isinstance(x, dict) and "l1" in x and "l3" in x


def _map_catalog_tables(tree: Any, fu, fi) -> Any:
    """Apply ``fu`` to every user table and ``fi`` to every item-axis table
    in ``tree``.  Catalog tables are identified structurally: any dict with
    both 'user_emb' and 'item_emb' keys (the model params and each Adam
    moment tree mirroring them) and any discriminator-shaped dict ('l1' +
    'l3': d_params and its moment mirrors, whose l1.w rows are the item
    axis).  The generator params contain no 'l1'/'l3' keys and the
    discriminator none of 'user_emb'/'item_emb' (models/mmssl.py:98-111,
    444-457), so the predicates are disjoint and unambiguous."""

    def pred(x):
        return _is_table_dict(x) or _is_disc_dict(x)

    def fix(x):
        if _is_table_dict(x):
            y = dict(x)
            y["user_emb"] = fu(y["user_emb"])
            y["item_emb"] = fi(y["item_emb"])
            return y
        if _is_disc_dict(x):
            y = dict(x)
            l1 = dict(y["l1"])
            l1["w"] = fi(l1["w"])
            y["l1"] = l1
            return y
        return x

    return jax.tree.map(fix, tree, is_leaf=pred)


# ---------------------------------------------------------------------------
# SparseGraph <-> portable dict
# ---------------------------------------------------------------------------

def _graph_to_portable(g: SparseGraph, n_rows_real: int) -> Dict[str, jnp.ndarray]:
    """Padding-sentinel entries (row == shape[0], val 0) remap to the real
    row count; live entries always index real rows (< n_rows_real) so they
    pass through untouched."""
    return {
        "rows": jnp.where(g.rows >= n_rows_real, n_rows_real, g.rows).astype(jnp.int32),
        "cols": g.cols,
        "vals": g.vals,
    }


def _graph_from_portable(
    d: Dict[str, jnp.ndarray], n_rows_real: int, n_rows_pad: int, n_cols_pad: int
) -> SparseGraph:
    return SparseGraph(
        rows=jnp.where(d["rows"] >= n_rows_real, n_rows_pad, d["rows"]).astype(jnp.int32),
        cols=d["cols"],
        vals=d["vals"],
        shape=(n_rows_pad, n_cols_pad),
    )


def _micro_graph_to_portable(g: SparseGraph, ni_real: int) -> Dict[str, jnp.ndarray]:
    """MICRO carried graph: capacity 2 * n_rows * k, the learned kNN half
    concatenated with the original half, each half row-ordered as
    repeat(arange(n_rows), k) by construction (ops/knn.
    build_knn_sparse_graph) — so the real-row entries of each half are its
    first ni_real * k."""
    n_pad = g.shape[0]
    half = g.capacity // 2
    k = half // n_pad
    keep = ni_real * k

    def part(x):
        return jnp.concatenate([x[:keep], x[half : half + keep]])

    return {"rows": part(g.rows), "cols": part(g.cols), "vals": part(g.vals)}


def _micro_graph_from_portable(
    d: Dict[str, jnp.ndarray], ni_real: int, ni_pad: int
) -> SparseGraph:
    cap = d["rows"].shape[0]
    half = cap // 2
    k = half // ni_real if ni_real else 0
    n_extra = ni_pad - ni_real
    # Pad-row entries exactly as a fresh padded build produces them:
    # mask_sim_padding zeroes pad rows entirely, so their top_k returns
    # ascending indices arange(k) with value 0 (ties broken by index).
    pad_rows = jnp.repeat(jnp.arange(ni_real, ni_pad, dtype=jnp.int32), k)
    pad_cols = jnp.tile(jnp.arange(k, dtype=jnp.int32), n_extra)
    pad_vals = jnp.zeros((n_extra * k,), d["vals"].dtype)

    def expand(x, pad):
        return jnp.concatenate([x[:half], pad, x[half:], pad])

    return SparseGraph(
        rows=expand(d["rows"], pad_rows),
        cols=expand(d["cols"], pad_cols),
        vals=expand(d["vals"], pad_vals),
        shape=(ni_pad, ni_pad),
    )


def _dense_item_graph_to_portable(x: jnp.ndarray, ni_real: int) -> jnp.ndarray:
    return x[:ni_real, :ni_real]


def _dense_item_graph_from_portable(x: jnp.ndarray, ni_pad: int) -> jnp.ndarray:
    p = ni_pad - x.shape[0]
    return jnp.pad(x, ((0, p), (0, p)))


# ---------------------------------------------------------------------------
# Whole-state transforms
# ---------------------------------------------------------------------------

def mmssl_to_portable(state: MMSSLTrainState, n_users: int, n_items: int) -> MMSSLTrainState:
    fu, fi = lambda x: _slice0(x, n_users), lambda x: _slice0(x, n_items)
    f = lambda t: _map_catalog_tables(t, fu, fi)
    return state._replace(
        params=f(state.params),
        d_params=f(state.d_params),
        opt_state=f(state.opt_state),
        d_opt_state=f(state.d_opt_state),
        mod_ui={m: _graph_to_portable(g, n_users) for m, g in state.mod_ui.items()},
        mod_iu={m: _graph_to_portable(g, n_items) for m, g in state.mod_iu.items()},
    )


def mmssl_from_portable(
    state: MMSSLTrainState, n_users: int, n_items: int, nu_pad: int, ni_pad: int
) -> MMSSLTrainState:
    fu, fi = lambda x: _pad0(x, nu_pad), lambda x: _pad0(x, ni_pad)
    f = lambda t: _map_catalog_tables(t, fu, fi)
    return state._replace(
        params=f(state.params),
        d_params=f(state.d_params),
        opt_state=f(state.opt_state),
        d_opt_state=f(state.d_opt_state),
        mod_ui={
            m: _graph_from_portable(g, n_users, nu_pad, ni_pad)
            for m, g in state.mod_ui.items()
        },
        mod_iu={
            m: _graph_from_portable(g, n_items, ni_pad, nu_pad)
            for m, g in state.mod_iu.items()
        },
    )


def _item_state_to_portable(item_state: Any, n_items: int) -> Any:
    if isinstance(item_state, tuple) and not item_state:  # CF models: ()
        return item_state
    if isinstance(item_state, jnp.ndarray):  # LATTICE dense carried graph
        return _dense_item_graph_to_portable(item_state, n_items)
    assert isinstance(item_state, dict)
    return {
        m: (
            _micro_graph_to_portable(g, n_items)
            if isinstance(g, SparseGraph)
            else _dense_item_graph_to_portable(g, n_items)
        )
        for m, g in item_state.items()
    }


def _item_state_from_portable(item_state: Any, n_items: int, ni_pad: int) -> Any:
    if isinstance(item_state, tuple) and not item_state:
        return item_state
    if isinstance(item_state, jnp.ndarray):
        return _dense_item_graph_from_portable(item_state, ni_pad)
    assert isinstance(item_state, dict)
    return {
        m: (
            _micro_graph_from_portable(g, n_items, ni_pad)
            if isinstance(g, dict)
            else _dense_item_graph_from_portable(g, ni_pad)
        )
        for m, g in item_state.items()
    }


def _resize_1d(x: jnp.ndarray, cap: int, fill) -> jnp.ndarray:
    if x.shape[0] == cap:
        return x
    if x.shape[0] > cap:
        return x[:cap]
    return jnp.concatenate([x, jnp.full((cap - x.shape[0],), fill, x.dtype)])


def mmssl_resize_capacity(
    state: MMSSLTrainState, cap: int, n_users: int, n_items: int
) -> MMSSLTrainState:
    """Resize the PORTABLE state's densification buffers and modality-graph
    COO arrays to capacity ``cap`` (capacity-elastic restore: batch_size /
    densify_period / m_topk_rate changes alter ``graph_capacity``).  Exact
    because live entries are front-packed ([0, count) for the buffers;
    rebuilds mirror buffer positions) and everything beyond is padding —
    growth appends padding, shrinkage is guarded by
    :func:`mmssl_capacity_fits` (call it BEFORE shrinking restored data)."""

    def graphs(d: dict, sentinel: int) -> dict:
        return {
            "rows": _resize_1d(d["rows"], cap, sentinel),
            "cols": _resize_1d(d["cols"], cap, 0),
            "vals": _resize_1d(d["vals"], cap, 0),
        }

    return state._replace(
        mod_ui={m: graphs(g, n_users) for m, g in state.mod_ui.items()},
        mod_iu={m: graphs(g, n_items) for m, g in state.mod_iu.items()},
        buf_rows={m: _resize_1d(x, cap, 0) for m, x in state.buf_rows.items()},
        buf_cols={m: _resize_1d(x, cap, 0) for m, x in state.buf_cols.items()},
    )


def mmssl_capacity_fits(
    state: MMSSLTrainState, cap: int, n_users: int, n_items: int
) -> "str | None":
    """None if every live entry of the (portable) state fits in ``cap``,
    else a description of what overflows.  All counts ride ONE packed
    device fetch (per-scalar fetches cost a full relay round-trip each,
    CLAUDE.md); replicated values, multi-process-safe."""
    import jax

    labels, vals = [], []
    for m, c in state.buf_count.items():
        labels.append(f"accumulation buffer '{m}'")
        vals.append(jnp.asarray(c, jnp.int32))
    for name, tree, sentinel in (("mod_ui", state.mod_ui, n_users),
                                 ("mod_iu", state.mod_iu, n_items)):
        for m, g in tree.items():
            labels.append(f"densified graph {name}['{m}']")
            vals.append(jnp.sum(g["rows"] < sentinel).astype(jnp.int32))
    counts = jax.device_get(jnp.stack(vals))
    for label, n in zip(labels, counts):
        if int(n) > cap:
            return f"{label} holds {int(n)} entries > capacity {cap}"
    return None


def simple_to_portable(state: SimpleTrainState, n_users: int, n_items: int) -> SimpleTrainState:
    fu, fi = lambda x: _slice0(x, n_users), lambda x: _slice0(x, n_items)
    f = lambda t: _map_catalog_tables(t, fu, fi)
    return state._replace(
        params=f(state.params),
        opt_state=f(state.opt_state),
        item_state=_item_state_to_portable(state.item_state, n_items),
    )


def simple_from_portable(
    state: SimpleTrainState, n_users: int, n_items: int, nu_pad: int, ni_pad: int
) -> SimpleTrainState:
    fu, fi = lambda x: _pad0(x, nu_pad), lambda x: _pad0(x, ni_pad)
    f = lambda t: _map_catalog_tables(t, fu, fi)
    return state._replace(
        params=f(state.params),
        opt_state=f(state.opt_state),
        item_state=_item_state_from_portable(state.item_state, n_items, ni_pad),
    )
