"""Mesh-sharded WSI long-axis stages: prompt screening and the refined
patch-grid sweep.

Round-1 sharded only the similarity scoring (`pipelines.score_tiles_sharded`);
prompt screening and the scatter/refine/gather ran single-device. At the
reference's scales that matters: screening 1,782 classifiers over a 100K-tile
slide materializes [P, N, C] logits ≈ 1.4 GB fp32
(WSI_evaluation/utils.py:119-146 runs it as a per-classifier Python loop).

Design: annotate the tile axis with NamedSharding P('dp') and let XLA insert
the collectives — the screening scores reduce over tiles (one psum), the
merged classifier is replicated, and the dense-grid stencil's halo exchange
is XLA's problem (shifted adds over a row-sharded grid become
collective-permutes). Padding tiles to the mesh uses a validity mask so the
screening mean stays EXACTLY the reference's mean over real tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from keep_tpu.ops.nn import l2_normalize
from keep_tpu.parallel import make_mesh, pad_to_multiple
from keep_tpu.wsi.grid import CoordGrid, refine_grid

Array = jax.Array


def _prompt_select_masked(
    classifiers: Array, features: Array, valid: Array, topn: int
) -> tuple:
    """prompt_select with a tile validity mask (padded rows excluded from the
    screening mean — identical scores to the unpadded single-device path)."""
    feats = l2_normalize(features.astype(jnp.float32)) * valid[:, None]
    logits = jnp.einsum(
        "nd,pdc->pnc", feats, classifiers, preferred_element_type=jnp.float32
    )
    top2 = jax.lax.top_k(logits, 2)[0]
    largest, second = top2[..., 0], top2[..., 1]
    val = (largest - second) - jnp.abs(largest + second - 1.0)  # [P, Npad]
    scores = jnp.sum(val * valid[None, :], axis=-1) / jnp.sum(valid)
    _, order = jax.lax.top_k(scores, topn)
    merged = classifiers[order].sum(axis=0)
    merged = merged / jnp.linalg.norm(merged, axis=0, keepdims=True)
    return merged, scores, order


def prompt_select_sharded(
    classifiers: Array,
    features: np.ndarray,
    mesh=None,
    topn: int = 50,
) -> Array:
    """`zeroshot.classifier.prompt_select` with the tile axis sharded over the
    mesh's 'dp' axis. Returns the merged [D, C] ensemble (replicated).

    Exact parity with the single-device path at any N (padding is masked out
    of the screening mean, NOT averaged in)."""
    # same clamp as classifier.prompt_select: top-50 of a smaller pool is
    # the whole pool, not a top_k error
    topn = min(topn, int(classifiers.shape[0]))
    mesh = mesh or make_mesh()
    n_dev = mesh.shape["dp"]
    padded, n = pad_to_multiple(np.asarray(features), n_dev)
    valid = np.zeros(len(padded), np.float32)
    valid[:n] = 1.0

    feats = jax.device_put(jnp.asarray(padded), NamedSharding(mesh, P("dp")))
    vmask = jax.device_put(jnp.asarray(valid), NamedSharding(mesh, P("dp")))
    cls = jax.device_put(jnp.asarray(classifiers), NamedSharding(mesh, P()))
    merged, _, _ = jax.jit(
        _prompt_select_masked,
        static_argnames=("topn",),
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P("dp")),
            NamedSharding(mesh, P("dp")),
        ),
        out_shardings=NamedSharding(mesh, P()),
    )(cls, feats, vmask, topn)
    return merged


def refined_probs_sharded(
    classifier: Array,
    features: np.ndarray,
    coords: np.ndarray,
    patch_size: int,
    mesh=None,
    overlap: bool = True,
    scale: float = 10.0,
) -> np.ndarray:
    """The full 100K+-patch sweep sharded end-to-end: score (tiles on 'dp') →
    scatter into the dense grid (rows on 'dp') → 2×2 refine stencil (XLA
    inserts the halo exchange) → gather. Returns [M, C] refined probabilities
    in first-seen patch order (single-device `refined_tumor_probs` parity)."""
    mesh = mesh or make_mesh()
    n_dev = mesh.shape["dp"]
    grid = CoordGrid.from_coords(coords, patch_size)

    padded, _ = pad_to_multiple(np.asarray(features), n_dev)
    feats = jax.device_put(jnp.asarray(padded), NamedSharding(mesh, P("dp")))
    cls = jax.device_put(jnp.asarray(classifier), NamedSharding(mesh, P()))
    cell_index = jax.device_put(
        jnp.asarray(grid.cell_index), NamedSharding(mesh, P())
    )
    keep = jax.device_put(jnp.asarray(grid.keep), NamedSharding(mesh, P()))
    rows, cols = grid.rows, grid.cols

    @functools.partial(
        jax.jit,
        static_argnames=("rows", "cols", "overlap", "scale"),
        out_shardings=NamedSharding(mesh, P()),
    )
    def sweep(cl, f, cell_idx, keep_idx, rows, cols, overlap, scale):
        feats_n = l2_normalize(f.astype(jnp.float32))
        probs = jax.nn.softmax(
            jnp.dot(feats_n, cl.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale, axis=-1
        )
        vals = probs[keep_idx]  # padded rows are never indexed (keep < N real)
        c = vals.shape[-1]
        g = jnp.zeros((rows * cols, c), vals.dtype).at[cell_idx].set(vals)
        occ = jnp.zeros((rows * cols,), jnp.float32).at[cell_idx].set(1.0)
        g = g.reshape(rows, cols, c)
        occ = occ.reshape(rows, cols)
        if overlap:
            g = refine_grid(g, occ)
        return g.reshape(rows * cols, c)[cell_idx]

    out = sweep(cls, feats, cell_index, keep, rows, cols, overlap, scale)
    return np.asarray(out)
