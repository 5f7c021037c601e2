"""Dense coordinate-grid representation of a WSI patch sweep.

The reference's label-refinement walks a Python dict keyed by ``"x_y"`` strings
and averages each patch's logits with up to 3 neighbors at ``coord −
patch_size`` offsets (WSI_evaluation/detection_utils.py:39-74,
segment_utils.py:63-89, subtyping_utils.py:38-65) — a pure-Python hot loop
over 10K–100K patches.

TPU-native rebuild: scatter patch logits into a dense ``[rows, cols, C]`` grid
(+ occupancy mask), then the neighbor average is a 2×2 stencil — four shifted
adds, fully vectorized, jittable, shardable over the patch axis.

Neighbor set per cell (r, c): {(r, c), (r−1, c), (r, c−1), (r−1, c−1)} —
i.e. self + left/top/diag-left-top at −patch_size, restricted to occupied
cells, exactly the reference's lt/rt/lb/rb lookup with coords = (x, y).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CoordGrid:
    """Maps N patch coords ↔ dense (row, col) grid cells.

    Built host-side once per slide (cheap integer math); all heavy math then
    runs on the dense device grid. Duplicate coordinates keep the FIRST
    occurrence (reference dict-insert semantics, detection_utils.py:45).
    """

    rows: int
    cols: int
    origin: tuple[int, int]  # (x_min, y_min)
    patch_size: int
    cell_index: np.ndarray  # [M] flat r*cols+c per kept patch
    keep: np.ndarray  # [M] indices into the original N patches (first-seen)

    @classmethod
    def from_coords(cls, coords: np.ndarray, patch_size: int) -> "CoordGrid":
        coords = np.asarray(coords)
        if coords.ndim != 2 or coords.shape[1] != 2:
            raise ValueError(f"coords must be [N, 2] (x, y); got {coords.shape}")
        if len(coords) == 0:
            # a blank slide (cut_tiles legitimately yields zero tissue
            # tiles) must fail with a diagnosable message, not IndexError
            raise ValueError("no patches: empty coords (blank slide?)")
        xy = coords.astype(np.int64)
        rem = xy % patch_size
        if not (rem == rem[0]).all():
            raise ValueError(
                "coords are not on a uniform patch_size grid; exact-offset "
                "neighbor matching (reference semantics) requires alignment"
            )
        x_min, y_min = xy[:, 0].min(), xy[:, 1].min()
        c = (xy[:, 0] - x_min) // patch_size
        r = (xy[:, 1] - y_min) // patch_size
        cols = int(c.max()) + 1
        rows = int(r.max()) + 1
        flat = (r * cols + c).astype(np.int64)
        # first occurrence wins
        _, first_idx = np.unique(flat, return_index=True)
        keep = np.sort(first_idx)
        return cls(
            rows=rows,
            cols=cols,
            origin=(int(x_min), int(y_min)),
            patch_size=patch_size,
            cell_index=flat[keep],
            keep=keep,
        )

    @property
    def num_patches(self) -> int:
        return len(self.cell_index)

    def scatter(self, values: Array) -> tuple[Array, Array]:
        """[N, C] per-patch values → ([rows, cols, C] grid, [rows, cols] occupancy).

        ``values`` is indexed by the ORIGINAL patch order; duplicates beyond
        the first are dropped.
        """
        vals = jnp.asarray(values)[jnp.asarray(self.keep)]
        c = vals.shape[-1]
        grid = jnp.zeros((self.rows * self.cols, c), vals.dtype)
        grid = grid.at[jnp.asarray(self.cell_index)].set(vals)
        occ = jnp.zeros((self.rows * self.cols,), jnp.float32)
        occ = occ.at[jnp.asarray(self.cell_index)].set(1.0)
        return grid.reshape(self.rows, self.cols, c), occ.reshape(self.rows, self.cols)

    def gather(self, grid: Array) -> Array:
        """[rows, cols, C] grid → [M, C] per-kept-patch values (first-seen order)."""
        flat = grid.reshape(self.rows * self.cols, -1)
        return flat[jnp.asarray(self.cell_index)]

    def kept_coords(self, coords: np.ndarray) -> np.ndarray:
        return np.asarray(coords)[self.keep]


def heatmap_image(grid_vals: np.ndarray, occ: np.ndarray, patch_size: int,
                  downsample: int = 16) -> np.ndarray:
    """Paint a [rows, cols] per-cell probability grid into a uint8 image at
    ``patch_size/downsample`` pixels per cell — the ~16×-downsampled level
    the reference paints its prediction masks at (segment_utils.py:122-152).
    Unoccupied cells render as 0."""
    cell = max(1, int(round(patch_size / downsample)))
    vals = np.clip(np.asarray(grid_vals, np.float32), 0.0, 1.0)
    img = np.round(vals * 255.0).astype(np.uint8) * (np.asarray(occ) > 0)
    return np.kron(img, np.ones((cell, cell), np.uint8))


@jax.jit
def refine_grid(grid: Array, occ: Array) -> Array:
    """2×2 causal stencil: per occupied cell, mean of values over the occupied
    subset of {self, top, left, top-left} (reference refine_seg overlap=True)."""
    c = grid.shape[-1]
    g = grid.astype(jnp.float32) * occ[..., None]
    gp = jnp.pad(g, ((1, 0), (1, 0), (0, 0)))
    op = jnp.pad(occ, ((1, 0), (1, 0)))
    vsum = gp[1:, 1:] + gp[:-1, 1:] + gp[1:, :-1] + gp[:-1, :-1]
    count = op[1:, 1:] + op[:-1, 1:] + op[1:, :-1] + op[:-1, :-1]
    return vsum / jnp.maximum(count, 1.0)[..., None]
