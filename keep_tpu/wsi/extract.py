"""Tile feature extraction: raw WSI tiles → KEEP image features.

The CLAM-equivalent path the reference delegates to external tooling (its
WSI pipelines consume precomputed h5 features; SURVEY §3.2). Here it is a
first-class batched device pipeline: uint8 tiles → fused normalize (+
optional resize) → ViT encode, at a fixed compiled batch shape with tail
padding — the throughput surface of BASELINE.json configs 2/5.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Optional

import numpy as np

from keep_tpu.configs import PreprocessConfig


def extract_features(
    model,
    tiles: np.ndarray | Iterable[np.ndarray],
    batch_size: int = 256,
    preprocess_cfg: PreprocessConfig = PreprocessConfig(),
    resize: bool = False,
    mesh=None,
    pipeline_depth: int = 2,
) -> np.ndarray:
    """uint8 tiles [N, S, S, 3] (or an iterable of such chunks) → [N, D]
    features. One compiled shape serves all batches (tail padded).

    ``mesh``: shard the tile axis over the mesh's 'dp' axis (params
    replicated) — the pod-scale path for the 20K-patches/s north-star
    workload itself; batch_size is rounded up to a multiple of the mesh.

    ``pipeline_depth``: batches kept in flight before fetching (1 = the
    round-3 double buffer). Measured on the relay (round 5): depth 2-3 is
    +2-4% over depth 1 on an upload-bound link; each level holds one more
    [bs, S, S, 3] uint8 batch + [bs, D] features in HBM (~37 MB at 256)."""
    import jax.numpy as jnp

    from keep_tpu.ops.preprocess import normalize_only, preprocess

    put = jnp.asarray
    if mesh is not None:
        import dataclasses

        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.shape["dp"]
        batch_size += (-batch_size) % n_dev  # divisible compiled shape
        shard = NamedSharding(mesh, P("dp"))
        model = dataclasses.replace(
            model, params=jax.device_put(model.params, NamedSharding(mesh, P()))
        )
        put = lambda a: jax.device_put(np.ascontiguousarray(a), shard)

    def dispatch_chunk(chunk: np.ndarray):
        n = chunk.shape[0]
        if n < batch_size:
            chunk = np.pad(chunk, ((0, batch_size - n), (0, 0), (0, 0), (0, 0)))
        placed = put(np.asarray(chunk))
        if resize:
            pixels = preprocess(placed, preprocess_cfg)
        else:
            pixels = normalize_only(placed, preprocess_cfg)
        return model.encode_image(pixels), n  # async dispatch, no fetch

    if isinstance(tiles, np.ndarray):
        chunks: Iterator[np.ndarray] = (
            tiles[i : i + batch_size] for i in range(0, len(tiles), batch_size)
        )
    else:
        # re-chunk user-supplied iterables: an oversize chunk would dispatch
        # at its raw size (fresh compile per shape; a crash under mesh
        # sharding when the size doesn't divide the 'dp' axis)
        def rechunk(it):
            for c in it:
                c = np.asarray(c)
                for i in range(0, len(c), batch_size):
                    yield c[i : i + batch_size]

        chunks = rechunk(tiles)

    # Double-buffered: keep one batch in flight so batch N's fetch (and batch
    # N+1's host-side pad/upload) overlap batch N's device compute — the same
    # pipelining the serving dispatcher measured at +11% (docs/PERF.md); the
    # eager per-chunk np.asarray serialized upload → compute → download.
    from collections import deque

    if pipeline_depth < 1:
        raise ValueError(f"pipeline_depth must be >= 1, got {pipeline_depth}")
    pending: deque = deque()
    outs: list[np.ndarray] = []
    for c in chunks:
        pending.append(dispatch_chunk(c))
        if len(pending) > pipeline_depth:
            feats, n = pending.popleft()
            outs.append(np.asarray(feats)[:n])
    while pending:
        feats, n = pending.popleft()
        outs.append(np.asarray(feats)[:n])
    if not outs:  # empty iterable (e.g. a slide with no tissue tiles):
        # keep the feature width so downstream cohort math still shapes up
        dim = getattr(getattr(model, "cfg", None), "projection_dim", 0)
        return np.zeros((0, dim), np.float32)
    return np.concatenate(outs, axis=0)


def extract_wsi_to_h5(
    model,
    slide_path: str,
    out_path: str,
    patch_size: int = 256,
    tissue_fraction: float = 0.25,
    level: int = 0,
    batch_size: int = 256,
    **kw,
) -> int:
    """Pyramidal slide (.svs / .tif) → CLAM-style h5, streaming: tissue
    tiles are read level-by-level through the native libtiff reader
    (keep_tpu.io.wsi — no OpenSlide) and encoded in compiled fixed-shape
    batches without ever materializing the slide in RAM. Returns the tile
    count. Coords are (x, y) at ``level`` (level 0 = CLAM convention)."""
    import h5py

    from keep_tpu.io.tiles import iter_wsi_tiles

    coords_acc: list[np.ndarray] = []

    def tile_chunks():
        for tiles, coords in iter_wsi_tiles(
            slide_path, patch_size=patch_size,
            tissue_fraction=tissue_fraction, chunk=batch_size, level=level,
        ):
            coords_acc.append(coords)
            yield tiles

    features = extract_features(model, tile_chunks(), batch_size=batch_size,
                                **kw)
    coords = (np.concatenate(coords_acc) if coords_acc
              else np.zeros((0, 2), np.int64))
    with h5py.File(out_path, "w") as f:
        f.create_dataset("features", data=features)
        f.create_dataset("coords", data=coords)
    return len(coords)


def extract_to_h5(
    model,
    tiles: np.ndarray,
    coords: np.ndarray,
    out_path: str,
    batch_size: int = 256,
    **kw,
) -> None:
    """Write the CLAM-style h5 (features + coords) the WSI pipelines consume."""
    import h5py

    features = extract_features(model, tiles, batch_size=batch_size, **kw)
    with h5py.File(out_path, "w") as f:
        f.create_dataset("features", data=features)
        f.create_dataset("coords", data=np.asarray(coords))
