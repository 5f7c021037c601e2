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
) -> np.ndarray:
    """uint8 tiles [N, S, S, 3] (or an iterable of such chunks) → [N, D]
    features. One compiled shape serves all batches (tail padded).

    ``mesh``: shard the tile axis over the mesh's 'dp' axis (params
    replicated) — the pod-scale path for the 20K-patches/s north-star
    workload itself; batch_size is rounded up to a multiple of the mesh."""
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

    def encode_chunk(chunk: np.ndarray) -> np.ndarray:
        n = chunk.shape[0]
        if n < batch_size:
            chunk = np.pad(chunk, ((0, batch_size - n), (0, 0), (0, 0), (0, 0)))
        placed = put(np.asarray(chunk))
        if resize:
            pixels = preprocess(placed, preprocess_cfg)
        else:
            pixels = normalize_only(placed, preprocess_cfg)
        return np.asarray(model.encode_image(pixels))[:n]

    if isinstance(tiles, np.ndarray):
        chunks: Iterator[np.ndarray] = (
            tiles[i : i + batch_size] for i in range(0, len(tiles), batch_size)
        )
    else:
        chunks = iter(tiles)
    return np.concatenate([encode_chunk(c) for c in chunks], axis=0)


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
