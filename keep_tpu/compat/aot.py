"""Ahead-of-time export of the inference entry points via ``jax.export``.

The reference offers ``trace_model`` — a ``torch.jit.trace`` of the fused
forward for deployment (reference model/model.py:547-560, ``--trace`` flag).
The TPU-native analog is StableHLO serialization: ``jax.export`` lowers the
jitted function once, records the calling convention, and produces a
self-describing artifact that any later process (or a C++ PJRT runtime)
can deserialize and run WITHOUT re-tracing Python.

Deliberate improvements over ``torch.jit.trace``:

- **Symbolic batch dimension** (XLA path): torch traces fix every shape;
  these exports use ``jax.export.symbolic_shape`` so one artifact serves
  every batch size.
- **Batch buckets** (Pallas path): the fused TPU kernels need concrete
  block shapes (shape polymorphism does not reach Pallas BlockSpecs), so
  ``use_flash=True`` exports one artifact per requested batch bucket and
  the loader pads/slices to the smallest covering bucket — exactly the
  fixed-bucket strategy ``serve.py`` compiles at warmup.
- **Weights stay in the checkpoint.** By default params are *inputs* to the
  exported program (the artifact is StableHLO only; weights ship via the
  existing safetensors/``pytorch_model.bin`` files). ``bake_params=True``
  reproduces the torch.jit behavior (constants folded in) for a fully
  self-contained file.

Artifacts are tied to the lowering platform(s): export on the deployment
backend (or pass ``platforms=("tpu",)`` etc.; cross-platform lowering is a
first-class ``jax.export`` feature).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from keep_tpu.configs import KEEPConfig

_MANIFEST = "aot_manifest.json"
_SYM = "sym"


def _specs_like(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), tree
    )


def export_fn(
    fn: Callable,
    *arg_specs,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``jit(fn)`` lowered at ``arg_specs`` to portable bytes.

    ``arg_specs`` are ``jax.ShapeDtypeStruct`` pytrees (symbolic dims allowed)
    or concrete example arrays.
    """
    exported = jax_export.export(jax.jit(fn), platforms=platforms)(*arg_specs)
    return exported.serialize()


def load_fn(blob: bytes) -> Callable:
    """Deserialize an ``export_fn`` artifact back to a callable."""
    return jax_export.deserialize(blob).call


def export_encoders(
    params: dict,
    cfg: KEEPConfig,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    use_flash: bool = False,
    gelu_approx: bool = False,
    bake_params: bool = False,
    batch_sizes: Optional[Sequence[int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Export ``encode_image`` and ``encode_text`` as StableHLO artifacts.

    Returns ``{"encode_image": {key: bytes}, "encode_text": {...},
    "manifest": dict}`` where ``key`` is ``"sym"`` (symbolic batch — one
    artifact, every batch size) or a concrete bucket size. The text
    sequence length is fixed at ``cfg.max_text_length`` (the tokenizer
    contract, reference keep_inference.py:99).

    ``use_flash=True`` (the Pallas-kernel path) requires ``batch_sizes``:
    Pallas block shapes must be concrete, so each bucket is its own export.
    """
    from keep_tpu.models import keep

    if use_flash and not batch_sizes:
        raise ValueError(
            "use_flash exports need concrete shapes (Pallas BlockSpecs are "
            "not shape-polymorphic) — pass batch_sizes=(1, 8, 32, ...) for "
            "bucketed artifacts, or export with use_flash=False for one "
            "symbolic-batch XLA artifact"
        )

    kw = dict(dtype=dtype, use_flash=use_flash, gelu_approx=gelu_approx)
    v = cfg.vision
    seq = cfg.max_text_length

    if bake_params:
        img_fn = lambda px: keep.encode_image(params, px, cfg, **kw)
        txt_fn = lambda i, m: keep.encode_text(params, i, m, cfg=cfg, **kw)
        extra = ()
    else:
        img_fn = lambda p, px: keep.encode_image(p, px, cfg, **kw)
        txt_fn = lambda p, i, m: keep.encode_text(p, i, m, cfg=cfg, **kw)
        extra = (_specs_like(params),)

    if batch_sizes:
        keys_dims = [(str(int(b)), int(b)) for b in sorted(set(batch_sizes))]
    else:
        keys_dims = [(_SYM, jax_export.symbolic_shape("b")[0])]

    img_blobs, txt_blobs = {}, {}
    for key, b in keys_dims:
        pix = jax.ShapeDtypeStruct((b, v.img_size, v.img_size, 3), jnp.float32)
        ids = jax.ShapeDtypeStruct((b, seq), jnp.int32)
        msk = jax.ShapeDtypeStruct((b, seq), jnp.int32)
        img_blobs[key] = export_fn(img_fn, *extra, pix, platforms=platforms)
        txt_blobs[key] = export_fn(txt_fn, *extra, ids, msk,
                                   platforms=platforms)

    manifest = {
        "format": "jax.export/stablehlo",
        "bake_params": bake_params,
        "dtype": jnp.dtype(dtype).name,
        "use_flash": use_flash,
        "gelu_approx": gelu_approx,
        "buckets": [k for k, _ in keys_dims],
        "img_size": v.img_size,
        "max_text_length": seq,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
    }
    return {"encode_image": img_blobs, "encode_text": txt_blobs,
            "manifest": manifest}


def save_aot(model_dir: str, params: dict, cfg: KEEPConfig, **kwargs) -> None:
    """Write ``encode_{image,text}.<bucket>.stablehlo`` +
    ``aot_manifest.json`` into ``model_dir`` (alongside the weight files —
    ``compat/export.save_pretrained`` writes those)."""
    arts = export_encoders(params, cfg, **kwargs)
    os.makedirs(model_dir, exist_ok=True)
    for name in ("encode_image", "encode_text"):
        for key, blob in arts[name].items():
            path = os.path.join(model_dir, f"{name}.{key}.stablehlo")
            with open(path, "wb") as f:
                f.write(blob)
    with open(os.path.join(model_dir, _MANIFEST), "w") as f:
        json.dump(arts["manifest"], f, indent=1)


def _pad_rows(x, to: int):
    n = x.shape[0]
    if n == to:
        return x
    pad = np.zeros((to - n,) + tuple(x.shape[1:]), np.asarray(x).dtype)
    return jnp.concatenate([jnp.asarray(x), jnp.asarray(pad)], 0)


class AOTModel:
    """Deserialized AOT bundle: ``encode_image(...)`` / ``encode_text(...)``.

    With ``bake_params=False`` (default export) pass the params pytree as
    the first argument, exactly as the pure functions take it; with baked
    params, pass only data. Bucketed bundles pad each call to the smallest
    covering bucket and slice the result back (padding rows are masked out
    of nothing — each row's encode is independent); batches larger than the
    biggest bucket raise.
    """

    def __init__(self, model_dir: str):
        with open(os.path.join(model_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self._fns = {}
        for name in ("encode_image", "encode_text"):
            self._fns[name] = {}
            for key in self.manifest["buckets"]:
                path = os.path.join(model_dir, f"{name}.{key}.stablehlo")
                with open(path, "rb") as f:
                    self._fns[name][key] = load_fn(f.read())

    def _dispatch(self, name: str, params, data_args):
        fns = self._fns[name]
        prefix = () if self.manifest["bake_params"] else (params,)
        if _SYM in fns:
            return fns[_SYM](*prefix, *data_args)
        n = data_args[0].shape[0]
        buckets = sorted(int(k) for k in fns)
        fit = next((b for b in buckets if b >= n), None)
        if fit is None:
            raise ValueError(
                f"batch {n} exceeds the largest exported bucket {buckets[-1]}"
            )
        out = fns[str(fit)](*prefix, *(_pad_rows(a, fit) for a in data_args))
        return out[:n]

    def encode_image(self, *args):
        if self.manifest["bake_params"]:
            return self._dispatch("encode_image", None, (args[0],))
        return self._dispatch("encode_image", args[0], (args[1],))

    def encode_text(self, *args):
        if self.manifest["bake_params"]:
            return self._dispatch("encode_text", None, args)
        return self._dispatch("encode_text", args[0], args[1:])


def load_aot(model_dir: str) -> AOTModel:
    return AOTModel(model_dir)
