"""AOT export (``compat/aot``) — the reference's ``trace_model``
(model/model.py:547-560) rebuilt as ``jax.export`` StableHLO artifacts.

Checks: serialize → deserialize → call matches the live function, the
symbolic batch dimension serves multiple batch sizes from ONE artifact
(beyond torch.jit.trace), the Pallas path exports fixed batch buckets with
pad-and-slice dispatch, baked-params artifacts are self-contained, and the
save/load directory layout round-trips.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.compat.aot import export_encoders, load_aot, save_aot
from keep_tpu.models import keep
from tests.test_keep_api import TINY as _TINY

TINY = dataclasses.replace(_TINY, max_text_length=32)


@pytest.fixture(scope="module")
def params():
    return keep.init(jax.random.PRNGKey(0), TINY)


def _data(batch, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    v = TINY.vision
    pixels = rng.standard_normal((batch, v.img_size, v.img_size, 3)).astype(
        np.float32)
    ids = rng.integers(1, TINY.text.vocab_size,
                       (batch, TINY.max_text_length)).astype(np.int32)
    mask = np.ones((batch, TINY.max_text_length), np.int32)
    mask[:, TINY.max_text_length // 2:] = 0
    return pixels, ids, mask


def test_roundtrip_params_as_inputs(params, tmp_path):
    save_aot(str(tmp_path), params, TINY, dtype=jnp.float32)
    aot = load_aot(str(tmp_path))
    assert aot.manifest["bake_params"] is False
    assert aot.manifest["buckets"] == ["sym"]
    for batch in (2, 5):  # one artifact, symbolic batch dim
        pixels, ids, mask = _data(batch)
        img = aot.encode_image(params, pixels)
        txt = aot.encode_text(params, ids, mask)
        ref_img = keep.encode_image(params, pixels, TINY)
        ref_txt = keep.encode_text(params, ids, mask, cfg=TINY)
        np.testing.assert_allclose(img, ref_img, atol=1e-6)
        np.testing.assert_allclose(txt, ref_txt, atol=1e-6)


def test_flash_requires_buckets(params):
    with pytest.raises(ValueError, match="batch_sizes"):
        export_encoders(params, TINY, use_flash=True)


def test_bucketed_flash_export_pads_and_slices(params, tmp_path):
    # the Pallas-kernel path: fixed buckets, pad to the smallest covering
    # bucket, slice back (serve.py's warmup-bucket strategy as artifacts)
    save_aot(str(tmp_path), params, TINY, dtype=jnp.float32, use_flash=True,
             batch_sizes=(2, 4))
    aot = load_aot(str(tmp_path))
    assert aot.manifest["buckets"] == ["2", "4"]
    for batch in (1, 2, 3, 4):  # 1→bucket 2, 3→bucket 4
        pixels, ids, mask = _data(batch)
        img = aot.encode_image(params, pixels)
        assert img.shape[0] == batch
        ref = keep.encode_image(params, pixels, TINY, use_flash=True)
        np.testing.assert_allclose(img, ref, atol=1e-5)
        txt = aot.encode_text(params, ids, mask)
        ref_t = keep.encode_text(params, ids, mask, cfg=TINY, use_flash=True)
        np.testing.assert_allclose(txt, ref_t, atol=1e-5)
    with pytest.raises(ValueError, match="exceeds"):
        aot.encode_image(params, _data(5)[0])


def test_baked_params_is_self_contained(params, tmp_path):
    save_aot(str(tmp_path), params, TINY, dtype=jnp.float32, bake_params=True)
    aot = load_aot(str(tmp_path))
    assert aot.manifest["bake_params"] is True
    pixels, ids, mask = _data(3)
    # no params argument: the trace_model-style frozen artifact
    np.testing.assert_allclose(
        aot.encode_image(pixels),
        keep.encode_image(params, pixels, TINY), atol=1e-6)
    np.testing.assert_allclose(
        aot.encode_text(ids, mask),
        keep.encode_text(params, ids, mask, cfg=TINY), atol=1e-6)
    # baked artifact on disk actually contains the weights (is bigger than
    # the params-as-inputs export of the same program)
    arts_lean = export_encoders(params, TINY, dtype=jnp.float32)
    baked = (tmp_path / "encode_image.sym.stablehlo").stat().st_size
    assert baked > len(arts_lean["encode_image"]["sym"])


def test_manifest_records_contract(params, tmp_path):
    save_aot(str(tmp_path), params, TINY, dtype=jnp.bfloat16)
    m = load_aot(str(tmp_path)).manifest
    assert m["img_size"] == TINY.vision.img_size
    assert m["max_text_length"] == TINY.max_text_length
    assert m["dtype"] == "bfloat16"
    assert m["platforms"] == [jax.default_backend()]


def test_int8_production_config_exports(params, tmp_path):
    """The shipped serving precision (quantized params + fused kernels) also
    exports as bucketed artifacts — the AOT story covers the production
    config, not just the parity path."""
    from keep_tpu.models.vit import fold_layerscale
    from keep_tpu.quant import quantize_linear_weights

    qp = dict(params)
    qp["visual"] = fold_layerscale(params["visual"])
    qp = quantize_linear_weights(qp)
    save_aot(str(tmp_path), qp, TINY, dtype=jnp.bfloat16, use_flash=True,
             gelu_approx=True, batch_sizes=(2,))
    aot = load_aot(str(tmp_path))
    pixels, ids, mask = _data(2)
    img = np.asarray(aot.encode_image(qp, pixels), np.float32)
    ref = np.asarray(keep.encode_image(
        qp, pixels, TINY, dtype=jnp.bfloat16, use_flash=True,
        gelu_approx=True), np.float32)
    np.testing.assert_allclose(img, ref, atol=2e-2)  # bf16 reorder noise
    cos = float(np.mean(np.sum(img * ref, 1)))
    assert cos > 0.999
