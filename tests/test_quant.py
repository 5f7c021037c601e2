"""int8 quantized inference path: accuracy vs fp32 + pipeline integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from keep_tpu.configs import ViTConfig
from keep_tpu.models import vit
from keep_tpu.ops.nn import linear
from keep_tpu.quant import (

    quantization_error,
    quantize_kernel,
    quantize_linear_weights,
)

pytestmark = pytest.mark.slow  # oracle/parity tests; fast pass: -m 'not slow'


def test_qlinear_accuracy(rng):
    x = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    p = {
        "kernel": jnp.asarray(rng.standard_normal((128, 96), dtype=np.float32) * 0.05),
        "bias": jnp.asarray(rng.standard_normal(96, dtype=np.float32) * 0.01),
    }
    ref = np.asarray(linear(p, x))
    qp = {**quantize_kernel(p["kernel"]), "bias": p["bias"]}
    got = np.asarray(linear(qp, x))
    # W8A8 error bound: ~1% relative on random gaussians
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.02
    cos = np.sum(got * ref) / (np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.9995


def test_quantize_pytree_structure(rng):
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=4)
    params = vit.init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_linear_weights(params)
    blocks = qparams["blocks"]
    assert blocks["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert blocks["attn"]["qkv"]["scale"].shape == (2, 3 * 64)
    assert blocks["mlp"]["fc1"]["kernel_q"].shape == (2, 64, 256)  # ratio 4.0
    assert qparams["patch_embed"]["kernel_q"].dtype == jnp.int8
    # non-targets untouched
    assert "kernel_q" not in str(type(qparams["norm"]))
    assert (np.asarray(qparams["cls_token"]) == np.asarray(params["cls_token"])).all()
    errs = quantization_error(params, qparams)
    assert errs and max(errs.values()) < 0.01


def test_quantize_is_path_aware(rng):
    """Name matching must not leak outside its policy: the vit_relpos
    rel-pos bias MLP (a K=2 coordinate network) and projection HEADS named
    'proj' (CoCa text / EVA trunk) stay high-precision; the attention
    output proj (parent 'attn') still quantizes."""
    from keep_tpu.models import vit_relpos as vrp

    cfg = vrp.ViTRelPosConfig(img_size=32, patch_size=8, embed_dim=64,
                              depth=2, num_heads=4, rel_pos_hidden=16)
    qp = quantize_linear_weights(vrp.init(jax.random.PRNGKey(0), cfg))
    rel = qp["blocks"]["attn"]["rel_pos"]
    assert "kernel" in rel["fc1"] and "kernel_q" not in rel["fc1"]
    assert "kernel" in rel["fc2"] and "kernel_q" not in rel["fc2"]
    assert qp["blocks"]["attn"]["qkv"]["kernel_q"].dtype == jnp.int8
    assert qp["blocks"]["attn"]["proj"]["kernel_q"].dtype == jnp.int8

    lin = lambda i, o: {"kernel": rng.standard_normal((i, o)).astype(np.float32),
                        "bias": np.zeros(o, np.float32)}
    tree = {"attn": {"proj": lin(8, 8)}, "proj": lin(8, 4)}  # head named proj
    q = quantize_linear_weights(tree)
    assert q["attn"]["proj"]["kernel_q"].dtype == jnp.int8
    assert "kernel_q" not in q["proj"] and "kernel" in q["proj"]


def test_vit_int8_close_to_fp32(rng):
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=4, num_heads=4)
    params = vit.init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(vit.forward(params, x, cfg))
    got = np.asarray(vit.forward(quantize_linear_weights(params), x, cfg))
    cos = np.mean(
        np.sum(got * ref, axis=1)
        / (np.linalg.norm(got, axis=1) * np.linalg.norm(ref, axis=1))
    )
    assert cos > 0.995, cos


def test_int8_keep_encode(rng):
    from keep_tpu.models import keep
    from tests.test_keep_api import TINY

    params = keep.init(jax.random.PRNGKey(0), TINY)
    qparams = quantize_linear_weights(params)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    a = np.asarray(keep.encode_image(params, x, TINY))
    b = np.asarray(keep.encode_image(qparams, x, TINY))
    cos = np.mean(np.sum(a * b, axis=1))  # both unit-norm
    assert cos > 0.99, cos
    ids = jnp.asarray(rng.integers(1, TINY.text.vocab_size, (2, 16)))
    ta = np.asarray(keep.encode_text(params, ids, cfg=TINY))
    tb = np.asarray(keep.encode_text(qparams, ids, cfg=TINY))
    assert np.mean(np.sum(ta * tb, axis=1)) > 0.99


def test_fused_qmatmul_matches_xla_qlinear(rng):
    """The fused Pallas kernel (interpret mode on CPU) == the XLA W8A8 path."""
    import jax.numpy as jnp

    from keep_tpu.kernels.qmatmul import quantized_matmul
    from keep_tpu.quant import quantize_kernel

    x = rng.standard_normal((70, 128)).astype(np.float32)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.05
    bias = rng.standard_normal(64).astype(np.float32) * 0.01
    q = quantize_kernel(jnp.asarray(w))
    ref = np.asarray(linear({**q, "bias": jnp.asarray(bias)}, jnp.asarray(x)))
    got = np.asarray(quantized_matmul(
        jnp.asarray(x), q["kernel_q"], q["scale"], jnp.asarray(bias),
        out_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    # fused gelu epilogue vs post-hoc tanh gelu
    got_g = np.asarray(quantized_matmul(
        jnp.asarray(x), q["kernel_q"], q["scale"], jnp.asarray(bias),
        activation="gelu_tanh", out_dtype=jnp.float32))
    ref_g = np.asarray(jax.nn.gelu(jnp.asarray(ref), approximate=True))
    np.testing.assert_allclose(got_g, ref_g, atol=1e-4, rtol=1e-3)


def test_fused_qmlp_matches_emulation(rng):
    """The fused int8 MLP-pair kernel (interpret mode on CPU) == the same
    math computed step-by-step in fp32 numpy, and stays close to the fp32
    MLP."""
    from keep_tpu.kernels.qmlp import quantized_mlp
    from keep_tpu.ops.nn import mlp
    from keep_tpu.quant import quantize_kernel

    d, f = 128, 256
    x = (rng.standard_normal((70, d)) * 0.5).astype(np.float32)
    w1 = (rng.standard_normal((d, f)) * 0.05).astype(np.float32)
    b1 = (rng.standard_normal(f) * 0.01).astype(np.float32)
    w2 = (rng.standard_normal((f, d)) * 0.05).astype(np.float32)
    b2 = (rng.standard_normal(d) * 0.01).astype(np.float32)
    q1 = quantize_kernel(jnp.asarray(w1))
    q2 = quantize_kernel(jnp.asarray(w2))

    got = np.asarray(quantized_mlp(
        jnp.asarray(x),
        q1["kernel_q"], q1["scale"], jnp.asarray(b1),
        q2["kernel_q"], q2["scale"], jnp.asarray(b2),
        out_dtype=jnp.float32,
    ))

    def quant_rows(a):
        s = np.maximum(np.abs(a).max(axis=1, keepdims=True), 1e-8) / 127.0
        return np.clip(np.round(a / s), -127, 127).astype(np.int8), s

    def gelu_tanh(v):
        c = 0.7978845608028654
        return 0.5 * v * (1.0 + np.tanh(c * (v + 0.044715 * v**3)))

    xq, a1 = quant_rows(x)
    h = xq.astype(np.int32) @ np.asarray(q1["kernel_q"], np.int32)
    h = h.astype(np.float32) * (a1 * np.asarray(q1["scale"])[None, :]) + b1
    h = gelu_tanh(h)
    hq, a2 = quant_rows(h)
    ref = hq.astype(np.int32) @ np.asarray(q2["kernel_q"], np.int32)
    ref = ref.astype(np.float32) * (a2 * np.asarray(q2["scale"])[None, :]) + b2
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    # end-to-end accuracy vs the fp32 MLP
    full = np.asarray(mlp(
        {"fc1": {"kernel": jnp.asarray(w1), "bias": jnp.asarray(b1)},
         "fc2": {"kernel": jnp.asarray(w2), "bias": jnp.asarray(b2)}},
        jnp.asarray(x), gelu_approx=True,
    ))
    cos = np.sum(got * full) / (np.linalg.norm(got) * np.linalg.norm(full))
    assert cos > 0.999, cos


def test_bsd_kernels_match_flat(rng):
    """[B, S, D] batch-gridded kernels == flattened [B*S, D] kernels (they
    avoid the S=197 relayout in-model but must compute the same thing)."""
    from keep_tpu.kernels.qmatmul import quantized_matmul, quantized_matmul_bsd
    from keep_tpu.kernels.qmlp import quantized_mlp, quantized_mlp_bsd
    from keep_tpu.quant import quantize_kernel

    b, s, d, f = 3, 37, 64, 128
    x = jnp.asarray((rng.standard_normal((b, s, d)) * 0.5).astype(np.float32))
    q1 = quantize_kernel(jnp.asarray((rng.standard_normal((d, f)) * 0.05
                                      ).astype(np.float32)))
    b1 = jnp.asarray((rng.standard_normal(f) * 0.01).astype(np.float32))
    q2 = quantize_kernel(jnp.asarray((rng.standard_normal((f, d)) * 0.05
                                      ).astype(np.float32)))
    b2 = jnp.asarray((rng.standard_normal(d) * 0.01).astype(np.float32))

    flat = np.asarray(quantized_matmul(
        x.reshape(-1, d), q1["kernel_q"], q1["scale"], b1,
        activation="gelu_tanh", out_dtype=jnp.float32)).reshape(b, s, f)
    bsd = np.asarray(quantized_matmul_bsd(
        x, q1["kernel_q"], q1["scale"], b1,
        activation="gelu_tanh", out_dtype=jnp.float32))
    np.testing.assert_allclose(bsd, flat, atol=2e-4, rtol=1e-4)

    flat_mlp = np.asarray(quantized_mlp(
        x.reshape(-1, d), q1["kernel_q"], q1["scale"], b1,
        q2["kernel_q"], q2["scale"], b2, out_dtype=jnp.float32)).reshape(b, s, d)
    bsd_mlp = np.asarray(quantized_mlp_bsd(
        x, q1["kernel_q"], q1["scale"], b1,
        q2["kernel_q"], q2["scale"], b2, out_dtype=jnp.float32))
    np.testing.assert_allclose(bsd_mlp, flat_mlp, atol=2e-4, rtol=1e-4)


def test_quantized_megakernel_block_matches_composition(rng):
    """The fused LN→int8 qkv→MHA→int8 proj→residual megakernel and the
    LN+residual-fused MLP pair == the op-by-op composition (interpret mode)."""
    from keep_tpu.kernels.qblock import quantized_attention_block
    from keep_tpu.kernels.qmlp import quantized_mlp_bsd
    from keep_tpu.ops.nn import layer_norm, mha_attention
    from keep_tpu.quant import quantize_kernel

    b, s, d, heads, eps = 2, 37, 64, 4, 1e-6
    x = jnp.asarray((rng.standard_normal((b, s, d)) * 0.3).astype(np.float32))
    norm1 = {"scale": jnp.asarray(1 + 0.1 * rng.standard_normal(d).astype(np.float32)),
             "bias": jnp.asarray(0.05 * rng.standard_normal(d).astype(np.float32))}
    qkv_p = {**quantize_kernel(jnp.asarray(
        (rng.standard_normal((d, 3 * d)) * 0.08).astype(np.float32))),
        "bias": jnp.asarray((rng.standard_normal(3 * d) * 0.01).astype(np.float32))}
    proj_p = {**quantize_kernel(jnp.asarray(
        (rng.standard_normal((d, d)) * 0.08).astype(np.float32))),
        "bias": jnp.asarray((rng.standard_normal(d) * 0.01).astype(np.float32))}

    got = np.asarray(quantized_attention_block(
        x, norm1, qkv_p, proj_p, num_heads=heads, eps=eps))

    # composition with the same quantization points
    def qlin(p, v):
        vf = np.asarray(v, np.float32)
        a = np.maximum(np.abs(vf).max(-1, keepdims=True), 1e-8) / 127.0
        vq = np.clip(np.round(vf / a), -127, 127).astype(np.int32)
        acc = vq @ np.asarray(p["kernel_q"], np.int32)
        return acc.astype(np.float32) * (a * np.asarray(p["scale"])[None, :]) \
            + np.asarray(p["bias"])

    y = np.asarray(layer_norm(norm1, x, eps))
    slab = np.stack([qlin(qkv_p, y[i]) for i in range(b)]).astype(np.float32)
    slab = jnp.asarray(slab).astype(jnp.bfloat16)
    dh = d // heads
    qh = slab[..., :d].reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    kh = slab[..., d:2 * d].reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    vh = slab[..., 2 * d:].reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
    attn = mha_attention(qh, kh, vh)
    attn = np.asarray(attn.transpose(0, 2, 1, 3).reshape(b, s, d), np.float32)
    ref = np.asarray(x) + np.stack([qlin(proj_p, attn[i]) for i in range(b)])
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-3)

    # MLP with fused LN + residual vs composition
    f = 2 * d
    fc1 = {**quantize_kernel(jnp.asarray(
        (rng.standard_normal((d, f)) * 0.08).astype(np.float32))),
        "bias": jnp.zeros((f,), jnp.float32)}
    fc2 = {**quantize_kernel(jnp.asarray(
        (rng.standard_normal((f, d)) * 0.08).astype(np.float32))),
        "bias": jnp.zeros((d,), jnp.float32)}
    norm2 = norm1
    got2 = np.asarray(quantized_mlp_bsd(
        x, fc1["kernel_q"], fc1["scale"], fc1["bias"],
        fc2["kernel_q"], fc2["scale"], fc2["bias"], out_dtype=jnp.float32,
        ln_scale=norm2["scale"], ln_bias=norm2["bias"], eps=eps,
        residual=True))
    from keep_tpu.kernels.qmlp import quantized_mlp

    y2 = np.asarray(layer_norm(norm2, x, eps))
    ref2 = np.asarray(quantized_mlp(
        jnp.asarray(y2.reshape(-1, d)),
        fc1["kernel_q"], fc1["scale"], fc1["bias"],
        fc2["kernel_q"], fc2["scale"], fc2["bias"],
        out_dtype=jnp.float32)).reshape(b, s, d) + np.asarray(x)
    np.testing.assert_allclose(got2, ref2, atol=1e-3, rtol=1e-3)


def test_vit_megakernel_path_matches_unfused(rng):
    """Full quantized+folded ViT forward: the megakernel path (use_flash) ==
    the unfused quantized path (use_flash=False) on the same weights."""
    from keep_tpu.models import vit as vitm

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4)
    params = vitm.fold_layerscale(vit.init(jax.random.PRNGKey(3), cfg))
    qp = quantize_linear_weights(params)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    mega = np.asarray(vit.forward(qp, x, cfg, use_flash=True, gelu_approx=True))
    ref = np.asarray(vit.forward(qp, x, cfg, use_flash=False, gelu_approx=True))
    np.testing.assert_allclose(mega, ref, atol=2e-2, rtol=2e-2)
    cos = np.mean(np.sum(mega * ref, 1) / (np.linalg.norm(mega, axis=1)
                                           * np.linalg.norm(ref, axis=1)))
    assert cos > 0.9999, cos


def test_bert_megakernel_path_matches_unfused(rng):
    """Quantized BERT forward: the post-LN megakernel path (use_flash) ==
    the unfused quantized path (use_flash=False), padding mask respected."""
    from keep_tpu.configs import BertConfig
    from keep_tpu.models import bert

    cfg = BertConfig(vocab_size=64, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64)
    params = bert.init(jax.random.PRNGKey(5), cfg)
    qp = quantize_linear_weights(params)
    ids = jnp.asarray(rng.integers(1, 64, size=(3, 16)))
    mask = np.ones((3, 16), np.int32)
    mask[0, 10:] = 0  # padded row exercises the in-kernel key mask
    mask = jnp.asarray(mask)
    mega = bert.forward(qp, ids, mask, cfg=cfg, use_flash=True,
                        gelu_approx=True)
    ref = bert.forward(qp, ids, mask, cfg=cfg, use_flash=False,
                       gelu_approx=True)
    for k in ("last_hidden_state", "pooler_output"):
        a, b = np.asarray(mega[k]), np.asarray(ref[k])
        np.testing.assert_allclose(a, b, atol=2e-2, rtol=2e-2)
        cos = float((a.ravel() @ b.ravel())
                    / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.9999, (k, cos)


def test_bert_megakernel_mask_changes_padded_rows(rng):
    """The fused path actually honors the padding mask (masking a key
    position must change other positions' outputs)."""
    from keep_tpu.configs import BertConfig
    from keep_tpu.models import bert

    cfg = BertConfig(vocab_size=64, hidden_size=64, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64)
    qp = quantize_linear_weights(bert.init(jax.random.PRNGKey(6), cfg))
    ids = jnp.asarray(rng.integers(1, 64, size=(1, 12)))
    full = np.asarray(bert.forward(qp, ids, jnp.ones((1, 12), jnp.int32),
                                   cfg=cfg, use_flash=True,
                                   gelu_approx=True)["last_hidden_state"])
    m = np.ones((1, 12), np.int32)
    m[0, 6:] = 0
    part = np.asarray(bert.forward(qp, ids, jnp.asarray(m), cfg=cfg,
                                   use_flash=True,
                                   gelu_approx=True)["last_hidden_state"])
    assert np.abs(full[0, :6] - part[0, :6]).max() > 1e-4


def test_qmlp_post_ln_matches_emulation(rng):
    """quantized_mlp_bsd(post_ln=True) == LN(x + int8-mlp(x)) composed from
    the flat kernels."""
    from keep_tpu.kernels.qmlp import quantized_mlp, quantized_mlp_bsd
    from keep_tpu.ops.nn import layer_norm

    d, f = 64, 128
    x = jnp.asarray(rng.standard_normal((2, 16, d), dtype=np.float32))
    w1 = quantize_kernel(jnp.asarray(
        rng.standard_normal((d, f), dtype=np.float32) * 0.05))
    w2 = quantize_kernel(jnp.asarray(
        rng.standard_normal((f, d), dtype=np.float32) * 0.05))
    b1 = jnp.asarray(rng.standard_normal(f, dtype=np.float32) * 0.01)
    b2 = jnp.asarray(rng.standard_normal(d, dtype=np.float32) * 0.01)
    ln = {"scale": jnp.asarray(rng.standard_normal(d, dtype=np.float32) * 0.1 + 1.0),
          "bias": jnp.asarray(rng.standard_normal(d, dtype=np.float32) * 0.05)}
    got = quantized_mlp_bsd(
        x, w1["kernel_q"], w1["scale"], b1, w2["kernel_q"], w2["scale"], b2,
        out_dtype=jnp.float32, ln_scale=ln["scale"], ln_bias=ln["bias"],
        eps=1e-12, post_ln=True,
    )
    inner = quantized_mlp(
        x.reshape(-1, d), w1["kernel_q"], w1["scale"], b1,
        w2["kernel_q"], w2["scale"], b2, out_dtype=jnp.float32,
    ).reshape(x.shape)
    ref = layer_norm(ln, x + inner, 1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_partial_quantization_skips_megakernels(rng):
    """Quantizing only a subset of the dense kernels (e.g. fc1 without fc2)
    must fall back to the generic dispatch, not crash the megakernel path."""
    from keep_tpu.configs import BertConfig
    from keep_tpu.models import bert, vit as vitm

    cfg = ViTConfig(img_size=16, patch_size=8, embed_dim=32, depth=1,
                    num_heads=4)
    params = vitm.fold_layerscale(vit.init(jax.random.PRNGKey(7), cfg))
    qp = quantize_linear_weights(params, targets=("qkv", "proj", "fc1"))
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    out = vit.forward(qp, x, cfg, use_flash=True, gelu_approx=True)
    assert np.isfinite(np.asarray(out)).all()

    bcfg = BertConfig(vocab_size=32, hidden_size=32, num_hidden_layers=1,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=32)
    bqp = quantize_linear_weights(bert.init(jax.random.PRNGKey(8), bcfg),
                                  targets=("qkv", "fc1", "fc2"))
    ids = jnp.asarray(rng.integers(1, 32, size=(1, 8)))
    bout = bert.forward(bqp, ids, jnp.ones((1, 8), jnp.int32), cfg=bcfg,
                        use_flash=True, gelu_approx=True)
    assert np.isfinite(np.asarray(bout["pooler_output"])).all()


def _cos(a, b):
    return float(np.mean(
        np.sum(a * b, axis=1)
        / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))))


def _outlier_params(cfg, n_outlier=4, gain=80.0):
    """A ViT whose LN outputs carry a few huge channels — the transformer
    outlier pathology SmoothQuant targets — built EXACTLY equivalent to the
    base model: norm scale × g on those channels, the consuming kernel's
    input rows ÷ g."""
    params = vit.init(jax.random.PRNGKey(1), cfg)
    blocks = params["blocks"]
    ch = np.arange(n_outlier)
    for norm_name, mod, lin in (("norm1", "attn", "qkv"),
                                ("norm2", "mlp", "fc1")):
        sc = np.array(blocks[norm_name]["scale"], np.float32)
        bi = np.array(blocks[norm_name]["bias"], np.float32)
        k = np.array(blocks[mod][lin]["kernel"], np.float32)
        sc[:, ch] *= gain
        bi[:, ch] *= gain
        k[:, ch, :] /= gain
        blocks[norm_name]["scale"] = jnp.asarray(sc)
        blocks[norm_name]["bias"] = jnp.asarray(bi)
        blocks[mod][lin]["kernel"] = jnp.asarray(k)
    return params


def test_smooth_vit_fold_is_exact(rng):
    """Smoothing alone (no quantization) must not change the model."""
    from keep_tpu.quant import smooth_vit

    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=3,
                    num_heads=4, layerscale_init=None)
    params = _outlier_params(cfg)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3), dtype=np.float32))
    ref, stats = vit.forward(params, x, cfg, ln_stats=True)
    assert stats["qkv"].shape == (cfg.depth, cfg.embed_dim)
    sm = smooth_vit(params, stats)
    got = vit.forward(sm, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_smooth_quantize_recovers_outlier_accuracy(rng):
    """With outlier channels, plain W8A8 (dynamic per-token activation
    scales) degrades — the outliers eat the 8-bit range; smoothing migrates
    them into per-channel weight scales and recovers the cos."""
    from keep_tpu.quant import smooth_quantize_vit

    # LayerScale off: at init gamma=1e-5 makes the residual branches
    # near-no-ops, hiding any quantization error from the output
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=3,
                    num_heads=4, layerscale_init=None)
    params = _outlier_params(cfg)
    calib = jnp.asarray(rng.standard_normal((4, 32, 32, 3), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(vit.forward(params, x, cfg))
    naive = np.asarray(vit.forward(quantize_linear_weights(params), x, cfg))
    smoothq = np.asarray(
        vit.forward(smooth_quantize_vit(params, calib, cfg), x, cfg))
    cos_naive, cos_smooth = _cos(naive, ref), _cos(smoothq, ref)
    assert cos_naive < 0.99, cos_naive  # the pathology is real...
    assert cos_smooth > 0.999, cos_smooth  # ...and smoothing recovers it


def test_keep_model_quantize_with_calibration(rng):
    """KEEPModel.quantize(calib_pixels=...) smooths the visual tower before
    int8 — the API stays one call for the production path."""
    from keep_tpu.models import keep
    from tests.test_keep_api import TINY

    params = keep.init(jax.random.PRNGKey(0), TINY)
    model = keep.KEEPModel(params=params, cfg=TINY)
    calib = jnp.asarray(
        rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    qm = model.quantize(calib_pixels=calib)
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(model.encode_image(x))
    got = np.asarray(qm.encode_image(x))
    assert _cos(got, ref) > 0.995


def _outlier_bert(cfg, n_outlier=4, gain=60.0):
    """A BERT whose residual-stream LN scales carry a few huge channels —
    outliers at every block's qkv and fc1 inputs. NOT an equivalence
    transform (post-LN residuals forbid one; see quant.smooth_bert): both
    quantized variants are judged against the fp forward of THIS model."""
    from keep_tpu.models import bert

    params = bert.init(jax.random.PRNGKey(2), cfg)
    ch = np.arange(n_outlier)
    blocks = params["blocks"]

    # BERT init kernels (std 0.02) make sublayer outputs tiny next to the
    # residual stream, hiding any quantization error behind the exact
    # residual pass-through — scale them up so attn/mlp carry real signal
    for lin in (blocks["attn"]["qkv"], blocks["attn"]["out"],
                blocks["mlp"]["fc1"], blocks["mlp"]["fc2"]):
        lin["kernel"] = jnp.asarray(np.array(lin["kernel"], np.float32) * 10)

    def boost(norm):
        sc = np.array(norm["scale"], np.float32)
        sc[..., ch] *= gain
        norm["scale"] = jnp.asarray(sc)

    def shrink_rows(lin):
        # the consuming kernel divides the outlier rows back out, keeping
        # every dot output O(1) — so the per-token quantize's lost small
        # channels (step ≈ gain/127) actually show up as output error
        k = np.array(lin["kernel"], np.float32)
        k[:, ch, :] /= gain
        lin["kernel"] = jnp.asarray(k)

    boost(params["embeddings"]["norm"])      # layer-0 qkv input
    boost(blocks["attn"]["norm"])            # every layer's fc1 input
    boost(blocks["norm"])                    # the next layer's qkv input
    shrink_rows(blocks["attn"]["qkv"])
    shrink_rows(blocks["mlp"]["fc1"])
    return params


_BERT_TINY = None


def _bert_tiny_cfg():
    from keep_tpu.configs import BertConfig

    global _BERT_TINY
    if _BERT_TINY is None:
        _BERT_TINY = BertConfig(
            vocab_size=128, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=64)
    return _BERT_TINY


def test_smooth_bert_is_exact(rng):
    """pre_scale smoothing alone (no quantization) must not change the
    model: kernel rows ×s, activation ÷s inside ops.nn.linear."""
    from keep_tpu.models import bert
    from keep_tpu.quant import smooth_bert

    cfg = _bert_tiny_cfg()
    params = _outlier_bert(cfg)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (4, 16)))
    mask = jnp.asarray((np.arange(16)[None, :]
                        < np.array([16, 12, 9, 16])[:, None]).astype(np.int32))
    ref, stats = bert.forward(params, ids, mask, cfg=cfg, ln_stats=True)
    assert stats["qkv"].shape == (cfg.num_hidden_layers, cfg.hidden_size)
    sm = smooth_bert(params, stats)
    assert sm["blocks"]["attn"]["qkv"]["pre_scale"].shape == (
        cfg.num_hidden_layers, cfg.hidden_size)
    got = bert.forward(sm, ids, mask, cfg=cfg)
    np.testing.assert_allclose(np.asarray(got["pooler_output"]),
                               np.asarray(ref["pooler_output"]),
                               atol=2e-4, rtol=1e-4)


def test_smooth_quantize_bert_recovers_outliers(rng):
    """With outlier channels, plain W8A8 degrades (per-token scales spend
    the 8 bits on the outliers); the pre_scale form recovers the cos
    without touching the post-LN residual math."""
    from keep_tpu.models import bert
    from keep_tpu.quant import smooth_quantize_bert

    cfg = _bert_tiny_cfg()
    params = _outlier_bert(cfg)
    calib_ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (4, 16)))
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 16)))
    ref = np.asarray(bert.forward(params, ids, cfg=cfg)["last_hidden_state"])
    naive = np.asarray(bert.forward(
        quantize_linear_weights(params), ids, cfg=cfg)["last_hidden_state"])
    sq = smooth_quantize_bert(params, calib_ids, None, cfg)
    smoothq = np.asarray(
        bert.forward(sq, ids, cfg=cfg)["last_hidden_state"])
    cos_naive, cos_smooth = _cos(naive, ref), _cos(smoothq, ref)
    assert cos_naive < 0.999, cos_naive   # the pathology is real...
    assert cos_smooth > 0.9999, cos_smooth  # ...and pre_scale recovers it


def test_bert_megakernel_honors_pre_scale(rng):
    """The int8 megakernel path (qblock post-LN + qmlp pre_scale1) must
    agree with the XLA _qlinear fallback on smoothed params — both divide
    the quantize input by s."""
    from keep_tpu.models import bert
    from keep_tpu.quant import smooth_quantize_bert

    cfg = _bert_tiny_cfg()
    params = _outlier_bert(cfg)
    calib_ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (4, 16)))
    qp = smooth_quantize_bert(params, calib_ids, None, cfg)
    ids = jnp.asarray(rng.integers(1, cfg.vocab_size, (4, 16)))
    mask = jnp.asarray((np.arange(16)[None, :]
                        < np.array([16, 10, 16, 7])[:, None]).astype(np.int32))
    mega = np.asarray(bert.forward(qp, ids, mask, cfg=cfg, use_flash=True,
                                   gelu_approx=True)["pooler_output"])
    ref = np.asarray(bert.forward(qp, ids, mask, cfg=cfg, use_flash=False,
                                  gelu_approx=True)["pooler_output"])
    assert _cos(mega, ref) > 0.9999, _cos(mega, ref)
    np.testing.assert_allclose(mega, ref, atol=5e-3, rtol=1e-2)


def test_keep_model_quantize_with_text_calibration(rng):
    """KEEPModel.quantize(calib_text=...) smooths the BERT tower (pre_scale
    form) before int8 — one call for the production path, both towers."""
    from keep_tpu.models import keep
    from tests.test_keep_api import TINY

    params = keep.init(jax.random.PRNGKey(0), TINY)
    model = keep.KEEPModel(params=params, cfg=TINY)
    calib_ids = jnp.asarray(rng.integers(1, TINY.text.vocab_size, (2, 12)))
    qm = model.quantize(calib_text=calib_ids)
    assert "pre_scale" in qm.params["text"]["blocks"]["attn"]["qkv"]
    assert "pre_scale" in qm.params["text"]["blocks"]["mlp"]["fc1"]
    ids = jnp.asarray(rng.integers(1, TINY.text.vocab_size, (3, 12)))
    ref = np.asarray(model.encode_text(ids))
    got = np.asarray(qm.encode_text(ids))
    assert _cos(got, ref) > 0.995


def test_qmlp_bsd_rows_bit_identical():
    """rows=k fuses k batch rows into one program — per-token math, so the
    output must be BIT-identical to rows=1 for every LN/residual variant.
    (Shipped default stays rows=1: in the full model the attention kernel
    pins the [B, 197, D] layout and the reshape costs more than the MXU
    padding saves — docs/PERF.md.)"""
    import jax
    import jax.numpy as jnp

    from keep_tpu.kernels.qmlp import quantized_mlp_bsd

    rng = np.random.default_rng(11)
    B, S, D, F = 8, 5, 8, 16
    x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    w1q = jnp.asarray(rng.integers(-127, 127, (D, F)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-127, 127, (F, D)), jnp.int8)
    s1 = jnp.full((F,), 0.01)
    s2 = jnp.full((D,), 0.01)
    b1 = jnp.asarray(rng.standard_normal((F,)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((D,)), jnp.float32)
    ln_s = jnp.ones((D,))
    ln_b = jnp.zeros((D,))
    variants = [
        dict(),
        dict(ln_scale=ln_s, ln_bias=ln_b, residual=True),
        dict(ln_scale=ln_s, ln_bias=ln_b, post_ln=True),
    ]
    for kw in variants:
        a = quantized_mlp_bsd(x, w1q, s1, b1, w2q, s2, b2, rows=1, **kw)
        for k in (2, 4, 8):
            b = quantized_mlp_bsd(x, w1q, s1, b1, w2q, s2, b2, rows=k, **kw)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="rows"):
        quantized_mlp_bsd(x, w1q, s1, b1, w2q, s2, b2, rows=3)


def test_inkernel_pre_scale_matches_premultiply(rng):
    """quantized_matmul(_bsd) / quantized_mlp with an in-kernel pre_scale
    must equal quantizing the explicitly pre-multiplied activation (the
    round-3 generic path that streamed fp32 through HBM) — 2-D and 3-D,
    interpret mode."""
    from keep_tpu.kernels.qmatmul import qlinear_fused
    from keep_tpu.kernels.qmlp import qmlp_fused
    from keep_tpu.quant import quantize_kernel

    d, f = 16, 32
    k1 = rng.standard_normal((d, f)).astype(np.float32)
    k2 = rng.standard_normal((f, d)).astype(np.float32)
    b1 = rng.standard_normal(f).astype(np.float32)
    b2 = rng.standard_normal(d).astype(np.float32)
    ps = np.exp(rng.standard_normal(d)).astype(np.float32)  # 1/s > 0
    p1 = {**quantize_kernel(jnp.asarray(k1)), "bias": jnp.asarray(b1),
          "pre_scale": jnp.asarray(ps)}
    p1_plain = {k: v for k, v in p1.items() if k != "pre_scale"}
    p2 = {**quantize_kernel(jnp.asarray(k2)), "bias": jnp.asarray(b2)}

    for shape in ((6, d), (2, 5, d)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        want = np.asarray(qlinear_fused(p1_plain, x * ps))
        got = np.asarray(qlinear_fused(p1, x))
        np.testing.assert_allclose(got, want, atol=1e-5)

        want_mlp = np.asarray(qmlp_fused(p1_plain, p2, x * ps))
        got_mlp = np.asarray(qmlp_fused(p1, p2, x))
        np.testing.assert_allclose(got_mlp, want_mlp, atol=1e-5)


# ---------------------------------------------------------------- MoE smooth

def _moe_vit_cfg():
    # img 32 / patch 8 -> 17 tokens: at 5 tokens (img 16) the pooled CLS
    # has so little averaging that even the UNsmoothable edges' per-token
    # quant noise alone costs ~0.008 cos, swamping what smoothing fixes
    return ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                     num_heads=4, moe_experts=4, moe_capacity_factor=2.0,
                     moe_dispatch="gather")


def _outlier_moe_params(cfg, n_outlier=4, gain=80.0):
    """An MoE-ViT with outlier LN channels, built EXACTLY equivalent to the
    base model: norm scale x g on those channels; every consumer's input
    rows / g — qkv for norm1, BOTH the expert wi kernels and the router
    for norm2 (the router reads the same LN output)."""
    from keep_tpu.models import moe

    params = moe.init_vit(jax.random.PRNGKey(1), cfg)
    blocks = params["blocks"]
    ch = np.arange(n_outlier)
    for norm_name in ("norm1", "norm2"):
        sc = np.array(blocks[norm_name]["scale"], np.float32)
        bi = np.array(blocks[norm_name]["bias"], np.float32)
        sc[:, ch] *= gain
        bi[:, ch] *= gain
        blocks[norm_name]["scale"] = jnp.asarray(sc)
        blocks[norm_name]["bias"] = jnp.asarray(bi)
    qkv = np.array(blocks["attn"]["qkv"]["kernel"], np.float32)
    qkv[:, ch, :] /= gain
    blocks["attn"]["qkv"]["kernel"] = jnp.asarray(qkv)
    wi = np.array(blocks["moe"]["wi"]["kernel"], np.float32)  # [L, E, D, F]
    wi[:, :, ch, :] /= gain
    blocks["moe"]["wi"]["kernel"] = jnp.asarray(wi)
    rt = np.array(blocks["moe"]["router"]["kernel"], np.float32)  # [L, D, E]
    rt[:, ch, :] /= gain
    blocks["moe"]["router"]["kernel"] = jnp.asarray(rt)
    return params


def test_smooth_moe_fold_is_exact(rng):
    """Smoothing alone (no quantization) must not change the MoE model —
    including token->expert routing (the router kernel is compensated)."""
    from keep_tpu.models import moe
    from keep_tpu.quant import smooth_moe

    cfg = _moe_vit_cfg()
    params = _outlier_moe_params(cfg)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3), dtype=np.float32))
    ref, aux_ref, stats = moe.vit_forward(params, x, cfg, ln_stats=True)
    assert stats["qkv"].shape == (cfg.depth, cfg.embed_dim)
    assert stats["wi"].shape == (cfg.depth, cfg.embed_dim)
    sm = smooth_moe(params, stats)
    got, aux = moe.vit_forward(sm, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)


def test_smooth_quantize_moe_recovers_outliers(rng):
    """With outlier channels, plain W8A8 over the expert kernels degrades;
    the router-compensated fold recovers the feature cos back to the
    CLEAN-model quantization floor. The floor itself is computed in-test
    (same seed, no outliers): at toy scale the discontinuous router means
    tiny per-edge quant noise flips some token->expert assignments, so an
    absolute 0.999 gate would be testing the toy geometry, not smoothing.
    (At production scale full-W8A8 experts measure feature cos ≈0.995 on
    chip — below the 0.999 gate — with the SAME router-flip rate under
    W8A16, so W8A8 stays the default and W8A16 ships as an opt-in for
    outlier checkpoints; scripts/moe_lab.py --model-cos, docs/PERF.md
    round 4.)"""
    from keep_tpu.models import moe
    from keep_tpu.quant import MOE_TARGETS, smooth_quantize_moe_vit

    cfg = _moe_vit_cfg()
    calib = jnp.asarray(rng.standard_normal((4, 32, 32, 3), dtype=np.float32))
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))

    clean = moe.init_vit(jax.random.PRNGKey(1), cfg)
    ref_c = np.asarray(moe.vit_forward(clean, x, cfg)[0])
    floor = _cos(np.asarray(moe.vit_forward(
        quantize_linear_weights(clean, MOE_TARGETS), x, cfg)[0]), ref_c)

    params = _outlier_moe_params(cfg)  # exactly-equivalent rescale of clean
    ref = np.asarray(moe.vit_forward(params, x, cfg)[0])
    naive = _cos(np.asarray(moe.vit_forward(
        quantize_linear_weights(params, MOE_TARGETS), x, cfg)[0]), ref)
    smooth = _cos(np.asarray(moe.vit_forward(
        smooth_quantize_moe_vit(params, calib, cfg), x, cfg)[0]), ref)
    assert naive < floor - 0.01, (naive, floor)   # the pathology is real...
    assert smooth > floor - 0.005, (smooth, floor)  # ...and the fold recovers


def test_keep_moe_quantize_with_calibration(rng):
    """KEEPModel.quantize(calib_pixels=...) on an MoE config calibrates via
    smooth_moe instead of raising (round-3 gap)."""
    from keep_tpu.configs import BertConfig, KEEPConfig
    from keep_tpu.models import keep

    cfg = KEEPConfig(
        vision=_moe_vit_cfg(),
        text=BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=32),
        projection_dim=32,
    )
    params = keep.init(jax.random.PRNGKey(0), cfg)
    model = keep.KEEPModel(params=params, cfg=cfg)
    calib = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
    qm = model.quantize(calib_pixels=calib)
    assert "kernel_q" in qm.params["visual"]["blocks"]["moe"]["wi"]
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(model.encode_image(x))
    got = np.asarray(qm.encode_image(x))
    # toy-scale MoE: router flips set the floor (see recovery test); this
    # is an integration check that calibration runs and stays close
    assert _cos(got, ref) > 0.98


def test_moe_w8a16_marker_and_oracle(rng):
    """weight_only targets carry the structural ``w_only`` marker (and only
    they do), and the _expert_linear W8A16 branch computes exactly an
    einsum against the dequantized int8 kernel."""
    from keep_tpu.models.moe import _expert_linear
    from keep_tpu.quant import MOE_TARGETS

    cfg = _moe_vit_cfg()
    from keep_tpu.models import moe

    params = moe.init_vit(jax.random.PRNGKey(1), cfg)
    qp = quantize_linear_weights(params, MOE_TARGETS,
                                 weight_only=("wi", "wo"))
    blocks = qp["blocks"]
    for t in ("wi", "wo"):
        assert "w_only" in blocks["moe"][t] and "kernel_q" in blocks["moe"][t]
    assert "w_only" not in blocks["attn"]["qkv"]  # W8A8 as before
    assert "kernel_q" in blocks["attn"]["qkv"]

    # branch oracle: dequantized-einsum equality (bf16 activations)
    e, d, f = 4, 64, 96
    k = jnp.asarray(rng.standard_normal((e, d, f), dtype=np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((e, f), dtype=np.float32) * 0.01)
    p_lin = {**quantize_kernel(k), "bias": b, "w_only": ()}
    x = jnp.asarray(
        rng.standard_normal((e, 8, d), dtype=np.float32)).astype(jnp.bfloat16)
    got = _expert_linear(p_lin, x, "ecd,edf->ecf")
    w = (p_lin["kernel_q"].astype(x.dtype)
         * p_lin["scale"][:, None, :].astype(x.dtype))
    want = jnp.einsum("ecd,edf->ecf", x, w) + b[:, None, :].astype(x.dtype)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_moe_w8a16_beats_w8a8_on_expert_noise(rng):
    """Quantizing ONLY the expert wi/wo: the W8A16 path (no activation
    quantization) must reconstruct the bf16 model strictly better than
    W8A8 — same routing noise, strictly less matmul noise. (On chip the
    difference is small because router flips dominate both variants;
    docs/PERF.md round-4 route study.)"""
    from keep_tpu.models import moe

    cfg = _moe_vit_cfg()
    params = moe.init_vit(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    fwd = jax.jit(lambda p: moe.vit_forward(
        p, x, cfg, dtype=jnp.bfloat16, gelu_approx=True)[0])
    ref = np.asarray(fwd(params), np.float32)
    experts_only = ("wi", "wo")
    a8 = np.asarray(fwd(quantize_linear_weights(
        params, experts_only)), np.float32)
    a16 = np.asarray(fwd(quantize_linear_weights(
        params, experts_only, weight_only=experts_only)), np.float32)
    err8 = float(np.linalg.norm(a8 - ref))
    err16 = float(np.linalg.norm(a16 - ref))
    assert err16 < err8, (err16, err8)
    assert _cos(a16, ref) > 0.998, _cos(a16, ref)
