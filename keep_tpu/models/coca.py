"""CoCa — contrastive captioner (alternative model family; reference
training/path_open_clip/coca_model.py + transformer.py:634-726).

Structure (exact open_clip/reference semantics, so full-model checkpoints
convert losslessly — parity-tested against the reference torch CoCa):
- vision tower: open_clip VisionTransformer variant of our ViT (ln_pre, NO
  trunk-final LN — the converted ``norm`` is identity) + attentional pooler
  at ``embed_dim`` with kdim=vision width and ln_q/ln_k
  (transformer.py:163-187); ``ln_post`` applies AFTER pooling, the first
  pooled token @ ``visual_proj`` is the contrastive latent, pooled tokens
  [1:] feed the decoder's cross-attention (transformer.py:489-495);
- text tower: causal transformer; input is trimmed to S-1 and a learned CLS
  token is appended at the END; positions cover all S slots (CLS included);
  pad positions are masked from the CLS query's attention row exactly as
  ``build_cls_mask`` does (transformer.py:587-594, including its shift-by-one
  column quirk); ``ln_final`` applies ONLY to the pooled CLS output — the
  decoder sees un-normalized token states (transformer.py:618-620);
- multimodal decoder: per layer a causal self-attention block then a
  cross-attention block over the pooled image tokens; final LN + projection
  to vocab logits (transformer.py:634-726);
- captioning loss: next-token CE on ``labels = text[:, -T:]``; training
  combines it with the contrastive loss;
- generation: greedy / top-k sampling (host loop over a jitted step; the
  reference delegates to HF GenerationMixin utilities) with
  ``embed_cls=False`` — which only skips the input trim; the CLS append,
  pad mask, and pooling are identical (coca_model.py:136-141).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.configs import ViTConfig
from keep_tpu.models import vit
from keep_tpu.ops.nn import l2_normalize, layer_norm, linear, mha_attention, mlp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CoCaConfig:
    embed_dim: int = 512
    vocab_size: int = 49408
    context_length: int = 76  # text tower sees S-1; CLS takes the last slot
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12
    decoder_layers: int = 6
    decoder_heads: int = 8
    n_queries: int = 256
    attn_pooler_heads: int = 8
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-5
    vision: ViTConfig = dataclasses.field(
        default_factory=lambda: ViTConfig(
            embed_dim=768, depth=12, num_heads=12, layerscale_init=None,
            ln_eps=1e-5, pool="none",
        )
    )
    pad_id: int = 0
    sot_id: int = 49406
    eos_id: int = 49407
    # coca_roberta-ViT-B-32 wiring (model_configs/coca_roberta-ViT-B-32.json):
    # the token tower is an HF-family encoder (models/hf_text) whose raw
    # hidden states feed the decoder, and the vision trunk has NO attentional
    # pooler — image_embs are the plain ViT patch tokens at trunk width.
    hf_text: Any = None  # HFTextConfig | None
    use_attn_pool: bool = True


def _attn_block(p, x, bias, cfg, heads, kv=None):
    """Pre-LN residual attention block; cross-attention when ``kv`` given
    (keys/values from ln_1kv(kv))."""
    b, s, d = x.shape
    dh = d // heads
    y = layer_norm(p["norm1"], x, cfg.ln_eps)
    if kv is None:
        qkv = linear(p["attn"]["qkv"], y).reshape(b, s, 3, heads, dh)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    else:
        ykv = layer_norm(p["norm1_kv"], kv, cfg.ln_eps)
        q = linear(p["attn"]["q"], y).reshape(b, s, heads, dh).transpose(0, 2, 1, 3)
        kvp = linear(p["attn"]["kv"], ykv).reshape(b, kv.shape[1], 2, heads, dh)
        k, v = (kvp[:, :, i].transpose(0, 2, 1, 3) for i in range(2))
    attn = mha_attention(q, k, v, bias=bias)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + linear(p["attn"]["proj"], attn)
    return x + mlp(p["mlp"], layer_norm(p["norm2"], x, cfg.ln_eps))


# --------------------------------------------------------------------------
# Towers
# --------------------------------------------------------------------------


def encode_text(params, input_ids, cfg: CoCaConfig, *, dtype=jnp.float32,
                embed_cls: bool = True):
    """→ (text_latent [B, E] normalized, token_embs [B, T, W]).

    ``embed_cls`` only controls the input trim, exactly as the reference's
    ``_encode_text`` (coca_model.py:136-141): True drops the last token to
    make room for the CLS slot (training), False keeps all tokens
    (generation). Either way the tower appends the learned CLS at the END,
    adds positions over all slots (CLS included), masks pads from the CLS
    attention row via build_cls_mask (transformer.py:587-594 — including its
    shift-by-one column quirk), pools ln_final(x[:, -1]) @ text_projection,
    and returns tokens = x[:, :-1] WITHOUT ln_final (transformer.py:598-625)."""
    ids = input_ids[:, :-1] if embed_cls else input_ids
    if cfg.hf_text is not None:
        # roberta token tower (coca_roberta): latent = projected mean-pool,
        # decoder tokens = raw hidden states (hf_model.py output_tokens)
        from keep_tpu.models import hf_text

        pooled, tokens = hf_text.forward(
            params["text"], ids, cfg.hf_text, dtype=dtype, output_tokens=True)
        return l2_normalize(pooled.astype(jnp.float32)), tokens
    t = params["text"]
    w = t["token_embedding"].shape[-1]
    b, s = ids.shape
    x = jnp.take(t["token_embedding"], ids, axis=0).astype(dtype)
    cls = jnp.broadcast_to(t["cls_emb"].reshape(1, 1, w).astype(dtype),
                           (b, 1, w))
    x = jnp.concatenate([x, cls], axis=1)  # CLS at the END
    sl = s + 1
    x = x + t["pos_embed"][:sl].astype(dtype)  # positions cover CLS too
    causal = jnp.triu(jnp.full((sl, sl), -1e9, jnp.float32), k=1)
    # build_cls_mask: only the LAST row (the CLS query) masks pads; the
    # column index is shifted by the 1-left pad — key j is gated by
    # ids[:, j-1] != pad, col 0 always open.
    valid = jnp.pad(ids != cfg.pad_id, ((0, 0), (1, 0)),
                    constant_values=True)  # [B, sl]
    cls_row = jnp.where(valid, 0.0, -1e9)[:, None, :]  # [B, 1, sl]
    rows = jnp.concatenate(
        [jnp.zeros((b, s, sl), jnp.float32), cls_row], axis=1
    )
    bias = (causal[None] + rows)[:, None]  # [B, 1, sl, sl]

    def body(carry, lp):
        return _attn_block(lp, carry, bias, cfg, cfg.text_heads), None

    x, _ = jax.lax.scan(body, x, t["blocks"])
    pooled = layer_norm(t["ln_final"], x[:, -1], cfg.ln_eps)
    tokens = x[:, :-1]
    latent = jnp.dot(pooled, t["text_projection"].astype(pooled.dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    return l2_normalize(latent.astype(jnp.float32)), tokens


def encode_image(params, pixels, cfg: CoCaConfig, *, dtype=jnp.float32,
                 use_flash=False):
    """→ (image_latent [B, E] normalized, image_embs [B, n_queries-1, E]).

    AttentionalPooler at d_model=embed_dim with kdim=vision width
    (transformer.py:163-187): q = ln_q(query), k = v = ln_k(trunk tokens),
    separate q/k/v projections (torch MHA with kdim != embed_dim), out_proj;
    then ln_post over ALL pooled tokens, latent = x[:, 0] @ visual_proj,
    decoder context = x[:, 1:] (transformer.py:489-495). The converted trunk
    carries ln_pre and an identity final ``norm`` (open_clip has no
    trunk-final LN on the attn-pool path)."""
    tokens = vit.forward(params["visual"], pixels, cfg.vision,
                         dtype=dtype, use_flash=use_flash)  # pool='none'
    if not cfg.use_attn_pool:
        # no-pool path (coca_base/coca_roberta): the reference pools FIRST
        # and ln_posts only the pooled CLS (transformer.py:494-495
        # `pooled, tokens = self._global_pool(x); pooled = self.ln_post(
        # pooled)`) — the decoder context is the RAW patch tokens at trunk
        # width, never LayerNormed
        pooled = layer_norm(params["ln_post"], tokens[:, 0], cfg.ln_eps)
        latent = jnp.dot(pooled, params["visual_proj"].astype(dtype),
                         preferred_element_type=jnp.float32).astype(dtype)
        return l2_normalize(latent.astype(jnp.float32)), tokens[:, 1:]
    p = params["attn_pool"]
    b = tokens.shape[0]
    heads = cfg.attn_pooler_heads
    e = p["query"].shape[-1]
    dh = e // heads
    q = layer_norm(p["ln_q"], p["query"].astype(dtype), cfg.ln_eps)
    q = jnp.broadcast_to(q[None], (b,) + q.shape)
    kv = layer_norm(p["ln_k"], tokens, cfg.ln_eps)
    qh = linear(p["q"], q).reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    kh = linear(p["k"], kv).reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    vh = linear(p["v"], kv).reshape(b, -1, heads, dh).transpose(0, 2, 1, 3)
    pooled = mha_attention(qh, kh, vh)
    pooled = pooled.transpose(0, 2, 1, 3).reshape(b, -1, e)
    pooled = linear(p["proj"], pooled)
    x = layer_norm(params["ln_post"], pooled, cfg.ln_eps)
    latent = jnp.dot(x[:, 0], params["visual_proj"].astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    return l2_normalize(latent.astype(jnp.float32)), x[:, 1:]


def decode(params, token_embs, image_embs, cfg: CoCaConfig, *, dtype=jnp.float32):
    """Multimodal decoder → vocab logits [B, T, V] (self-attn causal +
    cross-attn to image_embs per layer, transformer.py:634-726 semantics)."""
    d = params["decoder"]
    x = token_embs.astype(dtype)
    t = x.shape[1]
    causal = jnp.triu(jnp.full((t, t), -1e9, jnp.float32), k=1)[None, None]

    def body(carry, lp):
        self_p, cross_p = lp
        carry = _attn_block(self_p, carry, causal, cfg, cfg.decoder_heads)
        carry = _attn_block(cross_p, carry, None, cfg, cfg.decoder_heads,
                            kv=image_embs.astype(dtype))
        return carry, None

    x, _ = jax.lax.scan(body, x, (d["self_blocks"], d["cross_blocks"]))
    x = layer_norm(d["ln_final"], x, cfg.ln_eps)
    return jnp.dot(x, d["to_logits"].astype(x.dtype),
                   preferred_element_type=jnp.float32)


def forward(params, pixels, input_ids, cfg: CoCaConfig, *, dtype=jnp.float32,
            use_flash=False) -> dict:
    """Training forward (coca_model.py:151-166): contrastive latents +
    captioning logits with labels = the tokens the decoder predicts."""
    text_latent, token_embs = encode_text(params, input_ids, cfg, dtype=dtype)
    image_latent, image_embs = encode_image(params, pixels, cfg, dtype=dtype,
                                            use_flash=use_flash)
    logits = decode(params, token_embs, image_embs, cfg, dtype=dtype)
    return {
        "image_features": image_latent,
        "text_features": text_latent,
        "logits": logits,
        "labels": input_ids[:, -logits.shape[1]:],
        "logit_scale": jnp.exp(params["logit_scale"]),
    }


def caption_loss(logits: Array, labels: Array, pad_id: int = 0) -> Array:
    """Next-token CE over non-pad positions."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    mask = (labels != pad_id).astype(jnp.float32)
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


# --------------------------------------------------------------------------
# Generation (greedy / top-k; host loop over a jitted single-step)
# --------------------------------------------------------------------------


def generate(
    params,
    pixels: Array,
    cfg: CoCaConfig,
    seq_len: int = 30,
    generation_type: str = "greedy",  # 'greedy' | 'top_k' | 'top_p'
    top_k: int = 1,
    top_p: float = 0.1,
    temperature: float = 1.0,
    min_seq_len: int = 0,
    repetition_penalty: float = 1.0,
    key: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> np.ndarray:
    """Caption generation: start from SOT, append the next token by greedy
    argmax / top-k / nucleus (top-p) sampling, stop at EOS. Supports the
    reference's logits processors (coca_model.py:196-203): EOS suppressed
    below ``min_seq_len``; ``repetition_penalty`` down-weights already
    generated tokens (CTRL-style: positive logits divided, negative
    multiplied)."""
    b = pixels.shape[0]
    _, image_embs = encode_image(params, pixels, cfg, dtype=dtype)
    step_logits = _make_stepper(params, cfg, image_embs, dtype)

    ids = np.full((b, 1), cfg.sot_id, np.int32)
    finished = np.zeros(b, bool)
    if key is None:
        key = jax.random.PRNGKey(0)
    for t in range(seq_len - 1):
        logits = step_logits(ids) / max(temperature, 1e-6)
        if repetition_penalty != 1.0:
            for bi in range(b):
                seen = np.unique(ids[bi])
                pos = logits[bi, seen] > 0
                logits[bi, seen] = np.where(
                    pos, logits[bi, seen] / repetition_penalty,
                    logits[bi, seen] * repetition_penalty,
                )
        if ids.shape[1] < min_seq_len:
            logits[:, cfg.eos_id] = -1e9
        if generation_type == "top_p":
            key, sub = jax.random.split(key)
            order = np.argsort(-logits, axis=-1)
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            sorted_p = np.take_along_axis(probs, order, axis=-1)
            cum = np.cumsum(sorted_p, axis=-1)
            # HF TopPLogitsWarper semantics — what the reference actually
            # RUNS (coca_model.py:31,232): keep the smallest set whose mass
            # reaches top_p, i.e. drop token i iff the mass BEFORE it
            # already exceeds top_p. (The reference's "1 - top_p quantile"
            # comment contradicts its own warper; behavior wins.)
            drop_sorted = (cum - sorted_p) > top_p
            drop_sorted[:, 0] = False  # always keep the argmax
            drop = np.zeros_like(drop_sorted)
            np.put_along_axis(drop, order, drop_sorted, axis=-1)
            masked = np.where(drop, -1e9, logits)
            nxt = np.asarray(
                jax.random.categorical(sub, jnp.asarray(masked), axis=-1)
            )
        elif generation_type == "greedy" or top_k <= 1:
            nxt = logits.argmax(-1)
        else:
            key, sub = jax.random.split(key)
            kth = np.sort(logits, axis=-1)[:, -top_k][:, None]
            masked = np.where(logits < kth, -1e9, logits)
            nxt = np.asarray(
                jax.random.categorical(sub, jnp.asarray(masked), axis=-1)
            )
        nxt = np.where(finished, cfg.pad_id, nxt)
        ids = np.concatenate([ids, nxt[:, None].astype(np.int32)], axis=1)
        finished |= nxt == cfg.eos_id
        if finished.all():
            break
    return ids


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------


def _block_init(key, width, mlp_ratio, dtype, cross=False):
    ks = jax.random.split(key, 6)
    f = int(width * mlp_ratio)
    lin = lambda k, fi, fo: {
        "kernel": (jax.random.normal(k, (fi, fo)) * fi**-0.5).astype(dtype),
        "bias": jnp.zeros((fo,), dtype),
    }
    ln = lambda: {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)}
    attn = {"proj": lin(ks[1], width, width)}
    if cross:
        attn["q"] = lin(ks[0], width, width)
        attn["kv"] = lin(ks[2], width, 2 * width)
    else:
        attn["qkv"] = lin(ks[0], width, 3 * width)
    out = {
        "norm1": ln(),
        "attn": attn,
        "norm2": ln(),
        "mlp": {"fc1": lin(ks[3], width, f), "fc2": lin(ks[4], f, width)},
    }
    if cross:
        out["norm1_kv"] = ln()
    return out


def _stack_blocks(keys, width, mlp_ratio, dtype, cross=False):
    blocks = [_block_init(k, width, mlp_ratio, dtype, cross) for k in keys]
    return jax.tree.map(
        lambda *xs: jnp.stack(xs) if isinstance(xs[0], jnp.ndarray) else xs[0],
        *blocks,
    )


def init(key: jax.Array, cfg: CoCaConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 24))
    w, e = cfg.text_width, cfg.embed_dim
    normal = lambda k, shape, std: (jax.random.normal(k, shape) * std).astype(dtype)
    lin = lambda k, fi, fo: {
        "kernel": normal(k, (fi, fo), fi**-0.5),
        "bias": jnp.zeros((fo,), dtype),
    }
    ln = lambda n: {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}
    vw = cfg.vision.embed_dim
    visual = vit.init(next(keys), cfg.vision, dtype)
    # open_clip vision trunk: ln_pre after embedding, NO trunk-final LN —
    # vit.init's ``norm`` starts as identity (scale 1, bias 0) which matches
    # the attn-pool path (transformer.py:489-495); converters keep it identity.
    visual["ln_pre"] = ln(vw)
    if cfg.hf_text is not None:
        from keep_tpu.models import hf_text

        text = hf_text.init(next(keys), cfg.hf_text, dtype)
    else:
        text = {
            "token_embedding": normal(next(keys), (cfg.vocab_size, w), 0.02),
            # num_pos = context_length + 1: positions cover the appended CLS
            # (transformer.py:530-532)
            "pos_embed": normal(next(keys), (cfg.context_length + 1, w), 0.01),
            "cls_emb": normal(next(keys), (w,), 0.01),
            "blocks": _stack_blocks(
                jax.random.split(next(keys), cfg.text_layers),
                w, cfg.mlp_ratio, dtype,
            ),
            "ln_final": ln(w),
            "text_projection": normal(next(keys), (w, e), w**-0.5),
        }
    out = {
        "visual": visual,
        "text": text,
        "decoder": {
            "self_blocks": _stack_blocks(
                jax.random.split(next(keys), cfg.decoder_layers),
                w, cfg.mlp_ratio, dtype,
            ),
            "cross_blocks": _stack_blocks(
                jax.random.split(next(keys), cfg.decoder_layers),
                w, cfg.mlp_ratio, dtype, cross=True,
            ),
            "ln_final": ln(w),
            "to_logits": normal(next(keys), (w, cfg.vocab_size), w**-0.5),
        },
        "logit_scale": jnp.asarray(np.log(1 / 0.07), jnp.float32),
    }
    if cfg.use_attn_pool:
        out["attn_pool"] = {
            "query": normal(next(keys), (cfg.n_queries, e), e**-0.5),
            "ln_q": ln(e),
            "ln_k": ln(vw),
            "q": lin(next(keys), e, e),
            "k": lin(next(keys), vw, e),
            "v": lin(next(keys), vw, e),
            "proj": lin(next(keys), e, e),
        }
        out["ln_post"] = ln(e)
        out["visual_proj"] = normal(next(keys), (e, e), e**-0.5)
    else:
        # no attentional pooler: ln_post at trunk width, proj vw → embed_dim
        out["ln_post"] = ln(vw)
        out["visual_proj"] = normal(next(keys), (vw, e), vw**-0.5)
    return out


def _make_stepper(params, cfg: CoCaConfig, image_embs, dtype):
    """ONE compiled next-token step. The causal CLIP tower right-pads the
    (context-length-windowed) ids to a fixed width and reads logits at
    ``cur_len - 1`` — causal attention makes right pads invisible to
    earlier positions, so a single compile serves every step (the naive
    growing-ids loop recompiled the full tower + decoder per token). The
    roberta tower (hf_text) is bidirectional — pads would change earlier
    positions — so it keeps the per-length path with the reference's
    last-context window (coca_model.py:257)."""
    w = cfg.context_length

    if cfg.hf_text is None:
        @jax.jit
        def step(ids_pad, cur_len):
            _, tok = encode_text(params, ids_pad, cfg, dtype=dtype,
                                 embed_cls=False)
            logits = decode(params, tok, image_embs, cfg, dtype=dtype)
            return jax.lax.dynamic_index_in_dim(
                logits, cur_len - 1, 1, keepdims=False)

        def run(ids_np: np.ndarray) -> np.ndarray:
            window = ids_np[:, -w:]
            cur = window.shape[1]
            pad = np.full((ids_np.shape[0], w - cur), cfg.pad_id, np.int32)
            return np.asarray(
                step(jnp.asarray(np.concatenate([window, pad], 1)), cur))
    else:
        @jax.jit
        def step(ids):
            _, tok = encode_text(params, ids, cfg, dtype=dtype,
                                 embed_cls=False)
            return decode(params, tok, image_embs, cfg, dtype=dtype)[:, -1]

        def run(ids_np: np.ndarray) -> np.ndarray:
            return np.asarray(step(jnp.asarray(ids_np[:, -w:])))

    return run


def generate_beam(
    params,
    pixels: Array,
    cfg: CoCaConfig,
    seq_len: int = 30,
    num_beams: int = 6,
    min_seq_len: int = 0,
    dtype=jnp.float32,
) -> np.ndarray:
    """Beam-search captioning: length-normalized log-prob beams, EOS
    freezes a beam, EOS suppressed below ``min_seq_len``.

    Deviation from the reference's 'beam_search' type (documented, not
    reproduced): the reference runs HuggingFace GROUPED diverse beam
    search (num_beam_groups=3 with a diversity penalty,
    coca_model.py:213-305); this is standard single-group beam search, so
    selected beams can differ for the same weights. The parity-tested
    generation surface is greedy/top-k/top-p (``generate``)."""
    b = pixels.shape[0]
    _, image_embs = encode_image(params, pixels, cfg, dtype=dtype)
    # expand image embeddings per beam: [B*K, n_q, W]
    embs_k = jnp.repeat(image_embs, num_beams, axis=0)
    stepper = _make_stepper(params, cfg, embs_k, dtype)

    k, v = num_beams, cfg.vocab_size
    ids = np.full((b, k, 1), cfg.sot_id, np.int32)
    scores = np.full((b, k), -1e9, np.float64)
    scores[:, 0] = 0.0  # all beams start identical; keep one live
    finished = np.zeros((b, k), bool)

    for t in range(seq_len - 1):
        raw = stepper(ids.reshape(b * k, -1)).astype(np.float32)
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(raw), axis=-1))
        logp = logp.reshape(b, k, v)
        if ids.shape[2] < min_seq_len:
            logp[:, :, cfg.eos_id] = -1e9
        # frozen beams only extend with pad at no cost
        pad_only = np.full((b, k, v), -1e9)
        pad_only[:, :, cfg.pad_id] = 0.0
        logp = np.where(finished[:, :, None], pad_only, logp)
        cand = scores[:, :, None] + logp  # [B, K, V]
        flat = cand.reshape(b, k * v)
        top = np.argsort(-flat, axis=1)[:, :k]
        beam_idx, tok = top // v, top % v
        scores = np.take_along_axis(flat, top, axis=1)
        ids = np.concatenate(
            [np.take_along_axis(ids, beam_idx[:, :, None], axis=1),
             tok[:, :, None].astype(np.int32)], axis=2
        )
        finished = np.take_along_axis(finished, beam_idx, axis=1) | (tok == cfg.eos_id)
        if finished.all():
            break
    # best = highest length-normalized score
    lengths = (ids != cfg.pad_id).sum(axis=2)
    norm = scores / np.maximum(lengths, 1)
    best = norm.argmax(axis=1)
    return ids[np.arange(b), best]


def coca_loss(
    out: dict,
    *,
    caption_weight: float = 2.0,
    contrastive_weight: float = 1.0,
    pad_id: int = 0,
    axis_name=None,
) -> Array:
    """Composite CoCa objective: contrastive (global negatives when mapped
    over ``axis_name``) + weighted captioning CE over ``forward``'s output."""
    from keep_tpu.train.loss import clip_loss

    contrastive = clip_loss(
        out["image_features"], out["text_features"], out["logit_scale"],
        axis_name=axis_name,
    )
    caption = caption_loss(out["logits"], out["labels"], pad_id=pad_id)
    return contrastive_weight * contrastive + caption_weight * caption
