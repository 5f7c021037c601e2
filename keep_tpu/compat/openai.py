"""OpenAI/open_clip CLIP checkpoint loader (reference openai.py:24-90 +
pretrained.py surface): assemble a ``models.clip`` CLIP from a single
state dict (ViT or ModifiedResNet image tower + fused text tower).

Zero-egress environment: checkpoints come from local paths (the reference's
URL/hf-hub download helpers reduce to the file read here).
"""

from __future__ import annotations

import numpy as np

from keep_tpu.configs import ViTConfig
from keep_tpu.models.clip import CLIPConfig
from keep_tpu.models.text_transformer import (
    TextTransformerConfig,
    convert_openclip_text,
)


def _g(sd, k):
    v = sd[k]
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def infer_clip_config(sd) -> CLIPConfig:
    """Derive the architecture from a state dict (openai.py's
    build_model-style shape sniffing)."""
    vision_width = _g(sd, "visual.conv1.weight").shape[0]
    patch = _g(sd, "visual.conv1.weight").shape[-1]
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    grid = int(round((_g(sd, "visual.positional_embedding").shape[0] - 1) ** 0.5))
    embed_dim = _g(sd, "text_projection").shape[1]
    text_width = _g(sd, "ln_final.weight").shape[0]
    text_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}
    )
    vocab = _g(sd, "token_embedding.weight").shape[0]
    ctx = _g(sd, "positional_embedding").shape[0]
    # every original OpenAI checkpoint uses QuickGELU (the reference's
    # build_model_from_openai_state_dict hardcodes quick_gelu=True,
    # model/model.py:487-544); open_clip retrains use plain GELU — pass an
    # explicit cfg to load_openai_clip for those
    return CLIPConfig(
        embed_dim=embed_dim,
        vision=ViTConfig(
            img_size=grid * patch, patch_size=patch, embed_dim=vision_width,
            depth=vision_layers, num_heads=vision_width // 64,
            layerscale_init=None, ln_eps=1e-5, act="quick_gelu",
        ),
        text=TextTransformerConfig(
            vocab_size=vocab, context_length=ctx, width=text_width,
            heads=text_width // 64, layers=text_layers, output_dim=embed_dim,
            act="quick_gelu",
        ),
    )


def convert_openclip_vit_trunk(sd, embed_dim: int, depth: int,
                               prefix: str = "visual.") -> dict:
    """Shared open_clip/OpenAI ViT trunk keys (conv1 / class_embedding /
    positional_embedding / ln_pre / transformer.resblocks.N) → our vit pytree
    WITHOUT the final norm/proj (those differ between the CLIP and CoCa
    attn-pool tower variants — transformer.py:489-495)."""
    conv = _g(sd, prefix + "conv1.weight")  # [D, 3, P, P], no bias
    kernel = conv.transpose(2, 3, 1, 0).reshape(-1, embed_dim)

    def stack(fmt, transpose=False):
        mats = [_g(sd, fmt.format(i)) for i in range(depth)]
        return np.stack([m.T if transpose else m for m in mats])

    pre = prefix + "transformer.resblocks.{}."
    return {
        "patch_embed": {"kernel": kernel,
                        "bias": np.zeros(embed_dim, np.float32)},
        "cls_token": _g(sd, prefix + "class_embedding").reshape(1, 1, -1),
        "pos_embed": _g(sd, prefix + "positional_embedding")[None],
        "ln_pre": {"scale": _g(sd, prefix + "ln_pre.weight"),
                   "bias": _g(sd, prefix + "ln_pre.bias")},
        "blocks": {
            "norm1": {"scale": stack(pre + "ln_1.weight"),
                      "bias": stack(pre + "ln_1.bias")},
            "attn": {
                "qkv": {"kernel": stack(pre + "attn.in_proj_weight", transpose=True),
                        "bias": stack(pre + "attn.in_proj_bias")},
                "proj": {"kernel": stack(pre + "attn.out_proj.weight", transpose=True),
                         "bias": stack(pre + "attn.out_proj.bias")},
            },
            "norm2": {"scale": stack(pre + "ln_2.weight"),
                      "bias": stack(pre + "ln_2.bias")},
            "mlp": {
                "fc1": {"kernel": stack(pre + "mlp.c_fc.weight", transpose=True),
                        "bias": stack(pre + "mlp.c_fc.bias")},
                "fc2": {"kernel": stack(pre + "mlp.c_proj.weight", transpose=True),
                        "bias": stack(pre + "mlp.c_proj.bias")},
            },
        },
    }


def convert_openai_clip_visual(sd, cfg: ViTConfig) -> dict:
    """OpenAI ViT tower keys (visual.conv1 / class_embedding / ln_pre / ln_post
    / transformer.resblocks.N / proj) → our vit pytree + proj.

    Note: OpenAI's ViT applies ln_pre after embedding; our vit has no ln_pre —
    it is folded into... no fold exists, so we keep it explicit via an extra
    'ln_pre' entry consumed by models.clip when present.
    """
    out = convert_openclip_vit_trunk(sd, cfg.embed_dim, cfg.depth)
    out["norm"] = {"scale": _g(sd, "visual.ln_post.weight"),
                   "bias": _g(sd, "visual.ln_post.bias")}
    out["proj"] = _g(sd, "visual.proj")
    return out


def load_openai_clip(path_or_sd, cfg: CLIPConfig | None = None):
    """(params, cfg) for ``keep_tpu.models.clip`` from an OpenAI/open_clip
    checkpoint (state dict or torch file)."""
    import jax
    import jax.numpy as jnp

    sd = path_or_sd
    if isinstance(path_or_sd, str):
        import torch

        from keep_tpu.compat.torch_loader import normalize_state_dict

        try:
            sd = torch.load(path_or_sd, map_location="cpu",
                            weights_only=True)
        except Exception:
            # every ORIGINAL OpenAI CLIP release is a TorchScript archive
            # (reference openai.py:50-61's primary path) — weights_only
            # torch.load rejects those outright
            sd = torch.jit.load(path_or_sd, map_location="cpu").state_dict()
        sd = normalize_state_dict(sd)  # {'state_dict':...} / module. / buffers
    if "visual.class_embedding" not in sd and cfg is None:
        # ModifiedResNet tower (RN50/x4/...): the reference sniffs
        # ViT-vs-RN by key presence (model.py build_model); route to the
        # RN converter instead of KeyErroring in the ViT one
        raise ValueError(
            "RN-tower OpenAI checkpoint: pass an explicit CLIPConfig and "
            "convert the visual tower via models.resnet.convert_openai_resnet "
            "(this loader's auto-infer covers the ViT towers)")
    cfg = cfg or infer_clip_config(sd)
    params = {
        "visual": convert_openai_clip_visual(sd, cfg.vision),
        "text": convert_openclip_text(sd, cfg.text),
        "logit_scale": _g(sd, "logit_scale").reshape(()),
    }
    return jax.tree.map(jnp.asarray, params), cfg
