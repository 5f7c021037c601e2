"""Torch reference fixtures for golden-parity tests.

``TorchViT`` re-creates timm ``VisionTransformer`` semantics (the reference's
image tower, quick_start/keep_inference.py:32-40) from its documented behavior:
stride-P conv patchify, CLS token, learned pos embed, pre-LN blocks with
LayerScale, exact-GELU MLP, final LN, CLS pooling. State-dict key names follow
timm's so ``keep_tpu.compat.convert_timm_vit`` consumes them directly.

timm itself is not installed in this environment; this fixture is the parity
oracle in its place (BERT parity uses HF ``transformers.BertModel`` directly).
"""

import math

import torch
import torch.nn as nn

from keep_tpu.configs import ViTConfig


class _Attention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, s, d = x.shape
        qkv = self.qkv(x).reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = qkv.permute(2, 0, 3, 1, 4).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b, s, d)
        return self.proj(x)


class _LayerScale(nn.Module):
    def __init__(self, dim, init_values):
        super().__init__()
        self.gamma = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class _Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class _Block(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, init_values, eps):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = _Attention(dim, num_heads)
        self.ls1 = _LayerScale(dim, init_values)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = _Mlp(dim, int(dim * mlp_ratio))
        self.ls2 = _LayerScale(dim, init_values)

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        x = x + self.ls2(self.mlp(self.norm2(x)))
        return x


class TorchViT(nn.Module):
    def __init__(self, cfg: ViTConfig):
        super().__init__()
        self.cfg = cfg
        d = cfg.embed_dim

        class _PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, d, cfg.patch_size, stride=cfg.patch_size)

            def forward(self, x):
                x = self.proj(x)
                return x.flatten(2).transpose(1, 2)

        self.patch_embed = _PatchEmbed()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + cfg.num_patches, d))
        self.blocks = nn.ModuleList(
            [
                _Block(d, cfg.num_heads, cfg.mlp_ratio, cfg.layerscale_init, cfg.ln_eps)
                for _ in range(cfg.depth)
            ]
        )
        self.norm = nn.LayerNorm(d, eps=cfg.ln_eps)
        self._init()

    def _init(self):
        torch.manual_seed(0)
        nn.init.trunc_normal_(self.pos_embed, std=0.02)
        nn.init.trunc_normal_(self.cls_token, std=0.02)
        for m in self.modules():
            if isinstance(m, (nn.Linear, nn.Conv2d)):
                nn.init.normal_(m.weight, std=1.0 / math.sqrt(m.weight.shape[-1]))
                if m.bias is not None:
                    nn.init.normal_(m.bias, std=0.02)

    def forward(self, x):  # x: [B, 3, H, W]
        x = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 0]
