"""HF-architecture text towers for CLIP — the reference's ``HFTextEncoder``
(hf_model.py:93-169 + ``arch_dict`` in hf_configs.py), used by the
``roberta-*``, ``xlm-roberta-*`` and ``mt5-*`` presets.

Natively implemented archs:
- ``roberta`` / ``xlm-roberta`` — the BERT encoder stack (``models.bert``)
  with RoBERTa embedding semantics: position ids derived from the padding
  mask (first real token sits at ``pad_id + 1``), a single token type,
  LN eps 1e-5.
- ``bert`` — plain BERT trunk (the ViT-B-32-bert preset).

Poolers (hf_model.py:46-91): ``mean`` (mask-weighted mean over the last
hidden state — the arch default for roberta/mt5) and ``cls``.
Projections (hf_model.py:142-153): ``linear`` (no bias) or ``mlp``
(d → (d+out)//2 → GELU → out, no biases).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.configs import BertConfig
from keep_tpu.models import bert
from keep_tpu.ops.nn import gelu

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class HFTextConfig:
    arch: str = "roberta"  # 'roberta' | 'xlm-roberta' | 'bert' | 'mt5'
    trunk: BertConfig = dataclasses.field(
        default_factory=lambda: BertConfig(
            vocab_size=50265, max_position_embeddings=514, type_vocab_size=1,
            ln_eps=1e-5, pad_token_id=1,
        )
    )
    output_dim: int = 512
    pooler: str = "mean"  # 'mean' | 'cls'
    proj: str = "mlp"  # 'mlp' | 'linear' | 'none'

    @property
    def context_length(self) -> int:
        if self.arch == "mt5":  # relative positions: no hard max
            return 0
        # usable positions: roberta reserves pad_id+1 leading slots
        if self.arch in ("roberta", "xlm-roberta"):
            return self.trunk.max_position_embeddings - self.trunk.pad_token_id - 1
        return self.trunk.max_position_embeddings


def roberta_position_ids(input_ids: Array, pad_id: int) -> Array:
    """``create_position_ids_from_input_ids`` semantics: pads stay at
    ``pad_id``; real tokens count up from ``pad_id + 1``."""
    mask = (input_ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_id


def forward(params: dict, input_ids: Array, cfg: HFTextConfig, *,
            dtype=jnp.float32, normalize: bool = False,
            output_tokens: bool = False, **trunk_kw) -> Array:
    """[B, S] ids → [B, output_dim] projected text features (unnormalized,
    matching HFTextEncoder.forward; the CLIP wrapper normalizes).

    ``output_tokens=True`` additionally returns the raw last hidden states
    [B, S, width] — the CoCa decoder's token stream (HFTextEncoder
    output_tokens, hf_model.py; with the mean pooler no position is
    removed)."""
    tc = cfg.trunk
    mask = (input_ids != tc.pad_token_id).astype(jnp.int32)
    if cfg.arch == "mt5":
        from keep_tpu.models import t5

        out = t5.forward(params["trunk"], input_ids, mask, tc, dtype=dtype)
    else:
        pos = (roberta_position_ids(input_ids, tc.pad_token_id)
               if cfg.arch in ("roberta", "xlm-roberta") else None)
        out = bert.forward(params["trunk"], input_ids, mask, cfg=tc,
                           dtype=dtype, position_ids=pos, **trunk_kw)
    h = out["last_hidden_state"]
    if cfg.pooler == "mean":
        m = mask[:, :, None].astype(h.dtype)
        pooled = (h * m).sum(axis=1) / m.sum(axis=1)
    elif cfg.pooler == "cls":
        # reference ClsPooler(use_pooler_output=True): the tanh-dense
        # pooler_output when the trunk has one (BERT does), raw CLS
        # otherwise (hf_model.py:64-80)
        pooled = out.get("pooler_output")
        if pooled is None:
            pooled = h[:, 0]
    else:
        raise ValueError(f"unknown pooler {cfg.pooler!r}")
    if cfg.proj == "mlp":
        hid = gelu(jnp.dot(pooled, params["proj"]["fc1"].astype(pooled.dtype)))
        pooled = jnp.dot(hid, params["proj"]["fc2"].astype(hid.dtype))
    elif cfg.proj == "linear":
        pooled = jnp.dot(pooled, params["proj"]["w"].astype(pooled.dtype))
    if normalize:
        from keep_tpu.ops.nn import l2_normalize

        pooled = l2_normalize(pooled.astype(jnp.float32))
    if output_tokens:
        # ClsPooler drops the CLS position from the token stream
        # (hf_model.py:160-165); other poolers keep all positions
        return pooled, (h[:, 1:] if cfg.pooler == "cls" else h)
    return pooled


def init(key: jax.Array, cfg: HFTextConfig, dtype=jnp.float32) -> dict:
    kt, k1, k2 = jax.random.split(key, 3)
    o = cfg.output_dim
    if cfg.arch == "mt5":
        from keep_tpu.models import t5

        d = cfg.trunk.d_model
        params = {"trunk": t5.init(kt, cfg.trunk, dtype)}
    else:
        d = cfg.trunk.hidden_size
        params = {"trunk": bert.init(kt, cfg.trunk, dtype)}
    if cfg.proj == "mlp":
        hid = (d + o) // 2
        params["proj"] = {
            "fc1": (jax.random.normal(k1, (d, hid)) * d**-0.5).astype(dtype),
            "fc2": (jax.random.normal(k2, (hid, o)) * hid**-0.5).astype(dtype),
        }
    elif cfg.proj == "linear":
        params["proj"] = {
            "w": (jax.random.normal(k1, (d, o)) * d**-0.5).astype(dtype)}
    return params


def convert_hf_roberta(sd, cfg: HFTextConfig, proj_sd: dict | None = None) -> dict:
    """``transformers.RobertaModel``/``XLMRobertaModel`` state dict → our
    pytree (reuses the BERT converter key map — identical encoder keys)."""
    from keep_tpu.compat.torch_loader import convert_hf_bert

    trunk = convert_hf_bert(sd, cfg.trunk)
    out = {"trunk": trunk}

    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    if proj_sd is not None:
        if cfg.proj == "mlp":
            out["proj"] = {"fc1": _np(proj_sd["fc1"]).T,
                           "fc2": _np(proj_sd["fc2"]).T}
        elif cfg.proj == "linear":
            out["proj"] = {"w": _np(proj_sd["w"]).T}
    return out
