"""Golden parity: keep_tpu BERT vs HF transformers BertModel (the exact text
tower the reference wraps, quick_start/keep_inference.py:49-50)."""

import jax.numpy as jnp
import numpy as np
import torch
from transformers import BertConfig as HFBertConfig
from transformers import BertModel

from keep_tpu.compat.torch_loader import convert_hf_bert
from keep_tpu.configs import BertConfig
from keep_tpu.models import bert

CFG = BertConfig(
    vocab_size=512,
    hidden_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=96,
)


def make_hf_model(cfg: BertConfig) -> BertModel:
    torch.manual_seed(0)
    hf_cfg = HFBertConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    return BertModel(hf_cfg).eval()


def test_bert_matches_hf(rng):
    hf = make_hf_model(CFG)
    params = convert_hf_bert(hf.state_dict(), CFG)

    b, s = 3, 48
    ids = rng.integers(0, CFG.vocab_size, size=(b, s))
    # ragged padding masks
    mask = np.zeros((b, s), np.int64)
    for i, ln in enumerate([48, 31, 7]):
        mask[i, :ln] = 1
    ids = ids * mask  # pad positions = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        )
    out = bert.forward(params, jnp.asarray(ids), jnp.asarray(mask), cfg=CFG)

    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]), ref.pooler_output.numpy(), atol=2e-5, rtol=2e-5
    )
    # compare hidden states only at unpadded positions (padded query rows can
    # differ by the masking constant choice but never feed the pooler/features)
    got_h = np.asarray(out["last_hidden_state"])
    ref_h = ref.last_hidden_state.numpy()
    np.testing.assert_allclose(
        got_h[mask.astype(bool)], ref_h[mask.astype(bool)], atol=2e-5, rtol=2e-5
    )


def test_token_type_ids(rng):
    hf = make_hf_model(CFG)
    params = convert_hf_bert(hf.state_dict(), CFG)
    b, s = 2, 16
    ids = rng.integers(0, CFG.vocab_size, size=(b, s))
    tt = (rng.random((b, s)) > 0.5).astype(np.int64)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids), token_type_ids=torch.from_numpy(tt)
        ).pooler_output.numpy()
    out = bert.forward(
        params, jnp.asarray(ids), token_type_ids=jnp.asarray(tt), cfg=CFG
    )["pooler_output"]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
