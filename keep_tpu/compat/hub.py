"""Hub publishing surface — the reference's ``push_to_hf_hub.py:40-193``
(save_for_hf / save_config_for_hf / generate_readme / push_to_hf_hub)
re-targeted for a zero-egress environment.

``push_to_hub`` writes the EXACT artifact layout the HF hub expects
(open_clip_config.json + weights + tokenizer files + generated README model
card) into a local hub tree (``<root>/<owner>/<name>/``) and registers it in
``compat.registry`` so ``resolve()`` finds it by name. Uploading that
directory with ``huggingface_hub.upload_folder`` from a networked machine is
the only remaining step — nothing here depends on network access.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import numpy as np

HF_WEIGHTS_NAME = "open_clip_pytorch_model.bin"
HF_SAFE_WEIGHTS_NAME = "open_clip_model.safetensors"
HF_CONFIG_NAME = "open_clip_config.json"

# the eval transform's normalization (reference keep_inference.py:88-93)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def default_hub_root() -> str:
    return os.environ.get(
        "KEEP_HUB_ROOT",
        os.path.join(os.path.expanduser("~"), ".cache", "keep_tpu", "hub"))


def save_config_for_hub(config_path: str, model_config: Optional[dict],
                        preprocess_cfg: Optional[dict] = None) -> None:
    """``save_config_for_hf`` (push_to_hf_hub.py:38-54): model_cfg +
    preprocess_cfg in one json."""
    hf_config = {
        "model_cfg": model_config,
        "preprocess_cfg": preprocess_cfg
        or {"mean": list(IMAGENET_MEAN), "std": list(IMAGENET_STD)},
    }
    with open(config_path, "w") as f:
        json.dump(hf_config, f, indent=2)


def save_for_hub(
    save_directory: str,
    state_dict: dict,
    model_config: Optional[dict] = None,
    preprocess_cfg: Optional[dict] = None,
    tokenizer_files: Optional[list[str]] = None,
    skip_weights: bool = False,
    safe_serialization=False,  # False | True | 'both' (push_to_hf_hub.py:71-75)
) -> None:
    """``save_for_hf`` (push_to_hf_hub.py:57-81): weights + tokenizer +
    open_clip_config.json into one directory.

    ``state_dict`` is a flat name→array mapping (e.g. from
    ``compat.export.to_keep_state_dict`` or any ``*_to_*_state_dict``
    converter). Saved as torch ``.bin`` (and/or ``.safetensors`` per
    ``safe_serialization``) plus always ``weights.npz`` (framework-neutral)."""
    os.makedirs(save_directory, exist_ok=True)
    if not skip_weights:
        arrays = {k: np.asarray(v) for k, v in state_dict.items()}
        np.savez(os.path.join(save_directory, "weights.npz"), **arrays)
        # preserve each entry's dtype (int buffers, bool masks, bf16) —
        # a blanket float32 cast corrupted non-float entries and made the
        # .bin/.safetensors artifacts disagree with weights.npz
        def keep_dtype(v):
            a = np.ascontiguousarray(v)
            return a.astype(np.float32) if a.dtype == np.float64 else a

        if safe_serialization in (True, "both"):
            from safetensors.numpy import save_file

            save_file({k: keep_dtype(v) for k, v in arrays.items()},
                      os.path.join(save_directory, HF_SAFE_WEIGHTS_NAME))
        if safe_serialization in (False, "both"):
            try:
                import torch

                sd = {k: torch.from_numpy(keep_dtype(v).copy())
                      for k, v in arrays.items()}
                torch.save(sd, os.path.join(save_directory, HF_WEIGHTS_NAME))
            except ImportError:
                pass
    for f in tokenizer_files or []:
        shutil.copy(f, os.path.join(save_directory, os.path.basename(f)))
    save_config_for_hub(os.path.join(save_directory, HF_CONFIG_NAME),
                        model_config, preprocess_cfg)


def generate_readme(model_card: dict, model_name: str) -> str:
    """The reference's model-card generator, format-identical
    (push_to_hf_hub.py:195-241)."""
    text = "---\n"
    text += "tags:\n- clip\n"
    text += "library_name: open_clip\n"
    text += "pipeline_tag: zero-shot-image-classification\n"
    text += f"license: {model_card.get('license', 'mit')}\n"
    if "details" in model_card and "Dataset" in model_card["details"]:
        text += "datasets:\n"
        text += f"- {model_card['details']['Dataset'].lower()}\n"
    text += "---\n"
    text += f"# Model card for {model_name}\n"
    if "description" in model_card:
        text += f"\n{model_card['description']}\n"
    if "details" in model_card:
        text += "\n## Model Details\n"
        for k, v in model_card["details"].items():
            if isinstance(v, (list, tuple)):
                text += f"- **{k}:**\n"
                for vi in v:
                    text += f"  - {vi}\n"
            elif isinstance(v, dict):
                text += f"- **{k}:**\n"
                for ki, vi in v.items():
                    text += f"  - {ki}: {vi}\n"
            else:
                text += f"- **{k}:** {v}\n"
    if "usage" in model_card:
        text += "\n## Model Usage\n" + model_card["usage"] + "\n"
    if "comparison" in model_card:
        text += "\n## Model Comparison\n" + model_card["comparison"] + "\n"
    if "citation" in model_card:
        text += "\n## Citation\n"
        cites = model_card["citation"]
        if not isinstance(cites, (list, tuple)):
            cites = [cites]
        for c in cites:
            text += f"```bibtex\n{c}\n```\n"
    return text


def push_to_hub(
    repo_id: str,
    state_dict: dict,
    model_config: Optional[dict] = None,
    preprocess_cfg: Optional[dict] = None,
    tokenizer_files: Optional[list[str]] = None,
    model_card: Optional[dict] = None,
    hub_root: Optional[str] = None,
    register: bool = True,
    safe_serialization="both",
) -> str:
    """``push_to_hf_hub`` (push_to_hf_hub.py:84-193) against a LOCAL hub
    tree (zero-egress). Returns the repo directory. A README is generated
    only when absent, mirroring the reference's has_readme check.
    ``safe_serialization`` defaults to 'both' like the reference (.bin +
    .safetensors), so hub consumers without torch can load the repo."""
    if "/" not in repo_id:
        raise ValueError(f"repo_id must be 'owner/name', got {repo_id!r}")
    root = hub_root or default_hub_root()
    repo_dir = os.path.join(root, *repo_id.split("/"))
    os.makedirs(repo_dir, exist_ok=True)  # create_repo(exist_ok=True)

    save_for_hub(repo_dir, state_dict, model_config=model_config,
                 preprocess_cfg=preprocess_cfg,
                 tokenizer_files=tokenizer_files,
                 safe_serialization=safe_serialization)

    readme_path = os.path.join(repo_dir, "README.md")
    if not os.path.exists(readme_path):
        name = repo_id.split("/")[-1]
        with open(readme_path, "w") as f:
            f.write(generate_readme(model_card or {}, name))

    if register:
        from keep_tpu.compat import registry

        registry.register(
            repo_id, repo_dir, source=f"local-hub:{repo_id}", kind="dir",
        )
    return repo_dir
