"""Training run configuration: one dataclass tree loaded from YAML.

Replaces the reference's two-layer yacs CfgNode + argparse globals
(training/path_training/config/defaults.py, params.py, configs/
keep_config.yml) with explicit dataclasses; field names mirror the
reference's YAML so its configs translate 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from keep_tpu.configs import BertConfig, KEEPConfig, ViTConfig


@dataclasses.dataclass
class DatasetConfig:
    type: str = "json"  # 'json' | 'csv'
    train_data: str = ""
    val_data: str = ""
    img_dir: str = ""
    knowledge_file: str = ""
    label_cap: str = "both"
    zeroshot_cls: str = ""
    zeroshot_cls_imdir: str = ""
    zeroshot_cls_prompts: str = ""
    zeroshot_ret: str = ""
    zeroshot_ret_imdir: str = ""
    csv_img_key: str = "image_name"
    csv_caption_key: str = "caption"
    csv_separator: str = "|"
    # tokenizer source: a vocab.txt file or a model dir containing one
    # (the reference loads AutoTokenizer.from_pretrained(model_path),
    # path_training/main.py via factory.get_tokenizer, factory.py:85-98)
    vocab_path: str = ""
    tokenizer_type: str = "bert"  # 'bert' (WordPiece) | 'clip' (BPE)
    # decode every image into RAM once up front (the reference's
    # DATASET.PRELOAD_DATA / preload_dataset, data_proc_group.py:258-288)
    preload_data: bool = False


@dataclasses.dataclass
class DataloaderConfig:
    batch_size: int = 128
    caption_num: int = 32  # groups per batch (keep_config.yml)
    text_drop: bool = True
    workers: int = 8


@dataclasses.dataclass
class SolverConfig:
    epochs: int = 10
    lr: float = 1e-5
    weight_decay: float = 0.2
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    warmup: int = 200
    lr_scheduler: str = "cosine"  # 'cosine' | 'const' | 'const-cooldown'
    cooldown_steps: int = 0
    cooldown_power: float = 1.0
    cooldown_end_lr: float = 0.0
    grad_clip_norm: Optional[float] = 1.0
    # 'bfloat16' stores Adam's first moment in bf16 (-0.85 GB on the full
    # KEEP model) — a single-chip memory knob; None keeps fp32 moments (the
    # reference's torch AdamW numerics).
    mu_dtype: Optional[str] = None
    accum_freq: int = 1
    zeroshot_frequency: int = 1
    val_frequency: int = 1
    freeze_visual_epochs: int = 1
    freeze_text_epochs: int = 1
    freeze_knowledge_epochs: int = 0
    # LoRA fine-tuning (train/lora.py): rank > 0 trains rank-r adapters on
    # the targeted kernels (+ logit_scale) with the base weights frozen;
    # the optimizer state covers ~0.4% of the params at r=8. Scale = α/r.
    # Checkpoints store the ADAPTER tree; lora.merge_lora bakes a
    # standalone model for export. Composes with dp only.
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple = ("qkv", "proj", "out", "fc1", "fc2")
    # FSDP-style param/optimizer sharding over the 'dp' mesh axis (ZeRO-3
    # analog; parallel/fsdp.py). The reference replicates state on every
    # rank; this shards each large leaf's biggest divisible axis instead.
    fsdp: bool = False
    fsdp_min_size: int = 1 << 16  # leaves below this many elements replicate
    # Tensor parallelism: mp-axis size of a 2-D (dp, mp) mesh. Params (and
    # their Adam moments) take the Megatron layout from parallel/tp.py;
    # XLA's SPMD partitioner inserts the TP collectives. 1 = off. Set
    # fsdp=true TOO for the Megatron-LM 2-D state layout (large leaves
    # additionally sharded over 'dp').
    tp: int = 1
    # Sequence parallelism (requires tp > 1): Megatron-SP — the [B, S, D]
    # residual stream is constrained to P('dp', 'mp', None) at block
    # boundaries, so LN/elementwise regions run sequence-sharded over the
    # tp group and GSPMD inserts the all-gather/reduce-scatter pair
    # (parallel/sp.py). Identity math; trajectory == replicated DP.
    sp: bool = False
    # Expert parallelism (requires model.vision.moe_experts > 0): ep-axis
    # size of a 2-D (dp, ep) mesh — the MoE trunk's expert-stacked kernels
    # (and their Adam moments) shard over 'ep' (moe.ep_shardings); GSPMD
    # derives the dispatch all-to-alls. 1 = off.
    ep: int = 1
    # Pipeline parallelism: pp-axis size of a 2-D (dp, pp) mesh. The visual
    # trunk's stacked blocks (and their Adam moments) stage over 'pp'
    # (GPipe schedule, parallel/pp.py); batch stays sharded over 'dp'
    # through the pipeline. Requires depth % pp == 0 and
    # batch_size % (pp * dp) == 0. Mutually exclusive with tp/fsdp/accum.
    pp: int = 1


@dataclasses.dataclass
class ModelSection:
    precision: str = "amp_bf16"  # bf16 compute (no scaler on TPU)
    type: str = "hierarchy_metric"  # loss selector (factory.py:271-283)
    loss_subtype: str = "lhp-hn"
    logit_scale: float = 0.04
    pretrained_image: str = ""  # timm/UNI checkpoint path (factory.py:211-217)
    pretrained_text: str = ""  # knowledge-BERT checkpoint (factory.py:200-208)
    use_flash: bool = True


@dataclasses.dataclass
class SaveConfig:
    output_dir: str = "./logs"
    experiment_name: str = ""
    save_frequency: int = 1
    delete_previous_checkpoint: bool = False
    # background (async) Orbax saves: the epoch loop continues while the
    # previous checkpoint serializes; train() waits for the last one
    async_checkpointing: bool = False
    resume: str = ""  # '' | 'latest' | path
    remote_sync: str = ""  # dir/URL for background checkpoint sync
    remote_sync_frequency: int = 300  # seconds (reference params.py)
    copy_codebase: bool = False  # snapshot keep_tpu source into the run dir
    wandb_project: str = ""


@dataclasses.dataclass
class TrainRunConfig:
    dataset: DatasetConfig = dataclasses.field(default_factory=DatasetConfig)
    dataloader: DataloaderConfig = dataclasses.field(default_factory=DataloaderConfig)
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    model: ModelSection = dataclasses.field(default_factory=ModelSection)
    save: SaveConfig = dataclasses.field(default_factory=SaveConfig)
    keep: KEEPConfig = dataclasses.field(default_factory=KEEPConfig)
    seed: int = 0

    @classmethod
    def from_yaml(cls, path: str) -> "TrainRunConfig":
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return cls.from_dict(raw)

    @classmethod
    def from_dict(cls, raw: dict) -> "TrainRunConfig":
        def build(dc, d):
            names = {f.name for f in dataclasses.fields(dc)}
            kwargs = {}
            for k, v in (d or {}).items():
                k = k.lower()
                if k not in names:
                    raise KeyError(f"unknown config key {k} for {dc.__name__}")
                kwargs[k] = v
            return dc(**kwargs)

        keep_raw = raw.pop("keep", None) or {}
        keep_cfg = KEEPConfig(
            vision=ViTConfig(**keep_raw.get("vision", {})),
            text=BertConfig(**keep_raw.get("text", {})),
            projection_dim=keep_raw.get("projection_dim", 768),
            max_text_length=keep_raw.get("max_text_length", 256),
        )
        return cls(
            dataset=build(DatasetConfig, raw.get("dataset")),
            dataloader=build(DataloaderConfig, raw.get("dataloader")),
            solver=build(SolverConfig, raw.get("solver")),
            model=build(ModelSection, raw.get("model")),
            save=build(SaveConfig, raw.get("save")),
            keep=keep_cfg,
            seed=raw.get("seed", 0),
        )
