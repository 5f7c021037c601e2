"""Training entrypoint: ``python -m keep_tpu.train.main --config cfg.yml``.

Mirrors the reference's ``python -m path_training.main`` orchestration
(training/path_training/main.py:70-467): experiment naming, seed, logging,
model build (+ pretrained tower loading), resume-latest, data, LR schedule,
freeze phases, epoch loop with in-training eval and checkpointing, and the
results.jsonl history. TPU-native: no DDP wrap/GradScaler — one jitted train
step per freeze phase, bf16 compute, Orbax checkpoints.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import json
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from keep_tpu.models import keep
from keep_tpu.train import checkpoint as ckpt
from keep_tpu.train import eval as zs_eval
from keep_tpu.train import optim, schedules
from keep_tpu.train.config import TrainRunConfig
from keep_tpu.train.data import (
    BatchIterator,
    GroupDataset,
    Prefetcher,
    load_knowledge_json,
)
from keep_tpu.train.freeze import FreezeSchedule, diff_report, snapshot
from keep_tpu.train.loss import DOGraph
from keep_tpu.train.trainer import (
    LossConfig,
    make_accum_train_step,
    make_train_step,
    tree_state,
)
from keep_tpu.utils.logging import AverageMeter, append_results, setup_logging


def experiment_name(cfg: TrainRunConfig) -> str:
    """Timestamped experiment naming (reference main.py:96-109). Multi-host:
    process 0's name wins (the reference broadcasts too, main.py:166) —
    sub-second startup skew would otherwise split the run across
    directories and hang the collective checkpoint saves."""
    if cfg.save.experiment_name:
        return cfg.save.experiment_name
    date_str = datetime.datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
    name = "-".join(
        [
            date_str,
            f"model_{cfg.model.type}",
            f"lr_{cfg.solver.lr}",
            f"b_{cfg.dataloader.batch_size}",
            f"e_{cfg.solver.epochs}",
        ]
    )
    if jax.process_count() > 1:
        from keep_tpu.parallel.multihost import broadcast_object

        name = broadcast_object(name)
    return name


def build_schedule(cfg: TrainRunConfig, steps_per_epoch: int):
    total = cfg.solver.epochs * steps_per_epoch
    s = cfg.solver
    if s.lr_scheduler == "cosine":
        return schedules.cosine_lr(s.lr, s.warmup, total)
    if s.lr_scheduler == "const":
        return schedules.const_lr(s.lr, s.warmup)
    if s.lr_scheduler == "const-cooldown":
        return schedules.const_lr_cooldown(
            s.lr, s.warmup, total, s.cooldown_steps, s.cooldown_power, s.cooldown_end_lr
        )
    raise ValueError(f"unknown lr scheduler {s.lr_scheduler}")


def make_placement(mesh, batch_axis: int = 0):
    """(put_state, put_batch, put_repl) placement fns for a 'dp' mesh —
    the TPU-native DDP wiring (reference main.py:264-271). ``put_batch``
    shards each array's sample axis (``batch_axis``; 1 for accum-stacked
    [accum, micro, ...] arrays) over 'dp'; node_connection and state are
    replicated. With ``mesh=None`` everything is a plain device transfer.
    Used by both the training CLI and ``__graft_entry__.dryrun_multichip``
    so the driver validates the real code path."""
    if mesh is None:
        as_dev = lambda tree: jax.tree.map(jnp.asarray, tree)
        return as_dev, as_dev, as_dev
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(*([None] * batch_axis + ["dp"])))

    def put_repl(tree):
        return jax.device_put(tree, repl)

    def put_batch(arrays: dict):
        return {
            k: jax.device_put(
                jnp.asarray(v), repl if k == "node_connection" else data
            )
            for k, v in arrays.items()
        }

    return put_repl, put_batch, put_repl


def make_eval_placement(mesh, put_repl):
    """Placement for in-training eval batches: shard the sample axis over
    'dp' like training batches — a replicated eval encode would run the full
    batch redundantly on every device (the reference evaluates master-only,
    train_hierarchy.py:253; on a mesh that wastes the whole slice). Falls
    back to replication for arrays whose leading axis doesn't divide."""
    if mesh is None:
        return lambda x: jnp.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P

    data = NamedSharding(mesh, P("dp"))
    n_dev = mesh.shape["dp"]

    def put_eval(x):
        x = jnp.asarray(x)
        if x.ndim and x.shape[0] % n_dev == 0:
            return jax.device_put(x, data)
        return put_repl(x)

    return put_eval


def build_params(cfg: TrainRunConfig, rng_seed: int):
    """Init + optional pretrained tower loading (factory.py:200-217 semantics:
    the text tower loads a knowledge-BERT checkpoint, the visual tower loads a
    timm ViT checkpoint)."""
    params = keep.init(jax.random.PRNGKey(rng_seed), cfg.keep)
    params["logit_scale"] = jnp.asarray(np.log(1.0 / cfg.model.logit_scale), jnp.float32)
    if cfg.model.pretrained_image:
        import torch

        from keep_tpu.compat.torch_loader import (
            convert_timm_vit, normalize_state_dict)

        if getattr(cfg.keep.vision, "moe_experts", 0) > 0:
            raise ValueError(
                "model.pretrained_image loads a DENSE timm trunk — it "
                "cannot initialize an MoE trunk (vision.moe_experts > 0); "
                "drop one of the two")
        sd = normalize_state_dict(torch.load(
            cfg.model.pretrained_image, map_location="cpu", weights_only=True))
        params["visual"] = jax.tree.map(
            jnp.asarray, convert_timm_vit(sd, cfg.keep.vision)
        )
        logging.info("loaded pretrained visual tower from %s", cfg.model.pretrained_image)
    if cfg.model.pretrained_text:
        import torch

        from keep_tpu.compat.torch_loader import (
            convert_hf_bert, normalize_state_dict, strip_prefix)

        sd = normalize_state_dict(torch.load(
            cfg.model.pretrained_text, map_location="cpu", weights_only=True))
        if any(k.startswith("bert_model.") for k in sd):
            sd = strip_prefix(sd, "bert_model.")
        params["text"] = jax.tree.map(jnp.asarray, convert_hf_bert(sd, cfg.keep.text))
        logging.info("loaded pretrained text tower from %s", cfg.model.pretrained_text)
    return params


def build_eval_data(cfg: TrainRunConfig, image_loader=None) -> dict:
    """Zero-shot eval sets for the in-training evaluation
    (get_zeroshot_dataset, data_proc_group.py:459-496): 'zeroshot_cls' CSV
    has image_name|...|label; 'zeroshot_ret' has image_name|caption. Images
    are preprocessed once (eval transform) into fixed arrays."""
    from keep_tpu.ops.preprocess import preprocess
    from keep_tpu.train.data import CsvTextImageDataset, load_image

    out = {}
    specs = [
        ("zeroshot_cls", cfg.dataset.zeroshot_cls, cfg.dataset.zeroshot_cls_imdir, "label"),
        ("zeroshot_ret", cfg.dataset.zeroshot_ret, cfg.dataset.zeroshot_ret_imdir, "caption"),
        ("val", cfg.dataset.val_data, cfg.dataset.img_dir, "caption"),
    ]
    for task, path, imdir, caption_key in specs:
        if not path:
            continue
        ds = CsvTextImageDataset(path, img_key=cfg.dataset.csv_img_key,
                                 caption_key=caption_key, sep="both")
        loader = image_loader or (lambda name: load_image(imdir, name))
        # batch preprocessing per source-size bucket: one compile + one device
        # round-trip per distinct (H, W), not per image
        raw = [np.asarray(loader(ds[i].image)) for i in range(len(ds))]
        buckets: dict[tuple, list[int]] = {}
        for i, img in enumerate(raw):
            buckets.setdefault(img.shape, []).append(i)
        size = cfg.keep.vision.img_size
        pixels = np.empty((len(raw), size, size, 3), np.float32)
        for shape, idxs in buckets.items():
            batch = np.stack([raw[i] for i in idxs])
            pixels[np.asarray(idxs)] = np.asarray(preprocess(batch, crop=size))
        out[task] = (pixels, [ds[i].text for i in range(len(ds))])
    return out


def train(cfg: TrainRunConfig, tokenizer=None, dataset=None, image_loader=None,
          eval_data=None) -> dict:
    """Run training; returns the final eval record. ``dataset`` /
    ``image_loader`` / ``eval_data`` injectable for tests and custom sources."""
    # multi-host: pick up torchrun/SLURM/OpenMPI/TPU-pod env like the
    # reference's init_distributed_device (distributed.py:24-60); no-op
    # single-process
    from keep_tpu.parallel.multihost import init_from_env

    if init_from_env():
        logging.info("jax.distributed: process %d/%d",
                     jax.process_index(), jax.process_count())
    name = experiment_name(cfg)
    out_dir = os.path.join(cfg.save.output_dir, name)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    setup_logging(os.path.join(out_dir, "out.log"))
    logging.info("experiment %s → %s", name, out_dir)
    with open(os.path.join(out_dir, "params.txt"), "w") as f:
        f.write(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))

    if cfg.save.copy_codebase and jax.process_index() == 0:
        from keep_tpu.utils.logging import copy_codebase

        logging.info("code snapshot at %s", copy_codebase(out_dir))
    sync_proc = None
    if cfg.save.remote_sync and jax.process_index() == 0:
        from keep_tpu.train.sync import remote_sync, start_sync_process

        # fail fast on a bad target (the reference exits -1 here,
        # main.py:186-192) — a silently broken sync would lose every
        # checkpoint to a local-disk failure days later
        if not remote_sync(ckpt_dir, cfg.save.remote_sync):
            raise RuntimeError(
                f"initial remote sync to {cfg.save.remote_sync} failed — "
                "fix save.remote_sync before training")
        sync_proc = start_sync_process(
            cfg.save.remote_sync_frequency, ckpt_dir, cfg.save.remote_sync
        )
        logging.info("remote sync → %s every %ds", cfg.save.remote_sync,
                     cfg.save.remote_sync_frequency)

    from keep_tpu.utils.writers import MetricWriter

    writer = MetricWriter(out_dir, wandb_project=cfg.save.wandb_project or None,
                          primary=jax.process_index() == 0)

    if tokenizer is None:
        from keep_tpu.factory import get_tokenizer

        # vocab source: dataset.vocab_path (a vocab.txt or a model dir); the
        # reference's AutoTokenizer.from_pretrained(model_path). img_dir is
        # kept as a last-resort fallback for old configs.
        vocab = cfg.dataset.vocab_path or cfg.dataset.img_dir
        tokenizer = get_tokenizer(cfg.dataset.tokenizer_type, vocab)

    nodes = (
        load_knowledge_json(cfg.dataset.knowledge_file)
        if cfg.dataset.knowledge_file
        else None
    )
    do_graph = (
        DOGraph({k: v["parent"] for k, v in nodes.items()}) if nodes else DOGraph({})
    )
    if dataset is None:
        dataset = GroupDataset(
            cfg.dataset.train_data,
            num_instance=cfg.dataloader.batch_size // cfg.dataloader.caption_num,
            knowledge_json=nodes,
            text_drop=cfg.dataloader.text_drop,
            labeled_cap=cfg.dataset.label_cap,
            seed=cfg.seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )

    if eval_data is None and (cfg.dataset.zeroshot_cls or cfg.dataset.zeroshot_ret
                              or cfg.dataset.val_data):
        eval_data = build_eval_data(cfg, image_loader)
    eval_data = eval_data or {}

    preload = None
    if cfg.dataset.preload_data and image_loader is None:
        from keep_tpu.train.data import preload_images

        logging.info("preloading the entire image set into RAM "
                     "(dataset.preload_data)")
        preload = preload_images(dataset, cfg.dataset.img_dir,
                                 workers=cfg.dataloader.workers)
        logging.info("preloaded %d images", len(preload))

    make_iter = lambda: BatchIterator(
        dataset=dataset,
        tokenizer=tokenizer,
        img_dir=cfg.dataset.img_dir,
        batch_size=cfg.dataloader.batch_size,
        caption_num=cfg.dataloader.caption_num,
        image_size=cfg.keep.vision.img_size,
        max_length=cfg.keep.max_text_length,
        do_graph=do_graph,
        image_loader=image_loader,
        preload=preload,
        seed=cfg.seed,
        workers=cfg.dataloader.workers,
    )
    steps_per_epoch = make_iter().num_batches
    # the schedule advances per OPTIMIZER step: with accumulation the
    # optimizer fires once per accum_freq host batches — scheduling on host
    # batches would end the run only 1/accum into the decay curve
    opt_steps_per_epoch = steps_per_epoch // max(1, cfg.solver.accum_freq)
    schedule = build_schedule(cfg, max(1, opt_steps_per_epoch))

    params = build_params(cfg, cfg.seed)
    loss_cfg = LossConfig(
        kind=cfg.model.type if cfg.model.type == "hierarchy_metric" else "clip",
        caption_num=cfg.dataloader.caption_num,
        loss_subtype=cfg.model.loss_subtype,
    )
    fs = FreezeSchedule(
        freeze_visual_epochs=cfg.solver.freeze_visual_epochs,
        freeze_text_epochs=cfg.solver.freeze_text_epochs,
        freeze_knowledge_epochs=cfg.solver.freeze_knowledge_epochs,
        # reference condition (freeze_scheduler.py:27-36): with a
        # knowledge-BERT checkpoint configured the WHOLE text tower
        # freezes incl. mlp_embed; only the from-scratch text tower keeps
        # its head trainable through a freeze phase
        keep_text_head_open=not bool(cfg.model.pretrained_text),
    )
    dtype = jnp.bfloat16 if "bf16" in cfg.model.precision else jnp.float32
    use_flash = cfg.model.use_flash and jax.default_backend() == "tpu"

    # jitted eval encoders (compiled once; params passed per call)
    eval_enc_img = jax.jit(
        lambda p, px: keep.encode_image(p, px, cfg.keep, dtype=dtype,
                                        use_flash=use_flash)
    )
    eval_enc_txt = jax.jit(
        lambda p, ids, mask: keep.encode_text(p, ids, mask, cfg=cfg.keep,
                                              dtype=dtype, use_flash=use_flash)
    )

    accum = max(1, cfg.solver.accum_freq)

    # ONE optimizer + ONE jitted step for the whole run: freezing enters as a
    # dynamic 0/1 mask (optim.freeze_mask), so Adam moments and the schedule
    # count run continuously across freeze-phase changes — the reference
    # drives one global-step scheduler and one optimizer (main.py:283-357).
    tx = optim.adamw(
        schedule,
        weight_decay=cfg.solver.weight_decay,
        b1=cfg.solver.beta1,
        b2=cfg.solver.beta2,
        eps=cfg.solver.eps,
        grad_clip_norm=cfg.solver.grad_clip_norm,
        mu_dtype=cfg.solver.mu_dtype,
    )
    if accum > 1:
        # cached-negative accumulation (train_hierarchy.py:127-165):
        # accum_freq host batches form one optimizer step
        base_step_fn = make_accum_train_step(
            cfg.keep, loss_cfg, tx, accum, dtype=dtype, use_flash=use_flash
        )
    else:
        base_step_fn = None  # built per freeze phase by phase_step_fn below

    # LoRA fine-tuning (train/lora.py): the optimizer state covers the
    # adapter tree only; base params ride along as a frozen step input
    lora_scale = None
    lora_base = None
    if cfg.solver.lora_rank > 0:
        if accum > 1:
            raise ValueError("solver.lora_rank does not compose with "
                             "accum_freq > 1")
        from keep_tpu.train import lora as lora_mod

        lora_base = params
        lora_scale = cfg.solver.lora_alpha / cfg.solver.lora_rank
        params = lora_mod.init_lora(
            jax.random.PRNGKey(cfg.seed + 1), params, cfg.solver.lora_rank,
            targets=tuple(cfg.solver.lora_targets),
        )
        n_ad, n_ab = lora_mod.lora_param_count(params)
        n_base = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(lora_base))
        logging.info(
            "LoRA r=%d α=%g on %s: %s adapter params (%.2f%% of %s base; "
            "base frozen)", cfg.solver.lora_rank, cfg.solver.lora_alpha,
            tuple(cfg.solver.lora_targets), f"{n_ad:,}",
            100 * n_ad / n_base, f"{n_base:,}")
    state = tree_state(params, tx)

    start_epoch = 0
    if cfg.save.resume:
        epoch_sel = None if cfg.save.resume == "latest" else int(cfg.save.resume)
        try:
            # full-fidelity resume: params + optimizer state (Adam moments,
            # schedule count) + step (reference main.py:306-326)
            like = {"params": state.params, "opt_state": state.opt_state,
                    "step": np.asarray(0)}
            restored = ckpt.restore(ckpt_dir, epoch=epoch_sel, like=like)
            state = state.replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                step=jnp.asarray(restored["step"], jnp.int32),
            )
            start_epoch = restored["epoch"] + 1
            logging.info("resumed from epoch %d (step %d, optimizer state "
                         "restored)", restored["epoch"], int(state.step))
        except FileNotFoundError:
            logging.info("resume requested but no checkpoint found; fresh start")
        except Exception as e:  # older weights-only / foreign checkpoints
            restored = ckpt.restore(ckpt_dir, epoch=epoch_sel)
            state = state.replace(
                params=jax.tree.map(jnp.asarray, restored["params"])
            )
            start_epoch = restored["epoch"] + 1
            logging.warning(
                "resumed params only from epoch %d (optimizer state not "
                "restorable: %s) — Adam moments/schedule restart",
                restored["epoch"], e,
            )

    # multi-device: shard the batch over the mesh's 'dp' axis, replicate
    # params/opt state (the reference wires DDP here, main.py:264-271)
    mesh = None
    pp_mesh = None
    n_dev = len(jax.devices())
    tp = max(1, int(getattr(cfg.solver, "tp", 1)))
    pp = max(1, int(getattr(cfg.solver, "pp", 1)))
    sp = bool(getattr(cfg.solver, "sp", False))
    ep = max(1, int(getattr(cfg.solver, "ep", 1)))
    moe = int(getattr(cfg.keep.vision, "moe_experts", 0))
    if tp > 1 and pp > 1:
        raise ValueError("solver.tp and solver.pp are mutually exclusive")
    if cfg.solver.lora_rank > 0 and (tp > 1 or pp > 1 or ep > 1
                                     or cfg.solver.fsdp):
        raise ValueError("solver.lora_rank composes with dp only (the "
                         "adapter tree is tiny — shard the batch, "
                         "replicate the rest)")
    if sp and tp <= 1:
        raise ValueError("solver.sp requires solver.tp > 1 (sequence shards "
                         "over the tensor-parallel 'mp' axis)")
    if sp and accum > 1:
        raise ValueError("solver.sp does not compose with accum_freq > 1")
    if ep > 1 and moe <= 0:
        raise ValueError("solver.ep requires model.vision.moe_experts > 0 "
                         "(a dense trunk has no expert axis)")
    if ep > 1 and (tp > 1 or pp > 1):
        raise ValueError("solver.ep composes with dp only "
                         "(not solver.tp / solver.pp)")
    if ep > 1 and getattr(cfg.keep.vision, "moe_dispatch", "einsum") \
            == "gather":
        raise ValueError("solver.ep requires vision.moe_dispatch='einsum' "
                         "(the grouped one-hot dispatch is the EP-shardable "
                         "form; 'gather' is the single-device/dp fast path)")
    if moe > 0 and (tp > 1 or pp > 1):
        raise ValueError("the MoE trunk trains with dp/fsdp/ep; "
                         "solver.tp / solver.pp are not composed with it")
    if pp > 1 and cfg.solver.fsdp:
        raise ValueError("solver.pp and solver.fsdp are mutually exclusive "
                         "(tp composes with fsdp; pp does not)")
    if pp > 1 and accum > 1:
        raise ValueError("solver.pp does not compose with accum_freq > 1")
    if ep > 1 and cfg.solver.fsdp:
        raise ValueError("solver.ep and solver.fsdp are mutually exclusive "
                         "(expert leaves already shard; compose ep with "
                         "plain dp)")
    mp = max(tp, pp, ep)
    if mp > 1 and n_dev % mp:
        which = "tp" if tp > 1 else ("pp" if pp > 1 else "ep")
        raise ValueError(f"solver.{which}={mp} does not "
                         f"divide {n_dev} devices")
    if n_dev > 1:
        dp = n_dev // mp
        if cfg.dataloader.batch_size % dp == 0:
            from keep_tpu.parallel.mesh import make_mesh

            if tp > 1:
                mesh = make_mesh(axes=("dp", "mp"), shape=(dp, tp))
                logging.info("2-D mesh: dp=%d x tp=%d devices", dp, tp)
            elif pp > 1:
                if (cfg.dataloader.batch_size % pp
                        or (cfg.dataloader.batch_size // pp) % dp):
                    raise ValueError(
                        f"solver.pp={pp}: batch_size "
                        f"{cfg.dataloader.batch_size} must split into pp "
                        f"microbatches each divisible by dp={dp}")
                mesh = make_mesh(axes=("dp", "pp"), shape=(dp, pp))
                pp_mesh = mesh
                logging.info("2-D mesh: dp=%d x pp=%d devices (GPipe over "
                             "the visual trunk)", dp, pp)
            elif ep > 1:
                mesh = make_mesh(axes=("dp", "ep"), shape=(dp, ep))
                logging.info("2-D mesh: dp=%d x ep=%d devices (experts "
                             "sharded over 'ep')", dp, ep)
            else:
                mesh = make_mesh(axes=("dp",))
                logging.info("data-parallel mesh over %d devices", n_dev)
        elif mp > 1:
            # an explicit tp/pp/ep request must not silently degrade to a
            # replicated single-device run
            raise ValueError(
                f"batch_size {cfg.dataloader.batch_size} not divisible by "
                f"dp={dp} (devices {n_dev} / "
                f"{'tp' if tp > 1 else ('pp' if pp > 1 else 'ep')}={mp})")
        else:
            logging.warning(
                "batch_size %d not divisible by dp=%d; running "
                "single-device", cfg.dataloader.batch_size, dp)
    act_sharding = None
    if sp and mesh is not None:
        from keep_tpu.parallel.sp import seq_sharding

        act_sharding = seq_sharding(mesh)
        logging.info("SP: residual streams sequence-sharded over mp=%d "
                     "(Megatron-SP via GSPMD constraints)", tp)
    put_state, put_batch, put_repl = make_placement(
        mesh, batch_axis=1 if accum > 1 else 0
    )
    put_eval = make_eval_placement(mesh, put_repl)
    merge_eval = None
    if lora_base is not None:
        lora_base = put_repl(lora_base)
        # one compiled merge reused by every eval epoch
        from keep_tpu.train.lora import apply_lora as _apply_lora

        merge_eval = jax.jit(_apply_lora, static_argnames=("scale",))
    if mesh is not None and cfg.solver.fsdp and tp == 1:
        from keep_tpu.parallel.fsdp import place_state, sharded_fraction

        state = place_state(state, mesh, min_size=cfg.solver.fsdp_min_size)
        logging.info(
            "FSDP: %.0f%% of param elements sharded over %d devices",
            100 * sharded_fraction(state.params, mesh,
                                   min_size=cfg.solver.fsdp_min_size), n_dev)
    elif mesh is not None and tp > 1:
        # Megatron layout over 'mp' for params AND their Adam moments (the
        # moment pytrees mirror the param paths, so the same matcher
        # applies); unmatched leaves (step, LN, embeddings) replicate —
        # unless solver.fsdp also shards them (and the tp leaves' other
        # axis) over 'dp', Megatron-LM's 2-D state layout
        from keep_tpu.parallel.tp import (
            place_tp, place_tp_fsdp, tp_fraction)

        if cfg.solver.fsdp:
            state = place_tp_fsdp(state, mesh,
                                  min_size=cfg.solver.fsdp_min_size)
            logging.info(
                "TP x FSDP: %.0f%% of param elements split over mp=%d, "
                "large leaves also sharded over dp=%d",
                100 * tp_fraction(state.params, mesh), tp, dp)
        else:
            state = place_tp(state, mesh)
            logging.info(
                "TP: %.0f%% of param elements split over mp=%d",
                100 * tp_fraction(state.params, mesh), tp)
    elif pp_mesh is not None:
        # stage the visual trunk's layers (and their Adam moments) over 'pp'
        from keep_tpu.parallel.pp import place_pp, pp_fraction

        state = place_pp(state, pp_mesh)
        logging.info(
            "PP: %.0f%% of param elements staged over pp=%d",
            100 * pp_fraction(state.params, pp_mesh), pp)
    elif mesh is not None and ep > 1:
        # expert parallelism: the MoE trunk's expert-stacked kernels (and
        # their Adam moments — mirrored paths) shard over 'ep'; router,
        # attention, text tower replicate. GSPMD derives the dispatch
        # all-to-alls from these shardings (models/moe.py).
        from keep_tpu.models.moe import ep_shardings

        state = jax.tree.map(jax.device_put, state, ep_shardings(state, mesh))
        logging.info("EP: expert kernels sharded over ep=%d", ep)
    else:
        state = put_state(state)

    # per-phase static-freeze steps: stop-gradienting the frozen leaves at
    # compile time lets XLA drop the frozen towers' backward+remat entirely
    # (bit-identical updates, one extra compile per phase; trainer docstring)
    _phase_steps: dict = {}

    def phase_step_fn(epoch: int):
        if accum > 1:
            return base_step_fn  # accum path keeps the single dynamic-mask compile
        key = tuple(sorted(fs.frozen_towers(epoch)))
        if key not in _phase_steps:
            static = None
            if key:
                m = optim.freeze_mask(state.params, fs.frozen_fn(epoch))
                static = jax.tree.map(lambda x: bool(np.asarray(x) > 0.5), m)
            _phase_steps[key] = make_train_step(
                cfg.keep, loss_cfg, tx, dtype=dtype, use_flash=use_flash,
                donate=False, static_frozen=static, pp_mesh=pp_mesh,
                act_sharding=act_sharding, lora_scale=lora_scale,
            )
        if lora_scale is not None:
            raw = _phase_steps[key]
            return lambda s, b, f: raw(s, b, f, lora_base)
        return _phase_steps[key]

    cur_phase = None
    frozen = None
    results = {"epoch": start_epoch - 1, "resumed": start_epoch > 0}
    if start_epoch >= cfg.solver.epochs:
        logging.info("resume epoch %d >= epochs %d: nothing to train",
                     start_epoch, cfg.solver.epochs)
    n_ins = cfg.dataloader.batch_size // cfg.dataloader.caption_num
    ckpt_writer = None
    for epoch in range(start_epoch, cfg.solver.epochs):
        phase = fs.frozen_towers(epoch)
        if phase != cur_phase:
            frozen = put_repl(optim.freeze_mask(state.params, fs.frozen_fn(epoch)))
            step_fn = phase_step_fn(epoch)
            cur_phase = phase
            logging.info("epoch %d: frozen towers = %s", epoch, sorted(phase) or "none")
        pre_snapshot = snapshot(state.params)

        dataset.resample_epoch(epoch)
        loss_meter, step_time = AverageMeter(), AverageMeter()
        pending_losses: list = []
        t0 = time.time()
        pending = []
        for i, batch in enumerate(Prefetcher(make_iter())):
            if accum > 1:
                pending.append(batch)
                if len(pending) < accum:
                    continue
                arrays = {
                    k: np.stack([b[k] for b in pending])
                    for k in ("pixels", "input_ids", "attention_mask")
                    if k in pending[0]
                }
                if "node_connection" in pending[0]:
                    # the super-batch has accum·caption_num groups: build ONE
                    # reachability matrix over every chunk's group labels
                    # (chunk 0's matrix alone would merge distinct groups)
                    labels = [
                        lab for b in pending for lab in b["cap_labels"][::n_ins]
                    ]
                    arrays["node_connection"] = do_graph.node_connection(labels)
                pending = []
            else:
                arrays = {
                    k: v
                    for k, v in batch.items()
                    if k in ("pixels", "input_ids", "attention_mask",
                             "node_connection")
                }
            arrays = put_batch(arrays)
            state, metrics = step_fn(state, arrays, frozen)
            # defer the device fetch: float(loss) every step would sync the
            # pipeline (one ~5 ms relay round-trip per step, and it blocks
            # the host from prefetching the next batch behind the device
            # compute). Losses stay device scalars until the log cadence.
            pending_losses.append(metrics["loss"])
            step_time.update(time.time() - t0)
            t0 = time.time()
            if i % 100 == 0:
                for v in pending_losses:
                    loss_meter.update(float(v))
                pending_losses.clear()
                logging.info(
                    "epoch %d step %d/%d loss %.4f (%.2f samples/s)",
                    epoch, i, steps_per_epoch, loss_meter.avg,
                    # each timed optimizer step consumed accum host batches
                    cfg.dataloader.batch_size * accum
                    / max(step_time.avg, 1e-9),
                )
        for v in pending_losses:
            loss_meter.update(float(v))
        pending_losses.clear()
        logging.info("epoch %d freeze check: %s", epoch,
                     diff_report(pre_snapshot, state.params))

        results = {"epoch": epoch, "train_loss": loss_meter.avg}
        if (
            eval_data
            and cfg.solver.zeroshot_frequency
            and ((epoch + 1) % cfg.solver.zeroshot_frequency == 0
                 or epoch + 1 == cfg.solver.epochs)
        ):
            if merge_eval is not None:
                # bake the adapters once per eval: the encoders see a
                # plain merged param tree (same compiled encode fns)
                eval_p = merge_eval(lora_base, state.params,
                                    scale=lora_scale)
            else:
                eval_p = state.params
            enc_img = lambda px: eval_enc_img(eval_p, put_eval(px))
            enc_txt = lambda ids, mask: eval_enc_txt(
                eval_p, put_eval(ids), put_eval(mask))
            zs = zs_eval.zero_shot_eval(
                enc_img, enc_txt, tokenizer, eval_data,
                prompts_path=cfg.dataset.zeroshot_cls_prompts or None,
                batch_size=min(cfg.dataloader.batch_size, 64),
                max_length=cfg.keep.max_text_length,
            )
            results.update(zs)
            if "val" in eval_data:
                # val contrastive loss + R@K/rank metrics on paired features
                # (evaluate, train_hierarchy.py:264-326)
                vb = min(cfg.dataloader.batch_size, 64)
                vpix, vtexts = eval_data["val"]
                vimg = zs_eval.encode_in_batches(enc_img, [vpix], vb)
                venc = tokenizer(list(vtexts),
                                 max_length=cfg.keep.max_text_length)
                vtxt = zs_eval.encode_in_batches(
                    enc_txt, [venc["input_ids"], venc["attention_mask"]], vb
                )
                results.update(zs_eval.validation_metrics(
                    vimg, vtxt, float(jnp.exp(state.params["logit_scale"]))
                ))
            logging.info("epoch %d eval: %s", epoch, zs)
        append_results(os.path.join(ckpt_dir, "results.jsonl"), results)
        writer.write(int(state.step), results)

        if (epoch + 1) % cfg.save.save_frequency == 0 or epoch + 1 == cfg.solver.epochs:
            if ckpt_writer is None:
                ckpt_writer = ckpt.CheckpointWriter(
                    ckpt_dir, async_save=cfg.save.async_checkpointing,
                    keep_previous=not cfg.save.delete_previous_checkpoint,
                )
            ckpt_writer.save(epoch, state.params, state.opt_state,
                             step=int(state.step))
            logging.info("saved checkpoint epoch %d%s", epoch,
                         " (async)" if cfg.save.async_checkpointing else "")
    if ckpt_writer is not None:
        ckpt_writer.close()  # waits for any pending async save
    writer.close()
    if sync_proc is not None:
        from keep_tpu.train.sync import remote_sync

        remote_sync(ckpt_dir, cfg.save.remote_sync)  # final sync
        sync_proc.terminate()
    return results


def main(argv: Optional[list[str]] = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="YAML run config")
    parser.add_argument("--resume", help="override save.resume ('latest' or epoch)")
    parser.add_argument("--experiment-name", help="override save.experiment_name")
    args = parser.parse_args(argv)
    cfg = TrainRunConfig.from_yaml(args.config)
    if args.resume is not None:
        cfg.save.resume = args.resume
    if args.experiment_name is not None:
        cfg.save.experiment_name = args.experiment_name
    return train(cfg)


if __name__ == "__main__":
    main()
