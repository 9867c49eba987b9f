"""Training CLI: SLA white-box finetune or rCM distillation.

Reference surface: `torchrun -m scripts.train --config=... -- key=value`
(scripts/train.py:50-82). Here: a typed-config CLI with dotted overrides and
two experiments ("sla", "rcm") replacing the hydra registries
(rcm/configs/registry_{sla,distill}.py).

Usage:
  python -m turbodiffusion_tpu.scripts.train --experiment rcm \
      --data 'shards/*.tar' --teacher_ckpt teacher.pth --model Wan2.1-1.3B \
      -- distill.student_update_freq=5 trainer.max_iter=10000
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import sys


def apply_dotted_overrides(obj, overrides):
    """key=value dotted overrides onto (possibly nested) dataclasses."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        parts = key.split(".")
        target = obj
        for p in parts[:-1]:
            target = getattr(target, p)
        cur = getattr(target, parts[-1])
        typ = type(cur) if cur is not None else str
        val = (raw.lower() == "true") if typ is bool else typ(raw)
        if dataclasses.is_dataclass(target):
            # frozen dataclasses: rebuild along the path
            obj = _replace_path(obj, parts, val)
        else:
            setattr(target, parts[-1], val)
    return obj


def _replace_path(obj, parts, val):
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: val})
    child = getattr(obj, parts[0])
    return dataclasses.replace(
        obj, **{parts[0]: _replace_path(child, parts[1:], val)})


def main():
    argv = sys.argv[1:]
    overrides = []
    if "--" in argv:
        idx = argv.index("--")
        argv, overrides = argv[:idx], argv[idx + 1:]

    p = argparse.ArgumentParser(description="TurboDiffusion-TPU training")
    p.add_argument("--experiment", choices=["sla", "rcm"], required=True)
    p.add_argument("--model", default="Wan2.1-1.3B")
    p.add_argument("--data", required=True, help="glob of tar shards")
    p.add_argument("--teacher_ckpt", default=None)
    p.add_argument("--ckpt_dir", default="checkpoints/run")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--max_iter", type=int, default=10000)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--sla_topk", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--metrics_jsonl", default=None)
    p.add_argument("--mesh", type=str, default=None, metavar="DP,FSDP,CP",
                   help="Multi-chip mesh, e.g. 1,4,2: params+optimizer "
                        "FSDP-sharded, batch data-sharded, sequence "
                        "context-sharded (reference default: torchrun "
                        "FSDP+CP, scripts/train.py:50-82)")
    p.add_argument("--remat", default=None,
                   choices=["none", "mm_only", "attn_only", "self_attn_only",
                            "block_wise", "full"],
                   help="activation checkpointing (SAC analog, "
                        "selective_activation_checkpoint.py:26-59); "
                        "defaults to mm_only when --mesh shards params")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from turbodiffusion_tpu.pipelines.pipeline import make_wan_cfg, load_dit
    from turbodiffusion_tpu.training import distill as D
    from turbodiffusion_tpu.training.checkpointing import Checkpointer
    from turbodiffusion_tpu.training.data import WebDatasetLoader
    from turbodiffusion_tpu.training.train_step import (
        TrainState, make_optimizer, make_train_step)
    from turbodiffusion_tpu.training.trainer import (
        IterSpeed, JsonlLogger, Trainer, TrainerConfig)

    from turbodiffusion_tpu.inference.wan2_1_t2v import parse_mesh
    from turbodiffusion_tpu.parallel.sharding import (
        make_mesh, shard_batch, shard_params, use_mesh)

    mesh_cfg = parse_mesh(args.mesh)
    mesh = make_mesh(mesh_cfg) if mesh_cfg else None
    remat = args.remat
    if remat is None:
        # FSDP re-gathers params per block anyway; mm_only recompute is the
        # reference's training default (configs/experiments/*:sac_config)
        remat = "mm_only" if (mesh_cfg and mesh_cfg.fsdp > 1) else "none"

    shards = sorted(glob.glob(args.data))
    loader = WebDatasetLoader(shards, args.batch_size,
                              host_id=jax.process_index(),
                              num_hosts=jax.process_count(), seed=args.seed)

    optimizer = make_optimizer(lr=args.lr)
    tcfg = TrainerConfig(max_iter=args.max_iter, save_every=args.save_every)
    tcfg = apply_dotted_overrides(tcfg, [o for o in overrides
                                         if o.startswith("trainer.")])

    # `model.key=value` overrides customize architecture dims (e.g. a
    # mid-size config that fits one chip: model.dim=768 model.num_heads=6
    # model.num_layers=2); applied to student and teacher alike.
    model_ovr = [o[len("model."):] for o in overrides
                 if o.startswith("model.")]

    import contextlib
    ctx = use_mesh(mesh) if mesh is not None else contextlib.nullcontext()
    with ctx:
        if args.experiment == "sla":
            cfg = make_wan_cfg(args.model, attention_type="sla",
                               sla_topk=args.sla_topk)
            cfg_teacher = make_wan_cfg(args.model, attention_type="original")
            cfg = apply_dotted_overrides(cfg, model_ovr)
            cfg_teacher = apply_dotted_overrides(cfg_teacher, model_ovr)
            cfg = dataclasses.replace(cfg, remat=remat)
            cfg_teacher = dataclasses.replace(cfg_teacher, remat=remat)
            # student initializes FROM the teacher weights; the teacher stays
            # frozen with dense attention (t2v_model_sla.py). Keep the linear
            # branch even with zero-init proj_l — it must receive gradients.
            params, _ = load_dit(args.teacher_ckpt, cfg, args.seed)
            teacher, _ = load_dit(args.teacher_ckpt, cfg_teacher, args.seed)
            if mesh is not None:
                # FSDP placement: optimizer.init inherits the param shardings
                # (≡ fully_shard + DTensor optimizer state,
                # rcm/utils/fsdp_helper.py:96-149)
                params = shard_params(params, mesh)
                teacher = shard_params(teacher, mesh)
            state = TrainState(params, optimizer.init(params),
                               jnp.zeros((), jnp.int32))
            from turbodiffusion_tpu.training.train_step import (
                make_sla_train_step)
            step = make_sla_train_step(cfg, cfg_teacher, teacher, optimizer)
        else:
            cfg = make_wan_cfg(args.model, attention_type="original")
            cfg = apply_dotted_overrides(cfg, model_ovr)
            cfg = dataclasses.replace(cfg, remat=remat)
            dcfg = D.DistillConfig()
            dcfg = apply_dotted_overrides(
                dcfg, [o[len("distill."):] for o in overrides
                       if o.startswith("distill.")])
            teacher, _ = load_dit(args.teacher_ckpt, cfg, args.seed)
            if mesh is not None:
                teacher = shard_params(teacher, mesh)
            state = D.create_distill_state(teacher, optimizer, dcfg)
            step = D.make_distill_steps(cfg, dcfg, optimizer)

        if mesh is not None:
            base_step = step

            def step(state, batch, key):
                arrs = {k: v for k, v in batch.items()
                        if hasattr(v, "dtype")}
                return base_step(state, shard_batch(arrs, mesh), key)

        if mesh is not None:
            ptree = getattr(state, "params", None)
            if ptree is None:
                ptree = state.student
            specs = sorted({str(l.sharding.spec)
                            for l in jax.tree.leaves(ptree)
                            if hasattr(l, "sharding")})
            print(f"mesh {dict(mesh.shape)} remat={remat} "
                  f"param shardings: {specs}", flush=True)

        ckpt = Checkpointer(args.ckpt_dir)
        restored, at = ckpt.restore(state)
        start = 0
        if restored is not None:
            state, start = restored, at
            print(f"resumed from iteration {at}")

        callbacks = [IterSpeed(tcfg.log_every)]
        if args.metrics_jsonl:
            callbacks.append(JsonlLogger(args.metrics_jsonl))
        trainer = Trainer(tcfg, step, checkpointer=ckpt, callbacks=callbacks)
        trainer.train(state, loader, jax.random.PRNGKey(args.seed),
                      start_iter=start)


if __name__ == "__main__":
    main()
