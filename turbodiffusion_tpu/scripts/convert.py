"""Checkpoint conversion & quantization CLIs.

Covers the reference's converter surface:
  * quantize      — offline W8A8 quantization + attention-type stamping of a
                    DiT checkpoint (inference/modify_model.py:156-183,
                    scripts/quantize.sh)
  * ckpt-to-pth   — training checkpoint -> inference .pth with EMA weights
                    extracted (turbodiffusion/scripts/dcp_to_pth.py)
  * merge         — task-arithmetic model merging
                    (turbodiffusion/scripts/merge_models.py:6-60)
  * safetensors-to-pth — HF shards -> single state dict
                    (turbodiffusion/scripts/safetensors_to_pth.py)

Usage:
  python -m turbodiffusion_tpu.scripts.convert quantize \
      --model Wan2.1-1.3B --input_path in.pth --output_path out.pth \
      --attention_type sagesla [--quant_linear] [--mode block|postscale]
"""

from __future__ import annotations

import argparse
import glob
import sys


def _save_state_dict(sd: dict, path: str):
    """Save a numpy state dict as torch .pth (interop) or .npz."""
    if path.endswith(".npz"):
        import numpy as np
        np.savez(path, **sd)
        return
    import numpy as np
    import torch
    tsd = {}
    for k, v in sd.items():
        arr = np.asarray(v)
        t = torch.from_numpy(arr.copy())
        if arr.dtype == np.float32 and not k.endswith("scale"):
            t = t.to(torch.bfloat16) if "int8" not in k else t
        tsd[k] = t
    torch.save(tsd, path)


def cmd_quantize(args):
    import jax
    from turbodiffusion_tpu.ops.quant import quantize_wan_blocks
    from turbodiffusion_tpu.pipelines.pipeline import make_wan_cfg
    from turbodiffusion_tpu.utils.checkpoint import (
        load_torch_state_dict, strip_prefix, wan_params_from_state_dict,
        wan_state_dict_from_params)

    cfg = make_wan_cfg(args.model, args.attention_type, args.sla_topk,
                       quant_linear=args.quant_linear)
    sd = strip_prefix(load_torch_state_dict(args.input_path))
    params = wan_params_from_state_dict(sd, cfg)
    if args.quant_linear:
        # exported checkpoints keep the reference's per-linear Int8Linear
        # layout (ops/core.py:400-403) — no runtime QKV fusion on disk
        params["blocks"] = quantize_wan_blocks(params["blocks"],
                                               mode=args.mode,
                                               fuse_qkv=False)
    out = wan_state_dict_from_params(params, cfg)
    _save_state_dict(out, args.output_path)
    print(f"wrote {args.output_path} ({len(out)} tensors)")


def cmd_ckpt_to_pth(args):
    """Orbax training checkpoint -> inference .pth, extracting EMA weights
    (dcp_to_pth.py:36-46 extracts net_ema.* -> net.*)."""
    import jax
    from turbodiffusion_tpu.models.wan import init_wan_params
    from turbodiffusion_tpu.pipelines.pipeline import make_wan_cfg
    from turbodiffusion_tpu.training import distill as D
    from turbodiffusion_tpu.training.checkpointing import (
        Checkpointer, load_ema_as_params)
    from turbodiffusion_tpu.training.train_step import make_optimizer
    from turbodiffusion_tpu.utils.checkpoint import (
        wan_state_dict_from_params)

    cfg = make_wan_cfg(args.model, "original")
    template_params = init_wan_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    template = D.create_distill_state(template_params, opt, D.DistillConfig())
    ckpt = Checkpointer(args.ckpt_dir, async_save=False)
    state, step = ckpt.restore(template)
    if state is None:
        raise SystemExit(f"no checkpoint found in {args.ckpt_dir}")
    params = load_ema_as_params(state) if args.ema else state.student
    sd = wan_state_dict_from_params(params, cfg)
    _save_state_dict(sd, args.output_path)
    print(f"wrote {args.output_path} from iteration {step} "
          f"({'EMA' if args.ema else 'regular'} weights)")


def cmd_dcp_to_pth(args):
    """torch-DCP shard directory (__N_0.distcp) -> inference .pth.

    Interop with the reference's training checkpoints
    (rcm/checkpointers/dcp.py:16-49 layout; converter
    turbodiffusion/scripts/dcp_to_pth.py:33-46): reads the sharded
    distributed checkpoint single-process, extracts `net_ema.*` -> `net.*`
    (or `net.*` with --no-ema), casts floating tensors to bf16."""
    import torch
    from torch.distributed.checkpoint import FileSystemReader
    from torch.distributed.checkpoint.default_planner import (
        _EmptyStateDictLoadPlanner)
    from torch.distributed.checkpoint.state_dict_loader import (
        _load_state_dict)

    sd = {}
    _load_state_dict(sd, storage_reader=FileSystemReader(args.dcp_dir),
                     planner=_EmptyStateDictLoadPlanner(), no_dist=True)
    src = "net_ema." if args.ema else "net."
    out = {}
    for k, v in sd.items():
        if not k.startswith(src):
            continue
        nk = "net." + k[len(src):]
        if isinstance(v, torch.Tensor) and v.is_floating_point():
            v = v.to(torch.bfloat16)
        out[nk] = v
    if not out:
        # flat state dicts (no net./net_ema. prefix): pass through verbatim
        out = {k: (v.to(torch.bfloat16)
                   if isinstance(v, torch.Tensor) and v.is_floating_point()
                   else v)
               for k, v in sd.items()}
    torch.save(out, args.output_path)
    print(f"wrote {args.output_path} ({len(out)} tensors)")


def cmd_merge(args):
    """base + w*(target - diff_base) (merge_models.py:6-60)."""
    import numpy as np
    from turbodiffusion_tpu.utils.checkpoint import load_torch_state_dict
    base = load_torch_state_dict(args.base)
    tgt = load_torch_state_dict(args.target)
    dbase = load_torch_state_dict(args.diff_base)
    out = {}
    for k in base:
        if k in tgt and k in dbase:
            out[k] = base[k] + args.weight * (
                tgt[k].astype(base[k].dtype) - dbase[k].astype(base[k].dtype))
        else:
            out[k] = base[k]
    # carry over keys present only in target (e.g. proj_l from SLA finetune)
    for k in tgt:
        if k not in out:
            out[k] = tgt[k]
    _save_state_dict(out, args.output_path)
    print(f"wrote {args.output_path} ({len(out)} tensors)")


def cmd_safetensors_to_pth(args):
    """HF safetensors shards -> single .pth; reshapes the conv3d patch
    embedding to Linear (safetensors_to_pth.py:40-43)."""
    import numpy as np
    from turbodiffusion_tpu.utils.checkpoint import load_torch_state_dict
    sd = {}
    for path in sorted(glob.glob(args.input_glob)):
        sd.update(load_torch_state_dict(path))
    if "patch_embedding.weight" in sd and sd["patch_embedding.weight"].ndim == 5:
        w = sd["patch_embedding.weight"]
        sd["patch_embedding.weight"] = w.reshape(w.shape[0], -1)
    _save_state_dict(sd, args.output_path)
    print(f"wrote {args.output_path} ({len(sd)} tensors)")


def main():
    p = argparse.ArgumentParser(description="TurboDiffusion-TPU converters")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("quantize")
    q.add_argument("--model", default="Wan2.1-1.3B")
    q.add_argument("--input_path", required=True)
    q.add_argument("--output_path", required=True)
    q.add_argument("--attention_type", default="original",
                   choices=["sla", "sagesla", "original"])
    q.add_argument("--sla_topk", type=float, default=0.2)
    q.add_argument("--quant_linear", action="store_true")
    q.add_argument("--mode", default="block", choices=["block", "postscale"])
    q.set_defaults(fn=cmd_quantize)

    c = sub.add_parser("ckpt-to-pth")
    c.add_argument("--model", default="Wan2.1-1.3B")
    c.add_argument("--ckpt_dir", required=True)
    c.add_argument("--output_path", required=True)
    c.add_argument("--ema", action="store_true", default=True)
    c.add_argument("--no-ema", dest="ema", action="store_false")
    c.set_defaults(fn=cmd_ckpt_to_pth)

    d = sub.add_parser("dcp-to-pth")
    d.add_argument("--dcp_dir", required=True,
                   help="DCP model dir, e.g. checkpoints/iter_000010000/model")
    d.add_argument("--output_path", required=True)
    d.add_argument("--ema", action="store_true", default=True)
    d.add_argument("--no-ema", dest="ema", action="store_false")
    d.set_defaults(fn=cmd_dcp_to_pth)

    m = sub.add_parser("merge")
    m.add_argument("--base", required=True)
    m.add_argument("--target", required=True)
    m.add_argument("--diff_base", required=True)
    m.add_argument("--weight", type=float, default=1.0)
    m.add_argument("--output_path", required=True)
    m.set_defaults(fn=cmd_merge)

    s = sub.add_parser("safetensors-to-pth")
    s.add_argument("--input_glob", required=True)
    s.add_argument("--output_path", required=True)
    s.set_defaults(fn=cmd_safetensors_to_pth)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
