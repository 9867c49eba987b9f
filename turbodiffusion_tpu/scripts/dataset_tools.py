"""Dataset shard utilities — merge small webdataset tar shards into larger
ones and visualize latent shards through the VAE.

Analogs of the reference's dataset tooling
(rcm/datasets/merge_tar_shards.py, rcm/datasets/visualize_tar.py), built on
this framework's native tar reader (csrc/host_ops.cpp) and JAX VAE.

    python -m turbodiffusion_tpu.scripts.dataset_tools merge \
        --input_dir small/ --output_dir big/ --target_shard_size 5000
    python -m turbodiffusion_tpu.scripts.dataset_tools visualize \
        --tar_path shard-00000.tar --output_dir viz/ [--vae_path vae.pth] \
        [--max_samples 8]
"""

from __future__ import annotations

import argparse
import glob
import io
import os
import sys
import tarfile
from collections import defaultdict


def _iter_raw_samples(tar_path: str):
    """Yield (key, {member_name: bytes}) groups by dot-prefix, preserving
    member bytes verbatim (no decode — merge must be lossless)."""
    samples = defaultdict(dict)
    order = []
    with tarfile.open(tar_path, "r") as tf:
        for m in tf:
            if not m.isfile():
                continue
            name = os.path.basename(m.name)
            prefix = name.split(".")[0]
            if prefix not in samples:
                order.append(prefix)
            f = tf.extractfile(m)
            if f is not None:
                samples[prefix][name] = f.read()
    for key in order:
        yield key, samples[key]


def cmd_merge(args) -> int:
    shards = sorted(glob.glob(os.path.join(args.input_dir, "*.tar")))
    if not shards:
        print(f"no .tar shards in {args.input_dir}", file=sys.stderr)
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    out_idx = n_in_shard = total = 0
    writer = None

    def open_writer(i):
        path = os.path.join(args.output_dir, f"shard-{i:05d}.tar")
        return tarfile.open(path, "w"), path

    writer, wpath = open_writer(out_idx)
    for shard in shards:
        for key, files in _iter_raw_samples(shard):
            if n_in_shard >= args.target_shard_size:
                writer.close()
                print(f"wrote {wpath} ({n_in_shard} samples)")
                out_idx += 1
                n_in_shard = 0
                writer, wpath = open_writer(out_idx)
            for name, blob in sorted(files.items()):
                info = tarfile.TarInfo(name=f"{total:09d}.{name.split('.', 1)[1]}"
                                       if args.renumber else name)
                info.size = len(blob)
                writer.addfile(info, io.BytesIO(blob))
            n_in_shard += 1
            total += 1
    writer.close()
    print(f"wrote {wpath} ({n_in_shard} samples)")
    print(f"merged {len(shards)} shards -> {out_idx + 1} shards, "
          f"{total} samples")
    return 0


def cmd_visualize(args) -> int:
    import jax
    import numpy as np

    from turbodiffusion_tpu.training.data import iter_tar_samples
    from turbodiffusion_tpu.utils.video_io import save_video

    os.makedirs(args.output_dir, exist_ok=True)

    from turbodiffusion_tpu.models.vae import init_vae_params, vae_decode
    if args.vae_path:
        from turbodiffusion_tpu.utils.checkpoint import (
            load_torch_state_dict, vae_params_from_state_dict)
        params = vae_params_from_state_dict(
            load_torch_state_dict(args.vae_path))
    else:
        print("no --vae_path: random-weight VAE (layout/debug runs only)")
        params = init_vae_params(jax.random.PRNGKey(0))

    n = 0
    for sample in iter_tar_samples(args.tar_path):
        if "latents" not in sample:
            continue
        lat = np.asarray(sample["latents"], np.float32)
        if lat.ndim == 4:                       # (C, T, h, w) -> batch 1
            lat = lat[None]
        video = np.asarray(vae_decode(params, lat), np.float32)
        video01 = np.clip((video[0] + 1.0) / 2.0, 0.0, 1.0)
        path = save_video(video01, os.path.join(args.output_dir,
                                                f"sample_{n:04d}.mp4"))
        prompt = sample.get("prompts", "")
        if prompt:
            with open(os.path.join(args.output_dir,
                                   f"sample_{n:04d}.txt"), "w") as f:
                f.write(prompt)
        print(f"{path}  latent{tuple(lat.shape)} -> video"
              f"{tuple(video.shape)}  {prompt[:60]!r}")
        n += 1
        if args.max_samples and n >= args.max_samples:
            break
    if n == 0:
        print("no samples with a .latent.pt member found", file=sys.stderr)
        return 1
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("merge", help="re-shard small tars into larger ones")
    m.add_argument("--input_dir", required=True)
    m.add_argument("--output_dir", required=True)
    m.add_argument("--target_shard_size", type=int, default=5000)
    m.add_argument("--renumber", action="store_true",
                   help="renumber sample keys sequentially across shards")

    v = sub.add_parser("visualize",
                       help="decode latent samples from a shard via the VAE")
    v.add_argument("--tar_path", required=True)
    v.add_argument("--output_dir", required=True)
    v.add_argument("--vae_path", default=None)
    v.add_argument("--max_samples", type=int, default=8)

    args = p.parse_args(argv)
    return {"merge": cmd_merge, "visualize": cmd_visualize}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
