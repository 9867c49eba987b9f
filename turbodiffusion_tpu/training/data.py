"""Training data pipeline: webdataset-style tar shards of precomputed latents.

Reference: rcm/datasets/webdataset.py — tar shards whose members are grouped
by basename with extensions {latent.pt -> latents, embed.pt ->
t5_text_embeddings, prompt.txt -> prompts} (:36-48), shard shuffling,
split_by_node/split_by_worker sharding; and
rcm/datasets/build_synthetic_dataset.py — a builder that runs the teacher
sampler to emit synthetic latent shards.

TPU-side design: a plain-Python generator (tarfile + torch.load on CPU)
feeding fixed-shape jnp batches; shards are split across hosts by index
(≡ split_by_node) and prefetched one shard ahead.
"""

from __future__ import annotations

import io
import os
import random
import tarfile
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


KEY_MAP = {  # webdataset.py:36-48
    "latent.pt": "latents",
    "embed.pt": "t5_text_embeddings",
    "prompt.txt": "prompts",
}


def _load_member(name: str, data: bytes):
    if name.endswith(".pt"):
        import torch
        t = torch.load(io.BytesIO(data), map_location="cpu",
                       weights_only=True)
        if t.dtype == torch.bfloat16:
            t = t.to(torch.float32)
        return t.numpy()
    if name.endswith(".txt"):
        return data.decode("utf-8")
    if name.endswith(".npy"):
        return np.load(io.BytesIO(data))
    return data


def iter_tar_samples(shard_path: str, native: bool = True) -> Iterator[Dict]:
    """Group tar members by basename, map extensions to batch keys.

    native=True uses the C tar indexer + threaded range reads
    (csrc/host_ops.cpp tar_index/tar_read_ranges) — the Python tarfile
    module is the single-host-core bottleneck on data-heavy training;
    falls back to tarfile automatically."""
    if native:
        from turbodiffusion_tpu.utils import host_ops
        try:
            members = host_ops.tar_index(shard_path)
        except OSError:
            members = None
        if members is not None:
            blobs = host_ops.tar_read_ranges(
                shard_path, [(off, size) for _, off, size in members])
            sample: Dict = {}
            current = None
            for (name, _, _), data in zip(members, blobs):
                base, _, ext = name.partition(".")
                if current is not None and base != current and sample:
                    yield sample
                    sample = {}
                current = base
                key = KEY_MAP.get(name[len(base) + 1:])
                if key is not None:
                    sample[key] = _load_member(name, data)
            if sample:
                yield sample
            return

    sample = {}
    current = None
    with tarfile.open(shard_path) as tf:
        for member in tf:
            if not member.isfile():
                continue
            base, _, ext = member.name.partition(".")
            if current is not None and base != current and sample:
                yield sample
                sample = {}
            current = base
            data = tf.extractfile(member).read()
            key = KEY_MAP.get(member.name[len(base) + 1:])
            if key is not None:
                sample[key] = _load_member(member.name, data)
        if sample:
            yield sample


class WebDatasetLoader:
    """Sharded, shuffled, batched loader over tar shards."""

    def __init__(self, shard_paths: Sequence[str], batch_size: int,
                 host_id: int = 0, num_hosts: int = 1, seed: int = 0,
                 shuffle: bool = True, loop: bool = True):
        self.shards = sorted(shard_paths)
        assert self.shards, "no shards given"
        self.batch_size = batch_size
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.seed = seed
        self.shuffle = shuffle
        self.loop = loop

    def _epoch_shards(self, epoch: int) -> List[str]:
        shards = list(self.shards)
        if self.shuffle:
            random.Random(self.seed + epoch).shuffle(shards)
        return shards[self.host_id::self.num_hosts]  # split_by_node

    def __iter__(self):
        epoch = 0
        buf: List[Dict] = []
        while True:
            for shard in self._epoch_shards(epoch):
                for sample in iter_tar_samples(shard):
                    buf.append(sample)
                    if len(buf) == self.batch_size:
                        yield self._collate(buf)
                        buf = []
            epoch += 1
            if not self.loop:
                if buf:
                    yield self._collate(buf)
                return

    @staticmethod
    def _collate(samples: List[Dict]) -> Dict:
        out: Dict = {}
        for key in samples[0]:
            vals = [s[key] for s in samples]
            if isinstance(vals[0], np.ndarray):
                out[key] = np.stack(vals)
            else:
                out[key] = vals
        return out


def write_tar_shard(path: str, samples: Sequence[Dict]):
    """Write samples to a tar shard in the reference layout (inverse of
    iter_tar_samples; used by the synthetic dataset builder)."""
    import torch
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    inv = {v: k for k, v in KEY_MAP.items()}
    with tarfile.open(path, "w") as tf:
        for i, sample in enumerate(samples):
            for key, value in sample.items():
                ext = inv.get(key)
                if ext is None:
                    continue
                if ext.endswith(".pt"):
                    bio = io.BytesIO()
                    torch.save(torch.from_numpy(np.asarray(value)), bio)
                    data = bio.getvalue()
                else:
                    data = str(value).encode("utf-8")
                info = tarfile.TarInfo(name=f"{i:09d}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def build_synthetic_shard(path: str, pipe, prompts: Sequence[str],
                          gen=None, num_steps: int = 4):
    """Synthetic latent shard builder (build_synthetic_dataset.py:72-289):
    run the (teacher or student) sampler per prompt and store latents +
    text embeddings."""
    import jax
    import jax.numpy as jnp
    from turbodiffusion_tpu.config import GenerationConfig
    from turbodiffusion_tpu.pipelines.sampler import rcm_timesteps

    gen = gen or GenerationConfig()
    samples = []
    for i, prompt in enumerate(prompts):
        emb = pipe.text_encoder(prompt)
        video = pipe.generate_t2v(prompt, gen, text_emb=emb)
        # re-encode to latents through the VAE
        from turbodiffusion_tpu.models.vae import vae_encode
        latents = vae_encode(pipe.vae_params,
                             jnp.asarray(video * 2.0 - 1.0))
        samples.append({
            "latents": np.asarray(latents[0]),
            "t5_text_embeddings": np.asarray(emb[0], np.float32),
            "prompts": prompt,
        })
    write_tar_shard(path, samples)
    return len(samples)
