"""Parity harness (scripts/parity.py) + torch-DCP interop
(scripts/convert.py dcp-to-pth).

The harness protocol is exercised end-to-end against self-generated dumps
(no released checkpoints exist in this environment — the point is that the
moment they do, parity is one command). The DCP test synthesizes a sharded
torch distributed checkpoint in the reference's layout
(rcm/checkpointers/dcp.py:16-49) and round-trips it."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, **kw):
    env = dict(os.environ)
    # PYTHONPATH = repo ONLY: drops the axon sitecustomize (which ignores
    # JAX_PLATFORMS) so the subprocess honors cpu (tests/test_cli.py:14-19)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=env, cwd=REPO, **kw)


def test_parity_dump_and_replay_roundtrip(tmp_path):
    """dump from the test pipeline, then replay the same pipeline against
    the dumps: every stage must be bit-identical (PSNR inf >= 50 dB)."""
    dump = str(tmp_path / "golden")
    common = ["--model", "test", "--random_weights",
              "--attention_type", "original"]
    r = _run(["-m", "turbodiffusion_tpu.scripts.parity", "dump",
              "--out_dir", dump, "--num_steps", "2", "--num_frames", "5",
              "--resolution", "tiny", "--aspect_ratio", "1:1"]
             + common)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(dump, "latent_step_001.npy"))
    assert os.path.exists(os.path.join(dump, "video.npy"))

    r = _run(["-m", "turbodiffusion_tpu.scripts.parity", "replay",
              "--dump_dir", dump, "--min_psnr", "50"] + common)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "PASS" in r.stdout


def test_parity_replay_detects_mismatch(tmp_path):
    """A corrupted golden must fail the threshold — the harness actually
    discriminates, it doesn't rubber-stamp."""
    dump = str(tmp_path / "golden")
    common = ["--model", "test", "--random_weights",
              "--attention_type", "original"]
    r = _run(["-m", "turbodiffusion_tpu.scripts.parity", "dump",
              "--out_dir", dump, "--num_steps", "2", "--num_frames", "5",
              "--resolution", "tiny", "--aspect_ratio", "1:1"]
             + common)
    assert r.returncode == 0, r.stderr[-2000:]
    v = np.load(os.path.join(dump, "video.npy"))
    np.save(os.path.join(dump, "video.npy"),
            np.clip(v + 0.25 * np.random.RandomState(0).rand(*v.shape),
                    0, 1).astype(v.dtype))
    r = _run(["-m", "turbodiffusion_tpu.scripts.parity", "replay",
              "--dump_dir", dump, "--min_psnr", "30"] + common)
    assert r.returncode != 0
    assert "FAIL" in r.stdout


def test_dcp_to_pth_roundtrip(tmp_path):
    """Synthesized torch-DCP shards -> .pth with net_ema.* -> net.*
    extraction and bf16 cast (dcp_to_pth.py:33-46 contract)."""
    torch = pytest.importorskip("torch")
    import torch.distributed.checkpoint as dcp

    sd = {
        "net.blocks.0.w": torch.randn(8, 8),
        "net_ema.blocks.0.w": torch.randn(8, 8),
        "net_ema.head.bias": torch.arange(4, dtype=torch.float32),
        "net_ema.step": torch.tensor(7, dtype=torch.int64),
    }
    model_dir = str(tmp_path / "iter_000000007" / "model")
    dcp.save(sd, storage_writer=dcp.FileSystemWriter(model_dir))

    out = str(tmp_path / "model.pth")
    r = _run(["-m", "turbodiffusion_tpu.scripts.convert", "dcp-to-pth",
              "--dcp_dir", model_dir, "--output_path", out])
    assert r.returncode == 0, r.stderr[-2000:]

    got = torch.load(out, weights_only=False)
    assert set(got) == {"net.blocks.0.w", "net.head.bias", "net.step"}
    assert got["net.blocks.0.w"].dtype == torch.bfloat16
    assert got["net.step"].dtype == torch.int64
    torch.testing.assert_close(
        got["net.blocks.0.w"].float(),
        sd["net_ema.blocks.0.w"].to(torch.bfloat16).float())
