"""Training loop with callbacks, checkpointing, and watchdog.

Condensed equivalent of ImaginaireTrainer / ImaginaireTrainer_Distill
(imaginaire/trainer.py:42-233, rcm/trainers/trainer_distillation.py:42-295):
grad-accum-free loop, per-step callback fan-out, periodic async checkpoints,
resume from latest, SIGALRM stall watchdog (imaginaire/trainer.py:132).
"""

from __future__ import annotations

import json
import logging
import signal
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

log = logging.getLogger("turbodiffusion_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s|%(levelname)s|%(message)s", "%H:%M:%S"))
    log.addHandler(_h)
    log.setLevel(logging.INFO)


class Callback:
    """Hook surface ≡ imaginaire CallBackGroup (utils/callback.py:45-101)."""

    def on_train_start(self, state): ...
    def on_training_step_start(self, state, iteration: int): ...
    def on_training_step_end(self, state, metrics: Dict, iteration: int): ...
    def on_save_checkpoint(self, state, iteration: int): ...
    def on_train_end(self, state): ...


class IterSpeed(Callback):
    """rcm/callbacks/iter_speed.py analog: rolling it/s + loss logging."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n
        self.t0 = None

    def on_training_step_end(self, state, metrics, iteration):
        if self.t0 is None:
            self.t0 = time.perf_counter()
            return
        if iteration % self.every_n == 0:
            dt = (time.perf_counter() - self.t0) / self.every_n
            self.t0 = time.perf_counter()
            ms = {k: float(v) for k, v in metrics.items()}
            log.info(f"iter {iteration} | {1.0/dt:.2f} it/s | " +
                     " ".join(f"{k}={v:.4f}" for k, v in ms.items()))


class JsonlLogger(Callback):
    """Metrics sink (wandb_log.py analog for a zero-egress environment)."""

    def __init__(self, path: str):
        self.path = path

    def on_training_step_end(self, state, metrics, iteration):
        with open(self.path, "a") as f:
            f.write(json.dumps(
                {"iteration": iteration,
                 **{k: float(v) for k, v in metrics.items()}}) + "\n")


class HeartBeat(Callback):
    """Touches a liveness file every N seconds for external monitors
    (rcm/callbacks/heart_beat.py:29-106)."""

    def __init__(self, path: str, every_secs: float = 60.0):
        self.path = path
        self.every_secs = every_secs
        self._last = 0.0

    def on_training_step_end(self, state, metrics, iteration):
        now = time.time()
        if now - self._last >= self.every_secs:
            with open(self.path, "w") as f:
                f.write(f"{iteration} {now}\n")
            self._last = now


class GradNormMonitor(Callback):
    """Per-step parameter-norm record (GradClip magnitude records,
    rcm/callbacks/grad_clip.py:55)."""

    def __init__(self):
        self.history = []

    def on_training_step_end(self, state, metrics, iteration):
        if "grad_norm" in metrics:
            self.history.append(float(metrics["grad_norm"]))


class DeviceMonitor(Callback):
    """Periodic per-device utilization/memory report (the reference's
    DeviceMonitor callback, rcm/callbacks/device_monitor.py: GPU
    util/mem/temp via pynvml — here TPU/host equivalents: per-device HBM
    in-use and peak from `memory_stats()`, host RSS from /proc)."""

    def __init__(self, every_n: int = 50):
        self.every_n = every_n
        self.last: Dict = {}

    @staticmethod
    def snapshot() -> Dict:
        report: Dict = {"devices": []}
        for d in jax.local_devices():
            entry = {"id": d.id, "kind": d.device_kind}
            try:
                stats = d.memory_stats() or {}
                entry["bytes_in_use"] = int(stats.get("bytes_in_use", 0))
                entry["peak_bytes_in_use"] = int(
                    stats.get("peak_bytes_in_use", 0))
                entry["bytes_limit"] = int(stats.get("bytes_limit", 0))
            except Exception:
                pass  # CPU devices expose no memory stats
            report["devices"].append(entry)
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        report["host_rss_kb"] = int(line.split()[1])
                        break
        except OSError:
            pass
        return report

    def on_training_step_end(self, state, metrics, iteration):
        if iteration % self.every_n:
            return
        self.last = self.snapshot()
        parts = []
        for d in self.last["devices"]:
            if "bytes_in_use" in d:
                lim = d.get("bytes_limit") or 1
                parts.append(
                    f"d{d['id']} {d['bytes_in_use'] / 2**30:.2f}/"
                    f"{lim / 2**30:.2f}GiB "
                    f"(peak {d['peak_bytes_in_use'] / 2**30:.2f})")
        rss = self.last.get("host_rss_kb", 0) / 2**20
        log.info(f"iter {iteration} device mem: "
                 f"{'; '.join(parts) or 'n/a'}; host rss {rss:.2f}GiB")
        metrics["device_bytes_in_use"] = max(
            (d.get("bytes_in_use", 0) for d in self.last["devices"]),
            default=0)


class EveryNDrawSample(Callback):
    """Periodically run the few-step sampler and save decoded videos —
    training-time visual validation (rcm/callbacks/every_n_draw_distill.py:102,
    every_n_draw_sla.py:90). Draws with both regular and EMA weights when EMA
    is tracked."""

    def __init__(self, every_n: int, draw_fn, out_dir: str = "samples"):
        """draw_fn(params, tag, iteration) -> path of the saved sample."""
        self.every_n = every_n
        self.draw_fn = draw_fn
        self.out_dir = out_dir

    def on_training_step_end(self, state, metrics, iteration):
        if iteration == 0 or iteration % self.every_n:
            return
        # explicit None checks: pytrees have no truthiness, and a state with
        # neither attr must hit the warning path, not raise
        params = getattr(state, "student", None)
        if params is None:
            params = getattr(state, "params", None)
        try:
            if params is None:
                raise AttributeError(
                    f"state {type(state).__name__} has neither .student "
                    "nor .params")
            self.draw_fn(params, "reg", iteration)
            ema = getattr(state, "ema", None)
            if ema is not None:
                self.draw_fn(ema, "ema", iteration)
        except Exception as e:  # sampling must never kill training
            log.warning(f"EveryNDrawSample failed at iter {iteration}: {e}")


@dataclass
class TrainerConfig:
    max_iter: int = 1000
    save_every: int = 500
    watchdog_secs: int = 0       # 0 disables (trainer.py:132 SIGALRM)
    log_every: int = 10


class Trainer:
    def __init__(self, cfg: TrainerConfig, train_step: Callable,
                 checkpointer=None, callbacks: Optional[List[Callback]] = None):
        self.cfg = cfg
        self.train_step = train_step
        self.checkpointer = checkpointer
        self.callbacks = callbacks or [IterSpeed(cfg.log_every)]

    def _fan(self, hook: str, *args):
        for cb in self.callbacks:
            getattr(cb, hook)(*args)

    def train(self, state, dataloader, key: jax.Array, start_iter: int = 0):
        if self.cfg.watchdog_secs:
            def _timeout(signum, frame):
                raise TimeoutError(
                    f"no training step completed within "
                    f"{self.cfg.watchdog_secs}s (watchdog)")
            signal.signal(signal.SIGALRM, _timeout)

        self._fan("on_train_start", state)
        it = start_iter
        data_iter = iter(dataloader)
        while it < self.cfg.max_iter:
            if self.cfg.watchdog_secs:
                signal.alarm(self.cfg.watchdog_secs)
            self._fan("on_training_step_start", state, it)
            batch = next(data_iter)
            key, sub = jax.random.split(key)
            state, metrics = self.train_step(state, batch, sub)
            self._fan("on_training_step_end", state, metrics, it)
            it += 1
            if self.checkpointer and it % self.cfg.save_every == 0:
                self.checkpointer.save(it, state)
                self._fan("on_save_checkpoint", state, it)
        if self.cfg.watchdog_secs:
            signal.alarm(0)
        if self.checkpointer:
            self.checkpointer.save(self.cfg.max_iter, state)
            self.checkpointer.wait()
        self._fan("on_train_end", state)
        return state
