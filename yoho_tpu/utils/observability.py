"""Observability: scalar logging, stage timers, profiler hooks, env dump.

Upgrades the reference's ad-hoc story (SURVEY.md §5.1, §5.5):
tensorboardX ``Logger``/``Recorder`` (``utils/utils.py:168-219``),
scattered ``time.time()`` deltas (``YOHO_testset.py:138``,
``tests/extractor.py:161``), and MinkowskiEngine's
``diagnostics.print_diagnostics`` (``MinkowskiEngine/diagnostics.py:19``)
— as first-class, dependency-light utilities (JSONL + optional
TensorBoard via torch, ``jax.profiler`` traces).
"""

from __future__ import annotations

import contextlib
import json
import os
import platform
import sys
import time
from collections import defaultdict
from typing import Dict, Optional


class Logger:
    """Scalar logger: JSONL always; TensorBoard if torch is available;
    plain ``train.txt``/``val.txt`` mirrors like the reference Logger
    (``utils/utils.py:204-219``)."""

    def __init__(self, log_dir: str, tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def log(self, data: Dict[str, float], prefix: str, step: int, verbose: bool = False):
        rec = {"step": int(step), "prefix": prefix}
        msg = f"{prefix} step {step}"
        for k, v in data.items():
            v = float(v)
            rec[k] = v
            msg += f" | {k} {v:.5f}"
            if self._tb is not None:
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        with open(os.path.join(self.log_dir, f"{prefix}.txt"), "a") as f:
            f.write(msg + "\n")
        if verbose:
            print(msg, flush=True)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StageTimer:
    """Accumulating per-stage wall-clock timers.

    >>> t = StageTimer()
    >>> with t("lift"): ...
    >>> t.report()  # {'lift': {'total_s': ..., 'count': ..., 'mean_s': ...}}
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.counters = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[stage] += time.perf_counter() - t0
            self.counts[stage] += 1

    def count(self, name: str, n: int = 1) -> None:
        """Accumulate a saturation/event counter (e.g. dropped voxels).
        Nonzero counters are included in ``report()`` so silent
        truncation becomes visible in results.log / eval JSON."""
        self.counters[name] += int(n)

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_s": round(self.totals[k] / max(self.counts[k], 1), 4),
            }
            for k in self.totals
        }
        if self.counters:
            out["counters"] = dict(self.counters)
        return out

    def __str__(self):
        return " | ".join(
            f"{k}: {v['total_s']:.2f}s/{v['count']}" for k, v in self.report().items()
        )


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """``jax.profiler`` trace scope; no-op when log_dir is falsy.
    View with TensorBoard or xprof (replaces the reference's NVTX
    ranges, ``src/3rdparty/cudf/detail/nvtx/nvtx3.hpp``)."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def print_diagnostics(file=None) -> Dict[str, str]:
    """Environment dump (ME ``diagnostics.print_diagnostics`` analog)."""
    file = file or sys.stdout
    info: Dict[str, str] = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["devices"] = ", ".join(str(d) for d in jax.devices())
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable: {e}"
    for mod in ("flax", "optax", "numpy"):
        try:
            info[mod] = __import__(mod).__version__
        except Exception:
            info[mod] = "unavailable"
    for k, v in info.items():
        print(f"{k:14s}: {v}", file=file)
    return info
