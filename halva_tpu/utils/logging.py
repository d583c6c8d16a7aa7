"""Observability: rank-aware logging, step metrics, profiler hooks.

The reference scatters rank0_print (train_halva.py:29-31), wandb report_to,
file loggers (llava/utils.py:17-60) and no profiler at all; SURVEY.md §5
asks for first-class step timing + jax.profiler hooks.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional

import jax

_logger: Optional[logging.Logger] = None


def is_main_process() -> bool:
    return jax.process_index() == 0


def get_logger(name: str = "halva_tpu") -> logging.Logger:
    global _logger
    if _logger is None:
        logger = logging.getLogger(name)
        if not logger.handlers:
            h = logging.StreamHandler(sys.stdout)
            h.setFormatter(
                logging.Formatter(
                    "%(asctime)s %(levelname).1s %(name)s: %(message)s"
                )
            )
            logger.addHandler(h)
        logger.setLevel(logging.INFO)
        _logger = logger
    return _logger


def log0(msg: str, *args) -> None:
    """rank0_print equivalent."""
    if is_main_process():
        get_logger().info(msg, *args)


class MetricsLogger:
    """Append-only JSONL metrics (crash-tolerant, like the reference's
    flushed answers JSONL, model_vqa_loader.py:122-129)."""

    def __init__(self, path: Optional[str], report_to: str = "none"):
        self._f = None
        self._wandb = None
        if path and is_main_process():
            os.makedirs(
                os.path.dirname(os.path.abspath(path)), exist_ok=True
            )
            self._f = open(path, "a")
        if report_to == "wandb" and is_main_process():
            try:  # optional, like the reference's --report_to wandb
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "halva-tpu"),
                    resume="allow",
                )
            except Exception:
                get_logger().warning("wandb unavailable; JSONL only")

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        if self._wandb:
            self._wandb.log(
                {k: v for k, v in rec.items() if k != "time"}, step=step
            )
        log0(
            "step %d | %s",
            step,
            " ".join(
                f"{k}={rec[k]:.4g}" if isinstance(rec[k], float) else f"{k}={rec[k]}"
                for k in metrics
            ),
        )

    def close(self):
        if self._f:
            self._f.close()


class StepTimer:
    """EMA step timing + tokens/sec."""

    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg = None
        self._last = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._avg = (
                dt
                if self._avg is None
                else self._ema * self._avg + (1 - self._ema) * dt
            )
        self._last = now
        return dt

    @property
    def avg(self) -> Optional[float]:
        return self._avg


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """jax.profiler trace scope (view in TensorBoard/XProf)."""
    if logdir:
        jax.profiler.start_trace(logdir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    else:
        yield
