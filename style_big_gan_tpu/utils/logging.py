"""Logging sinks: stdout tee to log.txt, stats.jsonl, optional
TensorBoard/wandb (gated — both are optional in this image).

Rebuild of reference dnnlib Logger (util.py:56-112) + the four sink fan-out in
the trainer (reference: trainers.py:400-476, 850-866).
"""

from __future__ import annotations

import json
import os
import sys
from typing import Any, Dict, Optional


class Logger:
    """Tee stdout/stderr to a file (reference: dnnlib/util.py:56-112)."""

    def __init__(self, file_name: Optional[str] = None, mode: str = "w",
                 should_flush: bool = True):
        self.file = open(file_name, mode) if file_name else None
        self.should_flush = should_flush
        self.stdout = sys.stdout
        self.stderr = sys.stderr
        sys.stdout = self
        sys.stderr = self

    def write(self, text: str) -> None:
        if len(text) == 0:
            return
        if self.file is not None:
            self.file.write(text)
        self.stdout.write(text)
        if self.should_flush:
            self.flush()

    def flush(self) -> None:
        if self.file is not None:
            self.file.flush()
        self.stdout.flush()

    def close(self) -> None:
        self.flush()
        if self.file is not None:
            self.file.close()
            self.file = None
        if sys.stdout is self:
            sys.stdout = self.stdout
        if sys.stderr is self:
            sys.stderr = self.stderr

    def isatty(self):
        return False


class StatsJsonl:
    """Append-per-tick stats.jsonl (reference: trainers.py:441-444, 855-858)."""

    def __init__(self, path: str):
        self.file = open(path, "at")

    def write(self, fields: Dict[str, Any]) -> None:
        self.file.write(json.dumps(fields) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


def make_wandb(enabled: bool, project: str, name: str, config: Dict,
               resume_id: Optional[str] = None):
    """wandb run or None (gated; wandb is absent from this image by default)."""
    if not enabled:
        return None
    try:
        import wandb
    except ImportError:
        print("wandb requested but not installed; disabling wandb logging")
        return None
    kwargs = dict(project=project, name=name, config=config)
    if resume_id:
        kwargs.update(id=resume_id, resume="must")
    return wandb.init(**kwargs)


def make_tensorboard(enabled: bool, logdir: str):
    if not enabled:
        return None
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        try:
            from torch.utils.tensorboard import SummaryWriter
        except ImportError:
            print("tensorboard requested but not available; disabling")
            return None
    return SummaryWriter(logdir)


def pick_run_dir(outdir: str, name: str) -> str:
    """NNNNN-name numbered run dir (reference: trainers.py:400-418)."""
    os.makedirs(outdir, exist_ok=True)
    existing = [d for d in os.listdir(outdir)
                if os.path.isdir(os.path.join(outdir, d))]
    ids = []
    for d in existing:
        try:
            ids.append(int(d.split("-")[0]))
        except ValueError:
            pass
    run_id = max(ids, default=-1) + 1
    run_dir = os.path.join(outdir, f"{run_id:05d}-{name}")
    os.makedirs(run_dir, exist_ok=False)
    return run_dir
