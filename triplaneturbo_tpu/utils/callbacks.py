"""Trial provenance callbacks: code + config snapshots, progress file.

Rebuild of the reference callbacks (/root/reference/threestudio/utils/
callbacks.py:60-156): every trial directory records the exact code (git
ls-files copy), the parsed + raw configs, and the launching command line —
plus a simple JSONL step-metrics logger standing in for the TensorBoard/CSV
pair (launch.py:213-228).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from typing import Any, Dict, Optional

from .config import dump_config


def snapshot_code(trial_dir: str, repo_root: Optional[str] = None) -> Optional[str]:
    """Copy all git-tracked files into <trial>/code (CodeSnapshotCallback)."""
    repo_root = repo_root or os.getcwd()
    dst = os.path.join(trial_dir, "code")
    try:
        files = subprocess.run(
            ["git", "ls-files"], cwd=repo_root, capture_output=True, text=True, check=True
        ).stdout.splitlines()
    except Exception:
        return None
    for rel in files:
        # never snapshot prior trial dirs or caches (recursive-nesting guard)
        if rel.startswith(("outputs/", ".jax_cache/", ".cache/")):
            continue
        src = os.path.join(repo_root, rel)
        if not os.path.isfile(src):
            continue
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copy2(src, out)
    return dst


def snapshot_config(trial_dir: str, cfg: Any, raw_path: Optional[str] = None) -> str:
    """Write parsed.yaml (+ raw.yaml copy) into <trial>/configs
    (ConfigSnapshotCallback)."""
    d = os.path.join(trial_dir, "configs")
    os.makedirs(d, exist_ok=True)
    dump_config(os.path.join(d, "parsed.yaml"), cfg)
    if raw_path and os.path.exists(raw_path):
        shutil.copy2(raw_path, os.path.join(d, "raw.yaml"))
    with open(os.path.join(d, "cmd.txt"), "w") as f:
        f.write(" ".join(sys.argv) + "\n")
    return d


class MetricsLogger:
    """JSONL per-step metrics + progress file (ProgressCallback analog)."""

    def __init__(self, trial_dir: str):
        os.makedirs(trial_dir, exist_ok=True)
        self.path = os.path.join(trial_dir, "metrics.jsonl")
        self.progress_path = os.path.join(trial_dir, "progress.txt")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any]) -> None:
        rec = {"step": step, "t": round(time.time() - self._t0, 2)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                pass
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def progress(self, step: int, total: int, msg: str = "") -> None:
        with open(self.progress_path, "w") as f:
            f.write(f"{step}/{total} {msg}\n")
