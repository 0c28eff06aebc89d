"""Restartable long-running jobs (SURVEY.md §5: failure detection /
elastic recovery — absent in the reference; required for multi-host BA).

`run_restartable` drives a jitted step function with periodic orbax
checkpoints; on (re)start it resumes from the newest checkpoint, so a
preempted or crashed pjit job continues where it left off. State is any
pytree (model params, optimizer state, BA map blocks, step counter).
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Optional, Tuple

__all__ = ["run_restartable", "latest_checkpoint"]

_STEP_RE = re.compile(r"^step_(\d+)$")


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, str]]:
    """Newest (step, path) under `ckpt_dir`, or None."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m:
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, os.path.join(ckpt_dir, name))
    return best


def run_restartable(step_fn: Callable[[Any], Any], init_state: Any,
                    num_steps: int, ckpt_dir: str,
                    checkpoint_every: int = 100) -> Any:
    """Run `state = step_fn(state)` for `num_steps`, checkpointing every
    `checkpoint_every` steps; resumes from the newest checkpoint in
    `ckpt_dir` if one exists (crash/preemption recovery)."""
    from .checkpoint import load_checkpoint, save_checkpoint

    start = 0
    state = init_state
    newest = latest_checkpoint(ckpt_dir)
    if newest is not None:
        start, path = newest
        state = load_checkpoint(path, init_state)
    os.makedirs(ckpt_dir, exist_ok=True)
    for step in range(start, num_steps):
        state = step_fn(state)
        done = step + 1
        if done % checkpoint_every == 0 or done == num_steps:
            save_checkpoint(os.path.join(ckpt_dir, f"step_{done}"), state)
    return state
