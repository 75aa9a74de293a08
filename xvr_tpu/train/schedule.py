"""Learning-rate schedules.

Semantics of /root/reference/src/xvr/model/scheduler.py:6-37: linear warmup to
the peak LR then cosine decay to zero over the remaining updates (cycles=0.5),
or a constant schedule when disabled.
"""

from __future__ import annotations

import optax


def warmup_cosine_schedule(lr: float, warmup_steps: int, total_steps: int):
    warmup_steps = max(int(warmup_steps), 1)
    total_steps = max(int(total_steps), warmup_steps + 1)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=0.0,
    )


def identity_schedule(lr: float):
    return optax.constant_schedule(lr)
