"""End-of-round tunnel hygiene: CHECKED, not remembered (VERDICT r4 #3).

The axon tunnel charges a client's first real dispatch with cleanup debt
left by previously-exited clients — ~60-90 s after clean exits, 500-1100 s
after SIGKILLed ones (measured r03/r04). Whoever runs next (the driver's
end-of-round ``bench.py``) pays it. This script makes the invariant
checkable in-round:

1. verifies no orphan bench/JAX processes are still attached to the tunnel
   (REPORT ONLY — never kills anything: pattern-kills can match the
   session's own shell),
2. runs one trivial device dispatch with a forced readback, absorbing any
   residual debt under THIS process, and logs its duration.

Exit code 0 = tunnel clean (dispatch under --max-warmup-s and no orphans).
Append the output to a committed log (e.g. ``TUNNEL_HYGIENE.log``) so the
judge can see the debt was absorbed in-round.
"""

from __future__ import annotations

import argparse
import datetime
import sys
import time
from pathlib import Path


def find_orphans() -> list[str]:
    """Python processes (not us, not our ancestors) that imported the JAX
    TPU client — i.e. potential tunnel debt sources if they die uncleanly."""
    me = str(Path("/proc/self").resolve())
    my_pid = int(me.rsplit("/", 1)[-1]) if me.rsplit("/", 1)[-1].isdigit() else -1
    ancestors = set()
    pid = my_pid
    for _ in range(32):
        try:
            stat = Path(f"/proc/{pid}/stat").read_text()
            ppid = int(stat.rsplit(")", 1)[1].split()[1])
        except (OSError, IndexError, ValueError):
            break
        ancestors.add(pid)
        if ppid <= 1:
            break
        pid = ppid

    orphans = []
    for p in Path("/proc").iterdir():
        if not p.name.isdigit() or int(p.name) in ancestors:
            continue
        try:
            cmd = (p / "cmdline").read_bytes().replace(b"\0", b" ").decode()
        except OSError:
            continue
        if "python" not in cmd:
            continue
        # a process holding the TPU maps the axon/TPU client library...
        try:
            maps = (p / "maps").read_text()
        except OSError:
            continue
        if "libtpu" not in maps and "axon" not in maps:
            continue
        # ...but merely importing jax maps the plugin too (CPU-only pytest
        # does). A LIVE tunnel client also holds its connection socket, so
        # require at least one open socket fd before flagging.
        try:
            has_socket = any(
                "socket:" in str((p / "fd" / fd.name).resolve())
                for fd in (p / "fd").iterdir()
            )
        except OSError:
            continue
        if has_socket:
            orphans.append(f"pid {p.name}: {cmd[:120]}")
    return orphans


def until_clean(max_attempts: int, max_warmup_s: float) -> int:
    """Drain the tunnel's cleanup-debt backlog: the server charges each NEW
    client's first dispatch with cleanup for previously-exited clients
    (observed 2026-08-20: a backlog of several exited bench clients cost
    357 s + ~390 s across two successive probes), so one probe may only pay
    one predecessor's debt. Spawn fresh single-dispatch clients until one
    reports CLEAN — then the only remaining debt is that last tiny client's
    own exit."""
    import subprocess

    for attempt in range(1, max_attempts + 1):
        r = subprocess.run(
            [sys.executable, __file__, "--max-warmup-s", str(max_warmup_s)],
            timeout=1800,
        )
        print(f"until_clean attempt {attempt}: {'CLEAN' if r.returncode == 0 else 'DIRTY'}",
              flush=True)
        if r.returncode == 0:
            return 0
    return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-warmup-s", type=float, default=120.0,
                    help="dispatch slower than this = debt NOT absorbed")
    ap.add_argument("--until-clean", action="store_true",
                    help="spawn fresh probe clients until one is CLEAN")
    ap.add_argument("--max-attempts", type=int, default=8)
    args = ap.parse_args()
    if args.until_clean:
        return until_clean(args.max_attempts, args.max_warmup_s)

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    orphans = find_orphans()
    for o in orphans:
        print(f"[{stamp}] ORPHAN: {o}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    dev = jax.devices()[0]
    init_s = time.perf_counter() - t0

    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1024, 1024)).astype(np.float32))
    t0 = time.perf_counter()
    np.asarray((x @ x).ravel()[:1])  # forced readback: block_until_ready can lie
    warmup_s = time.perf_counter() - t0
    # steady probe uses a DIFFERENT executable: the debt can defer past the
    # first executable's readback onto the next one's (observed r5: a 9 s
    # "warmup" followed by a ~25 min wedge on the following readback), and a
    # repeat of the same executable can dodge the deferred variant
    t0 = time.perf_counter()
    np.asarray(jnp.tanh(x).sum().ravel()[:1])
    steady_s = time.perf_counter() - t0

    # steady_s participates: a huge steady probe = the deferred-debt variant
    # landed there, so the tunnel was NOT clean when we arrived
    clean = warmup_s <= args.max_warmup_s and steady_s <= args.max_warmup_s and not orphans
    print(
        f"[{stamp}] tunnel_hygiene device={dev} init={init_s:.1f}s "
        f"first_dispatch={warmup_s:.1f}s steady={steady_s:.2f}s "
        f"orphans={len(orphans)} -> {'CLEAN' if clean else 'DIRTY'}"
    )
    return 0 if clean else 1


if __name__ == "__main__":
    sys.exit(main())
