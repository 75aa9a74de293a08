"""Benchmark: 256x256 DRR rendering throughput on one TPU chip.

Measures the BASELINE.json north-star configs: trilinear and Siddon renders
with batched random-pose sampling at 256^2 detector resolution against a
256^3 CT volume, plus end-to-end train-step and registration figures at the
reference operating points.

Output protocol (driver contract): stdout carries ONLY JSON lines of the form
{"metric", "value", "unit", "vs_baseline", "detail"}. The headline line is
printed as soon as the core shear-warp figure exists; after every additional
section completes the line is RE-printed with the enriched detail — the last
parseable line wins. A wall-clock budget (``XVR_BENCH_BUDGET`` seconds,
default 1100 — the r03 driver tolerated 983 s without killing; r02 died past
~20 min) gates each optional section: sections that don't fit are skipped
and recorded in detail["skipped"] with detail["truncated"] = true, so the
run always exits 0 with a parseable line well inside the driver's timeout.
When no explicit budget is given and the tunnel's cleanup-debt warmup ate
into it (see the warmup comment in main), the budget auto-extends to leave
~750 s of post-warmup work, capped at 1200 s total.

Sections run in CLAIM order: the parity-defining register / train / flagship
(train -> `register model`) figures come first; channel/512^3/slab variants
are garnish and go last. Per-stage setup timings land in detail["timings"]
so a cold-environment overrun is diagnosable from the artifact itself.

Section costs are self-calibrating: measured durations are persisted to
``~/.cache/xvr_tpu/bench_costs.json`` and reused as the estimate on the next
run (the persistent XLA compilation cache makes warm reruns far cheaper than
cold ones, so static cold estimates would over-skip). The stored cost is the
LAST measurement, not the historical minimum — a degraded tunnel or wiped
cache must be able to raise the estimates again.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

T_START = time.perf_counter()
_BUDGET_ENV = os.environ.get("XVR_BENCH_BUDGET")
BUDGET = float(_BUDGET_ENV) if _BUDGET_ENV else 1100.0
# hard ceiling when auto-extending for tunnel debt (below: the r02 driver
# killed somewhere past ~20 min; r03 tolerated 983 s — stay at ~1200)
BUDGET_CAP = 1200.0


def extended_budget(budget: float, elapsed_s: float, explicit: bool,
                    cap: float = BUDGET_CAP, work_s: float = 750.0) -> float:
    """Effective budget after the warmup drained: leave ``work_s`` of
    post-warmup time for the section chain, never exceed ``cap``, and never
    second-guess an explicitly configured budget."""
    if explicit:
        return budget
    return min(max(budget, elapsed_s + work_s), cap)
COSTS_PATH = Path(
    os.environ.get("XVR_BENCH_COSTS", "~/.cache/xvr_tpu/bench_costs.json")
).expanduser()

# per-stage setup durations, folded into the emitted detail["timings"]:
# the r03 driver run burned 983 s before the first optional section and the
# artifact couldn't say where — now it can
TIMINGS: dict[str, float] = {}
_LAST_MARK = T_START


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mark(stage: str):
    """Stage-stamped setup log AND artifact telemetry: every pre-headline
    step records the time since the previous mark, so a budget overrun (e.g.
    a degraded tunnel making device ops 100x slow) is diagnosable from the
    driver-recorded JSON, not just a lost stderr tail."""
    global _LAST_MARK
    now = time.perf_counter()
    TIMINGS[stage] = round(now - _LAST_MARK, 1)
    _LAST_MARK = now
    log(f"[setup {elapsed():6.1f}s] {stage} (+{TIMINGS[stage]:.1f}s)")


def elapsed() -> float:
    return time.perf_counter() - T_START


def load_costs() -> dict:
    try:
        return json.loads(COSTS_PATH.read_text())
    except (OSError, ValueError):
        return {}


def save_costs(costs: dict) -> None:
    """Write only the keys THIS process changed, on top of the file's
    current contents. bench_register._memo_store writes its own keys
    (register:batch_cold_s, register_512:cold_core_s, ...) to the SAME
    file mid-run — and ``costs`` holds a startup snapshot of the whole
    file, so a plain write OR a plain merge re-imposes stale snapshot
    values over them (observed r5 twice: first the 512^3 admission keys
    vanished; then a blanket ``merged.update(costs)`` kept resurrecting a
    stall-inflated batch_cold_s that had been corrected on disk)."""
    baseline = getattr(save_costs, "baseline", {})
    try:
        merged = load_costs()
        for k, v in costs.items():
            if baseline.get(k) != v:
                merged[k] = v
                baseline[k] = v
        save_costs.baseline = baseline
        COSTS_PATH.parent.mkdir(parents=True, exist_ok=True)
        COSTS_PATH.write_text(json.dumps(merged))
    except OSError:
        pass


def wait_for_backend_init(total_s: float = 900.0, attempt_s: float = 120.0):
    """Retry BACKEND INIT (not dispatch) in subprocesses until it succeeds.

    During a tunnel outage ``jax.devices()`` raises UNAVAILABLE (observed
    2026-08-20: hour-long episodes); a failed in-process init can leave the
    process stuck with a broken backend, so probe from subprocesses and only
    init in-process once one succeeds. Init is a handshake — cheap and fast
    when the tunnel is up — unlike first DISPATCH, which queues for minutes
    and is handled separately by the warmup step.
    """
    import subprocess
    import time as _t

    t0 = _t.monotonic()
    code = "import jax; jax.devices(); print('INIT_OK')"
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                timeout=attempt_s, text=True,
            )
            if "INIT_OK" in r.stdout:
                if attempt > 1:
                    log(f"backend init ok (attempt {attempt})")
                return
            log(f"backend init failed (attempt {attempt}): "
                f"{(r.stderr or '').strip().splitlines()[-1][:120] if r.stderr else r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"backend init probe timed out ({attempt_s:.0f}s, attempt {attempt})")
        if _t.monotonic() - t0 > total_s:
            log(f"backend unavailable for {total_s:.0f}s; aborting")
            sys.exit(3)
        _t.sleep(30)


def warmup_watchdog(deadline_s: float):
    """Bound the device-warmup step without a subprocess probe.

    A wedged tunnel client hangs forever on its first op and never recovers
    in-process; cleanup DEBT (see the warmup comment in main) also stalls the
    first op, for up to ~15 min, but then clears. One long watchdog covers
    both: progress logs while draining, hard abort (os._exit — the main
    thread is stuck inside a readback) once the deadline says this is a
    wedge, not debt. Subprocess probes are WORSE than this: a probe killed
    mid-drain is itself an unclean client exit, which compounds the debt it
    was trying to measure, and a block_until_ready probe can report healthy
    without ever executing.
    """
    import threading

    done = threading.Event()

    def watch():
        waited = 0.0
        while not done.wait(60.0):
            waited += 60.0
            if waited >= deadline_s:
                log(f"device warmup exceeded {deadline_s:.0f}s: tunnel is "
                    f"wedged, not paying debt; aborting")
                os._exit(3)
            log(f"device warmup still draining ({waited:.0f}s)")

    threading.Thread(target=watch, daemon=True).start()
    return done


def main():
    global BUDGET
    wait_for_backend_init()
    mark("backend init probe")
    import jax
    import jax.numpy as jnp

    from xvr_tpu.geometry import Detector
    from xvr_tpu.render.volume import Volume, transform_hu_to_density
    from xvr_tpu.train.sampler import get_random_pose
    from xvr_tpu.utils.cache import enable_compilation_cache

    mark("imports")
    cachedir = enable_compilation_cache()
    log(f"device: {jax.devices()[0]}; compile cache: {cachedir}; "
        f"budget: {BUDGET:.0f}s")

    N = 256  # volume resolution
    H = 256  # detector resolution
    target = 5000.0

    def readback(x):
        """THE sync idiom for this file: force one element to the host.

        Through the axon tunnel ``block_until_ready`` can return before the
        dispatch queue drains (observed: impossible 6.9M DRRs/s timing
        windows), silently deferring stalls into whatever is timed next; a
        readback cannot. Every wait in this file must go through here —
        reintroducing block_until_ready reintroduces the phantom windows.
        """
        return np.asarray(jax.tree.leaves(x)[0].ravel()[:1])

    rng = np.random.default_rng(0)

    # Pay the tunnel's first-dispatch debt HERE, visibly. The tunnel server
    # charges a client's first real executable execution with cleanup debt
    # left by previously-exited clients (measured: 88 s after a clean exit,
    # 500-800 s after a SIGKILLed one) — and block_until_ready can return
    # early, deferring the stall into whatever is timed next. A matmul
    # executable with a FORCED scalar readback absorbs the debt under its
    # own mark, so the headline timer starts against a drained queue.
    # Separate rng: drawing warmup bytes from the shared seed-0 stream would
    # silently change hu (and hu512) relative to every prior round's runs.
    # deadline 1500 s: the largest debt observed is ~900-1100 s and a run
    # that finishes draining late can STILL emit the headline line (~30 s of
    # real work), which beats aborting with nothing on stdout
    # TWO distinct executables, both read back, both under the watchdog: the
    # debt can DEFER past the first readback onto the next executable's
    # (observed r5 run 4: warmup matmul returned in 9 s, then the
    # prepare_shearwarp readback wedged ~25 min) — a second, different
    # executable makes the deferred variant land inside this mark too.
    wrng = np.random.default_rng(123)
    done = warmup_watchdog(deadline_s=1500.0)
    x = jnp.asarray(wrng.uniform(size=(1024, 1024)).astype(np.float32))
    readback(x @ x)
    readback(jnp.tanh(x).sum())
    done.set()
    mark("device warmup (tunnel cleanup debt)")

    # The debt is environmental (50-900 s observed) and pure wall-clock: a
    # fixed budget measured from process start would hand it straight to the
    # claim-carrying sections. When no explicit XVR_BENCH_BUDGET was given,
    # extend the effective budget by enough post-warmup time for the
    # full section chain (~750 s warm), but never past the driver's
    # tolerance ceiling — sections are claim-ordered, so whatever survives
    # the cap is the right subset.
    debt = TIMINGS["device warmup (tunnel cleanup debt)"]
    extended = extended_budget(BUDGET, elapsed(), explicit=_BUDGET_ENV is not None)
    if extended != BUDGET:
        log(f"budget extended {BUDGET:.0f}s -> {extended:.0f}s "
            f"(warmup debt {debt:.0f}s; cap {BUDGET_CAP:.0f}s)")
        BUDGET = extended

    hu = rng.uniform(-1000.0, 1500.0, size=(N, N, N)).astype(np.float32)
    spacing = 1.5
    aff = np.eye(4, dtype=np.float32) * spacing
    aff[3, 3] = 1.0
    aff[:3, 3] = -(N - 1) / 2.0 * spacing
    vol = Volume(data=jnp.asarray(hu), affine=jnp.asarray(aff))
    density = transform_hu_to_density(vol.data, 2.0)
    readback(density)
    mark("volume prep")
    # host-side affine inverse: the device round-trip (inverse executable +
    # 4x4 readback) is one more draw in the tunnel's first-dispatch latency
    # lottery (observed 127 s once); the affine was BUILT in NumPy
    affinv_h = np.linalg.inv(aff).astype(np.float32)
    affinv = jnp.asarray(affinv_h)
    det = Detector(sdd=1020.0, height=H, width=H, delx=2.0, dely=2.0)

    # NOTE: raw detector rays (no orientation reorient) -> alpha ~ 0 views
    # the origin; reference-style alpha ~ 180 ranges apply to Projector poses.
    ranges = dict(
        alphamin=-30.0, alphamax=30.0, betamin=-15.0, betamax=15.0,
        gammamin=-15.0, gammamax=15.0, txmin=-30.0, txmax=30.0,
        tymin=500.0, tymax=800.0, tzmin=-30.0, tzmax=30.0,
    )

    # corner poses of the distribution, for measuring exact march windows
    corners = [
        [a, b, g]
        for a in (ranges["alphamin"], ranges["alphamax"])
        for b in (ranges["betamin"], ranges["betamax"])
        for g in (ranges["gammamin"], ranges["gammamax"])
    ]
    t_corners = [
        [ranges["txmin"], ranges["tymin"], ranges["tzmin"]],
        [ranges["txmax"], ranges["tymin"], ranges["tzmax"]],
        [ranges["txmin"], ranges["tymax"], ranges["tzmax"]],
        [ranges["txmax"], ranges["tymax"], ranges["tzmin"]],
    ]
    # probe pose matrices in pure NumPy (ZXY intrinsic camera-frame
    # convention, M = [R | R @ xyz] — mirrors geometry.convert) and
    # host-side rays: window sizing needs no device work at all
    def _pose_np(rot_deg, xyz):
        a, b, g = np.deg2rad(np.asarray(rot_deg, np.float64))
        ca, sa, cb, sb, cg, sg = np.cos(a), np.sin(a), np.cos(b), np.sin(b), np.cos(g), np.sin(g)
        Rz = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]])
        Rx = np.array([[1, 0, 0], [0, cb, -sb], [0, sb, cb]])
        Ry = np.array([[cg, 0, sg], [0, 1, 0], [-sg, 0, cg]])
        R = Rz @ Rx @ Ry
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = R @ np.asarray(xyz, np.float64)
        return M

    probe_M = np.stack([_pose_np(r, t) for r in corners for t in t_corners])
    psrc_h, ptgt_h = det.rays_numpy(probe_M)
    mark("probe rays (host)")

    from xvr_tpu.render.pallas import choose_permutation_for_pose
    from xvr_tpu.render.shearwarp import (
        measured_warp_window,
        prepare_shearwarp,
        raymarch_siddon_shearwarp,
        raymarch_trilinear_shearwarp,
    )

    costs = load_costs()  # cost + best-rate memo (feeds timed_windows too)
    save_costs.baseline = dict(costs)  # changed-key detection (see save_costs)
    perm = choose_permutation_for_pose(np.eye(3), affinv_h)
    B_SW = 192  # MXU utilization peaks near this pose batch (measured sweep
    # over B x unroll: 192/64 > 128/64 > 256/64 by a few percent)
    prepared = prepare_shearwarp(density, perm)
    mark("prepare dispatched")
    readback(prepared)
    mark("prepare_shearwarp")
    ww = measured_warp_window(psrc_h, ptgt_h, affinv_h, perm, (H, H), host=True)
    ww = int(-(-ww // 8) * 8)
    mark("warp window measured")
    log(f"measured warp window: {ww}")

    def timed_windows(run_one, batch, name, n_windows, n_iter):
        """Best-window throughput: a fresh executable on the tunneled chip
        runs ~2x slow for its first ~30-50 executions (server-side
        maturation), so we time several windows and report the best.
        Early-stops once maturation plateaus (two consecutive windows within
        1% of the running best — r03 showed windows 2-5 adding nothing) or
        the global budget runs dry. A plateau only counts as MATURED when the
        rate is near the best this config has ever posted (persisted in the
        cost memo): a uniformly-slow pre-maturation plateau on a degraded
        tunnel would otherwise halve the reported figure silently."""
        known = costs.get(f"rate:{name}")
        best, flat = 0.0, 0
        rtt = np.inf
        for w in range(n_windows):
            keys = jax.random.split(jax.random.PRNGKey(100 + w), n_iter)
            t0 = time.perf_counter()
            for k in keys:
                out = run_one(k)
            # sync with readback(), never block_until_ready (see the helper's
            # docstring); the tiny slice executable is warmed by the caller's
            # compile+first-run step
            readback(out)
            dt = time.perf_counter() - t0
            # pure readback RTT on the now-ready result, subtracted so the
            # sync doesn't bias the amortized rate. Re-measured every window
            # with the MIN kept (a single jittery probe must not inflate the
            # figure) and clamped to 20% of the window: a hiccup-sized rtt
            # would otherwise zero the denominator and fabricate a headline.
            t0 = time.perf_counter()
            readback(out)
            rtt = min(rtt, time.perf_counter() - t0, 0.2 * dt)
            rate = batch * n_iter / (dt - rtt)
            log(f"{name} window {w}: {rate:.1f} DRRs/s "
                f"({dt / n_iter * 1e3:.1f} ms / {batch}-batch)")
            flat = flat + 1 if rate < best * 1.01 else 0
            best = max(best, rate)
            matured = best >= 0.8 * known if known else True
            if flat >= 2 and w >= 2 and matured:
                log(f"{name}: matured after window {w}, stopping early")
                break
            if elapsed() > BUDGET:
                log(f"{name}: global budget exhausted, stopping windows")
                break
        if best > 0:
            costs[f"rate:{name}"] = round(best, 1)
            save_costs(costs)
        return best

    # ---- headline: shear-warp MXU trilinear (always runs, emitted first) --
    # The volume arrays are ARGUMENTS, never closure constants: a closed-over
    # 64 MB array turns StableHLO lowering into a 4-9 MINUTE host-side stall
    # on this 1-CPU host (measured: lower 265 s closed vs 1.3 s as args; the
    # r03 driver burned 983 s mostly here), on top of the embedded-constant
    # compile pathology already documented in docs/performance.md.
    @jax.jit
    def render_shearwarp(density, affinv, prepared, key):
        pose = get_random_pose(key, batch_size=B_SW, **ranges)
        src, tgt = det.rays(pose)
        return raymarch_trilinear_shearwarp(
            density, affinv, src, tgt, perm=perm, prepared=prepared,
            warp_window=ww, unroll=64,
        )

    t0 = time.perf_counter()
    out0 = render_shearwarp(density, affinv, prepared, jax.random.PRNGKey(0))
    readback(out0)  # warm the slice sync executable too
    log(f"shearwarp 256^2: compile+first run {time.perf_counter() - t0:.1f}s")
    mark("headline compile+first run")
    sw = timed_windows(
        lambda k: render_shearwarp(density, affinv, prepared, k), B_SW,
        "shearwarp 256^2", n_windows=6, n_iter=15,
    )
    mark("headline windows")

    detail = {
        "target": target,
        "volume": [N, N, N],
        "detector": [H, H],
        "warp_window": ww,
        "budget_s": BUDGET,
        "skipped": [],
        "truncated": False,
        "timings": TIMINGS,
    }
    headline = {
        "metric": f"256^2 DRRs/sec/chip (shear-warp MXU trilinear; 256^3 CT, batch {B_SW})",
        "value": round(sw, 1),
        "unit": "DRRs/s",
        "vs_baseline": round(sw / target, 4),
        "detail": detail,
    }

    def emit():
        detail["elapsed_s"] = round(elapsed(), 1)
        print(json.dumps(headline), flush=True)

    emit()  # the headline survives even if everything after is cut short

    # ---- optional sections, budget-gated, each re-emitting the line -------

    def section(name, cold_est, fn, gate=None, slice_s=None):
        """Run ``fn`` if it fits the remaining budget.

        Estimate = last measured cost x 1.4 when available, else ``cold_est``.
        ``gate`` CAPS the estimate for the deadline-aware sub-benches
        (register/train/flagship): their measured total stretches to their
        deadline slice, but a rerun's bounded core is all that must fit —
        the optional phases self-truncate. Stored costs are capped at 1.2x
        the slice THE RUN ACTUALLY HAD (``costs["<name>:slice"]``, written
        by the section body): without the cap, one env-cap-raised record
        run (r5: register 499 s under cap 500) or one transient tunnel
        wedge (r5: train 465 s against a 300 s slice) poisons the memo and
        starves the section out of every future driver-budget run — a
        deadlock, since only running the section can correct its estimate.
        The degraded-day protection the old uncapped estimate provided now
        lives INSIDE the sections (deadline-checked phases + claim ordering
        + incremental emission), so admission stays optimistic: worst case
        a cold core overshoots its slice by its own bounded cost, which the
        driver tolerance has absorbed before (r04: 1,276 s vs 1,200).
        Under-estimating is safe regardless because emission is incremental.
        """
        prior = costs.get(name)
        est = prior * 1.4 if prior is not None else (gate if gate is not None else cold_est)
        if gate is not None:
            est = min(est, gate)
        left = BUDGET - elapsed()
        if est > left:
            log(f"section {name}: skipped (est {est:.0f}s > {left:.0f}s left)")
            detail["skipped"].append(name)
            detail["truncated"] = True
            return
        log(f"section {name}: starting (est {est:.0f}s, {left:.0f}s left)")
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:  # keep the already-emitted line alive
            log(f"section {name} FAILED: {type(e).__name__}: {e}")
            detail["skipped"].append(f"{name}:error")
            detail["truncated"] = True  # an errored run is not full coverage
        else:
            measured = time.perf_counter() - t0
            own_slice = costs.get(f"{name}:slice", slice_s)
            # sliceless sections (siddon_fast/channels/cube/slab) get the
            # same poisoning protection at 3x their cold estimate: r5
            # rehearsal 4 hit a ~5 min tunnel stall inside channels_6 and
            # stored 333.6 s for a ~35 s section, which would have skipped
            # it on every debt-laden day after
            cap = own_slice * 1.2 if own_slice is not None else cold_est * 3.0
            costs[name] = min(measured, cap)
            save_costs(costs)
            TIMINGS[f"section:{name}"] = round(measured, 1)
        emit()

    sys.path.insert(0, str(Path(__file__).parent / "scripts"))
    from contextlib import redirect_stdout

    # -- end-to-end registration at the reference budget (scales 24,12,6 x
    # 500 on a 1436^2 X-ray; single `xvr register` invocation includes the
    # objective-gated re-anneal, --max_restarts default 1). Runs FIRST among
    # the optional sections: it carries the parity-defining mTRE claims.
    def run_register():
        import bench_register

        # Slice, don't starve: register's optional phases would happily run
        # to the GLOBAL deadline, eating every second the later sections
        # (train, flagship) need. r04 lesson: a FIXED slice is not enough —
        # under a debt-laden budget even 270 s of register starves train
        # (whose keys the artifact must carry every round). So the slice is
        # dynamic: reserve the estimated train + flagship costs out of the
        # remaining budget and clamp what's left to [150, 300] s — 150 s
        # covers the cold core (~100 s of stage-executable loads) plus a few
        # init-spread seeds, 300 s fits the full 16-seed spread + batched
        # phase when the compile cache is warm. The spread and batched
        # phases self-truncate at the deadline (checked between seeds and
        # between the batched cold/warm runs inside bench_register.run).
        # cap overridable for in-round record runs with real budget headroom
        # (driver runs keep the 300 s starvation protection)
        cap = float(os.environ.get("XVR_BENCH_REGISTER_SLICE_CAP", 300.0))
        reserve = 0.0
        for nm, fallback in (("train", 90.0), ("flagship", 110.0)):
            c = costs.get(nm)
            reserve += min(c * 1.4, fallback) if c is not None else fallback
        slice_s = min(cap, max(150.0, BUDGET - elapsed() - reserve - 40.0))
        costs["register:slice"] = slice_s  # the slice this measurement ran under
        log(f"register slice: {slice_s:.0f}s (reserved {reserve:.0f}s for train+flagship)")
        deadline = min(T_START + BUDGET, time.perf_counter() + slice_s)
        # registrar progress prints go to stderr: stdout is JSON lines only
        with redirect_stdout(sys.stderr):
            reg_stats = bench_register.run(deadline=deadline)
        log(f"register warm: {reg_stats.get('warm_runtime_s')} s, "
            f"mTRE {reg_stats.get('mtre_final_mm')} mm")
        for src_k, dst_k in [
            ("cold_runtime_s", "register_cold_s"),
            ("warm_runtime_s", "register_warm_s"),
            ("mtre_final_mm", "register_mtre_final_mm"),
            ("mtre_final_median_mm", "register_mtre_final_median_mm"),
            ("mtre_final_worst_mm", "register_mtre_worst_mm"),
            ("n_init_spread", "register_n_init_spread"),
            ("mtre_init_mm", "register_mtre_init_mm"),
            ("max_restarts", "register_max_restarts"),
            ("stage_compiles_cold", "register_stage_compiles_cold"),
            ("stage_compiles_total", "register_stage_compiles_total"),
            ("batch_k", "register_batch_k"),
            ("batch_warm_s_per_xray", "register_batch_warm_s_per_xray"),
            ("batch_mtre_median_mm", "register_batch_mtre_median_mm"),
            ("batch_mtre_worst_mm", "register_batch_mtre_worst_mm"),
            ("batch_skipped", "register_batch_skipped"),
        ]:
            if src_k in reg_stats:
                detail[dst_k] = reg_stats[src_k]

    # gate = the cold CORE cost (GT-render + 3 pyramid-stage compiles + two
    # runs); the init-spread/batched phases self-truncate at the dynamic slice
    section("register", 300, run_register, gate=130, slice_s=300)

    # -- train step at the reference finetune operating point (batch 116
    # DRRs @128^2, resnet34, grad-accum 4)
    def run_train():
        import bench_train

        # 130 s covers the unmasked compile + windows; the masked phase needs
        # ~150 s more (cold labelmap-channel compile), which only record runs
        # with real budget headroom should pay — raise the cap there
        cap = float(os.environ.get("XVR_BENCH_TRAIN_SLICE_CAP", 130.0))
        costs["train:slice"] = cap  # the slice this measurement ran under
        deadline = min(T_START + BUDGET, time.perf_counter() + cap)
        with redirect_stdout(sys.stderr):
            train_stats = bench_train.run(
                n_windows=2, n_steps=10, deadline=deadline
            )
        log(f"train step: {train_stats['value']} ms")
        detail["train_step_ms"] = train_stats["value"]
        detail["finetune_500_itrs_s"] = train_stats["finetune_500_itrs_s"]
        detail["train_renderer"] = train_stats["renderer"]
        if "masked_step_ms" in train_stats:
            detail["train_masked_step_ms"] = train_stats["masked_step_ms"]
            detail["train_masked_renderer"] = train_stats["masked_renderer"]

    # gate = cold unmasked compile + windows (~80 s); the masked phase
    # self-truncates at the 130 s slice (its compile is the expensive part)
    section("train", 250, run_train, gate=90, slice_s=130)

    # -- FLAGSHIP closed loop: train a CNN on-chip, then `register model`
    # with the REAL predict_pose init (reference cli/commands/register.py:228
    # + model/trainer.py:185-246 — the workflow the whole framework exists
    # for, executed end to end, no fixed perturbation standing in)
    def run_flagship():
        import bench_flagship
        import bench_register

        deadline = min(T_START + BUDGET, time.perf_counter() + 240.0)
        # tight mode under a debt-squeezed budget: 500 training iterations
        # (the reference finetune budget) still demonstrate the closed loop
        # honestly — a worse CNN init, the same sub-mm refinement machinery
        tight = BUDGET - elapsed() < 220.0
        with redirect_stdout(sys.stderr):
            fl = bench_flagship.run(
                deadline=deadline,
                min_itrs=500 if tight else 1000,
                max_itrs=500 if tight else 2000,
                stage_cache=getattr(
                    bench_register.LAST_REGISTRAR, "_stage_cache", None
                ),
            )
        log(f"flagship: init {fl['init_mtre_mm']} mm -> final "
            f"{fl['final_mtre_mm']} mm ({fl['train_itrs']} train itrs)")
        detail["register_model_init_mtre_mm"] = fl["init_mtre_mm"]
        detail["register_model_final_mtre_mm"] = fl["final_mtre_mm"]
        detail["register_model_train_itrs"] = fl["train_itrs"]
        detail["register_model_train_s"] = fl["train_s"]
        detail["register_model_register_s"] = fl["register_s"]
        detail["register_model_train_step_ms"] = fl["train_step_ms"]

    # gate = warm train compile + tight-mode 500 itrs (~20 s) + CNN-forward
    # compile + warm registration (~100 s total) — warm stages assume the
    # register section populated the shared stage cache; when it was skipped
    # or errored the registration is COLD (~125-300 s), so the optimistic
    # gate is dropped and the estimate falls back to the prior/cold figure
    reg_ran = not any(s.split(":")[0] == "register" for s in detail["skipped"])
    section("flagship", 300, run_flagship,
            gate=110 if reg_ran else None, slice_s=240)

    # -- Siddon-flavored shear-warp (the fast `--renderer siddon` path:
    # trapezoid transverse profile at small eps; see render/shearwarp.py)
    def run_siddon_fast():
        @jax.jit
        def render_siddon_fast(density, affinv, prepared, key):
            pose = get_random_pose(key, batch_size=B_SW, **ranges)
            src, tgt = det.rays(pose)
            return raymarch_siddon_shearwarp(
                density, affinv, src, tgt, perm=perm, prepared=prepared,
                warp_window=ww, unroll=64,
            )

        t0 = time.perf_counter()
        out0 = render_siddon_fast(density, affinv, prepared, jax.random.PRNGKey(0))
        readback(out0)
        log(f"siddon_fast 256^2: compile+first run {time.perf_counter() - t0:.1f}s")
        sid_fast = timed_windows(
            lambda k: render_siddon_fast(density, affinv, prepared, k), B_SW,
            "siddon_fast 256^2", n_windows=3, n_iter=15,
        )
        detail["siddon_fast_drrs_per_sec"] = round(sid_fast, 1)
        detail["siddon_fast_vs_baseline"] = round(sid_fast / target, 4)

    section("siddon_fast", 40, run_siddon_fast)

    # -- labelmap (channel) rendering: masked foundation-training config.
    # 2 labels (the finetune-script shape) and 6 labels (anatomical-style
    # masks); per-channel masked volumes fold into the MXU accumulate.
    from xvr_tpu.render.shearwarp import channel_slab_bounds

    def make_channel_bench(n_labels):
        mask = np.zeros((N, N, N), dtype=np.int32)
        lo, hi = N // 4, 3 * N // 4
        # n_labels contiguous slabs filling the central half of the volume
        edges = np.linspace(lo, hi, n_labels + 1).astype(int)
        for i in range(n_labels):
            mask[edges[i] : edges[i + 1], lo:hi, lo:hi] = i + 1
        labels = tuple(range(1, n_labels + 1))
        mask_dev = jnp.asarray(mask)
        prepared_ch = prepare_shearwarp(density, perm, mask=mask_dev, labels=labels)
        jax.block_until_ready(prepared_ch)
        ch_bounds = channel_slab_bounds(mask_dev, labels, perm)

        @jax.jit
        def render_channels(density, affinv, mask_dev, prepared_ch, key):
            pose = get_random_pose(key, batch_size=B_SW, **ranges)
            src, tgt = det.rays(pose)
            return raymarch_trilinear_shearwarp(
                density, affinv, src, tgt, perm=perm, prepared=prepared_ch,
                warp_window=ww, unroll=64, mask=mask_dev,
                labels=labels, chan_bounds=ch_bounds,
            )

        run_one = lambda k: render_channels(density, affinv, mask_dev, prepared_ch, k)
        return run_one, labels, ch_bounds

    def run_channels(n_labels, key_name, n_windows=3):
        run_one, labels, ch_bounds = make_channel_bench(n_labels)
        t0 = time.perf_counter()
        out0 = run_one(jax.random.PRNGKey(0))
        readback(out0)
        assert out0.shape[1] == n_labels + 1, out0.shape
        log(f"channels 256^2 ({n_labels} labels): compile+first run "
            f"{time.perf_counter() - t0:.1f}s")
        ch = timed_windows(
            run_one, B_SW,
            f"channels 256^2 ({n_labels}L)", n_windows=n_windows, n_iter=12,
        )
        detail[key_name] = round(ch, 1)
        # cost model: per-image work ~ (full march + sum of label slab
        # extents); record the predicted slowdown vs the unmasked march so
        # the measured ratio can be checked against it
        extents = [int(b[1] - b[0]) for b in np.asarray(ch_bounds)]
        detail[f"{key_name}_extents"] = extents
        # accumulate cost model: channel 0 is the full march (extent N) and
        # each label channel marches its slab extent, so the predicted
        # slowdown vs unmasked is sum(ALL extents)/N; the per-channel warp
        # adds a little on top (visible in the measured ratio)
        detail[f"{key_name}_pred_cost_ratio"] = round(sum(extents) / N, 3)
        detail[f"{key_name}_meas_cost_ratio"] = round(sw / ch, 3)

    section("channels_2", 40, lambda: run_channels(2, "labelmap_channels_drrs_per_sec"))
    section("channels_6", 50, lambda: run_channels(6, "labelmap_channels_6_drrs_per_sec", n_windows=2))

    # -- full DeepFluoro-scale volume: 512^3 (537 MB packed table in HBM)
    def run_512():
        N2 = 512
        hu512 = rng.uniform(-1000.0, 1500.0, size=(N2, N2, N2)).astype(np.float32)
        sp512 = 0.75
        aff512 = np.eye(4, dtype=np.float32) * sp512
        aff512[3, 3] = 1.0
        aff512[:3, 3] = -(N2 - 1) / 2.0 * sp512
        vol512 = Volume(data=jnp.asarray(hu512), affine=jnp.asarray(aff512))
        density512 = transform_hu_to_density(vol512.data, 2.0)
        affinv512_h = np.linalg.inv(aff512).astype(np.float32)
        affinv512 = jnp.asarray(affinv512_h)
        prepared512 = prepare_shearwarp(density512, perm)
        jax.block_until_ready(prepared512)
        ww512 = measured_warp_window(psrc_h, ptgt_h, affinv512_h, perm, (H, H), host=True)
        ww512 = int(-(-ww512 // 8) * 8)
        B512 = 64

        @jax.jit
        def render_512(density512, affinv512, prepared512, key):
            pose = get_random_pose(key, batch_size=B512, **ranges)
            src, tgt = det.rays(pose)
            return raymarch_trilinear_shearwarp(
                density512, affinv512, src, tgt, perm=perm, prepared=prepared512,
                warp_window=ww512, unroll=64,
            )

        t0 = time.perf_counter()
        out0 = render_512(density512, affinv512, prepared512, jax.random.PRNGKey(0))
        readback(out0)
        log(f"shearwarp 512^3: compile+first run {time.perf_counter() - t0:.1f}s")
        sw512 = timed_windows(
            lambda k: render_512(density512, affinv512, prepared512, k), B512,
            "shearwarp 512^3", n_windows=3, n_iter=8,
        )
        detail["shearwarp_512cube_drrs_per_sec"] = round(sw512, 1)

    section("cube_512", 70, run_512)

    # -- slab-marching Pallas kernels (golden/cross-check paths): 1 window
    # each — these are not production paths (see render/pallas.py docstring)
    def run_slab_kernels():
        from xvr_tpu.render.pallas import (
            measured_window_span,
            pack_density,
            raymarch_siddon_pallas,
            raymarch_trilinear_pallas,
        )

        packed = pack_density(density, perm)
        jax.block_until_ready(packed[0])
        vol_shape = tuple(int(density.shape[a]) for a in perm)
        margs = (psrc_h, ptgt_h, affinv_h, perm, (H, H), vol_shape)
        span_det = measured_window_span(*margs)
        span_remap = measured_window_span(*margs, remap=True)
        w_det = int(-(-span_det // 8) * 8)
        w_remap = int(-(-span_remap // 8) * 8)
        remap = w_remap + 8 < w_det
        window = w_remap if remap else w_det
        log(f"measured windows: detector-tiles {w_det}, sorted-remap {w_remap} "
            f"-> remap={remap}, window={window}")
        detail["window"] = window
        detail["remap"] = bool(remap)
        table, vshape = packed
        B = 16

        @jax.jit
        def render_trilinear(density, affinv, table, key):
            pose = get_random_pose(key, batch_size=B, **ranges)
            src, tgt = det.rays(pose)
            return raymarch_trilinear_pallas(
                density, affinv, src, tgt, window=window, perm=perm,
                packed=(table, vshape), remap=remap,
            )

        @jax.jit
        def render_siddon(density, affinv, table, key):
            pose = get_random_pose(key, batch_size=B, **ranges)
            src, tgt = det.rays(pose)
            return raymarch_siddon_pallas(
                density, affinv, src, tgt, window=window + 8, perm=perm,
                packed=(table, vshape), remap=remap,
            )

        for fn, name, key_name in [
            (render_trilinear, "slab trilinear 256^2", "slab_trilinear_drrs_per_sec"),
            (render_siddon, "siddon exact 256^2", "siddon_exact_drrs_per_sec"),
        ]:
            t0 = time.perf_counter()
            out0 = fn(density, affinv, table, jax.random.PRNGKey(0))
            readback(out0)
            log(f"{name}: compile+first run {time.perf_counter() - t0:.1f}s")
            v = timed_windows(
                lambda k: fn(density, affinv, table, k), B, name,
                n_windows=1, n_iter=12,
            )
            detail[key_name] = round(v, 1)

    section("slab_kernels", 90, run_slab_kernels)

    # -- registration at the TRUE DeepFluoro scale: 512^3 CT, 1436^2 X-ray,
    # scales 24,12,6 x 500, crop 100 — the 256^3 register section proves the
    # engine, this proves the reference's actual operating point. LAST in
    # the chain: it is the most expensive garnish (a cold run pays a ~270 s
    # one-time 512^3 phantom build on top of ~250 s of stage compiles), so
    # everything cheaper must already have landed when it starts.
    def run_register_512():
        import bench_register

        # Last section: its slice is whatever remains of the global budget.
        # run_fullscale checks that deadline BEFORE the ~270 s phantom build
        # and before the cold core (advisor r4), returning a skipped_reason
        # instead of overshooting, so admission here can stay optimistic.
        deadline = T_START + BUDGET
        with redirect_stdout(sys.stderr):
            st = bench_register.run_fullscale(deadline=deadline)
        if "skipped_reason" in st:
            detail["register_512_skipped"] = st["skipped_reason"]
            detail["skipped"].append("register_512:deadline")
            detail["truncated"] = True
            return
        for src_k, dst_k in [
            ("cold_runtime_s", "register_512_cold_s"),
            ("warm_runtime_s", "register_512_warm_s"),
            ("mtre_init_mm", "register_512_mtre_init_mm"),
            ("mtre_final_mm", "register_512_mtre_final_mm"),
            ("mtre_final_warm_mm", "register_512_mtre_final_warm_mm"),
            ("mtre_final_median_mm", "register_512_mtre_median_mm"),
            ("mtre_final_worst_mm", "register_512_mtre_worst_mm"),
            ("n_init_spread", "register_512_n_init_spread"),
        ]:
            if src_k in st:
                detail[dst_k] = st[src_k]

    section("register_512", 300, run_register_512, slice_s=300)

    emit()
    log(f"bench done in {elapsed():.1f}s (budget {BUDGET:.0f}s); "
        f"skipped: {detail['skipped']}")

    # optional in-round artifact: XVR_BENCH_WRITE_LOCAL=path writes the final
    # headline object wrapped with provenance, so BENCH_LOCAL.json is always
    # a verbatim bench output (docs cite its keys; no hand-edited numbers)
    local_path = os.environ.get("XVR_BENCH_WRITE_LOCAL")
    if local_path:
        import datetime

        coverage = (
            "full-coverage"
            if not detail["truncated"] and not detail["skipped"]
            else f"PARTIAL (skipped: {detail['skipped']})"
        )
        wrapped = {
            "note": (
                f"Validated in-round {coverage} `python bench.py` run "
                f"(real TPU, {datetime.date.today().isoformat()}, budget "
                f"{BUDGET:.0f}s). Written verbatim by bench.py via "
                "XVR_BENCH_WRITE_LOCAL; if the driver's BENCH_rNN.json is "
                "missing or truncated, this is the validated run."
            ),
            "result": headline,
        }
        Path(local_path).write_text(json.dumps(wrapped, indent=2) + "\n")
        log(f"wrote {local_path}")


if __name__ == "__main__":
    main()
