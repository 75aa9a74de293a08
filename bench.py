"""Benchmark: 256x256 DRR rendering throughput on one TPU chip.

Measures the BASELINE.json north-star configs: trilinear and Siddon renders
with batched random-pose sampling at 256^2 detector resolution against a
256^3 CT volume. Prints ONE JSON line: {"metric", "value", "unit",
"vs_baseline", "detail"} where value is the trilinear DRRs/sec/chip via the
framework's fast path (the shear-warp MXU renderer — pose sampling, ray
generation, slope-space matmul accumulation, and the detector warp all in one
jitted executable) and vs_baseline is value / 5000 (the BASELINE.json
target). The detail records the slab-marching Pallas kernel (the analytic-
gradient path) and the exact Siddon kernel.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def wait_for_healthy_device(attempts: int = 6, probe_timeout: int = 240) -> bool:
    """Confirm the accelerator answers before this process touches it.

    The tunneled TPU client can wedge indefinitely on its first device op
    (e.g. mid-recovery worker); a wedged client never recovers in-process.
    Probing from SUBPROCESSES keeps this process clean until the device is
    known healthy, and bounds the failure time instead of hanging the bench.
    """
    import subprocess
    import time as _t

    code = (
        "import jax, jax.numpy as jnp;"
        "(jnp.ones((128,128))@jnp.ones((128,128))).block_until_ready();"
        "print('OK')"
    )
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], capture_output=True,
                timeout=probe_timeout, text=True,
            )
            if "OK" in r.stdout:
                log(f"device probe ok (attempt {i + 1})")
                return True
            log(f"device probe failed (attempt {i + 1}): rc={r.returncode}")
        except subprocess.TimeoutExpired:
            log(f"device probe timed out after {probe_timeout}s (attempt {i + 1})")
        _t.sleep(45)
    return False


def main():
    if not wait_for_healthy_device():
        log("accelerator unreachable: the tunneled TPU worker did not answer "
            "any probe; aborting instead of hanging")
        sys.exit(3)
    import jax
    import jax.numpy as jnp

    from xvr_tpu.geometry import Detector
    from xvr_tpu.render.pallas import raymarch_siddon_pallas, raymarch_trilinear_pallas
    from xvr_tpu.render.volume import Volume, transform_hu_to_density
    from xvr_tpu.train.sampler import get_random_pose

    dev = jax.devices()[0]
    log(f"device: {dev}")

    N = 256  # volume resolution
    H = 256  # detector resolution
    B = 16  # poses per call
    S = 256  # trilinear samples per ray

    rng = np.random.default_rng(0)
    hu = rng.uniform(-1000.0, 1500.0, size=(N, N, N)).astype(np.float32)
    spacing = 1.5
    aff = np.eye(4, dtype=np.float32) * spacing
    aff[3, 3] = 1.0
    aff[:3, 3] = -(N - 1) / 2.0 * spacing
    vol = Volume(data=jnp.asarray(hu), affine=jnp.asarray(aff))
    density = transform_hu_to_density(vol.data, 2.0)
    affinv = vol.affine_inverse
    det = Detector(sdd=1020.0, height=H, width=H, delx=2.0, dely=2.0)

    # NOTE: raw detector rays (no orientation reorient) -> alpha ~ 0 views
    # the origin; reference-style alpha ~ 180 ranges apply to Projector poses.
    ranges = dict(
        alphamin=-30.0, alphamax=30.0, betamin=-15.0, betamax=15.0,
        gammamin=-15.0, gammamax=15.0, txmin=-30.0, txmax=30.0,
        tymin=500.0, tymax=800.0, tzmin=-30.0, tzmax=30.0,
    )

    from xvr_tpu.render.pallas import (
        choose_permutation_for_pose,
        measured_window_span,
        pack_density,
    )

    perm = choose_permutation_for_pose(np.eye(3), np.asarray(affinv))
    packed = pack_density(density, perm)  # once per volume
    jax.block_until_ready(packed[0])

    # EXACT windows for the pose distribution (corner poses), per ray layout;
    # an undersized window silently clips, so the bench must use measured
    # values, not guesses
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
    from xvr_tpu.geometry import convert

    probe = convert(
        np.asarray([r for r in corners for _ in t_corners], np.float32),
        np.asarray(t_corners * len(corners), np.float32),
        "euler_angles", "ZXY", degrees=True,
    )
    psrc, ptgt = det.rays(probe)
    vol_shape = tuple(int(density.shape[a]) for a in perm)
    margs = (np.asarray(psrc), np.asarray(ptgt), np.asarray(affinv), perm, (H, H), vol_shape)
    span_det = measured_window_span(*margs)
    span_remap = measured_window_span(*margs, remap=True)
    w_det = int(-(-span_det // 8) * 8)
    w_remap = int(-(-span_remap // 8) * 8)
    remap = w_remap + 8 < w_det
    window = w_remap if remap else w_det
    log(f"measured windows: detector-tiles {w_det}, sorted-remap {w_remap} -> "
        f"remap={remap}, window={window}")

    table, vshape = packed

    @jax.jit
    def render_trilinear(density, table, key):
        # Pallas fast path (slab-marching kernel, volume resident in VMEM);
        # the pose sampling + ray generation fuse into the same executable.
        # The packed table rides as an ARGUMENT — a closure capture would
        # embed it as a constant in the compile payload.
        pose = get_random_pose(key, batch_size=B, **ranges)
        src, tgt = det.rays(pose)
        return raymarch_trilinear_pallas(
            density, affinv, src, tgt, window=window, perm=perm,
            packed=(table, vshape), remap=remap,
        )

    @jax.jit
    def render_siddon(density, table, key):
        pose = get_random_pose(key, batch_size=B, **ranges)
        src, tgt = det.rays(pose)
        return raymarch_siddon_pallas(
            density, affinv, src, tgt, window=window + 8, perm=perm,
            packed=(table, vshape), remap=remap,
        )

    def timed_windows(run_one, batch, name, n_windows, n_iter):
        """Best-window throughput: a fresh executable on the tunneled chip
        runs ~2x slow for its first ~30-50 executions (server-side
        maturation), so we time several windows and report the best."""
        best = 0.0
        for w in range(n_windows):
            keys = jax.random.split(jax.random.PRNGKey(100 + w), n_iter)
            t0 = time.perf_counter()
            for k in keys:
                out = run_one(k)
            out.block_until_ready()
            dt = time.perf_counter() - t0
            best = max(best, batch * n_iter / dt)
            log(f"{name} window {w}: {batch * n_iter / dt:.1f} DRRs/s "
                f"({dt / n_iter * 1e3:.1f} ms / {batch}-batch)")
        return best

    def bench(fn, name, n_windows=3, n_iter=12):
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        fn(density, table, key).block_until_ready()
        log(f"{name}: compile+first run {time.perf_counter() - t0:.1f}s")
        return timed_windows(
            lambda k: fn(density, table, k), B, name, n_windows, n_iter
        )

    # --- shear-warp MXU fast path (the framework's throughput renderer) ----
    from xvr_tpu.render.shearwarp import (
        measured_warp_window,
        prepare_shearwarp,
        raymarch_trilinear_shearwarp,
    )

    B_SW = 192  # MXU utilization peaks near this pose batch (measured sweep
    # over B x unroll: 192/64 > 128/64 > 256/64 by a few percent)
    prepared = prepare_shearwarp(density, perm)
    jax.block_until_ready(prepared)
    ww = measured_warp_window(
        np.asarray(psrc), np.asarray(ptgt), np.asarray(affinv), perm, (H, H)
    )
    ww = int(-(-ww // 8) * 8)
    log(f"measured warp window: {ww}")

    @jax.jit
    def render_shearwarp(prepared, key):
        pose = get_random_pose(key, batch_size=B_SW, **ranges)
        src, tgt = det.rays(pose)
        return raymarch_trilinear_shearwarp(
            density, affinv, src, tgt, perm=perm, prepared=prepared,
            warp_window=ww, unroll=64,
        )

    t0 = time.perf_counter()
    render_shearwarp(prepared, jax.random.PRNGKey(0)).block_until_ready()
    log(f"shearwarp 256^2: compile+first run {time.perf_counter() - t0:.1f}s")
    sw = timed_windows(
        lambda k: render_shearwarp(prepared, k), B_SW, "shearwarp 256^2",
        n_windows=6, n_iter=15,
    )

    # --- Siddon-flavored shear-warp (the framework's fast `--renderer
    # siddon` path: trapezoid profile at small eps; see render/shearwarp.py)
    from xvr_tpu.render.shearwarp import raymarch_siddon_shearwarp

    @jax.jit
    def render_siddon_fast(prepared, key):
        pose = get_random_pose(key, batch_size=B_SW, **ranges)
        src, tgt = det.rays(pose)
        return raymarch_siddon_shearwarp(
            density, affinv, src, tgt, perm=perm, prepared=prepared,
            warp_window=ww, unroll=64,
        )

    t0 = time.perf_counter()
    render_siddon_fast(prepared, jax.random.PRNGKey(0)).block_until_ready()
    log(f"siddon_fast 256^2: compile+first run {time.perf_counter() - t0:.1f}s")
    sid_fast = timed_windows(
        lambda k: render_siddon_fast(prepared, k), B_SW, "siddon_fast 256^2",
        n_windows=4, n_iter=15,
    )

    # --- labelmap (channel) rendering: masked foundation-training config.
    # Two bone labels -> 3 output channels; per-channel masked volumes fold
    # into the MXU accumulate (VERDICT r1 #4: no slab fallback for masks).
    from xvr_tpu.render.shearwarp import channel_slab_bounds

    mask = np.zeros((N, N, N), dtype=np.int32)
    mask[N // 4 : N // 2, N // 4 : 3 * N // 4, N // 4 : 3 * N // 4] = 1
    mask[N // 2 : 3 * N // 4, N // 4 : 3 * N // 4, N // 4 : 3 * N // 4] = 2
    labels = (1, 2)
    prepared_ch = prepare_shearwarp(
        density, perm, mask=jnp.asarray(mask), labels=labels
    )
    jax.block_until_ready(prepared_ch)
    # static per-label march bounds (labels span 50% of slabs here; anatomical
    # labels are usually tighter) — what Projector.with_shearwarp measures
    ch_bounds = channel_slab_bounds(jnp.asarray(mask), labels, perm)

    @jax.jit
    def render_channels(prepared_ch, key):
        pose = get_random_pose(key, batch_size=B_SW, **ranges)
        src, tgt = det.rays(pose)
        return raymarch_trilinear_shearwarp(
            density, affinv, src, tgt, perm=perm, prepared=prepared_ch,
            warp_window=ww, unroll=64, mask=jnp.asarray(mask), labels=labels,
            chan_bounds=ch_bounds,
        )

    t0 = time.perf_counter()
    out0 = render_channels(prepared_ch, jax.random.PRNGKey(0))
    out0.block_until_ready()
    assert out0.shape[1] == len(labels) + 1, out0.shape
    log(f"channels 256^2 (2 labels): compile+first run {time.perf_counter() - t0:.1f}s")
    ch = timed_windows(
        lambda k: render_channels(prepared_ch, k), B_SW, "channels 256^2",
        n_windows=3, n_iter=12,
    )

    # --- full DeepFluoro-scale volume: 512^3 (537 MB packed table in HBM)
    N2 = 512
    hu512 = rng.uniform(-1000.0, 1500.0, size=(N2, N2, N2)).astype(np.float32)
    sp512 = 0.75
    aff512 = np.eye(4, dtype=np.float32) * sp512
    aff512[3, 3] = 1.0
    aff512[:3, 3] = -(N2 - 1) / 2.0 * sp512
    vol512 = Volume(data=jnp.asarray(hu512), affine=jnp.asarray(aff512))
    density512 = transform_hu_to_density(vol512.data, 2.0)
    affinv512 = vol512.affine_inverse
    prepared512 = prepare_shearwarp(density512, perm)
    jax.block_until_ready(prepared512)
    ww512 = measured_warp_window(
        np.asarray(psrc), np.asarray(ptgt), np.asarray(affinv512), perm, (H, H)
    )
    ww512 = int(-(-ww512 // 8) * 8)
    B512 = 64

    @jax.jit
    def render_512(prepared512, key):
        pose = get_random_pose(key, batch_size=B512, **ranges)
        src, tgt = det.rays(pose)
        return raymarch_trilinear_shearwarp(
            density512, affinv512, src, tgt, perm=perm, prepared=prepared512,
            warp_window=ww512, unroll=64,
        )

    t0 = time.perf_counter()
    render_512(prepared512, jax.random.PRNGKey(0)).block_until_ready()
    log(f"shearwarp 512^3: compile+first run {time.perf_counter() - t0:.1f}s")
    sw512 = timed_windows(
        lambda k: render_512(prepared512, k), B512, "shearwarp 512^3",
        n_windows=3, n_iter=8,
    )
    del prepared512, density512, vol512, hu512

    tri = bench(render_trilinear, "slab trilinear 256^2")
    sid = bench(render_siddon, "siddon exact 256^2")

    # --- end-to-end figures: train-step ms at the reference finetune
    # operating point and cold/warm registration at the reference budget
    # (VERDICT r1 #7/#10: these used to be self-reported in docs only)
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent / "scripts"))
    from contextlib import redirect_stdout

    train_stats = reg_stats = None
    try:
        import bench_train

        # trainer/registrar progress prints go to stderr: stdout must stay
        # ONE JSON line for the driver
        with redirect_stdout(sys.stderr):
            train_stats = bench_train.run(n_windows=2, n_steps=10)
        log(f"train step: {train_stats['value']} ms")
    except Exception as e:  # pragma: no cover - keep the headline line alive
        log(f"bench_train failed: {type(e).__name__}: {e}")
    try:
        import bench_register

        with redirect_stdout(sys.stderr):
            reg_stats = bench_register.run()
        log(f"register warm: {reg_stats['warm_runtime_s']} s, "
            f"mTRE {reg_stats['mtre_final_mm']} mm")
    except Exception as e:  # pragma: no cover
        log(f"bench_register failed: {type(e).__name__}: {e}")

    target = 5000.0
    detail = {
        "siddon_fast_drrs_per_sec": round(sid_fast, 1),
        "siddon_fast_vs_baseline": round(sid_fast / target, 4),
        "labelmap_channels_drrs_per_sec": round(ch, 1),
        "shearwarp_512cube_drrs_per_sec": round(sw512, 1),
        "slab_trilinear_drrs_per_sec": round(tri, 1),
        "siddon_exact_drrs_per_sec": round(sid, 1),
        "target": target,
        "volume": [N, N, N],
        "detector": [H, H],
        "n_samples": S,
        "window": window,
        "warp_window": ww,
        "remap": bool(remap),
    }
    if train_stats is not None:
        detail["train_step_ms"] = train_stats["value"]
        detail["finetune_500_itrs_s"] = train_stats["finetune_500_itrs_s"]
        detail["train_renderer"] = train_stats["renderer"]
        detail["train_masked_step_ms"] = train_stats["masked_step_ms"]
        detail["train_masked_renderer"] = train_stats["masked_renderer"]
    if reg_stats is not None:
        detail["register_cold_s"] = reg_stats["cold_runtime_s"]
        detail["register_warm_s"] = reg_stats["warm_runtime_s"]
        detail["register_mtre_final_mm"] = reg_stats["mtre_final_mm"]
        detail["register_mtre_final_median_mm"] = reg_stats["mtre_final_median_mm"]
        detail["register_mtre_restart_mm"] = reg_stats["mtre_restart_mm"]
        detail["register_mtre_init_mm"] = reg_stats["mtre_init_mm"]
        detail["register_stage_compiles_cold"] = reg_stats["stage_compiles_cold"]
        detail["register_stage_compiles_total"] = reg_stats["stage_compiles_total"]
        detail["register_batch_k"] = reg_stats["batch_k"]
        detail["register_batch_warm_s_per_xray"] = reg_stats["batch_warm_s_per_xray"]
        detail["register_batch_mtre_median_mm"] = reg_stats["batch_mtre_median_mm"]
    print(
        json.dumps(
            {
                "metric": f"256^2 DRRs/sec/chip (shear-warp MXU trilinear; 256^3 CT, batch {B_SW})",
                "value": round(sw, 1),
                "unit": "DRRs/s",
                "vs_baseline": round(sw / target, 4),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
