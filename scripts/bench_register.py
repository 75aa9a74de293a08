"""End-to-end registration benchmark (BASELINE.json config 3).

Synthetic DeepFluoro-style setup: a 256^3 CT with asymmetric bone features,
a ground-truth DRR written as a 1436^2 DICOM X-ray (sdd 1020, 0.194 mm
pixels — the DeepFluoro intrinsics, scripts/deepfluoro/register/finetuned.sh
in the reference), then `xvr register`-equivalent test-time optimization from
a perturbed initial pose at scales 24,12,6 x 500 iterations with crop 100.

Prints one JSON line: {"runtime_s", "iters", "ms_per_iter", "dgeo_init_mm",
"dgeo_final_mm"}. The reference budget for this config is a <=3 h SLURM
allocation per X-ray batch on an RTX 6000 Ada; per-registration wall time
there is minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root (no pip install needed)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# Shared cost memo (same file bench.py uses): the optional phases here gate
# themselves on MEASURED prior costs, not cold-sized guesses — with the
# persistent XLA compile cache a "cold" process is far cheaper than a truly
# cold one, and a cold-sized gate starves phases whose executables are
# already on disk (advisor finding r4 on the batched phase).
MEMO_PATH = Path(
    os.environ.get("XVR_BENCH_COSTS", "~/.cache/xvr_tpu/bench_costs.json")
).expanduser()


def _memo_load() -> dict:
    try:
        return json.loads(MEMO_PATH.read_text())
    except (OSError, ValueError):
        return {}


def _memo_store(**kv) -> None:
    try:
        memo = _memo_load()
        memo.update(kv)
        MEMO_PATH.parent.mkdir(parents=True, exist_ok=True)
        MEMO_PATH.write_text(json.dumps(memo))
    except OSError:
        pass


PHANTOM_VERSION = "v2"  # bump when the construction below changes
KB = 8  # X-rays in the batched-registration phase


def fiducial_mtre(pose_matrix, gt_matrix, fids) -> float:
    """Mean 3D fiducial error in mm: fiducials carried through the INVERSE
    of each pose (world -> camera), mean Euclidean distance — one definition
    shared by every bench script so the published figures and the tests
    cannot drift apart."""
    Mi = np.linalg.inv(np.asarray(pose_matrix, np.float64).reshape(4, 4))
    Gi = np.linalg.inv(np.asarray(gt_matrix, np.float64).reshape(4, 4))
    a = fids @ Gi[:3, :3].T + Gi[:3, 3]
    b = fids @ Mi[:3, :3].T + Mi[:3, 3]
    return float(np.linalg.norm(a - b, axis=-1).mean())
N_INIT_SPREAD = 16  # total inits in the accuracy-spread phase (main + jittered)

# the most recent run()'s registrar, exposed so later bench sections
# (bench_flagship) can share its compiled pyramid-stage executables
LAST_REGISTRAR = None


def phantom_cache_dir(n: int = 256) -> Path:
    """Disk-cache location of the bench phantom (keyed by version, backend,
    and resolution) — exposed so deadline gating can ask "is the expensive
    phantom build already paid?" without triggering it."""
    import jax

    suffix = "" if n == 256 else f"_{n}"
    return (
        Path("~/.cache/xvr_tpu").expanduser()
        / f"bench_phantom_{PHANTOM_VERSION}_{jax.default_backend()}{suffix}"
    )


def build_phantom(n: int = 256) -> tuple[Path, dict]:
    """Build the deterministic bench phantom, cached on disk.

    The CT volume, the 1436^2 ground-truth X-ray, the KB batched-phase
    X-rays, the fiducials, and every ground-truth pose are all seeded and
    deterministic, so they are built ONCE per (version, backend) and reused:
    the GT renders alone cost ~60 s per bench run otherwise — time the
    driver's budget cannot spare. Returns (dir, meta) with meta arrays
    ``gt_pose`` (4,4), ``fids`` (60,3 world mm), ``batch_poses`` (KB,4,4).

    ``n`` is the CT resolution; the physical extent stays 384 mm, so n=512
    is the full DeepFluoro-scale operating point (0.75 mm voxels) with the
    same anatomy. The batched-phase X-rays are built for n=256 only.
    """
    import jax
    import jax.numpy as jnp

    from xvr_tpu.geometry import convert
    from xvr_tpu.io import dcmwrite, save_nifti
    from xvr_tpu.io.volumes import read
    from xvr_tpu.render import Projector

    cache = phantom_cache_dir(n)
    meta_path = cache / "meta.npz"
    if meta_path.exists():
        meta = dict(np.load(meta_path))
        log(f"bench phantom: cache hit ({cache})")
        return cache, meta
    cache.mkdir(parents=True, exist_ok=True)
    d = cache

    # ---- synthetic CT. Registration needs coarse-scale ASYMMETRY: a
    # rotation-symmetric body (e.g. a cylinder of small blobs) leaves a flat
    # similarity ridge along the roll axis that fixed-step Adam random-walks
    # down. Use an ellipsoid body plus a few LARGE, differently-oriented bone
    # structures (diagonal rod, off-center ball, plate) that a 60-pixel
    # pyramid level still resolves. ----
    sp = 384.0 / n  # fixed 384 mm physical extent at any resolution
    c = (n - 1) / 2
    X, Y, Z = np.meshgrid(*([np.arange(n, dtype=np.float32)] * 3), indexing="ij")
    body = ((X - c) / (0.45 * n)) ** 2 + ((Y - c) / (0.30 * n)) ** 2 + (
        (Z - c) / (0.40 * n)
    ) ** 2
    hu = np.where(body <= 1.0, 40.0, -1000.0).astype(np.float32)
    # thick diagonal rod: a capsule around the segment p(t) = A + t*D,
    # t in [0.28, 0.72] (the closed form of the old 200-sphere stamp loop,
    # which cost >2 min of host time per bench run)
    A = np.array([0.0, 0.35 * n, 0.9 * n], np.float32)
    D = np.array([n, 0.3 * n, -0.8 * n], np.float32)
    tstar = np.clip(
        ((X - A[0]) * D[0] + (Y - A[1]) * D[1] + (Z - A[2]) * D[2]) / (D @ D),
        0.28, 0.72,
    )
    r2 = (
        (X - A[0] - tstar * D[0]) ** 2
        + (Y - A[1] - tstar * D[1]) ** 2
        + (Z - A[2] - tstar * D[2]) ** 2
    )
    hu = np.where(r2 <= (0.045 * n) ** 2, 1200.0, hu)
    # large off-center ball + a plate
    r2 = (X - 0.62 * n) ** 2 + (Y - 0.45 * n) ** 2 + (Z - 0.6 * n) ** 2
    hu = np.maximum(hu, np.where(r2 <= (0.10 * n) ** 2, 1000.0, hu))
    plate = (np.abs(X - 0.35 * n) < 0.04 * n) & (np.abs(Y - 0.55 * n) < 0.12 * n) & (
        np.abs(Z - 0.35 * n) < 0.12 * n
    )
    hu = np.maximum(hu, np.where(plate, 1400.0, hu))
    # band-limit like a real CT (sharp edges alias at coarse pyramid levels);
    # voxel-unit sigmas scale with n so the PHYSICAL content matches across
    # resolutions
    from scipy.ndimage import gaussian_filter

    hu = gaussian_filter(hu, sigma=2.0 * n / 256).astype(np.float32)
    # trabecular-style texture inside bone: real radiographs are texture-rich
    # and that texture is what the gradient-NCC term locks onto; a smooth
    # phantom under-represents achievable registration accuracy
    prng_tex = np.random.default_rng(5)
    tex = gaussian_filter(
        prng_tex.normal(0.0, 1.0, hu.shape).astype(np.float32),
        sigma=1.2 * n / 256,
    )
    tex *= 250.0 / max(tex.std(), 1e-6)
    hu = np.where(hu > 400.0, hu + tex, hu).astype(np.float32)
    aff = np.eye(4, dtype=np.float32) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -c * sp
    save_nifti(d / "ct.nii.gz", hu, aff)

    # ---- ground-truth X-ray at DeepFluoro intrinsics ----
    SDD, H, DELX = 1020.0, 1436, 0.194
    vol = read(d / "ct.nii.gz")
    proj = Projector.from_volume(vol, sdd=SDD, height=H, delx=DELX)
    gt_pose = convert(
        jnp.asarray([[182.0, -4.0, 3.0]]), jnp.asarray([[6.0, 740.0, -10.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    t0 = time.perf_counter()
    gt_proj = (
        proj.with_shearwarp(gt_pose, differentiable=False)
        if jax.default_backend() == "tpu" else proj
    )
    img = np.asarray(gt_proj(gt_pose))[0, 0]
    log(f"GT render 1436^2: {time.perf_counter() - t0:.1f}s ({gt_proj.renderer})")
    dcmwrite(
        d / "xray.dcm", (img / img.max() * 60000).astype(np.uint16),
        sdd=SDD, row_spacing=DELX, col_spacing=DELX,
    )

    # ---- batched-phase X-rays: KB distinct ground-truth poses near the
    # shared init (the realistic sweep shape: one init strategy, per-image
    # refinement)
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    brng = np.random.default_rng(11)
    batch_mats = []
    for k in range(KB if n == 256 else 0):
        rot_k = np.asarray(rot0)[0] + np.deg2rad(brng.uniform(-0.6, 0.6, 3))
        xyz_k = np.asarray(xyz0)[0] + brng.uniform(-2.5, 2.5, 3)
        pose_k = convert(
            jnp.asarray([rot_k], jnp.float32), jnp.asarray([xyz_k], jnp.float32),
            "euler_angles", "ZXY",
        )
        batch_mats.append(np.asarray(pose_k.matrix).reshape(4, 4))
        img_k = np.asarray(gt_proj(pose_k))[0, 0]
        dcmwrite(
            d / f"xray_b{k}.dcm", (img_k / img_k.max() * 60000).astype(np.uint16),
            sdd=SDD, row_spacing=DELX, col_spacing=DELX,
        )

    # fiducial targets for mTRE (the reference's headline accuracy metric,
    # src/xvr/metrics/evaluator.py:17-36): random bone points in world mm
    frng = np.random.default_rng(7)
    bone = np.argwhere(hu > 600)
    fids = bone[frng.choice(len(bone), 60, replace=False)].astype(np.float64) * sp - c * sp

    meta = {
        "gt_pose": np.asarray(gt_pose.matrix, np.float64).reshape(4, 4),
        "fids": fids,
        "batch_poses": (
            np.stack(batch_mats) if batch_mats else np.zeros((0, 4, 4))
        ),
        "sdd": np.float64(SDD),
        "delx": np.float64(DELX),
    }
    np.savez(meta_path, **meta)
    log(f"bench phantom: built and cached ({cache})")
    return cache, meta


def run_fullscale(deadline: float | None = None) -> dict:
    """Registration at the reference's TRUE DeepFluoro scale: a 512^3 CT
    (0.75 mm voxels, 384 mm extent — real DeepFluoro CTs are ~512x512x300)
    against the 1436^2 X-ray at scales 24,12,6 x 500 with crop 100. The
    256^3 sections prove the engine; this proves the operating point.
    """
    import jax
    import jax.numpy as jnp

    from xvr_tpu.geometry import RigidTransform
    from xvr_tpu.registrar import RegistrarFixed

    log(f"device: {jax.devices()[0]}")

    def left():
        return np.inf if deadline is None else deadline - time.perf_counter()

    # Deadline gates BEFORE the expensive irreversible steps (advisor r4):
    # the one-time 512^3 phantom build (~270 s) and the cold registration
    # core (~250 s of stage compiles on a wiped compile cache) each check
    # the remaining slice against the last MEASURED cost before starting,
    # so a cold-cache run cannot silently push the whole bench past the
    # driver's budget. A skip returns {"skipped_reason": ...} for the
    # artifact instead of raising.
    memo = _memo_load()
    cold_est = memo.get("register_512:cold_core_s", 300.0)
    if not (phantom_cache_dir(512) / "meta.npz").exists():
        build_est = memo.get("register_512:phantom_build_s", 290.0)
        if left() < build_est + cold_est:
            reason = (
                f"phantom build ~{build_est:.0f}s + cold core ~{cold_est:.0f}s "
                f"> {left():.0f}s left"
            )
            log(f"register_512: skipped ({reason})")
            return {"skipped_reason": reason}
        t0 = time.perf_counter()
        d, meta = build_phantom(n=512)
        _memo_store(**{
            "register_512:phantom_build_s": round(time.perf_counter() - t0, 1)
        })
    else:
        d, meta = build_phantom(n=512)
    if left() < cold_est:
        reason = f"cold core ~{cold_est:.0f}s > {left():.0f}s left"
        log(f"register_512: skipped ({reason})")
        # decay-on-skip, same self-healing rationale as the batched phase
        _memo_store(**{"register_512:cold_core_s": round(cold_est * 0.7, 1)})
        return {"skipped_reason": reason}
    gt_pose = RigidTransform(jnp.asarray(meta["gt_pose"], jnp.float32).reshape(1, 4, 4))
    fids = np.asarray(meta["fids"], np.float64)

    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    rot_init = np.asarray(rot0)[0] + np.deg2rad([0.6, -0.5, 0.4])
    xyz_init = np.asarray(xyz0)[0] + np.array([2.0, -3.0, 1.5])
    reg = RegistrarFixed(
        volume=d / "ct.nii.gz", mask=None, orientation="AP",
        rot=rot_init.tolist(), xyz=xyz_init.tolist(),
        linearize=False, scales="24,12,6", n_itrs="500,500,500", crop=100,
        reverse_x_axis=False, lr_rot=1e-2, lr_xyz=1.0,
        patience=10, max_n_plateaus=3, verbose=1,
        coarse_seeds=16,
    )
    t0 = time.perf_counter()
    out = reg.run(d / "xray.dcm")
    cold_s = time.perf_counter() - t0
    _memo_store(**{"register_512:cold_core_s": round(cold_s, 1)})
    stats = {
        "volume": 512,
        "cold_runtime_s": round(cold_s, 1),
        "mtre_init_mm": round(
            fiducial_mtre(out[3].matrix, np.asarray(gt_pose.matrix)[0], fids), 3
        ),
        "mtre_final_mm": round(
            fiducial_mtre(out[4].matrix, np.asarray(gt_pose.matrix)[0], fids), 3
        ),
    }
    # warm run only when the deadline allows (the cold run is the must-have)
    warm_s = None
    if deadline is None or deadline - time.perf_counter() > cold_s * 0.5:
        t0 = time.perf_counter()
        out = reg.run(d / "xray.dcm")
        warm_s = time.perf_counter() - t0
        stats["warm_runtime_s"] = round(warm_s, 1)
        stats["mtre_final_warm_mm"] = round(
            fiducial_mtre(out[4].matrix, np.asarray(gt_pose.matrix)[0], fids), 3
        )
    # init SPREAD at the true scale, same rationale as run()'s: the tail
    # (worst over jittered inits) is the claim-shaped statistic. Each seed
    # swaps init_pose on the same registrar (~one warm run each) and the
    # loop is deadline-gated per seed, so a tight driver budget just yields
    # a narrower spread.
    if warm_s is not None:
        from xvr_tpu.geometry import convert as _convert

        # one entry per DISTINCT init (same convention as run()'s spread):
        # the main init contributes its warm final once, then jittered seeds
        finals = [stats["mtre_final_warm_mm"]]
        for seed in range(1, 8):
            if left() < 4 * warm_s:
                log(f"register_512: stopping init spread at {len(finals)} finals")
                break
            prng = np.random.default_rng(100 + seed)
            reg.init_pose = _convert(
                jnp.asarray(
                    [np.asarray(rot0)[0] + np.deg2rad(prng.uniform(-0.8, 0.8, 3))],
                    jnp.float32,
                ),
                jnp.asarray(
                    [np.asarray(xyz0)[0] + prng.uniform(-3.0, 3.0, 3)], jnp.float32
                ),
                parameterization=reg.parameterization, convention=reg.convention,
            )
            out_i = reg.run(d / "xray.dcm")
            finals.append(round(
                fiducial_mtre(out_i[4].matrix, np.asarray(gt_pose.matrix)[0], fids), 3
            ))
        stats["mtre_final_median_mm"] = round(float(np.median(finals)), 3)
        stats["mtre_final_worst_mm"] = round(float(max(finals)), 3)
        stats["n_init_spread"] = len(finals)
    log(f"register 512^3: cold {stats['cold_runtime_s']}s, "
        f"mTRE {stats['mtre_init_mm']} -> {stats['mtre_final_mm']} mm "
        f"(spread {stats.get('n_init_spread', 1)}: median "
        f"{stats.get('mtre_final_median_mm')}, worst {stats.get('mtre_final_worst_mm')})")
    return stats


def run(deadline: float | None = None) -> dict:
    """Cold + warm registration at the reference budget; returns the
    JSON-ready dict (importable so bench.py can fold these numbers into the
    driver-recorded line).

    ``deadline`` is an absolute ``time.perf_counter()`` value; the optional
    phases (median-over-inits, batched registration) are skipped once it is
    near, so the core cold/warm/mTRE figures always make it out.
    """
    import jax
    import jax.numpy as jnp

    from xvr_tpu.geometry import RigidTransform
    from xvr_tpu.metrics import double_geodesic
    from xvr_tpu.registrar import RegistrarFixed

    log(f"device: {jax.devices()[0]}")
    d, meta = build_phantom()
    SDD, DELX = float(meta["sdd"]), float(meta["delx"])
    gt_pose = RigidTransform(jnp.asarray(meta["gt_pose"], jnp.float32).reshape(1, 4, 4))
    fids = np.asarray(meta["fids"], np.float64)

    # ---- register from a model-like init (reference scales/budget). Run
    # TWICE with the same registrar: the first pays the per-stage jit
    # compiles (once per intrinsics/scale combination), the second is the
    # steady-state cost of the reference's 1800-registration sweeps. ----
    # CNN-like initial error (the reference's `register model` operating
    # point: the pose-regression network lands within a few mm / ~1 deg,
    # and test-time optimization refines from there — arXiv:2503.16309).
    # Larger perturbations exceed the similarity basin at these scales for
    # the reference's optimizer mechanics too (first-Adam-kick + patience).
    rot0, xyz0 = gt_pose.convert("euler_angles", "ZXY")
    rot_init = np.asarray(rot0)[0] + np.deg2rad([0.6, -0.5, 0.4])
    xyz_init = np.asarray(xyz0)[0] + np.array([2.0, -3.0, 1.5])

    # SINGLE-invocation registrar: the default max_restarts=1 folds the
    # objective-gated re-anneal into `run`, so mtre_final_mm below is what
    # one `xvr register` command reaches at the reference budget.
    reg = RegistrarFixed(
        volume=d / "ct.nii.gz", mask=None, orientation="AP",
        rot=rot_init.tolist(), xyz=xyz_init.tolist(),
        linearize=False, scales="24,12,6", n_itrs="500,500,500", crop=100,
        reverse_x_axis=False, lr_rot=1e-2, lr_xyz=1.0,
        patience=10, max_n_plateaus=3, verbose=1,
        # wide basin search at scale 24 (nearly free on the MXU): targets
        # the worst-case tail of the final-mTRE distribution
        coarse_seeds=16,
    )
    global LAST_REGISTRAR
    LAST_REGISTRAR = reg
    results = {}
    compiles = {}
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        out = reg.run(d / "xray.dcm")
        results[tag] = (time.perf_counter() - t0, out)
        compiles[tag] = reg.stage_compiles
    (cold_s, _), (warm_s, out) = results["cold"], results["warm"]
    gt, intrinsics, _, init_pose, final_pose, kwargs = out
    iters = len(kwargs["trajectory"]["ncc"])

    def time_left():
        return np.inf if deadline is None else deadline - time.perf_counter()

    # Accuracy over a SPREAD of initializations: a single trajectory with
    # plateau-counted early exit is a high-variance observable (run-to-run
    # reassociation noise alone moves the final mTRE by >1 mm on this
    # phantom); the median over perturbed inits is the stable figure and the
    # WORST over the spread is the claim-shaped one (the reference says
    # "submillimeter", not "submillimeter in the median" — README.md:20).
    # Extra inits reuse the compiled stages, so each costs ~one warm run.
    # Runs BEFORE the batched phase: worst-over-inits is a claim-carrying
    # figure, while the batched throughput is garnish whose COLD cost (the
    # K=8 stage compiles, ~2 min on a wiped compile cache) would otherwise
    # starve the spread out of the section's slice.
    # Each extra init swaps ``init_pose`` on the SAME registrar (stage
    # executables, projector, and device-resident volume all reused), so a
    # seed costs ~one warm run instead of a full registrar rebuild — that is
    # what lets the spread stretch to 16 seeds inside the section slice
    # (verdict r4 #7: pin the worst-over-inits tail with more draws).
    from xvr_tpu.geometry import convert as _convert

    orig_init_pose = reg.init_pose
    extra_finals = [final_pose]
    for seed in range(1, N_INIT_SPREAD):
        if time_left() < 4 * warm_s:
            log(f"bench_register: stopping init spread at {len(extra_finals)} "
                f"(deadline near)")
            break
        prng = np.random.default_rng(seed)
        reg.init_pose = _convert(
            jnp.asarray(
                [np.asarray(rot0)[0] + np.deg2rad(prng.uniform(-0.8, 0.8, 3))],
                jnp.float32,
            ),
            jnp.asarray(
                [np.asarray(xyz0)[0] + prng.uniform(-3.0, 3.0, 3)], jnp.float32
            ),
            parameterization=reg.parameterization, convention=reg.convention,
        )
        extra_finals.append(reg.run(d / "xray.dcm")[4])
    reg.init_pose = orig_init_pose  # the batched phase registers from the main init

    # ---- batched registration: K DISTINCT X-rays per optimization (the TPU
    # answer to the reference's 1800-job SLURM sweeps). Each X-ray comes from
    # its own ground-truth pose near the shared fixed init — the realistic
    # sweep shape: one init strategy, per-image refinement. Skipped when the
    # deadline is near (the K=8 stage compiles are the cost).
    batch_stats = {}
    # Admission by MEASURED prior (advisor r4): once the K=8 stage
    # executables are in the persistent compile cache, a "cold" batch run
    # costs a fraction of the truly-cold figure, so gate on the last
    # measurement (1.3x margin) when one exists and fall back to the
    # cold-sized gate only on a first-ever run. A skip is recorded in the
    # stats dict (``batch_skipped``) so the artifact distinguishes
    # "skipped" from "missing".
    prior_bc = _memo_load().get("register:batch_cold_s")
    need = prior_bc * 1.3 + 3 * warm_s if prior_bc is not None else 10 * warm_s + 60
    if time_left() > need:
        # the KB X-rays and their ground-truth poses are pre-rendered by
        # build_phantom (disk-cached alongside the volume)
        gt_batch = [
            RigidTransform(jnp.asarray(meta["batch_poses"][k], jnp.float32).reshape(1, 4, 4))
            for k in range(KB)
        ]
        batch_files = [d / f"xray_b{k}.dcm" for k in range(KB)]
        t0 = time.perf_counter()
        bat = reg.run_batch(batch_files)  # pays the K=8 stage compiles
        batch_cold_s = time.perf_counter() - t0
        _memo_store(**{"register:batch_cold_s": round(batch_cold_s, 1)})
        batch_stats = {
            # batched registration (K X-rays per optimization, shared wall time)
            "batch_k": KB,
            "batch_cold_s": round(batch_cold_s, 1),
        }
        # the warm rerun is the claim-carrying per-X-ray figure but is
        # skippable mid-phase: the cold run above already yields poses.
        # First-ever estimate: the stage executables are in-process now, so
        # a warm batch costs ~K lockstep warm trajectories (measured ~0.5x
        # the single-X-ray warm cost each), NOT half the cold figure — the
        # cold run is dominated by the K=8 stage compiles/loads (r5 run 2:
        # cold 149.9 s, actual warm ~12 s; the 0.5x-cold default starved
        # the phase the advisor r4 finding was about).
        prior_bw = _memo_load().get("register:batch_warm_s", warm_s * KB * 0.6)
        if time_left() > prior_bw * 1.3:
            t0 = time.perf_counter()
            bat = reg.run_batch(batch_files)
            batch_warm_s = time.perf_counter() - t0
            _memo_store(**{"register:batch_warm_s": round(batch_warm_s, 1)})
            batch_stats["batch_warm_s"] = round(batch_warm_s, 1)
            batch_stats["batch_warm_s_per_xray"] = round(batch_warm_s / KB, 2)
        else:
            log("bench_register: skipping batched WARM rerun (deadline near)")
            batch_stats["batch_skipped"] = "warm rerun (deadline near)"

        batch_mtres = [
            fiducial_mtre(bat[k][4].matrix, np.asarray(gt_batch[k].matrix)[0], fids)
            for k in range(KB)
        ]
        batch_mtre = float(np.median(batch_mtres))
        log(f"batched x{KB}: cold {batch_cold_s:.1f}s, "
            f"median mTRE {batch_mtre:.3f} mm (per-image {[round(m, 2) for m in batch_mtres]})")
        batch_stats["batch_mtre_median_mm"] = round(batch_mtre, 3)
        batch_stats["batch_mtre_worst_mm"] = round(max(batch_mtres), 3)
    else:
        log(f"bench_register: skipping batched phase (need {need:.0f}s, "
            f"{time_left():.0f}s left)")
        batch_stats = {"batch_skipped": f"deadline near (need {need:.0f}s)"}
        # decay the measured prior on every skip: a stall-inflated
        # measurement (r5: 284s stored for a ~150s phase) would otherwise
        # raise the admission threshold above every future slice and the
        # phase could never run to correct itself — the same deadlock the
        # section-cost cap in bench.py closes, self-healing here because
        # the next actual run re-measures whatever the true cost is
        if prior_bc is not None:
            _memo_store(**{"register:batch_cold_s": round(prior_bc * 0.7, 1)})

    def mtre(pose):
        return fiducial_mtre(pose.matrix, np.asarray(gt_pose.matrix)[0], fids)

    _, _, dg_init = (float(np.squeeze(x)) for x in double_geodesic(gt_pose, init_pose, SDD))
    rg, tg, dg_fin = (float(np.squeeze(x)) for x in double_geodesic(gt_pose, final_pose, SDD))

    return {
        "metric": "xvr register (scales 24,12,6 x 500, 1436^2 X-ray, 256^3 CT)",
        "cold_runtime_s": round(cold_s, 1),
        "warm_runtime_s": round(warm_s, 1),
        "iters": iters,
        # divide by iterations EXECUTED (incl. discarded re-anneal passes),
        # not trajectory length — a discarded pass costs time, leaves no rows
        "ms_per_iter_warm": round(
            results["warm"][1][5]["runtime"]
            / max(results["warm"][1][5].get("iters_run", iters), 1) * 1e3, 1,
        ),
        "mtre_init_mm": round(mtre(init_pose), 3),
        "mtre_final_mm": round(mtre(final_pose), 3),
        "mtre_final_median_mm": round(float(np.median([mtre(p) for p in extra_finals])), 3),
        "mtre_final_worst_mm": round(float(max(mtre(p) for p in extra_finals)), 3),
        "n_init_spread": len(extra_finals),
        "max_restarts": reg.max_restarts,  # re-anneal is inside the invocation
        "restart_seeds": reg.restart_seeds,  # multi-start width of each re-anneal
        "dgeo_init_mm": round(dg_init, 2),
        "dgeo_final_mm": round(dg_fin, 2),
        "rot_final_deg": round(np.rad2deg(rg / SDD), 3),
        "trans_final_mm": round(tg, 2),
        # cache telemetry (one executable per pyramid stage; the warm run
        # must reuse all of them — cache keys quantize measured windows)
        "stage_compiles_cold": compiles["cold"],
        "stage_compiles_total": compiles["warm"],
        **batch_stats,
    }


def main():
    from xvr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # bench.py does this for the in-process path
    print(json.dumps(run()))


if __name__ == "__main__":
    main()
