"""CLI-level smoke tests: the command tree drives the real engines end to end
(tiny configs, CPU). Mirrors the reference's command surface
(/root/reference/src/xvr/cli/cli.py:28-59)."""

import numpy as np
import pytest
from click.testing import CliRunner

import jax.numpy as jnp

from xvr_tpu.cli.cli import cli
from xvr_tpu.geometry import convert
from xvr_tpu.io import dcmwrite, save_nifti


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    n, c, sp = 24, 11.5, 4.0
    idx = np.arange(n)
    X, Y, Z = np.meshgrid(idx, idx, idx, indexing="ij")
    r2 = (X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2
    hu = np.where(r2 <= 8**2, 200.0, -1000.0).astype(np.float32)
    hu += np.where(r2 <= 4**2, 800.0, 0.0)
    aff = np.eye(4) * sp
    aff[3, 3] = 1.0
    aff[:3, 3] = -c * sp
    save_nifti(d / "ct.nii.gz", hu, aff)

    from xvr_tpu.io.volumes import read
    from xvr_tpu.render import Projector

    proj = Projector.from_volume(read(d / "ct.nii.gz"), sdd=400.0, height=48, delx=4.0)
    pose = convert(
        jnp.asarray([[180.0, 2.0, -1.0]]), jnp.asarray([[3.0, 220.0, -2.0]]),
        "euler_angles", "ZXY", degrees=True,
    )
    img = np.asarray(proj(pose))[0, 0]
    dcmwrite(d / "xray.dcm", (img / img.max() * 60000).astype(np.uint16),
             sdd=400.0, row_spacing=4.0, col_spacing=4.0)
    return d


def _invoke(args):
    return CliRunner().invoke(cli, args, catch_exceptions=False)


def test_cli_version_and_help():
    r = _invoke(["--version"])
    assert r.exit_code == 0 and "version" in r.output
    r = _invoke(["register", "--help"])
    for sub in ("model", "dicom", "fixed", "restart"):
        assert sub in r.output


@pytest.mark.slow
def test_cli_train_then_restart(workdir):
    out = workdir / "models"
    args = [
        "train", "-v", str(workdir / "ct.nii.gz"), "-o", str(out),
        "--r1", "165", "195", "--r2", "-5", "5", "--r3", "-5", "5",
        "--tx", "-5", "5", "--ty", "150", "250", "--tz", "-5", "5",
        "--sdd", "400", "--height", "32", "--delx", "4.0",
        "--model_name", "resnet18", "--batch_size", "2",
        "--n_total_itrs", "2", "--n_save_every_itrs", "1", "--lr", "1e-3",
    ]
    r = _invoke(args)
    assert r.exit_code == 0, r.output
    ckpts = sorted(out.glob("*.ckpt"))
    assert ckpts, "train wrote no checkpoint"

    r = _invoke(["restart", "-c", str(out)])
    assert r.exit_code == 0, r.output


@pytest.mark.slow
def test_cli_register_fixed_and_animate(workdir):
    res = workdir / "results"
    r = _invoke([
        "register", "fixed", str(workdir / "xray.dcm"),
        "-v", str(workdir / "ct.nii.gz"), "-o", str(res),
        "--rot", "3.18", "0.0", "0.0", "--xyz", "0.0", "225.0", "0.0",
        "--scales", "2", "--n_itrs", "15", "--verbose", "0",
    ])
    assert r.exit_code == 0, r.output
    bundle = res / "xray" / "parameters.npz"
    assert bundle.exists(), list(res.rglob("*"))

    r = _invoke(["animate", "-i", str(bundle), "-o", str(workdir / "traj.gif"), "--skip", "5"])
    assert r.exit_code == 0, r.output
    assert (workdir / "traj.gif").exists()


def test_local_run_jsonl_logging(tmp_path, monkeypatch):
    """The wandb-or-JSONL shim: start event with config, metric rows, figure
    persistence, and non-JSON values stringified."""
    monkeypatch.setenv("XVR_LOG_DIR", str(tmp_path))
    monkeypatch.delenv("WANDB_API_KEY", raising=False)
    import json
    from pathlib import Path

    from xvr_tpu.cli.logging import start_run

    run = start_run("proj", "myrun", {"lr": 1e-3, "path": Path("/x")})
    run.log({"itr": 0, "loss": 1.5})
    run.log({"itr": 1, "loss": 0.5, "weird": object()})
    run.finish()

    rows = [
        json.loads(line)
        for line in (tmp_path / "proj" / "myrun.jsonl").read_text().splitlines()
    ]
    assert rows[0]["event"] == "start" and rows[0]["config"]["lr"] == 1e-3
    assert rows[1]["loss"] == 1.5
    assert isinstance(rows[2]["weird"], str)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot([0, 1])
        run.log({"itr": 2, "imgs": fig})
        plt.close(fig)
        pngs = list((tmp_path / "proj" / "myrun" / "figures").glob("*.png"))
        assert len(pngs) == 1
    except ImportError:
        pass


def test_cli_register_directory_glob(workdir, tmp_path):
    """XRAY arguments that are directories glob by --pattern and register
    every match (reference register.py run/parse_dcmfiles semantics);
    --init_only keeps it cheap."""
    import shutil

    xdir = tmp_path / "xrays"
    xdir.mkdir()
    shutil.copy(workdir / "xray.dcm", xdir / "a.dcm")
    shutil.copy(workdir / "xray.dcm", xdir / "b.dcm")
    (xdir / "ignored.txt").write_text("not a dicom")

    res = tmp_path / "results"
    r = _invoke([
        "register", "fixed", str(xdir),
        "-v", str(workdir / "ct.nii.gz"), "-o", str(res),
        "--rot", "3.18", "0.0", "0.0", "--xyz", "0.0", "225.0", "0.0",
        "--pattern", "*.dcm", "--init_only", "--verbose", "0",
    ])
    assert r.exit_code == 0, r.output
    assert (res / "a" / "parameters.npz").exists()
    assert (res / "b" / "parameters.npz").exists()
    assert not (res / "ignored").exists()
    # init-only bundles record the initial pose and no final pose
    d = np.load(res / "a" / "parameters.npz")
    assert "init_pose" in d.files and "final_pose" not in d.files


def test_register_cli_defaults_match_reference():
    """The CLI surface is the reference contract: every register subcommand
    must default to the reference schedule (n_itrs 500, linearize off,
    reverse_x_axis off — reference src/xvr/config/registrar.py:5-38), i.e.
    the API-level clinical presets (clinical_defaults: n_itrs "100",
    linearize/reverse_x_axis True) must NOT leak through click. The help
    epilog documents the divergence."""
    from xvr_tpu.cli.commands.register import dicom, fixed, model, restart

    for cmd in (model, dicom, fixed, restart):
        defaults = {p.name: p.default for p in cmd.params}
        assert defaults["n_itrs"] == "500", (cmd.name, defaults["n_itrs"])
        assert defaults["linearize"] is False, cmd.name
        assert defaults["reverse_x_axis"] is False, cmd.name
        assert defaults["scales"] == "8", cmd.name
        # the base-kwargs plumbing passes each of these explicitly, so the
        # click default IS the effective value for a bare CLI invocation
        from xvr_tpu.cli.commands.register import _base_kwargs

        kw = {p.name: p.default for p in cmd.params}
        kw.setdefault("labels", None)
        effective = _base_kwargs(kw)
        assert effective["n_itrs"] == "500" and effective["linearize"] is False

    runner = CliRunner()
    res = runner.invoke(cli, ["register", "fixed", "--help"])
    assert res.exit_code == 0
    assert "clinical presets" in res.output, "epilog missing from --help"


def test_clinical_defaults_api_presets():
    """Direct API construction applies the clinical presets when the kwargs
    are omitted, and explicit values always win (registrar/base.py:32-44)."""
    from xvr_tpu.registrar.base import clinical_defaults

    preset = clinical_defaults({})
    assert preset == {"linearize": True, "n_itrs": "100", "reverse_x_axis": True}
    explicit = clinical_defaults({"n_itrs": "500", "linearize": False})
    assert explicit["n_itrs"] == "500" and explicit["linearize"] is False
    assert explicit["reverse_x_axis"] is True
