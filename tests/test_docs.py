"""Docs freshness guards.

The reference renders its CLI reference pages from the live commands on
every docs build (mkdocs-click, /root/reference/docs/cli/train.md); here the
pages are committed statically, so this test is what keeps them honest —
the committed markdown must match what ``docs/scripts/gen_cli_pages.py``
would write today (caught drifting by several rounds of CLI options in r5).
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_api_layout_symbols_resolve():
    """Every symbol docs/api.md names must import from where it says
    (found drifting in r5: `xvr_tpu.models.load_model` existed but was not
    re-exported from the package)."""
    import importlib

    checks = {
        "xvr_tpu.geometry": ["RigidTransform", "convert", "Detector"],
        "xvr_tpu.render": [
            "Volume", "Projector", "transform_hu_to_density",
            "raymarch_trilinear", "raymarch_siddon",
        ],
        "xvr_tpu.metrics": [
            "ncc", "local_ncc", "multiscale_ncc", "gradient_ncc",
            "dice_loss", "double_geodesic", "Evaluator",
        ],
        "xvr_tpu.models": ["create_backbone", "PoseRegressor", "load_model"],
        "xvr_tpu.models.inference": ["predict_pose", "resample", "construct_antipode"],
        "xvr_tpu.train": [
            "Trainer", "get_random_pose", "xray_augmentations",
            "pose_regression_loss",
        ],
        "xvr_tpu.registrar": ["RegistrarBase", "Registration"],
        "xvr_tpu.io": ["read_xray", "read"],
        "xvr_tpu.parallel": ["make_mesh", "collective_bytes_summary"],
        "xvr_tpu.visualization": [
            "plot_drr", "plot_mask", "plot_registration", "animate",
        ],
    }
    missing = []
    for mod, syms in checks.items():
        m = importlib.import_module(mod)
        missing += [f"{mod}.{s}" for s in syms if not hasattr(m, s)]
    assert not missing, f"docs/api.md names unresolvable symbols: {missing}"


def test_cli_pages_current():
    sys.path.insert(0, str(REPO / "docs" / "scripts"))
    try:
        import gen_cli_pages
    finally:
        sys.path.pop(0)

    for page, cmds in gen_cli_pages.PAGES.items():
        expected = "\n".join(
            f"# `xvr {cmd}`\n\n```\n{gen_cli_pages.help_text(cmd)}\n```\n"
            for cmd in cmds
        )
        committed = (REPO / "docs" / "cli" / page).read_text()
        assert committed == expected, (
            f"docs/cli/{page} is stale — rerun "
            f"`PYTHONPATH=. python docs/scripts/gen_cli_pages.py`"
        )
