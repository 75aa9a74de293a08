"""Generate docs/cli/*.md from the live CLI help output.

The reference builds these pages with mkdocs-click
(/root/reference/docs/cli/train.md); here they are generated statically so
the docs build needs no plugin. Re-run after changing any CLI option:

    python docs/scripts/gen_cli_pages.py
"""

from __future__ import annotations

from pathlib import Path

import jax

# Help text needs no accelerator: pin CPU before anything imports further
# jax internals, so doc builds never contend for (or stall) the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import click
from click.testing import CliRunner

from xvr_tpu.cli.cli import cli

OUT = Path(__file__).resolve().parents[1] / "cli"

PAGES = {
    "train.md": ["train"],
    "restart.md": ["restart"],
    "register.md": ["register", "register model", "register dicom",
                    "register fixed", "register restart"],
    "animate.md": ["animate"],
    "dcm2nii.md": ["dcm2nii"],
}


def help_text(cmd: str) -> str:
    # click wraps help at the terminal width (COLUMNS); pin it so the pages
    # (and the freshness test in tests/test_docs.py) are environment-stable
    r = CliRunner(env={"COLUMNS": "80"}).invoke(
        cli, cmd.split() + ["--help"], catch_exceptions=False,
        prog_name="xvr",
    )
    assert r.exit_code == 0, r.output
    return r.output.rstrip()


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for page, cmds in PAGES.items():
        parts = []
        for cmd in cmds:
            parts.append(f"# `xvr {cmd}`\n\n```\n{help_text(cmd)}\n```\n")
        (OUT / page).write_text("\n".join(parts))
        print(f"wrote docs/cli/{page}")


if __name__ == "__main__":
    main()
