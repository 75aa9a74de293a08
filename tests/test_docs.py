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
