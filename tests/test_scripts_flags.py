"""Experiment-script compat guard.

The ``scripts/{deepfluoro,ljubljana,femur}`` tree mirrors the reference's
SLURM sweeps (reference ``scripts/deepfluoro/train/de_novo.sh:19-41`` etc.)
and is the workflow surface users copy from. Every ``--flag`` a script
passes to an ``xvr`` command must exist on that command — a script invoking
a dropped/renamed option would only fail at runtime on real data, which
this environment can never execute.
"""

import re
import shlex
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

from click import Group

from xvr_tpu.cli.cli import cli

REPO = Path(__file__).resolve().parents[1]


def _command_for(tokens):
    """Resolve ['xvr', 'register', 'model', ...] to the click command."""
    cmd = cli
    i = 1
    while i < len(tokens) and isinstance(cmd, Group):
        nxt = cmd.commands.get(tokens[i])
        if nxt is None:
            break
        cmd, i = nxt, i + 1
    return cmd, tokens[i:]


def _known_flags(cmd):
    out = set()
    for p in cmd.params:
        out.update(o for o in (p.opts + p.secondary_opts) if o.startswith("-"))
    return out


def _xvr_invocations(text):
    """Yield token lists for each `xvr ...` command, joining continuations."""
    text = text.replace("\\\n", " ")
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("xvr "):
            # strip shell substitutions that confuse shlex quoting
            line = re.sub(r"\$\{[^}]*\}", "X", line).replace("$", "")
            yield shlex.split(line)


def test_reference_script_flags_exist():
    """THE compat contract (docs/migration.md: "Scripts written against the
    modern reference CLI run unchanged"): every --flag the REFERENCE's own
    modern experiment scripts pass to `xvr` must exist on our command of
    the same name. Skipped where the reference checkout is absent; the
    v1-submission tree is deliberately out of scope (docs/migration.md)."""
    import pytest

    ref = Path("/root/reference/scripts")
    if not ref.is_dir():
        pytest.skip("reference checkout not available")
    scripts = [
        p for p in sorted(ref.glob("*/*/*.sh")) if "v1-submission" not in p.parts
    ]
    assert len(scripts) >= 15, scripts
    problems = []
    for sh in scripts:
        for tokens in _xvr_invocations(sh.read_text()):
            cmd, rest = _command_for(tokens)
            if isinstance(cmd, Group):
                problems.append(f"{sh}: unresolved subcommand in {tokens[:3]}")
                continue
            known = _known_flags(cmd)
            for tok in rest:
                if tok.startswith("--") and tok.split("=")[0] not in known:
                    problems.append(f"{sh}: {cmd.name} has no option {tok}")
    assert not problems, "\n".join(problems)


def test_experiment_script_flags_exist():
    scripts = sorted(REPO.glob("scripts/*/*/*.sh"))
    assert len(scripts) >= 18, f"experiment tree went missing? {len(scripts)}"
    problems = []
    for sh in scripts:
        for tokens in _xvr_invocations(sh.read_text()):
            cmd, rest = _command_for(tokens)
            if isinstance(cmd, Group):
                problems.append(f"{sh}: unresolved subcommand in {tokens[:3]}")
                continue
            known = _known_flags(cmd)
            for tok in rest:
                if tok.startswith("--") and tok.split("=")[0] not in known:
                    problems.append(f"{sh}: {cmd.name} has no option {tok}")
    assert not problems, "\n".join(problems)
