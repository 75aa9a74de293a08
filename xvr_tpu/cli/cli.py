"""`xvr` command-line interface.

Same command tree as the reference (/root/reference/src/xvr/cli/cli.py:15-59):
``train``, ``restart``, ``register {model,dicom,fixed,restart}``, ``animate``,
``dcm2nii``, with commands listed in definition order.
"""

from __future__ import annotations

import click

from .. import __version__
from .commands.animate import animate
from .commands.dcm2nii import dcm2nii
from .commands.register import dicom, fixed, model, restart as register_restart
from .commands.restart import restart
from .commands.train import train


class OrderedGroup(click.Group):
    """List commands in insertion order (not alphabetical)."""

    def list_commands(self, ctx):
        return list(self.commands)


@click.group(
    cls=OrderedGroup,
    context_settings={"help_option_names": ["-h", "--help"], "max_content_width": 120},
)
@click.version_option(__version__, "-v", "--version")
def cli():
    """xvr-tpu: TPU-native 2D/3D X-ray to volume registration."""
    from ..utils.cache import enable_compilation_cache

    # Persist compiled executables across invocations: repeat registrations /
    # training restarts at the same intrinsics skip minutes of XLA compiles.
    enable_compilation_cache()


@click.group(cls=OrderedGroup)
def register():
    """Initialize and refine the pose of an X-ray with iterative optimization."""


register.add_command(model)
register.add_command(dicom)
register.add_command(fixed)
register.add_command(register_restart)

cli.add_command(train)
cli.add_command(restart)
cli.add_command(register)
cli.add_command(animate)
cli.add_command(dcm2nii)


if __name__ == "__main__":
    cli()
