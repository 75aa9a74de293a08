"""`xvr animate` — turn a saved registration run back into a video.

The registration engine writes a self-describing result bundle (poses +
per-iteration trajectory + full config); this command replays that bundle,
re-rendering a DRR at every recorded pose and stitching the frames into an
animation (reference surface: /root/reference/src/xvr/cli/commands/animate.py).
"""

from __future__ import annotations

import click

from ..formatter import CategorizedCommand, categorized_option


@click.command(cls=CategorizedCommand)
@categorized_option(
    "-i", "--inpath", required=True, type=click.Path(exists=True),
    help="Result bundle written by <xvr register> (directory or parameters file)",
)
@categorized_option(
    "-o", "--outpath", required=True, type=click.Path(),
    help="Where to write the rendered animation",
)
@categorized_option(
    "--skip", default=1, type=int,
    help="Stride through the trajectory, rendering every Nth iterate",
)
@categorized_option(
    "--dpi", default=192, type=int,
    help="Resolution of each rendered frame",
)
@categorized_option(
    "--fps", default=30, type=int,
    help="Playback rate of the resulting video",
)
def animate(inpath, outpath, skip, dpi, fps):
    """Replay a registration trajectory as a rendered animation."""
    from ...visualization.animate import animate as render_trajectory

    render_trajectory(inpath, outpath, skip=skip, dpi=dpi, fps=fps)
