"""`xvr dcm2nii` — bake a DICOM series (or DICOMDIR) into a single NIfTI.

The converter behind it is our own dependency-free implementation
(xvr_tpu/io/dcm2nii.py): it sorts slices by ImagePositionPatient along the
stack normal, applies RescaleSlope/Intercept, and assembles the affine from
the DICOM orientation tags. Reference surface:
/root/reference/src/xvr/cli/commands/dcm2nii.py:6-17.
"""

from __future__ import annotations

import click

from ..formatter import CategorizedCommand


@click.command(cls=CategorizedCommand)
@click.argument("inpath", type=click.Path(exists=True))
@click.argument("outpath", type=click.Path())
def dcm2nii(inpath, outpath):
    """Convert a DICOMDIR to a NIfTI file."""
    from ...io.dcm2nii import dicom_series_to_nifti

    click.echo(f"Converting {inpath} to {outpath}")
    dicom_series_to_nifti(inpath, outpath)
