from .nifti import load_nifti, save_nifti, to_canonical
from .volumes import parse_labels, read

__all__ = ["load_nifti", "parse_labels", "read", "save_nifti", "to_canonical"]
