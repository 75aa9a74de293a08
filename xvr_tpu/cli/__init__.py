"""Command-line surface: the ``xvr`` click group and its commands."""

from .cli import cli

__all__ = ["cli"]
