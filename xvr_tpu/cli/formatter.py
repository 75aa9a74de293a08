"""Categorized ``--help`` formatting for the CLI.

Reproduces the reference's help UX (/root/reference/src/xvr/cli/formatter.py:
options grouped into sections like Required/Data/Sampling/... with aligned
columns and ``-h`` enabled).
"""

from __future__ import annotations

from collections import defaultdict

import click


class CategorizedOption(click.Option):
    def __init__(self, *args, category: str = "Miscellaneous", **kwargs):
        self.category = category
        super().__init__(*args, **kwargs)


def categorized_option(*param_decls, category: str = "Miscellaneous", **kwargs):
    def decorator(f):
        params = getattr(f, "__click_params__", None)
        if params is None:
            params = f.__click_params__ = []
        params.append(CategorizedOption(param_decls, category=category, **kwargs))
        return f

    return decorator


class CategorizedCommand(click.Command):
    def __init__(self, *args, category_order=None, **kwargs):
        kwargs.setdefault(
            "context_settings",
            {
                "show_default": True,
                "max_content_width": 120,
                "help_option_names": ["-h", "--help"],
            },
        )
        super().__init__(*args, **kwargs)
        self.category_order = list(category_order or []) + ["Miscellaneous"]

    def format_help(self, ctx, formatter):
        self.format_usage(ctx, formatter)
        if self.help:
            formatter.indent()
            formatter.write_paragraph()
            formatter.write_text(self.help)
            formatter.dedent()

        groups: dict[str, list] = defaultdict(list)
        for param in self.params:
            if isinstance(param, click.Argument):
                continue
            groups[getattr(param, "category", "Miscellaneous")].append(param)

        sections = []
        rows_all = []
        for category in self.category_order:
            rows = [p.get_help_record(ctx) for p in groups.get(category, [])]
            rows = [r for r in rows if r is not None]
            if rows:
                name = f"{category} options" if len(groups) > 1 else "Options"
                sections.append((name, rows))
                rows_all.extend(rows)

        if rows_all:
            width = max(len(flag) for flag, _ in rows_all)
            for name, rows in sections:
                with formatter.section(name):
                    for flag, doc in rows:
                        formatter.write_text(f"{flag:<{width}}  {doc}")
        self.format_epilog(ctx, formatter)
