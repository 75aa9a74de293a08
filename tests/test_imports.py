"""Import-smoke test: every module in the package must import cleanly.

The reference gets this implicitly from its strict mkdocs build, which walks
the package with mkdocstrings (/root/reference/.github/workflows/docs.yml:34-40,
docs/scripts/gen_ref_pages.py:9-35). Here it is explicit and part of the fast
test subset.
"""

import importlib
import pkgutil

import pytest

import xvr_tpu

MODULES = sorted(
    info.name
    for info in pkgutil.walk_packages(xvr_tpu.__path__, prefix="xvr_tpu.")
)


@pytest.mark.parametrize("name", MODULES)
def test_module_imports(name):
    importlib.import_module(name)


def test_package_has_expected_subpackages():
    tops = {m.split(".")[1] for m in MODULES}
    assert {
        "cli", "config", "geometry", "io", "metrics", "models", "parallel",
        "registrar", "render", "train", "utils", "visualization",
    } <= tops
