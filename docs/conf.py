# Sphinx configuration — structural parity with the reference's RTD setup
# (/root/reference/docs/conf.py).  The documentation content lives in the
# Markdown files next to this config (rendered by myst_parser under sphinx,
# readable as plain Markdown without it — this image ships no sphinx, so the
# Markdown files are the canonical docs).
#
# Build (where sphinx + myst-parser are installed):
#     sphinx-build -b html docs docs/_build/html
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "pxmcmc-tpu"
author = "pxmcmc-tpu contributors"
copyright = "2026, pxmcmc-tpu contributors"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]
try:  # Markdown sources; optional so bare sphinx still builds the rst shell
    import myst_parser  # noqa: F401

    extensions.append("myst_parser")
    source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
except ImportError:
    source_suffix = {".rst": "restructuredtext"}

master_doc = "contents"
exclude_patterns = ["_build"]
autodoc_mock_imports = ["jax", "jaxlib", "h5py", "scipy", "matplotlib"]

try:
    import sphinx_rtd_theme  # noqa: F401

    html_theme = "sphinx_rtd_theme"
except ImportError:
    html_theme = "alabaster"
