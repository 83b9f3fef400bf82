# Sphinx configuration for cvmatrix_tpu (counterpart of the reference's
# docs/conf.py Sphinx+RTD setup: autodoc over the public modules).

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "cvmatrix_tpu"
author = "cvmatrix_tpu developers"
release = "0.3.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"

html_theme = "alabaster"
exclude_patterns = ["_build"]
