# Sphinx configuration for the dgp_tpu documentation.
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "dgp_tpu"
author = "dgp_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"

html_theme = "alabaster"
exclude_patterns = []
