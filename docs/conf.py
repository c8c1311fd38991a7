# Sphinx configuration for the twotower-tpu docs build (CI `documentation`
# job; parity with the reference's sphinx job, reference ci.yml:164-191).
# Pages are Markdown, rendered via myst-parser.

project = "twotower-tpu"
author = "twotower-tpu contributors"
copyright = "2026, twotower-tpu contributors"

extensions = ["myst_parser"]
source_suffix = {".md": "markdown", ".rst": "restructuredtext"}
root_doc = "index"

exclude_patterns = ["_build"]

# Docs link into source dirs that are not part of the doc tree.
suppress_warnings = ["myst.xref_missing"]

try:  # theme is optional — plain builders still work without it
    import sphinx_rtd_theme  # noqa: F401

    html_theme = "sphinx_rtd_theme"
except ImportError:
    html_theme = "alabaster"
html_static_path = []
