"""Legacy-editable-install shim (see the note atop pyproject.toml):
all metadata lives in pyproject.toml's [project] table; this file
exists so `pip install -e .` works where the `wheel` package (and so
PEP 660 build_editable) is unavailable."""

from setuptools import setup

setup()
