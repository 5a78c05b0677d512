"""Shim for environments whose setuptools predates built-in bdist_wheel
(< 70.1) and that have no ``wheel`` package or network: ``pip install -e .``
needs to build a PEP 660 editable wheel, which fails there, while
``python setup.py develop`` installs a classic egg-link with stdlib-only
machinery. All metadata lives in pyproject.toml."""

from setuptools import setup

setup()
