"""Compatibility shim: all metadata lives in pyproject.toml.

Kept so ``pip install -e . --no-use-pep517`` (the legacy develop-mode
flow) works in minimal environments whose setuptools predates native
``bdist_wheel`` (< 70.1) and that cannot fetch build dependencies —
the modern PEP 660 editable path needs the ``wheel`` package there.
"""
from setuptools import setup

setup()
