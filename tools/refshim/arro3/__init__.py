"""Minimal stand-in for the ``arro3`` package (not installed in this
environment); see tools/refshim/nanoarrow.py for the rationale."""
