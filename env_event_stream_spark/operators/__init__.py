"""Declarative operator library.

Each module exposes pure ``DataFrame -> DataFrame`` builders so
Catalyst sees the whole plan (pushdown, pruning, join selection stay
available). Nothing here collects to the driver.
"""
