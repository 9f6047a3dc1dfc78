"""Interop (scipy conversion) and visualization."""
