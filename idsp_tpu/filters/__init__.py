"""Filters and control loops (reference L3), TPU-first."""
