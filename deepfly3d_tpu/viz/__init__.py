"""Rendering: 2D overlays, 3D skeleton plots, result videos."""
