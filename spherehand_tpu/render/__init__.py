"""Differentiable rendering: analytic sphere depth, Gaussian heatmaps, and the
triangle z-buffer rasterizer (XLA reference + Pallas TPU kernel)."""
