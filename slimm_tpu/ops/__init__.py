"""Pallas TPU kernels for the hot ops."""

from .hist import HIST_MAX_BINS, mxu_hist, mxu_hist2, pallas_ok

__all__ = ["mxu_hist", "mxu_hist2", "pallas_ok", "HIST_MAX_BINS"]
