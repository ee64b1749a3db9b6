"""Analytic functions + interpolation (capability C13).

The reference initializes benchmark_03's source vector by interpolating
f(x) = sum_d sin(x_d) at the DoF support points (AnalyticalFunction,
benchmark_03.h:362-378) and importing host->device; here interpolation is a
pure function of the support-point array."""

from __future__ import annotations

import numpy as np

__all__ = ["sum_of_sines", "interpolate"]


def sum_of_sines(points: np.ndarray) -> np.ndarray:
    """f(x) = sum_d sin(x_d)  (benchmark_03.h:366-371)."""
    return np.sin(points).sum(axis=-1)


# axis-separable form consumed by DoFHandler.interpolate_values' fast path
sum_of_sines.axis_fn = np.sin


def interpolate(dof_handler, fn=sum_of_sines) -> np.ndarray:
    """Nodal interpolation into a DoF vector (VectorTools::interpolate).

    Chunk-fused: evaluates fn per cell chunk so only the [n_dofs] result
    is materialized (the support-point array is dim x larger — past the
    host's fast-fault window at nref>=8, see utils/hostmem.py)."""
    return dof_handler.interpolate_values(fn)
