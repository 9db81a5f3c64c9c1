"""Fused Pallas TPU kernel for LPG (placeholder until implemented).

Will provide: fused reduction-head transform + k x k plane expansion with a
custom VJP.  See bts_tpu/ops/lpg.py for the math contract.
"""

from __future__ import annotations


def pallas_available() -> bool:
    return False


def lpg(plane_eq, k):  # pragma: no cover - placeholder
    raise NotImplementedError("Pallas LPG kernel not yet implemented")
