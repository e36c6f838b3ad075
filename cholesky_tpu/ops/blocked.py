"""Blocked single-chip drivers (filled in by the fast-path tiers).

This module hosts the recursive blocked POTRF/TRTRI/LAUUM/POTRI/TRSM/TRMM
drivers whose tiles are Pallas MXU kernels — the analog of the reference's
cu* single-GPU tier. Populated incrementally; any name not defined here
falls back to the oracle tier via ops/dispatch.py.
"""

from __future__ import annotations
