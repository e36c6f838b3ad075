"""Unit tests for the sweep harness's variant-config axis (r4).

The on-chip sweeps are the durable perf record (reference
test/test_gpulapack.sh + benchmark_base.tar.gz); these tests pin the
harness logic that golden comparisons depend on — config normalization
for pre-r4 rows and the per-op variant grids — without touching a device.
"""

import importlib.util
import sys
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "sweep", Path(__file__).parent.parent / "tools" / "sweep.py")
sweep = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("sweep", sweep)
_spec.loader.exec_module(sweep)


def test_default_cfg_covers_every_op():
    assert set(sweep.DEFAULT_CFG) == set(sweep.POINTS)
    assert set(sweep.GRID_CFG) == set(sweep.POINTS)
    for op, cfg in sweep.DEFAULT_CFG.items():
        assert cfg in sweep.GRID_CFG[op], (op, cfg)


def test_norm_cfg_maps_pre_r4_rows_to_default_variant():
    # pre-r4 golden rows stored the BACKEND ("auto") in the config field;
    # they measured the default variant of each op
    assert sweep.norm_cfg("potrf", "auto") == "l"
    assert sweep.norm_cfg("trmm", "auto") == "llnn"
    assert sweep.norm_cfg("trtri", None) == "ln"
    # genuine variants pass through
    assert sweep.norm_cfg("potrf", "u") == "u"
    assert sweep.norm_cfg("trsm", "rutn") == "rutn"
    # junk falls back to the default (never KeyErrors a comparison)
    assert sweep.norm_cfg("gemm", "zz") == "nn"


def test_grid_variants_are_well_formed():
    for op in ("trmm", "trsm"):
        for cfg in sweep.GRID_CFG[op]:
            assert len(cfg) == 4
            assert cfg[0] in "lr" and cfg[1] in "lu"
            assert cfg[2] in "nt" and cfg[3] in "nu"
    for cfg in sweep.GRID_CFG["trtri"]:
        assert len(cfg) == 2 and cfg[0] in "lu" and cfg[1] in "nu"
