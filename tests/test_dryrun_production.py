"""Production-dims multichip dryrun (VERDICT r2 #8): the FULL-SIZE config
(bf16, dims %128, Pallas training-scan kernels engaged) compiles and runs
one sharded train step on the 8-virtual-device CPU mesh — exercising the
GSPMD x Mosaic-call interaction the toy-dims dryrun skips. Slow tier."""

import pytest


@pytest.mark.slow
def test_dryrun_production_dims():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8, production=True)
