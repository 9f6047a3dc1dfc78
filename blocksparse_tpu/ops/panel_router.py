"""Panel implementation router: v1 (core/panel.py) by default, v2
(SEG-parametric pinned covers, core/panel2.py) via BST_PANEL_IMPL=v2.

v2 was built and measured head-to-head in round 4
(benchmarks/archive/proto_r4_panel2.py): its smaller-SEG plans cut value padding
(config3 1.37 -> 1.29, configS 2.19 -> 2.07) but the finer x row gather
costs more than the padding saves -- TPU serializes ops, so the gather
is paid per product even when products are pipelined.  v1's shifted
32-lane segment covers remain the better trade on every BASELINE
population, so v1 stays the default; v2 is kept as the measured
alternative (it wins if a future runtime overlaps gather ops with
kernels, and its greedy pinned covers are the simpler base for new
layouts).

The formats talk to the panel engine only through these four functions;
`panel_run` dispatches on the plan type, so cached entries stay valid
even if the env changes between builds.
"""

from __future__ import annotations

import os

__all__ = ["panel_plan_general", "panel_plan_sym", "panel_arrays",
           "panel_run"]


def _impl() -> str:
    return os.environ.get("BST_PANEL_IMPL", "v1")


def panel_plan_general(layout, *, transpose: bool):
    if _impl() == "v1":
        from ..core.panel import panel_plan_from_layout

        return panel_plan_from_layout(layout, transpose=transpose)
    from ..core.panel2 import panel2_plan_from_layout

    return panel2_plan_from_layout(layout, transpose=transpose)


def panel_plan_sym(dlayout, olayout, *, transpose_diag: bool):
    if _impl() == "v1":
        from ..core.panel import panel_plan_symmetric

        return panel_plan_symmetric(dlayout, olayout,
                                    transpose_diag=transpose_diag)
    from ..core.panel2 import panel2_plan_symmetric

    return panel2_plan_symmetric(dlayout, olayout,
                                 transpose_diag=transpose_diag)


def panel_arrays(plan):
    from ..core.panel2 import Panel2Plan

    if isinstance(plan, Panel2Plan):
        from .pallas.panel2_spmv import panel2_device_arrays

        return panel2_device_arrays(plan)
    from .pallas.panel_spmv import panel_device_arrays

    return panel_device_arrays(plan)


def panel_run(plan, dev, x, *, interpret: bool = False):
    from ..core.panel2 import Panel2Plan

    if isinstance(plan, Panel2Plan):
        from .pallas.panel2_spmv import panel2_apply

        return panel2_apply(plan, dev, x, interpret=interpret)
    from .pallas.panel_spmv import panel_apply

    return panel_apply(plan, dev, x, interpret=interpret)
