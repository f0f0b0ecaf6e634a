from .postprocess import (
    cutflow_efficiencies,
    data_mc_ratio,
    normalize_histograms,
    stack_by_group,
    yields_table_tex,
    cutflow_png,
    write_histograms,
)

__all__ = [
    "cutflow_efficiencies",
    "data_mc_ratio",
    "normalize_histograms",
    "stack_by_group",
    "yields_table_tex",
    "cutflow_png",
    "write_histograms",
]
