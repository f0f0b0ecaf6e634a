from .selection import Selection
from .plots import EquidistantBinning, VariableBinning, Plot
from .cutflow import CutFlowReport
from .histogrammer import run_analysis

__all__ = [
    "Selection",
    "EquidistantBinning",
    "VariableBinning",
    "Plot",
    "CutFlowReport",
    "run_analysis",
]
