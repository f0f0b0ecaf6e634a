"""CutFlowReport — per-selection event count and weight sum.

Mirrors the reference (phaseII-analysis.py:502-510, jet_test.py:728-734):
each added selection contributes one (N, SumW) counter; bamboo stores these
as 1-bin histograms (phaseII-analysis.py:224-230), and the single-pass
histogrammer here does exactly the same — a cutflow entry is a pid with
bin 0, so it rides the same aggregation job as the plots.
"""

from __future__ import annotations


class CutFlowReport:
    def __init__(self, name: str):
        self.name = name
        self.entries: list[tuple] = []  # (selection, title)

    def add(self, selection, title: str | None = None) -> "CutFlowReport":
        self.entries.append((selection, title or selection.name))
        return self
