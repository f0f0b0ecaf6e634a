from .phase2 import define_phase2
from .jet_test import define_jet_test

__all__ = ["define_phase2", "define_jet_test"]
