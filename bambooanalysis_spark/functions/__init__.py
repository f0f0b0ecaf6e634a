from .physics import (
    bit_set,
    delta_phi,
    delta_r,
    in_range_open,
    invariant_mass,
    invariant_mass_p4,
)

__all__ = [
    "bit_set",
    "delta_phi",
    "delta_r",
    "in_range_open",
    "invariant_mass",
    "invariant_mass_p4",
]
