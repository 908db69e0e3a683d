from .rigid import (
    MassOperator,
    surface_mass_and_com,
    rigid_modes,
    normal_vector_l2,
)

__all__ = [
    "MassOperator",
    "surface_mass_and_com",
    "rigid_modes",
    "normal_vector_l2",
]
