from .stokeslet import stokeslet_G, stresslet_W, hypersingular_L, contract_normal
from .images import (
    free_surface_G,
    free_surface_W,
    no_slip_wall_G,
    no_slip_wall_W,
    no_slip_wall_singular_GW,
    image_point,
)

__all__ = [
    "stokeslet_G",
    "stresslet_W",
    "hypersingular_L",
    "contract_normal",
    "free_surface_G",
    "free_surface_W",
    "no_slip_wall_G",
    "no_slip_wall_W",
    "no_slip_wall_singular_GW",
    "image_point",
]
