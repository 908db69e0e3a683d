from .reference_element import LagrangeLine, LagrangeQuad, reference_element
from .quadrature import (
    gauss_1d,
    gauss_quad,
    iterated_gauss_1d,
    iterated_gauss_quad,
    telles_1d,
    telles_quad,
    duffy_triangle_rule,
    singular_rule_quad,
    singular_rule_line,
)

__all__ = [
    "LagrangeLine",
    "LagrangeQuad",
    "reference_element",
    "gauss_1d",
    "gauss_quad",
    "iterated_gauss_1d",
    "iterated_gauss_quad",
    "telles_1d",
    "telles_quad",
    "duffy_triangle_rule",
    "singular_rule_quad",
    "singular_rule_line",
]
