from knp_emi_cgx_tpu.fem.p1 import (  # noqa: F401
    cell_geometry,
    facet_geometry,
    reference_mass,
    interval_quadrature,
    triangle_quadrature,
    facet_quadrature,
)
