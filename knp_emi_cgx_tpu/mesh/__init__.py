from knp_emi_cgx_tpu.mesh.generation import (  # noqa: F401
    SimplexMesh,
    unit_square_mesh,
    unit_cube_mesh,
    mark_subdomains_square,
    mark_boundaries_square,
    mark_subdomains_cube,
    mark_boundaries_cube,
    mark_boundaries_square_mms,
    mark_boundaries_cube_mms,
    generate_square_geometry,
    generate_cube_geometry,
)
from knp_emi_cgx_tpu.mesh.topology import MeshTopology, build_topology  # noqa: F401
