from .box import (  # noqa: F401
    BOX_LX, BOX_LY, box_test_mesh, box_wind, box_ocean_currents,
    box_initial_state, box_forcing, box_coriolis_parameter)
from .ic import (  # noqa: F401
    category_initial_profile, uniform_ice, uniform_interior,
    circle_ice, random_coverage, special_cells, cice_default,
    ridging_band)
