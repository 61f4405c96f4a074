from .box import (  # noqa: F401
    BOX_LX, BOX_LY, box_test_mesh, box_wind, box_ocean_currents,
    box_initial_state, box_forcing, box_coriolis_parameter)
