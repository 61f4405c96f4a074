from .evp import (  # noqa: F401
    VelocitySolverState, DynamicsForcing, DynamicsTensors,
    make_velocity_solver, init_velocity_state)
