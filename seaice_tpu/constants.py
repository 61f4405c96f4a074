"""Physical constants.

Mirrors the values used by the reference model
(`/root/reference/src/shared/mpas_seaice_constants.F` and
`/root/reference/src/column/constants/cice/ice_constants_colpkg.F90`)
so that results are field-for-field comparable.
"""

import math

PI = math.pi
DEGREES_TO_RADIANS = PI / 180.0
RADIANS_TO_DEGREES = 180.0 / PI
SECONDS_PER_DAY = 86400.0
SECONDS_PER_YEAR = 86400.0 * 365.0

# Earth
GRAVITY = 9.80616               # gravitational acceleration (m s-2)
OMEGA = 7.29212e-5              # Earth angular rotation rate (s-1)
EARTH_RADIUS = 6371229.0        # default MPAS sphere radius (m)

# densities (kg m-3)
DENSITY_ICE = 917.0
DENSITY_SNOW = 330.0
DENSITY_SEAWATER = 1026.0
DENSITY_FRESHWATER = 1000.0
DENSITY_AIR = 1.3

# thermodynamic constants
STEFAN_BOLTZMANN = 567.0e-10    # W m-2 K-4
ICE_SNOW_EMISSIVITY = 0.95
FRESH_FREEZING_POINT = 273.15   # K
AIR_SPECIFIC_HEAT = 1005.0      # J kg-1 K-1
ICE_SPECIFIC_HEAT = 2106.0      # J kg-1 K-1
OCEAN_SPECIFIC_HEAT = 4218.0    # J kg-1 K-1
LATENT_HEAT_VAPORIZATION = 2.501e6   # J kg-1 (Lvap)
LATENT_HEAT_SUBLIMATION = 2.835e6    # J kg-1 (Lsub)
LATENT_HEAT_MELTING = LATENT_HEAT_SUBLIMATION - LATENT_HEAT_VAPORIZATION  # Lfresh
OCEAN_ALBEDO = 0.06
VON_KARMAN = 0.4
ICE_SURFACE_ROUGHNESS = 0.0005  # m
STABILITY_REFERENCE_HEIGHT = 10.0  # m
OCEAN_FREEZING_TEMP = -1.8      # deg C, Tocnfrz
ICE_REF_SALINITY = 4.0          # ppt

# dynamics constants
ICE_STRENGTH_HIBLER_P = 2.75e4  # P* in Hibler (1979) strength formula (N m-2)
ICE_STRENGTH_HIBLER_C = 20.0    # C* in Hibler (1979) strength formula
ICE_OCEAN_DRAG = 0.00536        # ice-ocean drag coefficient
AIR_STRESS_COEFF = 0.0012       # constant air drag coefficient (standalone)

# EVP rheology parameters
# (reference: mpas_seaice_velocity_solver_constitutive_relation.F:41-59)
EVP_ECCENTRICITY = 2.0
EVP_ECCENTRICITY_SQ = EVP_ECCENTRICITY ** 2
EVP_DAMPING_TIMESCALE_PARAMETER = 0.36   # dampingTimescale = 0.36 * dt_dyn
REVISED_EVP_DAMPING_RATIO_DENOM = 0.86   # Bouillon et al. 2013 Se
REVISED_EVP_DAMPING_RATIO = 5.5e-3       # Bouillon et al. 2013 xi

PUNY = 1.0e-11

# thresholds for dynamics computational masks
# (reference: mpas_seaice_velocity_solver.F:64-65)
ICE_AREA_MINIMUM = 0.001
ICE_MASS_MINIMUM = 0.01

# ocean turning angle (northern hemisphere values; reference
# mpas_seaice_velocity_solver.F:62-63)
SIN_OCEAN_TURNING_ANGLE = 0.0
COS_OCEAN_TURNING_ANGLE = 1.0
