"""CICE column-package physical constants
(values match `/root/reference/src/column/constants/cice/
ice_constants_colpkg.F90` so results are comparable field-for-field)."""

import math

RHOI = 917.0            # density of ice (kg/m^3)
RHOS = 330.0            # density of snow
RHOW = 1026.0           # density of seawater
RHOFRESH = 1000.0
CP_AIR = 1005.0
CP_ICE = 2106.0         # specific heat of fresh ice (J/kg/K)
CP_OCN = 4218.0
LSUB = 2.835e6          # latent heat of sublimation (J/kg)
LVAP = 2.501e6          # latent heat of vaporization (J/kg)
LFRESH = LSUB - LVAP    # latent heat of melting of fresh ice (J/kg)
DEPRESST = 0.054        # freezing-point depression (C/ppt)
EMISSIVITY = 0.95
STEFAN_BOLTZMANN = 567.0e-10
TFFRESH = 273.15        # freezing temp of fresh water (K)
GRAVIT = 9.80616
VONKAR = 0.4
ZVIR = 0.606            # rh2o/rair - 1
ZREF = 10.0             # reference height for stability (m)
ICERUF = 0.0005         # ice surface roughness (m)
DRAGIO = 0.00536
ALBOCN = 0.06
TOCNFRZ = -1.8
ICE_REF_SALINITY = 4.0
QQQICE = 11637800.0     # saturation humidity over ice
TTTICE = 5897.8
QQQOCN = 627572.4
TTTOCN = 5107.4
KICE = 2.03             # conductivity of fresh ice (W/m/K)
KSNO = 0.30             # conductivity of snow
BETAK = 0.13            # MU71 conductivity salinity coefficient
KIMIN = 0.10            # min saline-ice conductivity
HS_MIN = 1.0e-4         # min snow thickness for snow temps (m)
HFRAZILMIN = 0.05       # min thickness of new frazil ice (m)
SALTMAX = 3.2           # max salinity at ice base, BL99 (ppt)
MIN_SALIN = 0.1         # threshold for brine-free ice (ppt)
NSAL = 0.407            # BL99 salinity profile shape
MSAL = 0.573
FERRMAX = 1.0e-3        # max allowed thermo energy flux error (W/m^2)
PUNY = 1.0e-11
TIMELT = 0.0            # melting temp of ice top surface (C)
TSMELT = 0.0            # melting temp of snow (C)
USTAR_MIN = 0.0005      # min friction velocity under ice (m/s; MPAS
                        # config_min_friction_velocity default)
CPRHO = CP_OCN * RHOW
PI = math.pi
VISCOSITY_DYN = 1.79e-3   # dynamic viscosity of brine (kg/m/s)
